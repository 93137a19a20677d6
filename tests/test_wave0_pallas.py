"""The Pallas wave-0 initializer must be bit-identical to host_wave0
(which the XLA build_wave0 and the scalar reference already verify).
Interpret mode on CPU; Mosaic-compiled on TPU."""

import numpy as np

from conftest import INTERPRET
import pytest

from tests.test_wave_pallas import _mutate


@pytest.mark.parametrize("direction", [+1, -1])
def test_pallas_wave0_matches_host(direction):
    import jax.numpy as jnp

    from fastga_tpu.ops import seqpack, wave as wavek, wave_pallas

    rng = np.random.default_rng(11)
    A = rng.integers(0, 4, 30000).astype(np.uint8)
    B = _mutate(A, 0.08, rng)
    pool = seqpack.SeqPool.build({"a": A, "b": B})
    cfg = wavek.WaveConfig(n=32, w=256, chunk=24, max_chunks=64)

    init = wave_pallas.build_wave0_pallas(cfg, direction, interpret=INTERPRET)
    pw = jnp.asarray(pool.words)
    pages = wave_pallas.build_pool_pages(jnp, pw)
    aw, alen = pool.offs["a"]
    bw, blen = pool.offs["b"]
    n = cfg.n

    def pad(v, fill=0):
        x = np.full(n, fill, np.int32)
        x[:] = v
        return x

    targs = (pad(aw), pad(alen, 1), pad(bw), pad(blen, 1),
             pad(-(1 << 30)), pad(1 << 30))
    anti = np.asarray([2 * (6000 + 211 * i) for i in range(n)], np.int32)
    dgmin = pad(-25)
    dgmax = pad(25)
    valid = np.ones(n, np.int32)
    valid[-3:] = 0   # padding rows must come out dead

    st_host, kb0 = wavek.host_wave0(
        np.asarray(pool.words), targs, dgmin, dgmax, anti, cfg,
        direction)
    alive_host = st_host[15].copy()
    alive_host[valid == 0] = False

    st_dev = init(pages, tuple(jnp.asarray(t) for t in targs),
                  jnp.asarray(dgmin), jnp.asarray(dgmax),
                  jnp.asarray(anti), jnp.asarray(valid))

    names = ("V Thi Tlo M kbase low hgh besta bestx lasta trima trimx "
             "trimd trim_wave trim_slot alive fallback dif").split()
    ref = st_host[:15] + (alive_host,) + st_host[16:]
    for i, (h, d) in enumerate(zip(ref, st_dev)):
        hv = np.asarray(h)
        dv = np.asarray(d)
        if names[i] in ("V", "Thi", "Tlo", "M"):
            # state rows only matter inside the band / for valid rows
            band = (np.arange(cfg.w)[None, :]
                    >= np.asarray(st_host[5])[:, None]) \
                & (np.arange(cfg.w)[None, :]
                   <= np.asarray(st_host[6])[:, None]) \
                & (valid[:, None] > 0)
            assert np.array_equal(np.where(band, hv, 0),
                                  np.where(band, dv, 0)), names[i]
        elif names[i] in ("alive",):
            assert np.array_equal(hv.astype(bool), dv.astype(bool)), \
                names[i]
        else:
            ok = np.array_equal(hv, dv)
            if not ok and names[i] not in ("V",):
                # scalar columns only matter for valid rows
                assert np.array_equal(hv[valid > 0], dv[valid > 0]), \
                    names[i]
