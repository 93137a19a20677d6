import numpy as np
import pytest

from fastga_tpu.io import gdb as gdbm
from fastga_tpu.io import gix as gixm
from fastga_tpu.utils import dna
from tests.test_gdb import write_fasta


@pytest.fixture
def small_gdb(tmp_path, rng):
    s1 = dna.to_ascii(rng.integers(0, 4, 5000).astype(np.uint8), upper=True).decode()
    s2 = dna.to_ascii(rng.integers(0, 4, 9000).astype(np.uint8), upper=True).decode()
    fa = tmp_path / "g.fasta"
    write_fasta(fa, [("c1", s1), ("c2", s2)])
    g, _ = gdbm.create_gdb(fa, tmp_path / "g")
    return g, tmp_path


def test_build_sorted(small_gdb):
    g, _ = small_gdb
    t = gixm.build_gix(g)
    assert t.n > 0
    khi, klo = t.khi_klo()
    key = (khi.astype(object) << 16) + klo.astype(object)
    assert all(key[i] <= key[i + 1] for i in range(len(key) - 1))


def test_lcp_bruteforce(small_gdb):
    g, _ = small_gdb
    t = gixm.build_gix(g)
    kb = t.kbytes
    # brute-force base-level lcp on a sample
    idx = np.linspace(1, t.n - 1, 200).astype(int)
    for i in idx:
        a = np.repeat(kb[i - 1], 4)  # expand later; compare base by base
        la = _bases(kb[i - 1])
        lb = _bases(kb[i])
        want = 0
        while want < t.kmer and la[want] == lb[want]:
            want += 1
        if want == t.kmer:
            assert t.lcp[i] == 40
        else:
            assert t.lcp[i] == want


def _bases(kbrow):
    out = []
    for b in kbrow:
        out += [(b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3]
    return out


def test_entry_kmers_match_sequence(small_gdb):
    g, _ = small_gdb
    t = gixm.build_gix(g)
    rng = np.random.default_rng(1)
    seqs = {r: g.get_contig(int(t.perm[r])) for r in range(g.ncontig)}
    for i in rng.integers(0, t.n, 100):
        bases = np.array(_bases(t.kbytes[i]), dtype=np.uint8)
        ctg = seqs[int(t.cont[i])]
        p = int(t.post[i])
        if t.comp[i]:
            want = dna.revcomp(ctg[p - t.kmer : p])
        else:
            want = ctg[p : p + t.kmer]
        np.testing.assert_array_equal(bases, want)


def test_prefix_index(small_gdb):
    g, _ = small_gdb
    t = gixm.build_gix(g)
    assert t.prefix_index[-1] == t.n
    # every entry's 24-bit prefix falls in its panel
    p24 = ((t.kbytes[:, 0].astype(np.int64) << 16)
           | (t.kbytes[:, 1].astype(np.int64) << 8)
           | t.kbytes[:, 2].astype(np.int64))
    starts = t.prefix_index[p24]
    ends = t.prefix_index[p24 + 1]
    i = np.arange(t.n)
    assert ((i >= starts) & (i < ends)).all()


def test_disk_roundtrip(small_gdb):
    g, tmp = small_gdb
    t = gixm.build_gix(g)
    gixm.write_gix(t, tmp / "g")
    t2 = gixm.read_gix(tmp / "g")
    assert t2.kmer == t.kmer
    assert t2.n == t.n
    np.testing.assert_array_equal(t2.kbytes, t.kbytes)
    np.testing.assert_array_equal(t2.post, t.post)
    np.testing.assert_array_equal(t2.cont, t.cont)
    np.testing.assert_array_equal(t2.comp, t.comp)
    np.testing.assert_array_equal(t2.lcp, t.lcp)
    np.testing.assert_array_equal(t2.perm, t.perm)
    np.testing.assert_array_equal(t2.prefix_index, t.prefix_index)
    assert (t2.post_bytes, t2.cont_bytes) == (t.post_bytes, t.cont_bytes)


def test_rc_fwd_pairing(small_gdb):
    # every 40-mer position sampled forward must also appear as its RC twin
    # when both fit: syncmer at j emits fwd(j) and rc(j+12) for j in [28,len-40]
    g, _ = small_gdb
    t = gixm.build_gix(g)
    fwd_posts = set(zip(t.cont[~t.comp].tolist(), t.post[~t.comp].tolist()))
    rc_posts = set(zip(t.cont[t.comp].tolist(), (t.post[t.comp] - 12).tolist()))
    lens = {r: g.contigs[int(t.perm[r])].clen for r in range(g.ncontig)}
    for (c, j) in list(fwd_posts)[:500]:
        if j >= 28:
            assert (c, j) in rc_posts
    for (c, j) in list(rc_posts)[:500]:
        if j <= lens[c] - 40:
            assert (c, j) in fwd_posts


def test_masked_prefix(tmp_path, rng):
    s = dna.to_ascii(rng.integers(0, 4, 2000).astype(np.uint8), upper=True).decode()
    # lower-case a block
    s = s[:500] + s[500:700].lower() + s[700:]
    fa = tmp_path / "g.fasta"
    write_fasta(fa, [("c1", s)])
    g, masks = gdbm.create_gdb(fa, tmp_path / "g")
    t = gixm.build_gix(g, masks=masks)
    # forward entries starting inside the mask have maskb = min(run, 40)
    sel = (~t.comp) & (t.post >= 500) & (t.post < 700)
    want = np.minimum(700 - t.post[sel], 40)
    np.testing.assert_array_equal(t.maskb[sel], want)
    # entries well before the mask are unmasked
    sel2 = (~t.comp) & (t.post < 440)
    assert (t.maskb[sel2] == 0).all()


def test_old_format_roundtrip(tmp_path, small_gdb):
    """Pre-v1.3 GIX (counts in ktab + .post part files, FastGA.c:273-344):
    write_gix_old -> read_gix reproduces the table; the stub carries the
    2^16 post index and a 255 cutoff (full table).  Cross-validated
    against the C reference: FastGA reads our old-format files and
    produces byte-identical PAF (see tools/oracle + /verify recipe)."""
    g, _ = small_gdb
    t = gixm.build_gix(g)
    root = tmp_path / "old"
    gixm.write_gix_old(t, root)
    assert (tmp_path / "old.gix").exists()
    assert (tmp_path / ".old.post.1").exists()
    t2 = gixm.read_gix(root)
    assert t2.freq == 255 and t2.kmer == t.kmer
    np.testing.assert_array_equal(t.kbytes, t2.kbytes)
    np.testing.assert_array_equal(t.post, t2.post)
    np.testing.assert_array_equal(t.cont, t2.cont)
    np.testing.assert_array_equal(t.comp, t2.comp)
    np.testing.assert_array_equal(np.minimum(t.lcp, 40),
                                  np.minimum(t2.lcp, 40))
    np.testing.assert_array_equal(t.prefix_index, t2.prefix_index)
    assert (t2.maskb == 0).all()
    gixm.remove_gix(root)
    assert not (tmp_path / ".old.post.1").exists()
    assert not (tmp_path / ".old.ktab.1").exists()


def test_kmer_stream(small_gdb):
    """KmerStream (libfastk Kmer_Stream parity) must reproduce read_gix
    column-for-column through a tiny read buffer, support goto_kmer ==
    GixTable.searchsorted, clone, and batched entries()."""
    g, tmp = small_gdb
    t = gixm.build_gix(g)
    gixm.write_gix(t, tmp / "s", nthreads=4)   # multiple part files
    s = gixm.KmerStream(tmp / "s", bufents=64)
    assert s.nels == t.n
    assert s.kmer == t.kmer
    assert np.array_equal(np.asarray(s.perm), np.asarray(t.perm))

    # full iteration matches the in-memory table
    s.first()
    i = 0
    while not s.eof:
        assert np.array_equal(s.kmer_codes(), t.kmer_codes(i)), i
        assert s.post == int(t.post[i])
        assert s.cont == int(t.cont[i])
        assert s.comp == bool(t.comp[i])
        assert s.lcp == int(t.lcp[i])
        assert s.maskb == int(t.maskb[i])
        i += 1
        s.next()
    assert i == t.n

    # random access + clone
    rng = np.random.default_rng(11)
    for i in rng.integers(0, t.n, 16):
        s.goto_index(int(i))
        assert np.array_equal(s.kmer_codes(), t.kmer_codes(int(i)))
        c = s.clone()
        assert c.idx == s.idx and c.post == s.post
        c.close()

    # goto_kmer == searchsorted on existing and probe kmers
    for i in rng.integers(0, t.n, 8):
        codes = t.kmer_codes(int(i))
        assert s.goto_kmer(codes) == t.searchsorted(codes)
    for _ in range(8):
        codes = rng.integers(0, 4, t.kmer).astype(np.uint8)
        assert s.goto_kmer(codes) == t.searchsorted(codes)

    # batched decode covers every entry exactly once, in order
    got = 0
    for (i0, suf, maskb, lcp, post, cont, comp) in s.entries(chunk=100):
        n = len(post)
        assert i0 == got
        assert np.array_equal(post, t.post[i0:i0 + n].astype(np.int64))
        assert np.array_equal(cont, t.cont[i0:i0 + n])
        assert np.array_equal(comp, t.comp[i0:i0 + n])
        assert np.array_equal(lcp, t.lcp[i0:i0 + n])
        assert np.array_equal(suf, t.kbytes[i0:i0 + n, 3:])
        got += n
    assert got == t.n
    s.close()

    # old format is rejected with a clear error
    gixm.write_gix_old(t, tmp / "o")
    with pytest.raises(ValueError):
        gixm.KmerStream(tmp / "o")
