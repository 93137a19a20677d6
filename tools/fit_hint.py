#!/usr/bin/env python
"""Fit the first-tile wave-count predictor from a FASTGA_TPU_HINT_LOG.

Log lines: ``tile_extent tube_extent cov waves hint_used`` (written by
models/aligner._device_align more_fn).  The predictor groups tubes into
32-lane kernel blocks, so what matters is rank correlation + the cost
model Σ_blocks max(waves) when sorted by the prediction.

Usage: python tools/fit_hint.py /tmp/hints.txt
"""

import sys

import numpy as np


def block_cost(nw, order, bt=32):
    x = nw[order]
    pad = (-len(x)) % bt
    if pad:
        x = np.concatenate([x, np.zeros(pad, x.dtype)])
    return int(x.reshape(-1, bt).max(axis=1).sum())


def main():
    d = np.loadtxt(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hints.txt")
    ext, text, cov, nw, hint = d.T
    unc = np.maximum(text - cov, 0)
    n = len(nw)
    ideal = int(np.ceil(nw.sum() / 32))
    print(f"{n} samples; waves p50={np.median(nw):.0f} "
          f"p90={np.percentile(nw, 90):.0f} max={nw.max():.0f}")
    print(f"ideal block-waves {ideal}")
    print(f"perfect sort      {block_cost(nw, np.argsort(nw))}")
    print(f"current hint      {block_cost(nw, np.argsort(hint, kind='stable'))}")
    print(f"submit order      {block_cost(nw, np.arange(n))}")

    # candidate predictors (evaluated by the cost they actually control)
    cands = {
        "ext": ext,
        "unc": unc,
        "unc+0.01ext": unc + 0.01 * ext,
        "unc+0.05ext": unc + 0.05 * ext,
        "0.3unc+0.012text (baked)": 24 + 0.3 * unc + 0.012 * text,
    }
    for name, p in cands.items():
        c = block_cost(nw, np.argsort(p, kind="stable"))
        r = np.corrcoef(p, nw)[0, 1]
        print(f"{name:28s} cost={c:8d} ({c / ideal:.2f}x ideal) "
              f"corr={r:.3f}")

    # least squares for waves ~ a*unc + b*text + c (report only)
    X = np.stack([unc, text, np.ones(n)], axis=1)
    coef, *_ = np.linalg.lstsq(X, nw, rcond=None)
    print(f"lstsq: waves ~ {coef[0]:.4f}*unc + {coef[1]:.5f}*text "
          f"+ {coef[2]:.1f}")
    pf = X @ coef
    print(f"lstsq predictor cost="
          f"{block_cost(nw, np.argsort(pf, kind='stable'))}")


if __name__ == "__main__":
    sys.exit(main())
