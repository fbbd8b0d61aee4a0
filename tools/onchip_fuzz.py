"""Compiled-mode random-shape parity fuzz of the rowsort kernel on the
REAL backend.

The CPU test suite runs the Pallas kernels in interpret mode only (the
virtual mesh cannot compile Mosaic); TPU_VALID.json pins a handful of
fixed shapes.  This tool draws random (k, read_len, batch, canonical)
configurations — spans, sub-row splits, odd batches, N-rich data — and
checks the COMPILED kernel against the XLA lax.sort oracle on whatever
backend jax sees.  Each trial costs one ~4-40 s Mosaic compile.

    python tools/onchip_fuzz.py --trials 20 [--seed 0]

Exit 1 on the first mismatch with the failing config printed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfrk_tpu.ops.pallas.rowsort import (
        rowsort_rle_pallas,
        rowsort_rle_pallas_large,
    )
    from cfrk_tpu.ops.perread_sparse import (
        count_perread_sparse,
        count_perread_sparse_large,
    )

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    for t in range(args.trials):
        # Bias lengths toward the interesting layout boundaries:
        # spans (<= 71 bp at k=8), one-vreg rows, the g=2 half-skip
        # band (129-192 windows), multi-sub-row, contigs — including
        # the round-4 extended 17-64 kb band (g up to 512; rarer: each
        # such trial is a ~30 s Mosaic compile).
        length = int(rng.choice([
            rng.integers(33, 72), rng.integers(72, 200),
            rng.integers(200, 600), rng.integers(600, 2500),
            rng.integers(2500, 16500), rng.integers(16500, 66000),
        ], p=[0.22, 0.26, 0.18, 0.18, 0.08, 0.08]))
        big = bool(rng.integers(0, 3) == 0)
        if big:
            k = int(rng.integers(16, 32))
            length = max(length, k + 3)
        else:
            k = int(rng.integers(1, 16))
        b = int(rng.choice([5, 37, 64, 256, 511]))
        if length > 2500:
            b = int(rng.choice([3, 9, 16]))  # contig batches are small
        canonical = bool(rng.integers(0, 2))
        p_n = float(rng.choice([0.0, 0.02, 0.3]))
        codes = rng.integers(0, 4, size=(b, length)).astype(np.int8)
        if p_n:
            codes[rng.random(codes.shape) < p_n] = -1
        x = jnp.asarray(codes)
        cfg = dict(k=k, length=length, b=b, canonical=canonical, p_n=p_n)
        if big:
            got = rowsort_rle_pallas_large(x, k, canonical=canonical)
            want = count_perread_sparse_large(x, k, canonical)
        else:
            got = rowsort_rle_pallas(x, k, canonical=canonical)
            want = count_perread_sparse(x, k, canonical)
        for a, bb in zip(got, want):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(bb), err_msg=json.dumps(cfg)
            )
        print(f"# {t + 1}/{args.trials} ok {json.dumps(cfg)}", flush=True)
    print(json.dumps({
        "platform": platform, "trials": args.trials, "seed": args.seed,
        "wall_s": round(time.perf_counter() - t0, 1), "ok": True,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
