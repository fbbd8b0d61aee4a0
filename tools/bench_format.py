"""Single-core native formatter microbenchmark (MB/s of .cfrk bytes).

Times the three native emitters on representative shapes with the
segment-parallel path FORCED OFF (CFRK_FORMAT_THREADS=1 honoured by the
extension; sizes below the 4 MB parallel threshold also stay serial) so
the number is the per-core emitter speed the segment parallelism then
multiplies.  Run before/after emitter changes; PERF.md records both.

    python tools/bench_format.py
"""

from __future__ import annotations

import json
import os
import sys
import time

# Single-core numbers by construction (the docstring's contract): the
# extension honours this cap in format_row_segments.
os.environ.setdefault("CFRK_FORMAT_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_mb_s(fn, out_bytes_hint, reps=5):
    best = float("inf")
    n = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        n = len(out)
    return n / best / 1e6, n


def main() -> None:
    from cfrk_tpu.io.native import _fastaio as _ext  # built in-tree

    rng = np.random.default_rng(0)
    results = {}

    # sparse pairs, k=8-shaped: 8192 rows x 143 window slots, ~all real.
    n_rows, w = 8192, 143
    idx = np.sort(
        rng.integers(0, 4**8, size=(n_rows, w)), axis=1
    ).astype(np.int32)
    cnt = rng.integers(1, 5, size=(n_rows, w)).astype(np.int32)
    mbs, nbytes = _time_mb_s(
        lambda: _ext.format_pairs(idx.tobytes(), cnt.tobytes(), n_rows, w, True),
        None,
    )
    results["pairs_k8"] = {"mb_s": round(mbs, 1), "out_mb": round(nbytes / 1e6, 1)}

    # 64-bit pairs, k=31-shaped.
    idx64 = np.sort(
        rng.integers(0, 4**31, size=(2048, 122), dtype=np.uint64), axis=1
    )
    cnt2 = np.ones((2048, 122), dtype=np.int32)
    mbs, nbytes = _time_mb_s(
        lambda: _ext.format_pairs64(
            idx64.tobytes(), cnt2.tobytes(), 2048, 122, True
        ),
        None,
    )
    results["pairs64_k31"] = {
        "mb_s": round(mbs, 1), "out_mb": round(nbytes / 1e6, 1)
    }

    # dense rows, k=2-shaped (the reference's own at-scale workload):
    # 16 cells/row, mostly nonzero -> emitter-dominated, not template.
    dn, dc = 65536, 16
    dense = rng.integers(0, 50, size=(dn, dc)).astype(np.int32)
    mbs, nbytes = _time_mb_s(
        lambda: _ext.format_rows(dense.tobytes(), dn, dc, True), None
    )
    results["dense_k2"] = {"mb_s": round(mbs, 1), "out_mb": round(nbytes / 1e6, 1)}

    # dense-pairs walk, k=8-shaped (the dense .cfrk route: sparse pairs
    # densified in the bin walk — template spans + emitted cells).
    mbs, nbytes = _time_mb_s(
        lambda: _ext.format_dense_pairs(
            idx[:512].tobytes(), cnt[:512].tobytes(), 512, w, 4**8, True
        ),
        None,
    )
    results["dense_pairs_k8"] = {
        "mb_s": round(mbs, 1), "out_mb": round(nbytes / 1e6, 1)
    }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
