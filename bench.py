"""Headline benchmark: per-read k-mer counting throughput on 1 chip.

Covers BOTH k-values of the BASELINE metric ("bases/sec/chip at k=8 and
k=31") in one run:

* k=8, 150 bp (BASELINE config 2): dense per-read histograms.  The
  measured op is the fused Pallas row-sort+RLE kernel
  (cfrk_tpu/ops/pallas/rowsort.py) — the route every driver's dense-row
  `.cfrk` output actually takes (device ships sorted (idx, count) pairs;
  the native formatter densifies inside its bin walk).  It replaces the
  reference's ComputeIndex + ComputeFreqNew pipeline (reference
  src/kmer_kernel.cu:21-49,73-90).
* k=31 canonical, 152 bp (BASELINE config 4's per-batch core): the same
  kernel's 2-key variant ((hi, lo) split keys, lexicographic network).
  The reference could not run ANY k of this size (dense-table OOM exit,
  reference src/kmer_main.cu:51-56).

Prints ONE JSON line:
    {"metric": ..., "value": k8_bases_per_s, "unit": "bases/s",
     "vs_baseline": k8_fraction, "k8": {...}, "k31": {...}}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
a fraction of an explicit speed-of-light model.  Two rooflines are
reported per k (docs/PERF.md "Rooflines"):

* ``vs_dense_sol`` (k=8 only; this is ``vs_baseline``): the measured
  throughput against the WRITE-BOUND dense-emit roofline of the op it
  replaces — max(int8 MXU time of the one-hot contractions, one HBM
  write of the b4-packed count matrix) = 0.66 ms/batch = 1.87 Gb/s.
  Round 2 proved ~2 ms/batch is the materialisation floor of ANY
  compare-built one-hot kernel on this chip (docs/PERF.md "Rejected
  kernel designs"), so the dense kernel itself can never exceed ~0.33
  of this number; the sort route delivers the same product without
  one-hots and is scored against the same bar.
* ``vs_sort_sol``: the kernel against its own fused sort+RLE roofline:
  sum-over-phases stages = log2(n)(log2(n)+1)/2 compare-exchange passes
  over the padded window axis n, charged per element per key as one
  cross-lane partner fetch (~1.5e12/s permute path) plus two ALU ops
  (~6e12/s VPU) — doubled for the 2-key lexicographic variant — PLUS
  the RLE neighbour-compare and log2(n) suffix-min passes and the
  pair-emit HBM traffic (re-derived round 4; constants and derivation
  in cfrk_tpu/ops/roofline.py::sort_sol).

Measurement honesty (the round-1 lesson still applies):

* the kernel folds chk[block] = sum(counts & 3) + sum(run-start keys
  & 3) IN-KERNEL while the pairs sit in VMEM; the benchmark consumes
  only chk.  Both outputs come from one un-splittable Mosaic custom
  call, so the pair writes happen without charging a D2H read-back.
* the timed ``lax.scan`` cycles DISTINCT input batches via a
  data-dependent index (loop-invariant inputs get the kernel hoisted:
  ~3x inflation, verified in round 1).
* the timed section ends by fetching one scalar that data-depends on
  every step (block_until_ready returns early under the axon tunnel).
* ``assert frac <= 1.0`` per roofline — a number above its own speed
  of light is a measurement bug by definition and fails loudly.
"""

from __future__ import annotations

import json
import math
import time

import numpy as np

K8, LEN8 = 8, 150
K31, LEN31 = 31, 152
# 32768 reads/batch = auto_batch_size(150) — the measured dispatch-
# amortization optimum at this read length (docs/PERF.md "Row-sort
# kernel"); matches the CLI's auto default so the bench measures what
# production dispatches.
BATCH = 32768
# 512 steps: each jitted run carries ~27 ms of fixed dispatch/sync
# overhead (measured by step-count extrapolation, docs/PERF.md
# "Measurement methodology") — at 64 steps that is +0.43 ms/step of
# artifact; at 512 it is +0.05 ms.  The timed region is still ~0.2 s.
N_BATCHES = 512
DISTINCT = 4  # distinct input batches cycled through the loop

# Roofline models shared with tools/bench_suite.py — one source of
# truth in cfrk_tpu/ops/roofline.py (chip constants documented there).
from cfrk_tpu.ops.roofline import (  # noqa: E402
    HBM_BW,
    dense_emit_sol as dense_write_sol_bases_per_s,
    sort_sol as sort_sol_bases_per_s,
)


def setup_compile_cache() -> None:
    """Point JAX's persistent compile cache at the repo-local dir (shared
    by bench.py and tools/warm_compile.py so their cache keys match)."""
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build_rowsort_programs(batch: int, n_batches: int, k: int, read_len: int):
    """The exact traced programs the measurement times: the bare
    per-batch kernel step and the n-batch scan wrapper, plus the
    DISTINCT cycled inputs.  tools/warm_compile.py imports this so the
    compile-cache warmer can never desynchronize from the bench."""
    import jax
    import jax.numpy as jnp

    from cfrk_tpu.ops.pallas.rowsort import (
        rowsort_rle_pallas,
        rowsort_rle_pallas_large,
    )

    rng = np.random.default_rng(k)  # distinct data per k
    xs = jnp.asarray(
        rng.integers(0, 4, size=(DISTINCT, batch, read_len)).astype(np.int8)
    )

    @jax.jit
    def step_chk(x):
        if k <= 15:
            out = rowsort_rle_pallas(x, k, checksum=True)
        else:
            out = rowsort_rle_pallas_large(x, k, canonical=True, checksum=True)
        return jnp.sum(out[-1])

    def run(xs):
        def body(c, i):
            return c + step_chk(xs[i % DISTINCT]), ()

        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_batches))
        return c

    return xs, step_chk, jax.jit(run)


def _measure(fn, xs) -> float:
    """Best-of-3 timed runs (the timed region includes one tunnel round
    trip whose latency variance is tens of ms — min() keeps the honest
    device number)."""
    dt = math.inf
    chks = []
    for _rep in range(3):
        t0 = time.perf_counter()
        chks.append(int(np.asarray(fn(xs))))
        dt = min(dt, time.perf_counter() - t0)
    # The fetched scalar data-depends on every step; identical inputs
    # must give identical checksums or the measurement ran nothing real.
    assert len(set(chks)) == 1, f"non-deterministic checksums: {chks}"
    return dt


def _case(batch: int, n_batches: int, k: int, read_len: int) -> dict:
    xs, step_chk, fn = build_rowsort_programs(batch, n_batches, k, read_len)
    # Stage 1: compile the bare kernel; the scan wrapper then compiles
    # in seconds (the rowsort kernel itself compiles in ~5 s — no MXU).
    _ = int(np.asarray(step_chk(xs[0])))
    _ = int(np.asarray(fn(xs)))  # compile scan + warm up
    dt = _measure(fn, xs)
    bases = n_batches * batch * read_len
    bps = bases / dt
    sort_sol = sort_sol_bases_per_s(
        batch, read_len, k, keys=(1 if k <= 15 else 2)
    )
    rec = {
        "k": k,
        "read_len": read_len,
        "step_ms": round(dt / n_batches * 1e3, 3),
        "bases_per_s": round(bps, 1),
        "vs_sort_sol": round(bps / sort_sol, 4),
    }
    assert rec["vs_sort_sol"] <= 1.0, (
        f"k={k}: measured {bps:.3e} bases/s exceeds its own sort "
        f"roofline {sort_sol:.3e} — measurement bug, refusing to report"
    )
    if k <= 8:
        # vs_dense_sol may legitimately EXCEED 1.0: the pairs route
        # ships (key, count) runs, never the dense matrix, so the
        # dense-emit write bound does not bind it (measured 2.03 Gb/s
        # vs the 1.87 Gb/s dense bound on 2026-08-19).  It is reported
        # as the comparison to the op being replaced; the binding
        # roofline (and vs_baseline's anchor when this one is beaten)
        # is vs_sort_sol.
        dense_sol = dense_write_sol_bases_per_s(batch, read_len, k)
        rec["vs_dense_sol"] = round(bps / dense_sol, 4)
    return rec


def main(impl_override: str | None = None) -> None:
    import jax

    setup_compile_cache()

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    impl = impl_override or ("rowsort" if on_tpu else "matmul")

    if impl == "rowsort":
        batch, n_batches = BATCH, N_BATCHES
        k8 = _case(batch, n_batches, K8, LEN8)
        k31 = _case(batch, n_batches, K31, LEN31)
        # vs_baseline anchors to the dense-emit write roofline of the op
        # replaced, capped at 1.0: the pairs route measures ABOVE that
        # bar (5.2 vs 1.87 Gb/s steady-state — it never writes the dense
        # matrix, so the bound that capped every dense-emit design does
        # not bind it).  beats_dense_write_sol records the cap firing;
        # the kernel's own binding roofline is k8.vs_sort_sol.
        beats_dense = k8["vs_dense_sol"] > 1.0
        vs_baseline = min(1.0, k8["vs_dense_sol"])
        out = {
            "metric": (
                f"perread count throughput, 1 chip ({platform}, pallas "
                "rowsort pairs): k=8 dense-row route; k31 = canonical "
                "sparse"
            ),
            "value": k8["bases_per_s"],
            "unit": "bases/s",
            "vs_baseline": vs_baseline,
            "beats_dense_write_sol": beats_dense,
            "k8": k8,
            "k31": k31,
        }
        print(json.dumps(out))
        return

    # ---- XLA fallback (off-TPU or guarded-child failure): the einsum
    # dense route, two separate executables so the count matrix crosses
    # HBM (the fusion that inflated round 1's number is impossible).
    import jax.numpy as jnp

    from cfrk_tpu.ops.perread import count_perread

    batch = BATCH if on_tpu else 256
    n_batches = N_BATCHES if on_tpu else 4
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(0, 4, size=(DISTINCT, batch, LEN8)).astype(np.int8)
    )
    produce = jax.jit(lambda x: count_perread(x, K8, impl="matmul"))
    consume = jax.jit(lambda c: jnp.sum(c & 3, dtype=jnp.int32))
    _ = int(np.asarray(consume(produce(xs[0]))))  # compile both
    dt = math.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        chk = None
        for i in range(n_batches):
            part = consume(produce(xs[i % DISTINCT]))  # async enqueue
            chk = part if chk is None else chk + part
        checksum = int(np.asarray(chk))  # one end-of-run sync
        dt = min(dt, time.perf_counter() - t0)
    assert checksum > 0
    bases = n_batches * batch * LEN8
    bps = bases / dt
    # matmul roofline: bf16 contraction + int32 write AND read-back
    # (separate executables).
    w = LEN8 - K8 + 1
    four_k = 4**K8
    flops = 2.0 * batch * w * four_k
    io_bytes = batch * four_k * 4.0 * 2.0
    specs_flops = 197e12 if on_tpu else 1e12
    specs_bw = HBM_BW if on_tpu else 50e9
    sol = batch * LEN8 / max(flops / specs_flops, io_bytes / specs_bw)
    frac = bps / sol
    assert frac <= 1.0, (
        f"measured {bps:.3e} bases/s exceeds the {sol:.3e} speed-of-light"
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"perread dense k={K8} count throughput, 1 chip "
                    f"({platform}, matmul fallback)"
                ),
                "value": round(bps, 1),
                "unit": "bases/s",
                "vs_baseline": round(frac, 4),
            }
        )
    )


def _guarded() -> None:
    """Attempt the Pallas measurement in a CHILD process under a
    deadline, falling back to the XLA matmul path inline.

    The rowsort kernels compile in seconds, but the remote Mosaic
    tunnel has bad-weather tails; the driver runs this script under a
    hard timeout, so a hung compile must not eat the whole budget and
    leave no output.  Exactly ONE JSON line is printed either way."""
    import os
    import subprocess
    import sys

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "560"))
    t0 = time.perf_counter()
    reason = "produced no JSON line"
    child_err = ""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True,
            text=True,
            timeout=max(deadline - 120.0, 60.0),  # reserve fallback time
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        if out.returncode != 0:
            reason = f"exited with code {out.returncode}"
        child_err = out.stderr
    except subprocess.TimeoutExpired as e:
        reason = "exceeded its time slot"
        child_err = (e.stderr or b"").decode(errors="replace") if isinstance(
            e.stderr, bytes
        ) else (e.stderr or "")
    print(
        f"# rowsort attempt {reason} after {time.perf_counter() - t0:.0f}s; "
        f"falling back to matmul",
        file=sys.stderr,
    )
    if child_err:
        tail = child_err.strip().splitlines()[-10:]
        print("# child stderr tail:", file=sys.stderr)
        for ln in tail:
            print(f"#   {ln}", file=sys.stderr)
    main(impl_override="matmul")


if __name__ == "__main__":
    import sys

    if "--inner" in sys.argv:
        main()
    elif "--no-guard" in sys.argv:
        main()
    else:
        _guarded()
