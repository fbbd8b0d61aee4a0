"""Headline benchmark: dense per-read k-mer counting throughput on 1 chip.

Workload (BASELINE.json config 2): synthetic reads of 150 bp, k=8, dense
4**8-bin per-read histograms via the batched-dot Pallas kernel
(cfrk_tpu/ops/pallas/perread.py) — the TPU replacement of the reference's
ComputeIndex + ComputeFreqNew CUDA pipeline
(reference src/kmer_kernel.cu:21-49,73-90).

Prints ONE JSON line:
    {"metric": ..., "value": bases/sec/chip, "unit": "bases/s",
     "vs_baseline": fraction_of_speed_of_light}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
the achieved fraction of the chip's speed-of-light for this op, under a
PER-IMPLEMENTATION roofline:

* pallas (packed): SOL = max(MXU time of the one-hot contractions,
  HBM time of ONE write of the packed count matrix).  No read-back is
  charged — materialisation is proven differently (below).
* matmul fallback: the einsum path materialises int32 counts and the
  measurement loop reads them back in a SEPARATE executable, so SOL
  charges one write + one read of the int32 matrix.

Round-1 lesson (VERDICT): a checksum fused into the same jitted program
does NOT force materialisation — XLA fuses the einsum into the reduction
and the recorded number exceeded speed-of-light (vs_baseline 1.45).
This bench forces honesty structurally:

* pallas path: the kernel emits a second output chk[block] =
  sum(counts & 3) folded IN-KERNEL (ops/pallas/perread.py,
  checksum=True).  Consuming chk keeps the custom call alive; the
  counts HBM write is part of the same un-splittable Mosaic kernel.
* matmul path: step 1 (jit A) returns the count matrix; step 2 (jit B)
  reduces it.  XLA cannot fuse across executables, so the counts hit
  HBM between them.
* ``assert frac <= 1.0`` — a number above its own speed of light is a
  measurement bug by definition and fails the bench loudly.

Measurement notes (tunneled-TPU constraints, .claude/skills/verify):
* the bare kernel is compiled FIRST (remote Mosaic compile, minutes);
  the ``lax.scan`` wrapper then compiles in seconds.
* the timed scan cycles DISTINCT input batches via a data-dependent
  index (a loop-invariant input gets the kernel hoisted: ~3x inflation,
  verified in round 1).
* the timed section ends by fetching one scalar that data-depends on
  every step (block_until_ready returns early under the axon tunnel).
"""

from __future__ import annotations

import json
import math
import time

import numpy as np

K = 8
READ_LEN = 150
BATCH = 8192
N_BATCHES = 64
DISTINCT = 4  # distinct input batches cycled through the loop


def _chip_specs(platform: str, *, int8: bool = False) -> dict:
    if platform in ("tpu", "axon"):
        # TPU v5e: ~197 Tflop/s bf16, ~394 Top/s int8, ~819 GB/s HBM.
        return {"flops": 394e12 if int8 else 197e12, "hbm_bw": 819e9}
    # CPU fallback numbers (only used off-TPU; keeps vs_baseline finite).
    return {"flops": 1e12, "hbm_bw": 50e9}


def speed_of_light_bases_per_s(
    platform: str,
    batch: int,
    read_len: int,
    k: int,
    *,
    count_bytes: float,
    read_back: bool,
    int8_mxu: bool = False,
) -> float:
    """Per-impl roofline: max(MXU contraction time, count-matrix HBM
    traffic).  ``count_bytes``/bin, whether a read-back is charged, and
    the MXU peak (the pallas kernel's default is int8 MACs at 2x the
    bf16 peak — charging the bf16 peak would UNDERSTATE its speed of
    light) depend on the implementation measured (module docstring)."""
    specs = _chip_specs(platform, int8=int8_mxu)
    w = read_len - k + 1
    four_k = 4**k
    flops = 2.0 * batch * w * four_k  # one-hot outer-product matmuls
    io_bytes = batch * four_k * count_bytes * (2.0 if read_back else 1.0)
    t = max(flops / specs["flops"], io_bytes / specs["hbm_bw"])
    return batch * read_len / t


def setup_compile_cache() -> None:
    """Point JAX's persistent compile cache at the repo-local dir (shared
    by bench.py and tools/warm_compile.py so their cache keys match)."""
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build_pallas_programs(batch: int, n_batches: int):
    """The exact traced programs the pallas measurement times: the bare
    per-batch kernel step and the n-batch scan wrapper, plus the DISTINCT
    cycled inputs.  tools/warm_compile.py imports this so the compile-cache
    warmer can never desynchronize from what the bench compiles."""
    import jax
    import jax.numpy as jnp

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas, resolve_packed

    pk = resolve_packed(True, READ_LEN - K + 1)  # b4 for 150 bp
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(0, 4, size=(DISTINCT, batch, READ_LEN)).astype(np.int8)
    )

    @jax.jit
    def step_chk(x):
        _counts, chk = count_perread_pallas(
            x, K, packed=pk, read_block=16, checksum=True
        )
        return jnp.sum(chk)

    def run(xs):
        def body(c, i):
            return c + step_chk(xs[i % DISTINCT]), ()

        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_batches))
        return c

    return xs, step_chk, jax.jit(run), pk


def main(impl_override: str | None = None) -> None:
    import jax

    setup_compile_cache()

    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    batch = BATCH if on_tpu else 256
    n_batches = N_BATCHES if on_tpu else 4
    impl = impl_override or ("pallas" if on_tpu else "matmul")

    if impl == "pallas":
        xs, step_chk, fn, pk = build_pallas_programs(batch, n_batches)

        # Stage 1: compile the bare kernel (primes the Mosaic cache);
        # the scan wrapper below then compiles in seconds.
        _ = int(np.asarray(step_chk(xs[0])))
        _ = int(np.asarray(fn(xs)))  # compile scan + warm up

        # Best-of-3: the timed region includes one tunnel round trip
        # (the scalar fetch that forces execution), whose latency
        # variance is tens of ms against a ~0.1 s scan — a single rep
        # can read 25% low.  min() keeps the honest device number.
        dt = math.inf
        for _rep in range(3):
            t0 = time.perf_counter()
            checksum = int(np.asarray(fn(xs)))
            dt = min(dt, time.perf_counter() - t0)
        count_bytes, read_back = (1.0 if pk == "b4" else 2.0), False
        int8_mxu = True  # count_perread_pallas default mxu_dtype="int8"
    else:
        from cfrk_tpu.ops.perread import count_perread

        rng = np.random.default_rng(0)
        xs = jnp.asarray(
            rng.integers(0, 4, size=(DISTINCT, batch, READ_LEN)).astype(np.int8)
        )

        # Two separate executables: produce (A) and consume (B).  The
        # count matrix must cross HBM between them — the fusion that
        # inflated round 1's number is structurally impossible.
        produce = jax.jit(lambda x: count_perread(x, K, impl=impl))
        consume = jax.jit(lambda c: jnp.sum(c & 3, dtype=jnp.int32))
        _ = int(np.asarray(consume(produce(xs[0]))))  # compile both

        dt = math.inf
        for _rep in range(3):  # best-of-3, same rationale as above
            t0 = time.perf_counter()
            chk = None
            for i in range(n_batches):
                part = consume(produce(xs[i % DISTINCT]))  # async enqueue
                chk = part if chk is None else chk + part
            checksum = int(np.asarray(chk))  # one end-of-run sync
            dt = min(dt, time.perf_counter() - t0)
        count_bytes, read_back = 4.0, True
        int8_mxu = False  # the einsum path contracts in bf16/f32

    bases = n_batches * batch * READ_LEN
    bases_per_s = bases / dt
    sol = speed_of_light_bases_per_s(
        platform, batch, READ_LEN, K,
        count_bytes=count_bytes, read_back=read_back, int8_mxu=int8_mxu,
    )
    frac = bases_per_s / sol
    assert checksum > 0
    assert frac <= 1.0, (
        f"measured {bases_per_s:.3e} bases/s exceeds the {sol:.3e} "
        "speed-of-light — the measurement is broken (elided work or "
        "wrong roofline), refusing to report it"
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"perread dense k={K} count throughput, "
                    f"1 chip ({platform}, {impl})"
                ),
                "value": round(bases_per_s, 1),
                "unit": "bases/s",
                "vs_baseline": round(frac, 4),
            }
        )
    )


def _guarded() -> None:
    """Attempt the Pallas measurement in a CHILD process under a
    deadline, falling back to the XLA matmul path inline.

    The remote Mosaic compile varies from ~2 s (warm cache) to ~10 min
    (cold, loaded server); the driver runs this script under a hard
    timeout, so a hung/slow compile must not eat the whole budget and
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
        f"# pallas attempt {reason} after {time.perf_counter() - t0:.0f}s; "
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
