"""Headline benchmark: dense per-read k-mer counting throughput on 1 chip.

Workload (BASELINE.json config 2): synthetic reads of 150 bp, k=8, dense
4**8-bin per-read histograms via the fused Pallas kernel
(cfrk_tpu/ops/pallas/perread.py) — the TPU replacement of the reference's
ComputeIndex + ComputeFreqNew CUDA pipeline
(reference src/kmer_kernel.cu:21-49,73-90).

Prints ONE JSON line:
    {"metric": ..., "value": bases/sec/chip, "unit": "bases/s",
     "vs_baseline": fraction_of_speed_of_light}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
the achieved fraction of the chip's speed-of-light for this op.  Dense
k=8 per-read counting emits 4**8 bins per 150 bp read, so the roofline
is HBM bandwidth, not MXU flops.  The kernel packs hi-bin pairs into
one int32 ("fh" packing: 2 bytes per bin), and the model charges one
write of the packed matrix plus one read (the checksum that forces
materialisation).

Measurement notes (tunneled-TPU constraints):
* the bare jitted kernel is compiled FIRST (~4 min through the remote
  Mosaic tunnel); only then is the 64-step ``lax.scan`` wrapper jitted —
  with the kernel already in the in-process Mosaic cache the scan
  compiles in seconds, whereas jitting the scan cold blows the bench
  timeout.  The timed run is the scan: back-to-back device steps with no
  host dispatch in the loop.
* every step feeds a non-algebraically-foldable checksum (sum of
  counts & 3), so no step can be elided; the timed section ends with a
  single scalar fetch, which is an honest end-to-end sync
  (``block_until_ready`` returns early under the axon tunnel and bulk
  D2H is ~5 MB/s).
"""

from __future__ import annotations

import json
import time

import numpy as np

K = 8
READ_LEN = 150
BATCH = 8192
N_BATCHES = 64
DISTINCT = 4  # distinct input batches cycled through the loop


def _chip_specs(platform: str) -> dict:
    """Rough per-chip peak specs for the roofline, by platform."""
    if platform in ("tpu", "axon"):
        # TPU v5e: ~197 Tflop/s bf16, ~819 GB/s HBM.
        return {"flops": 197e12, "hbm_bw": 819e9}
    # CPU fallback numbers (only used off-TPU; keeps vs_baseline finite).
    return {"flops": 1e12, "hbm_bw": 50e9}


def speed_of_light_bases_per_s(
    platform: str, batch: int, read_len: int, k: int, count_bytes: float = 2.0
) -> float:
    specs = _chip_specs(platform)
    w = read_len - k + 1
    four_k = 4**k
    flops = 2.0 * batch * w * four_k          # one-hot outer-product matmuls
    # count write + checksum read; 2 B/bin for the fh-packed kernel,
    # 4 B/bin for the int32 fallback paths.
    io_bytes = 2.0 * batch * four_k * count_bytes
    t = max(flops / specs["flops"], io_bytes / specs["hbm_bw"])
    return batch * read_len / t


def main(impl_override: str | None = None) -> None:
    import os

    import jax

    # Persistent compilation cache (helps on setups where it applies; the
    # remote-compile tunnel bypasses it, hence the loop structure below).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from cfrk_tpu.ops.perread import count_perread

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    batch = BATCH if on_tpu else 256
    n_batches = N_BATCHES if on_tpu else 4
    impl = impl_override or ("pallas" if on_tpu else "auto")

    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(0, 4, size=(DISTINCT, batch, READ_LEN)).astype(np.int8)
    )

    if impl == "pallas":
        from cfrk_tpu.ops.pallas.perread import count_perread_pallas

        # fh-packed: half the HBM write, rank-3 blocks (compiles FASTER
        # than unpacked; the rank-4 reads-packing does not).  rb=16
        # halves the grid steps: +5% over rb=8, compiles in ~136 s.
        count = jax.jit(
            lambda x: count_perread_pallas(x, K, packed="fh", read_block=16)
        )
    else:
        count = jax.jit(lambda x: count_perread(x, K, impl=impl))
    # Stage 1: compile the bare kernel (primes the in-process Mosaic cache).
    _ = int(jnp.sum(count(xs[0]) & 3, dtype=jnp.int32))

    # Stage 2: the scan wrapper now compiles fast and runs with zero host
    # dispatch between steps.
    def run(xs):
        def body(chk, i):
            counts = count(xs[i % DISTINCT])
            return chk + jnp.sum(counts & 3, dtype=jnp.int32), ()

        chk, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_batches))
        return chk

    fn = jax.jit(run)
    _ = int(fn(xs))  # compile scan + warm up

    t0 = time.perf_counter()
    checksum = int(fn(xs))
    dt = time.perf_counter() - t0

    bases = n_batches * batch * READ_LEN
    bases_per_s = bases / dt
    sol = speed_of_light_bases_per_s(
        platform, batch, READ_LEN, K,
        count_bytes=2.0 if impl == "pallas" else 4.0,
    )
    assert checksum > 0
    print(
        json.dumps(
            {
                "metric": (
                    f"perread dense k={K} count throughput, "
                    f"1 chip ({platform}, {impl})"
                ),
                "value": round(bases_per_s, 1),
                "unit": "bases/s",
                "vs_baseline": round(bases_per_s / sol, 4),
            }
        )
    )


def _guarded() -> None:
    """Attempt the Pallas measurement in a CHILD process under a
    deadline, falling back to the XLA matmul path inline.

    The remote Mosaic compile of the fused kernel varies from ~2 s
    (warm cache) to ~8 min (cold, loaded server); the driver runs this
    script under a hard timeout, so a hung/slow compile must not eat
    the whole budget and leave no output.  Exactly ONE JSON line is
    printed either way."""
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
    # Fallback: pure-XLA path, fast reliable compile (~1 min).
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
