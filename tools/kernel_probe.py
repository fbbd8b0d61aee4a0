"""Probe one Pallas per-read kernel configuration on the current backend.

Measures cold(ish) compile time of the bare kernel, then the steady-state
step time via a jitted ``lax.scan`` cycling several distinct input
batches (loop-invariant inputs get hoisted/CSE'd — see
docs/PERF.md "Measurement methodology").  Prints one JSON line.

Usage:
    python tools/kernel_probe.py --packed b4 --checksum --rb 16
    python tools/kernel_probe.py --packed fh --steps 32

The timed section ends by fetching ONE scalar that data-depends on every
step (the axon tunnel's block_until_ready returns early; bulk D2H is
~5 MB/s — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--len", dest="read_len", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rb", type=int, default=16)
    ap.add_argument("--wb", type=int, default=512)
    ap.add_argument("--packed", default="none", choices=["none", "fh", "b4"])
    ap.add_argument("--checksum", action="store_true")
    ap.add_argument("--mxu", default="bf16", choices=["bf16", "int8"])
    ap.add_argument(
        "--op",
        default="perread",
        choices=["perread", "spectrum", "rowsort", "rowsort_large"],
    )
    ap.add_argument("--mode", default="gather", choices=["gather", "roll"])
    ap.add_argument("--canonical", action="store_true")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--distinct", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas

    platform = jax.devices()[0].platform
    packed = False if args.packed == "none" else args.packed

    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(0, 4, size=(args.distinct, args.batch, args.read_len)).astype(
            np.int8
        )
    )

    if args.op in ("rowsort", "rowsort_large"):
        from cfrk_tpu.ops.pallas.rowsort import (
            rowsort_rle_pallas,
            rowsort_rle_pallas_large,
        )

        fn = (
            rowsort_rle_pallas if args.op == "rowsort" else rowsort_rle_pallas_large
        )

        def one(x):
            return fn(
                x,
                args.k,
                canonical=args.canonical,
                read_block=args.rb,
                mode=args.mode,
                checksum=True,
            )

        step_val = jax.jit(lambda x: jnp.sum(one(x)[-1]))
    elif args.op == "spectrum":
        from cfrk_tpu.ops.pallas.spectrum import spectrum_pallas

        def one(x):
            return spectrum_pallas(x, args.k, mxu_dtype=args.mxu)

        step_val = jax.jit(lambda x: jnp.sum(one(x) & 3, dtype=jnp.int32))
    else:

        def one(x):
            return count_perread_pallas(
                x,
                args.k,
                read_block=args.rb,
                window_block=args.wb,
                packed=packed,
                checksum=args.checksum,
                mxu_dtype=args.mxu,
            )

        if args.checksum:
            step_val = jax.jit(lambda x: jnp.sum(one(x)[1]))
        else:
            step_val = jax.jit(
                lambda x: jnp.sum(one(x) & 3, dtype=jnp.int32)
            )

    t0 = time.perf_counter()
    _ = int(np.asarray(step_val(xs[0])))
    compile_s = time.perf_counter() - t0

    def run(xs):
        def body(chk, i):
            return chk + step_val(xs[i % args.distinct]), ()

        chk, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(args.steps))
        return chk

    fn = jax.jit(run)
    t0 = time.perf_counter()
    _ = int(np.asarray(fn(xs)))
    scan_compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    chk = int(np.asarray(fn(xs)))
    dt = time.perf_counter() - t0

    bases = args.steps * args.batch * args.read_len
    print(
        json.dumps(
            {
                "platform": platform,
                "k": args.k,
                "read_len": args.read_len,
                "batch": args.batch,
                "rb": args.rb,
                "packed": args.packed,
                "checksum": args.checksum,
                "mxu": args.mxu,
                "op": args.op,
                "compile_s": round(compile_s, 1),
                "scan_compile_s": round(scan_compile_s, 1),
                "steps": args.steps,
                "total_s": round(dt, 4),
                "step_ms": round(dt / args.steps * 1e3, 3),
                "mbases_per_s": round(bases / dt / 1e6, 1),
                "chk": chk,
            }
        )
    )


if __name__ == "__main__":
    main()
