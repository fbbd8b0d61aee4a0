"""Step-time decomposition probes for the fused row-sort kernel.

Variants isolate the cost centers (sort network, RLE, partner mode,
mask construction) by swapping pieces for free stand-ins — checksums
differ between variants by design; only times are comparable.

    python tools/rowsort_probe.py --variant full --mode roll
    python tools/rowsort_probe.py --variant sortonly
    python tools/rowsort_probe.py --variant rleonly
    python tools/rowsort_probe.py --variant noop
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--rb", type=int, default=256)
    ap.add_argument("--mode", default="roll", choices=["gather", "roll"])
    ap.add_argument(
        "--variant", default="full",
        choices=["full", "sortonly", "rleonly", "noop", "preponly",
                 "kernelnoop", "kernelsort"],
    )
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument(
        "--keys", type=int, default=1, choices=[1, 2],
        help="2: the (hi, lo) 2-key network (k in 16..31, canonical "
             "keys) — decomposes the sparse_k31 case's cost centers",
    )
    ap.add_argument(
        "--rle", default="kernel", choices=["kernel", "gather"],
        help="gather: candidate clamped-gather RLE (g=1 only) — "
             "suffix-min by index-clamped doubling, no fill masks",
    )
    ap.add_argument(
        "--major-bits", type=int, default=0,
        help="keys=2 only: replace hi with its top N bits (0 = full "
             "key).  The round-5 radix-partition probe: a STABLE b-bit "
             "partition on this VPU has no scatter/inverse-permute "
             "primitive, so it IS a 2-key sort of (bucket_bits, lane) — "
             "this measures that partition pass at its cheapest "
             "(1-bit major) against the full (hi, lo) network",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cfrk_tpu.ops.pallas import rowsort as rs

    k, L, B = args.k, args.read_len, args.batch
    w = L - k + 1
    sent = 4**k
    n, g, span, rb_plan = rs._plan_layout(w, B, args.rb)
    rb = rb_plan if span < rs.LANES else min(args.rb, rb_plan)
    rows_blk = rb * g if span == rs.LANES else rb // (rs.LANES // span)

    def kernel(idx_ref, chk_ref, *, variant, mode):
        x = idx_ref[...]
        if span < rs.LANES:
            # Short-read span-packed layout (128/span reads per row).
            if variant in ("full", "sortonly"):
                (x,) = rs._bitonic_sort_span((x,), span, mode)
            if variant in ("full", "rleonly"):
                first, counts = rs._rle_sorted_span((x,), span, x != sent)
                val = jnp.sum(counts & 3) + jnp.sum(
                    jnp.where(first, x, 0) & 3
                )
            else:
                val = jnp.sum(x & 3)
            chk_ref[0, pl.program_id(0)] = val
            return
        if variant in ("full", "sortonly"):
            (x,) = rs._bitonic_sort((x,), g, mode)
        if variant in ("full", "rleonly"):
            first, counts = rs._rle_sorted((x,), g, x != sent)
            val = jnp.sum(counts & 3) + jnp.sum(jnp.where(first, x, 0) & 3)
        else:
            val = jnp.sum(x & 3)
        chk_ref[0, pl.program_id(0)] = val

    def _rle_gather_g1(keys, real):
        """Candidate RLE for g == 1 rows: every shifted fetch is an
        index-CLAMPED gather; min over overlapping suffix ranges is
        exact (idempotent), so no per-pass fill masks or iota compares
        — the cost centers of the roll+where RLE."""
        lane = rs._lane_iota(keys[0].shape)
        prev_idx = jnp.maximum(lane - 1, 0)
        neq = None
        for kk in keys:
            nk = kk != jnp.take_along_axis(kk, prev_idx, axis=1)
            neq = nk if neq is None else (neq | nk)
        first = ((lane == 0) | neq) & real
        boundary = jnp.where(first | ~real, lane, rs.LANES)
        nxt = jnp.take_along_axis(
            boundary, jnp.minimum(lane + 1, rs.LANES - 1), axis=1
        )
        d = 1
        while d < rs.LANES:
            nxt = jnp.minimum(
                nxt,
                jnp.take_along_axis(
                    nxt, jnp.minimum(lane + d, rs.LANES - 1), axis=1
                ),
            )
            d *= 2
        # lane 127's suffix is empty: force the fill the clamp skipped.
        nxt = jnp.where(lane == rs.LANES - 1, rs.LANES, nxt)
        counts = jnp.where(first, nxt - lane, 0)
        return first, counts

    def kernel2(hi_ref, lo_ref, chk_ref, *, variant, mode):
        sent_i = 0x7FFFFFFF
        keys = (hi_ref[...], lo_ref[...])
        if variant in ("full", "sortonly"):
            keys = rs._bitonic_sort(keys, g, mode)
        if variant in ("full", "rleonly"):
            rle = _rle_gather_g1 if args.rle == "gather" else (
                lambda ks, real: rs._rle_sorted(ks, g, real)
            )
            first, counts = rle(keys, keys[1] != sent_i)
            val = jnp.sum(counts & 3) + jnp.sum(
                jnp.where(first, keys[1], 0) & 3
            )
        else:
            val = jnp.sum(keys[0] & 3) + jnp.sum(keys[1] & 3)
        chk_ref[0, pl.program_id(0)] = val

    from cfrk_tpu.ops.encode import window_indices
    from cfrk_tpu.ops.sparse import kmer_keys

    def prep(codes):
        if args.keys == 2:
            sent_i = 0x7FFFFFFF
            hi, lo = kmer_keys(codes, k, True)
            flip = jnp.uint32(0x80000000)
            hi = (hi ^ flip).astype(jnp.int32)
            lo = (lo ^ flip).astype(jnp.int32)
            if args.major_bits:
                # Radix-partition probe: the major key becomes its top
                # N bits — the comparator work of a stable partition.
                hi = jax.lax.shift_right_logical(
                    hi, jnp.int32(32 - args.major_bits)
                )
            hi, bb = rs._pad_split(hi, w, n, rs.LANES, rb, sent_i)
            lo, _ = rs._pad_split(lo, w, n, rs.LANES, rb, sent_i)
            return (hi, lo), bb
        idx = window_indices(codes, k, False)
        idx = jnp.where(idx < 0, sent, idx)
        idx, bb = rs._pad_split(idx, w, n, span, rb, sent)
        return (idx,), bb

    def call_kernel(streams, bb, variant):
        blk = pl.BlockSpec((rows_blk, rs.LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        body = kernel if len(streams) == 1 else kernel2
        out = pl.pallas_call(
            functools.partial(body, variant=variant, mode=args.mode),
            grid=(bb // rb,),
            in_specs=[blk] * len(streams),
            out_specs=pl.BlockSpec((1, bb // rb), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, bb // rb), jnp.int32),
        )(*streams)
        return jnp.sum(out)

    rng = np.random.default_rng(0)
    if args.variant in ("kernelnoop", "kernelsort"):
        # pre-prepped split inputs: isolates the kernel from the prep
        raw = rng.integers(0, 4, size=(4, B, L)).astype(np.int8)
        pre = []
        prep_j = jax.jit(prep)
        for i in range(4):
            streams, bb = prep_j(jnp.asarray(raw[i]))
            pre.append(np.stack([np.asarray(s) for s in streams]))
        xs = jnp.asarray(np.stack(pre))  # [4, n_streams, rows, 128]
        inner = "noop" if args.variant == "kernelnoop" else "sortonly"

        @jax.jit
        def step(stacked):
            streams = tuple(stacked[j] for j in range(stacked.shape[0]))
            rows = streams[0].shape[0]
            bb = (
                rows // g if span == rs.LANES
                else rows * (rs.LANES // span)
            )
            return call_kernel(streams, bb, inner)
    elif args.variant == "preponly":
        xs = jnp.asarray(rng.integers(0, 4, size=(4, B, L)).astype(np.int8))

        @jax.jit
        def step(codes):
            streams, bb = prep(codes)
            return sum(jnp.sum(s[:, :1] & 3) for s in streams)
    else:
        xs = jnp.asarray(rng.integers(0, 4, size=(4, B, L)).astype(np.int8))

        @jax.jit
        def step(codes):
            streams, bb = prep(codes)
            return call_kernel(streams, bb, args.variant)
    _ = int(np.asarray(step(xs[0])))

    def run(xs):
        def body(c, i):
            return c + step(xs[i % 4]), ()

        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(args.steps))
        return c

    fn = jax.jit(run)
    _ = int(np.asarray(fn(xs)))
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        chk = int(np.asarray(fn(xs)))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "variant": args.variant, "mode": args.mode, "k": k, "n": n,
        "step_ms": round(best / args.steps * 1e3, 3),
        "mbases_per_s": round(B * L * args.steps / best / 1e6, 1),
        "chk": chk,
    }))


if __name__ == "__main__":
    main()
