"""Pallas TPU kernel: fused per-read bitonic row sort + run-length encode.

The round-3 answer to the one-hot materialisation floor: the dense
per-read kernel (ops/pallas/perread.py) must BUILD ~1.3 G one-hot int8
elements per batch on the VPU before the MXU can contract them — a
measured ~2 ms/batch design floor for any compare-built one-hot kernel
on this chip (docs/PERF.md "Rejected kernel designs").  This kernel
never materialises a one-hot: each read's window keys are sorted in
VMEM by a bitonic network, run-length encoded in the same kernel
invocation, and emitted as sparse (key, count) pairs — the exact row
contract of ops/perread_sparse.count_perread_sparse, which is what
every driver's `.cfrk` output path (dense rows included — they densify
host-side in the bin walk) already consumes.

Replaces the reference's ComputeIndex + ComputeFreqNew pipeline
(reference ``src/kmer_kernel.cu:21-49,73-90``) for the sparse/pair
routes; the XLA ``lax.sort`` row-sort route (ops/perread_sparse.py)
stays as the fallback off-TPU and the parity oracle.

Layout: the padded window axis n (power of two, >= 128) is SPLIT into
g = n/128 sub-rows of 128 lanes, so every vector is [g*rb, 128] — one
vreg wide.  Bitonic stages with distance d < 128 are row-local (partner
fetched with ONE ``tpu.dynamic_gather`` per stage in "gather" mode —
Mosaic's gather supports only a single vreg along the gathered axis —
or two lane-rolls + select in "roll" mode); stages with d >= 128
exchange whole sub-rows via sublane rolls.  Sentinel keys (invalid
windows, padding) are the maximum key value so they sort to the row
tail and RLE gives them count 0 — no masking inside the sort.

Measured on one v5e (8192 x 150 bp, k=8): 1.19 ms/step = 1031 Mbases/s
in roll mode on first compile — vs 2.04 ms for the dense one-hot kernel
and 2.65 ms for the XLA row-sort route (docs/PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..encode import window_indices

__all__ = [
    "rowsort_rle_pallas",
    "rowsort_rle_pallas_large",
]

LANES = 128


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _roll_lane(x, shift: int):
    return pltpu.roll(x, shift % LANES, 1)


def _roll_sub(x, shift: int):
    rows = x.shape[0]
    return pltpu.roll(x, shift % rows, 0)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _subrow_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _exchange(vals, partners, keep_self):
    return tuple(
        jnp.where(keep_self, v, pv) for v, pv in zip(vals, partners)
    )


def _compare_swap(vals, partners, is_lower, ascending):
    """One compare-exchange: vals/partners are key tuples (lexicographic,
    major first).  Returns the new key tuple."""
    take_min = is_lower == ascending
    part_smaller = partners[0] < vals[0]
    eq = partners[0] == vals[0]
    for pv, v in zip(partners[1:], vals[1:]):
        part_smaller = part_smaller | (eq & (pv < v))
        eq = eq & (pv == v)
    keep_self = take_min != part_smaller
    return _exchange(vals, partners, keep_self)


def _bitonic_sort_span(vals: tuple, span: int, mode: str):
    """Sort SPAN-element groups within each 128-lane row independently.

    The short-read layout: 128/span reads share one row (span = padded
    windows/read, a power of two <= 64).  All partner fetches stay
    inside their span group — ``lane ^ d`` with d < span never crosses
    a span boundary, and neither do the roll-mode selects (adding or
    subtracting a clear/set bit below the span bit).
    """
    shape = vals[0].shape
    lane = _lane_iota(shape)
    log_s = span.bit_length() - 1
    true_mask = (lane & 0) == 0
    for p in range(1, log_s + 1):
        blk = 1 << p
        ascending = (lane & blk) == 0 if blk < span else true_mask
        for s in range(p - 1, -1, -1):
            d = 1 << s
            if mode == "gather":
                idx = lane ^ d
                partners = tuple(
                    jnp.take_along_axis(v, idx, axis=1) for v in vals
                )
            else:
                low = (lane & d) == 0
                partners = tuple(
                    jnp.where(low, _roll_lane(v, -d), _roll_lane(v, d))
                    for v in vals
                )
            vals = _compare_swap(vals, partners, (lane & d) == 0, ascending)
    return vals


def _rle_sorted_span(keys: tuple, span: int, real):
    """RLE for the short-read span layout (see _bitonic_sort_span)."""
    shape = keys[0].shape
    lane = _lane_iota(shape)
    pos = lane & (span - 1)

    def shift_left(x, d, fill):
        return jnp.where(pos < span - d, _roll_lane(x, -d), fill)

    prev = _roll_lane(keys[0], 1)  # pos == 0 is masked by `first` below
    neq = keys[0] != prev
    for kk in keys[1:]:
        neq = neq | (kk != _roll_lane(kk, 1))
    first = ((pos == 0) | neq) & real
    boundary = jnp.where(first | ~real, pos, span)
    nxt = shift_left(boundary, 1, span)
    d = 1
    while d < span:
        nxt = jnp.minimum(nxt, shift_left(nxt, d, span))
        d *= 2
    counts = jnp.where(first, nxt - pos, 0)
    return first, counts


def _bitonic_sort(vals: tuple, g: int, mode: str):
    """Sort each read's g*128 elements ascending, keys lexicographic.

    The direction masks depend only on the stage distance (is_lower: 8
    distinct) and merge-block size (ascending: 7 distinct), and the
    gather index only on the distance — each is built ONCE here and
    reused across the 36 stages, in case Mosaic does not CSE the
    per-stage iota arithmetic.
    """
    n = g * LANES
    log_n = n.bit_length() - 1
    shape = vals[0].shape
    lane = _lane_iota(shape)
    sub = _subrow_iota(shape) % g if g > 1 else None
    gather_idx = {}  # d (< LANES) -> partner lane index
    is_lower_by_s = {}
    take_up_by_m = {}
    ascending_by_p = {}
    for p in range(1, log_n + 1):
        blk = 1 << p
        if blk < LANES or g == 1:
            ascending_by_p[p] = (
                (lane & blk) == 0 if blk < LANES else (lane & 0) == 0
            )
        elif blk // LANES < g:
            ascending_by_p[p] = (sub & (blk // LANES)) == 0
        else:  # final phase: whole read ascending
            ascending_by_p[p] = (lane & 0) == 0
        for s in range(p - 1, -1, -1):
            d = 1 << s
            if d < LANES:
                if mode == "gather" and d not in gather_idx:
                    gather_idx[d] = lane ^ d
                is_lower_by_s[s] = is_lower_by_s.get(s, (lane & d) == 0)
            else:
                m = d // LANES
                take_up_by_m[m] = take_up_by_m.get(m, (sub & m) == 0)
                is_lower_by_s[s] = take_up_by_m[m]

    for p in range(1, log_n + 1):
        for s in range(p - 1, -1, -1):
            d = 1 << s
            if d < LANES:
                if mode == "gather":
                    idx = gather_idx[d]
                    partners = tuple(
                        jnp.take_along_axis(v, idx, axis=1) for v in vals
                    )
                else:
                    low = is_lower_by_s[s]
                    partners = tuple(
                        jnp.where(low, _roll_lane(v, -d), _roll_lane(v, d))
                        for v in vals
                    )
            else:
                m = d // LANES
                take_up = take_up_by_m[m]
                partners = tuple(
                    jnp.where(take_up, _roll_sub(v, -m), _roll_sub(v, m))
                    for v in vals
                )
            vals = _compare_swap(
                vals, partners, is_lower_by_s[s], ascending_by_p[p]
            )
    return vals


def _prev_element(x, g: int):
    """x at read-order position i-1 (don't-care at i == 0)."""
    pl1 = _roll_lane(x, 1)
    if g == 1:
        return pl1
    lane = _lane_iota(x.shape)
    return jnp.where(lane == 0, _roll_sub(pl1, 1), pl1)


def _shift_left_fill(x, d: int, g: int, fill):
    """x at read-order position i+d, filling past the read end."""
    lane = _lane_iota(x.shape)
    if d < LANES:
        sl = _roll_lane(x, -d)
        if g == 1:
            return jnp.where(lane < LANES - d, sl, fill)
        sub = _subrow_iota(x.shape) % g
        nxt = _roll_sub(sl, -1)
        return jnp.where(
            lane < LANES - d, sl, jnp.where(sub == g - 1, fill, nxt)
        )
    m = d // LANES
    sub = _subrow_iota(x.shape) % g
    return jnp.where(sub < g - m, _roll_sub(x, -m), fill)


def _rle_sorted(keys: tuple, g: int, real):
    """RLE sorted per-read element streams: returns (first, counts).

    keys: tuple of [g*rb, 128] arrays (lexicographic); real: mask of
    non-sentinel elements.  counts[i] = run length at run starts, 0
    elsewhere.  The next-boundary suffix-min runs in log2(n) masked
    shifts, all VMEM-resident.
    """
    shape = keys[0].shape
    n = g * LANES
    lane = _lane_iota(shape)
    pos = lane if g == 1 else (_subrow_iota(shape) % g) * LANES + lane
    neq = keys[0] != _prev_element(keys[0], g)
    for kk in keys[1:]:
        neq = neq | (kk != _prev_element(kk, g))
    first = ((pos == 0) | neq) & real
    boundary = jnp.where(first | ~real, pos, n)
    nxt = _shift_left_fill(boundary, 1, g, n)
    d = 1
    while d < n:
        nxt = jnp.minimum(nxt, _shift_left_fill(nxt, d, g, n))
        d *= 2
    counts = jnp.where(first, nxt - pos, 0)
    return first, counts


def _sort_and_rle(keys: tuple, g: int, span: int, mode: str, real_of):
    """Dispatch to the sub-row (long-read) or span (short-read) network."""
    if span < LANES:
        keys = _bitonic_sort_span(keys, span, mode)
        first, counts = _rle_sorted_span(keys, span, real_of(keys))
    else:
        keys = _bitonic_sort(keys, g, mode)
        first, counts = _rle_sorted(keys, g, real_of(keys))
    return keys, first, counts


def _rowsort_kernel(
    idx_ref, idx_out_ref, cnt_out_ref, *rest,
    sentinel: int, g: int, span: int, mode: str, checksum: bool,
):
    if checksum:
        (chk_ref,) = rest
    (x,), first, counts = _sort_and_rle(
        (idx_ref[...],), g, span, mode, lambda ks: ks[0] != sentinel
    )
    idx_out_ref[...] = jnp.where(first, x, sentinel)
    cnt_out_ref[...] = counts
    if checksum:
        i = pl.program_id(0)
        chk_ref[i, 0] = jnp.sum(counts & 3) + jnp.sum(
            jnp.where(first, x, 0) & 3
        )


def _rowsort_kernel_large(
    hi_ref, lo_ref, hi_out_ref, lo_out_ref, cnt_out_ref, *rest,
    sentinel: int, g: int, span: int, mode: str, checksum: bool,
):
    if checksum:
        (chk_ref,) = rest
    (hi, lo), first, counts = _sort_and_rle(
        (hi_ref[...], lo_ref[...]), g, span, mode,
        lambda ks: ks[1] != sentinel,
    )
    hi_out_ref[...] = jnp.where(first, hi, sentinel)
    lo_out_ref[...] = jnp.where(first, lo, sentinel)
    cnt_out_ref[...] = counts
    if checksum:
        i = pl.program_id(0)
        chk_ref[i, 0] = jnp.sum(counts & 3) + jnp.sum(
            jnp.where(first, lo, 0) & 3
        )


def _plan_layout(w: int, b: int, read_block: int):
    """Pick the row layout for W windows/read.

    Returns (n, g, span, rb):
    * long/standard reads (padded W >= 128): n = g*128, span = 128,
      each read spans g sub-rows; rb reads per block, capped so blocks
      hold ~1024 VMEM rows.
    * short reads (padded W <= 64): span = padded W (32 or 64), n =
      span, g = 1, and 128/span reads PACK into each row — the whole
      pipeline (sort, RLE, I/O) shrinks by the packing factor.
    """
    n = max(_next_pow2(w), 32)
    if n < LANES:
        span = n  # 32 or 64
        rpr = LANES // span
        unit = 8 * rpr  # rows align to the 8-sublane tile
        rb = min(1024 * rpr, -(-b // unit) * unit)
        return n, 1, span, rb
    g = n // LANES
    rb = min(read_block, b, max(8, 1024 // g))
    rb = max(8, (rb // 8) * 8)
    return n, g, LANES, rb


def _pad_split(arr, w: int, n: int, span: int, rb: int, fill: int):
    """[B, w] → padded row layout [rows, 128] (see _plan_layout)."""
    b = arr.shape[0]
    if n > w:
        arr = jnp.pad(arr, ((0, 0), (0, n - w)), constant_values=fill)
    pad_b = (-b) % rb
    if pad_b:
        arr = jnp.pad(arr, ((0, pad_b), (0, 0)), constant_values=fill)
    bb = arr.shape[0]
    if span < LANES:  # pack 128/span reads per row
        return arr.reshape(bb // (LANES // span), LANES), bb
    return arr.reshape(bb * (n // LANES), LANES), bb


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "read_block", "interpret", "mode",
                     "checksum"),
)
def rowsort_rle_pallas(
    codes: jax.Array,
    k: int,
    *,
    canonical: bool = False,
    read_block: int = 512,
    interpret: bool | None = None,
    mode: str = "gather",
    checksum: bool = False,
):
    """Per-read sparse histograms, fused sort+RLE kernel (k <= 15).

    codes [B, L] int8 → (idx, counts) [B, W] int32 with W = L-k+1: the
    exact row contract of ops/perread_sparse.count_perread_sparse —
    rows sorted ascending, position j holds a distinct k-mer index and
    its count iff it is the first element of its run, sentinel ``4**k``
    with count 0 otherwise.

    ``checksum=True`` additionally returns chk[nblocks] int32 folded
    in-kernel (bench honesty: consuming chk keeps the pair writes alive
    without a D2H read-back — same discipline as the dense kernel).
    ``mode``: "gather" fetches row-local bitonic partners with one
    ``tpu.dynamic_gather`` per stage; "roll" uses two lane-rolls +
    select (fallback if gather lowering regresses).
    """
    if codes.ndim != 2:
        raise ValueError(f"codes must be [B, L], got {codes.shape}")
    if not 1 <= k <= 15:
        raise ValueError("rowsort_rle_pallas supports k <= 15")
    b, length = codes.shape
    w = length - k + 1
    if w <= 0:
        raise ValueError(f"read length {length} < k={k}")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    sent = 4**k
    idx = window_indices(codes, k, canonical)  # [B, W], -1 invalid
    idx = jnp.where(idx < 0, sent, idx)
    n, g, span, rb = _plan_layout(w, b, read_block)
    idx, bb = _pad_split(idx, w, n, span, rb, sent)
    rows_blk = rb * g if span == LANES else rb // (LANES // span)
    rows_all = bb * g if span == LANES else bb // (LANES // span)

    kernel = functools.partial(
        _rowsort_kernel, sentinel=sent, g=g, span=span, mode=mode,
        checksum=checksum,
    )
    blk = pl.BlockSpec(
        (rows_blk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [blk, blk]
    out_shape = [
        jax.ShapeDtypeStruct((rows_all, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows_all, LANES), jnp.int32),
    ]
    if checksum:
        out_specs.append(
            pl.BlockSpec((bb // rb, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((bb // rb, 1), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(bb // rb,),
        in_specs=[blk],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(idx)
    idx_out = outs[0].reshape(bb, n)[:b, :w]
    cnt_out = outs[1].reshape(bb, n)[:b, :w]
    if checksum:
        return idx_out, cnt_out, outs[2].reshape(-1)
    return idx_out, cnt_out


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "read_block", "interpret", "mode",
                     "checksum"),
)
def rowsort_rle_pallas_large(
    codes: jax.Array,
    k: int,
    *,
    canonical: bool = False,
    read_block: int = 512,
    interpret: bool | None = None,
    mode: str = "gather",
    checksum: bool = False,
):
    """Per-read sparse histograms for 16 <= k <= 31, fused 2-key kernel.

    codes [B, L] int8 → (hi, lo, counts), each [B, W] — the contract of
    ops/perread_sparse.count_perread_sparse_large (uint32 (hi, lo) split
    keys sorted lexicographically, sentinel 0xFFFFFFFF, RLE counts).

    Keys are order-mapped to int32 inside (u ^ 0x80000000) so the
    compare-exchange network runs on signed vectors — the natural
    Mosaic path — and mapped back at emit.
    """
    from ..sparse import INVALID_SENTINEL, kmer_keys

    if codes.ndim != 2:
        raise ValueError(f"codes must be [B, L], got {codes.shape}")
    if not 16 <= k <= 31:
        raise ValueError("rowsort_rle_pallas_large supports 16 <= k <= 31")
    b, length = codes.shape
    w = length - k + 1
    if w <= 0:
        raise ValueError(f"read length {length} < k={k}")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    hi, lo = kmer_keys(codes, k, canonical)  # [B, W] uint32

    # Order-preserving uint32 → int32 map: flip the sign bit.  NOTE a
    # 16-T hi prefix at k=31 DOES collide with the hi sentinel value —
    # which is why validity is always judged on lo (valid lo < 4**15 <
    # sentinel, never ambiguous), and why the RLE real-mask below must
    # stay on lo.
    flip = jnp.uint32(0x80000000)
    hi = (hi ^ flip).astype(jnp.int32)
    lo = (lo ^ flip).astype(jnp.int32)
    sent_i = 0x7FFFFFFF  # sentinel 0xFFFFFFFF after the sign flip

    n, g, span, rb = _plan_layout(w, b, read_block)
    hi, bb = _pad_split(hi, w, n, span, rb, sent_i)
    lo, _ = _pad_split(lo, w, n, span, rb, sent_i)
    rows_blk = rb * g if span == LANES else rb // (LANES // span)
    rows_all = bb * g if span == LANES else bb // (LANES // span)

    kernel = functools.partial(
        _rowsort_kernel_large, sentinel=sent_i, g=g, span=span, mode=mode,
        checksum=checksum,
    )
    blk = pl.BlockSpec(
        (rows_blk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [blk, blk, blk]
    out_shape = [
        jax.ShapeDtypeStruct((rows_all, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows_all, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows_all, LANES), jnp.int32),
    ]
    if checksum:
        out_specs.append(
            pl.BlockSpec((bb // rb, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((bb // rb, 1), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(bb // rb,),
        in_specs=[blk, blk],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(hi, lo)
    hi_out = (outs[0].reshape(bb, n)[:b, :w].astype(jnp.uint32)) ^ flip
    lo_out = (outs[1].reshape(bb, n)[:b, :w].astype(jnp.uint32)) ^ flip
    cnt_out = outs[2].reshape(bb, n)[:b, :w]
    if checksum:
        return hi_out, lo_out, cnt_out, outs[3].reshape(-1)
    return hi_out, lo_out, cnt_out
