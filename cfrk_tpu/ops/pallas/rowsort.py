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
    # Same hoisting discipline as _bitonic_sort: the gather index and
    # low-lane masks depend only on the distance — build each once
    # (Mosaic does not reliably CSE per-stage iota arithmetic; measured
    # +15% step time without hoisting on the standard network).
    gather_idx = {d: lane ^ d for d in (1 << s for s in range(log_s))}
    is_lower = {d: (lane & d) == 0 for d in gather_idx}
    for p in range(1, log_s + 1):
        blk = 1 << p
        ascending = (lane & blk) == 0 if blk < span else true_mask
        for s in range(p - 1, -1, -1):
            d = 1 << s
            if mode == "gather":
                partners = tuple(
                    jnp.take_along_axis(v, gather_idx[d], axis=1)
                    for v in vals
                )
            else:
                low = is_lower[d]
                partners = tuple(
                    jnp.where(low, _roll_lane(v, -d), _roll_lane(v, d))
                    for v in vals
                )
            vals = _compare_swap(vals, partners, is_lower[d], ascending)
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


def _lex_less(xs: tuple, ys: tuple):
    """ys < xs lexicographically (major key first)."""
    less = ys[0] < xs[0]
    eq = ys[0] == xs[0]
    for yv, xv in zip(ys[1:], xs[1:]):
        less = less | (eq & (yv < xv))
        eq = eq & (yv == xv)
    return less


def _bitonic_sort_g2split(vals: tuple, bspan: int, mode: str):
    """Sort 256-element reads in the g=2 GROUPED block layout, skipping
    the all-sentinel work of the pad half.

    Layout (``_pad_split(grouped=True)``): rows [0:rb] hold every
    read's FIRST 128 lanes (all real for W > 128); rows [rb:2rb] the
    second 128 lanes, of which only the first ``bspan`` (pow2 <= 64)
    can be real — the rest are sentinels by construction.

    Network: (a) phases 1..log2(bspan) row-local on the FULL array (the
    B half finishes its span sort here — its last phase runs
    all-ascending while A keeps the standard (lane & blk) direction);
    (b) phases log2(bspan)+1..7 on the A half only — 128-lane work
    instead of 256; (c) reverse B with one gather, turning each read's
    [A asc | B asc-then-sentinels] into the bitonic [A asc | B desc];
    (d) the d=128 merge stage, which in this layout is a PERMUTE-FREE
    elementwise lexicographic min/max of the two halves; (e) the final
    7 row-local merge stages, all ascending.  ~25% less stage work
    than the standard 36-stage network at k=8/150 bp (W=143, bspan=16).
    """
    shape = vals[0].shape
    rb = shape[0] // 2
    lane = _lane_iota(shape)
    b_rows = _subrow_iota(shape) >= rb
    log_s = bspan.bit_length() - 1

    # Index/mask constants built ONCE and reused across stages (Mosaic
    # does not reliably CSE per-stage iota arithmetic — same discipline
    # as _bitonic_sort, measured +15% step time without it).
    gather_idx = {d: lane ^ d for d in (1 << s for s in range(7))}
    is_lower = {d: (lane & d) == 0 for d in gather_idx}
    a_shape = (rb, shape[1])
    lane_a = _lane_iota(a_shape)
    gather_idx_a = {d: lane_a ^ d for d in gather_idx}
    is_lower_a = {d: (lane_a & d) == 0 for d in gather_idx}
    true_full = (lane & 0) == 0
    true_a = (lane_a & 0) == 0

    # (a) shared row-local phases: A standard, B finishing its span.
    for p in range(1, log_s + 1):
        blk = 1 << p
        std = (lane & blk) == 0
        ascending = (b_rows | std) if blk == bspan else std
        for s in range(p - 1, -1, -1):
            d = 1 << s
            partners = tuple(
                jnp.take_along_axis(v, gather_idx[d], axis=1) for v in vals
            )
            vals = _compare_swap(vals, partners, is_lower[d], ascending)

    # (b) A-only phases at half width.
    a = tuple(v[:rb] for v in vals)
    for p in range(log_s + 1, 8):
        blk = 1 << p
        ascending = (lane_a & blk) == 0 if blk < LANES else true_a
        for s in range(p - 1, -1, -1):
            d = 1 << s
            partners = tuple(
                jnp.take_along_axis(v, gather_idx_a[d], axis=1) for v in a
            )
            a = _compare_swap(a, partners, is_lower_a[d], ascending)

    # (c) reverse B: one gather per key.
    rev = LANES - 1 - lane_a
    bvals = tuple(
        jnp.take_along_axis(v[rb:], rev, axis=1) for v in vals
    )

    # (d) the d=128 merge stage: elementwise lex min into A, max into B.
    swap = _lex_less(a, bvals)  # bvals < a
    a2 = tuple(jnp.where(swap, bv, av) for av, bv in zip(a, bvals))
    b2 = tuple(jnp.where(swap, av, bv) for av, bv in zip(a, bvals))
    vals = tuple(
        jnp.concatenate([av, bv], axis=0) for av, bv in zip(a2, b2)
    )

    # (e) final merge phases, all ascending.
    for s in range(6, -1, -1):
        d = 1 << s
        partners = tuple(
            jnp.take_along_axis(v, gather_idx[d], axis=1) for v in vals
        )
        vals = _compare_swap(vals, partners, is_lower[d], true_full)
    return vals


def _prev_element_g2(x):
    """x at read position i-1 in the grouped g=2 layout."""
    rb = x.shape[0] // 2
    pl1 = _roll_lane(x, 1)
    lane = _lane_iota(x.shape)
    return jnp.where(lane == 0, _roll_sub(pl1, rb), pl1)


def _shift_left_fill_g2(x, d: int, fill):
    """x at read position i+d in the grouped g=2 layout."""
    rb = x.shape[0] // 2
    lane = _lane_iota(x.shape)
    b_rows = _subrow_iota(x.shape) >= rb
    if d < LANES:
        sl = _roll_lane(x, -d)
        nxt = _roll_sub(sl, -rb)
        return jnp.where(
            lane < LANES - d, sl, jnp.where(b_rows, fill, nxt)
        )
    return jnp.where(b_rows, fill, _roll_sub(x, -rb))


def _rle_sorted_g2(keys: tuple, real):
    """RLE for the grouped g=2 layout (see _bitonic_sort_g2split)."""
    shape = keys[0].shape
    rb = shape[0] // 2
    n = 2 * LANES
    lane = _lane_iota(shape)
    b_rows = _subrow_iota(shape) >= rb
    pos = lane + jnp.where(b_rows, LANES, 0)
    neq = keys[0] != _prev_element_g2(keys[0])
    for kk in keys[1:]:
        neq = neq | (kk != _prev_element_g2(kk))
    first = ((pos == 0) | neq) & real
    boundary = jnp.where(first | ~real, pos, n)
    nxt = _shift_left_fill_g2(boundary, 1, n)
    d = 1
    while d < n:
        nxt = jnp.minimum(nxt, _shift_left_fill_g2(nxt, d, n))
        d *= 2
    counts = jnp.where(first, nxt - pos, 0)
    return first, counts


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


def _sort_and_rle(
    keys: tuple, g: int, span: int, mode: str, real_of, bspan: int = 0
):
    """Dispatch: span (short-read), grouped g=2 half-skip, or standard
    sub-row network."""
    if span < LANES:
        keys = _bitonic_sort_span(keys, span, mode)
        first, counts = _rle_sorted_span(keys, span, real_of(keys))
    elif bspan:
        keys = _bitonic_sort_g2split(keys, bspan, mode)
        first, counts = _rle_sorted_g2(keys, real_of(keys))
    else:
        keys = _bitonic_sort(keys, g, mode)
        first, counts = _rle_sorted(keys, g, real_of(keys))
    return keys, first, counts


def _rowsort_kernel(
    idx_ref, idx_out_ref, cnt_out_ref, *rest,
    sentinel: int, g: int, span: int, mode: str, checksum: bool,
    bspan: int = 0,
):
    if checksum:
        (chk_ref,) = rest
    (x,), first, counts = _sort_and_rle(
        (idx_ref[...],), g, span, mode, lambda ks: ks[0] != sentinel,
        bspan,
    )
    idx_out_ref[...] = jnp.where(first, x, sentinel)
    cnt_out_ref[...] = counts
    if checksum:
        # One-row SMEM layout (1, nblocks): SMEM windows pad every row to
        # 512 B, so (nblocks, 1) overflows 1 MB SMEM at 2048 blocks.
        i = pl.program_id(0)
        chk_ref[0, i] = jnp.sum(counts & 3) + jnp.sum(
            jnp.where(first, x, 0) & 3
        )


def _rowsort_kernel_large(
    hi_ref, lo_ref, hi_out_ref, lo_out_ref, cnt_out_ref, *rest,
    sentinel: int, g: int, span: int, mode: str, checksum: bool,
    bspan: int = 0,
):
    if checksum:
        (chk_ref,) = rest
    (hi, lo), first, counts = _sort_and_rle(
        (hi_ref[...], lo_ref[...]), g, span, mode,
        lambda ks: ks[1] != sentinel, bspan,
    )
    hi_out_ref[...] = jnp.where(first, hi, sentinel)
    lo_out_ref[...] = jnp.where(first, lo, sentinel)
    cnt_out_ref[...] = counts
    if checksum:
        # One-row SMEM layout — see _rowsort_kernel.
        i = pl.program_id(0)
        chk_ref[0, i] = jnp.sum(counts & 3) + jnp.sum(
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
    if g > 128:
        # Huge contigs (32 kb - 256 kb, round 4): the 8-read floor would
        # put 2048+ rows in a block and blow the 16 MB scoped-VMEM
        # limit; cap blocks at ~1024 rows where g allows (rows stay a
        # multiple of 8 because g >= 256); at g > 1024 a single read IS
        # the block (g rows — 1 MB/stream at g=2048, measured to
        # compile in ~88 s and run 3.0 Gb/s at 256 kb).
        rb = max(1, 1024 // g)
    return n, g, LANES, rb


def _pad_split(arr, w: int, n: int, span: int, rb: int, fill: int,
               grouped: bool = False):
    """[B, w] → padded row layout [rows, 128] (see _plan_layout).

    ``grouped`` (g=2 half-skip network only): instead of interleaving a
    read's two sub-rows, each rb-read block lays out all rb FIRST
    halves, then all rb second halves — so the kernel can run the
    A-only network phases on a contiguous sublane slice.
    """
    b = arr.shape[0]
    if n > w:
        arr = jnp.pad(arr, ((0, 0), (0, n - w)), constant_values=fill)
    pad_b = (-b) % rb
    if pad_b:
        arr = jnp.pad(arr, ((0, pad_b), (0, 0)), constant_values=fill)
    bb = arr.shape[0]
    if span < LANES:  # pack 128/span reads per row
        return arr.reshape(bb // (LANES // span), LANES), bb
    if grouped:
        blocks = bb // rb
        return (
            arr.reshape(blocks, rb, 2, LANES)
            .transpose(0, 2, 1, 3)
            .reshape(blocks * 2 * rb, LANES)
        ), bb
    return arr.reshape(bb * (n // LANES), LANES), bb


def _ungroup(out, bb: int, rb: int):
    """Invert _pad_split(grouped=True) on a kernel output: → [bb, 256]."""
    blocks = bb // rb
    return (
        out.reshape(blocks, 2, rb, LANES)
        .transpose(0, 2, 1, 3)
        .reshape(bb, 2 * LANES)
    )


def _g2split_bspan(w: int, n: int, g: int, span: int, mode: str) -> int:
    """Span of the pad half for the g=2 half-skip network, or 0.

    Eligible when the padded axis is exactly two sub-rows and the
    second holds <= 64 real lanes (so its span sort shares the first
    log2(bspan) phases) — the k<=15 150 bp and k=15 152 bp headline
    shapes.  Gather mode only (the B reversal is a gather).
    """
    if span == LANES and g == 2 and LANES < w <= LANES + 64 \
            and mode == "gather":
        return max(_next_pow2(w - LANES), 1)
    return 0


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
    bspan = _g2split_bspan(w, n, g, span, mode)
    idx, bb = _pad_split(idx, w, n, span, rb, sent, grouped=bool(bspan))
    rows_blk = rb * g if span == LANES else rb // (LANES // span)
    rows_all = bb * g if span == LANES else bb // (LANES // span)

    kernel = functools.partial(
        _rowsort_kernel, sentinel=sent, g=g, span=span, mode=mode,
        checksum=checksum, bspan=bspan,
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
            pl.BlockSpec((1, bb // rb), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, bb // rb), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(bb // rb,),
        in_specs=[blk],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(idx)
    if bspan:
        idx_out = _ungroup(outs[0], bb, rb)[:b, :w]
        cnt_out = _ungroup(outs[1], bb, rb)[:b, :w]
    else:
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
    bspan = _g2split_bspan(w, n, g, span, mode)
    hi, bb = _pad_split(hi, w, n, span, rb, sent_i, grouped=bool(bspan))
    lo, _ = _pad_split(lo, w, n, span, rb, sent_i, grouped=bool(bspan))
    rows_blk = rb * g if span == LANES else rb // (LANES // span)
    rows_all = bb * g if span == LANES else bb // (LANES // span)

    kernel = functools.partial(
        _rowsort_kernel_large, sentinel=sent_i, g=g, span=span, mode=mode,
        checksum=checksum, bspan=bspan,
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
            pl.BlockSpec((1, bb // rb), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, bb // rb), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(bb // rb,),
        in_specs=[blk, blk],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(hi, lo)
    if bspan:
        unsplit = [_ungroup(o, bb, rb) for o in outs[:3]]
    else:
        unsplit = [o.reshape(bb, n) for o in outs[:3]]
    hi_out = (unsplit[0][:b, :w].astype(jnp.uint32)) ^ flip
    lo_out = (unsplit[1][:b, :w].astype(jnp.uint32)) ^ flip
    cnt_out = unsplit[2][:b, :w]
    if checksum:
        return hi_out, lo_out, cnt_out, outs[3].reshape(-1)
    return hi_out, lo_out, cnt_out
