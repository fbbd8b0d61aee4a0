"""Pallas TPU kernel: dense per-read k-mer histograms.

The TPU-native replacement of the reference's ComputeIndex +
ComputeFreqNew CUDA kernels (reference ``src/kmer_kernel.cu:21-49`` and
``:73-90``).  Compared to the XLA einsum path (ops/perread.py), the win
is memory traffic: the one-hot operands and the float32 accumulator live
only in VMEM and the int32 count matrix is written to HBM exactly once —
the XLA path materialises the one-hots and the f32 einsum output in HBM
(~6x the traffic at k=8).

Structure: a [n_read_blocks, n_window_tiles] grid over a transposed
window-index matrix (see ops/pallas/common.py for why transposed).  Each
step takes one [wt, rb] tile, builds per-read one-hot matrices
[wt, 4**kh] / [wt, 4**kl] by lane-broadcast compare, and accumulates
``one_hot(hi)^T @ one_hot(lo)`` on the MXU into a per-read-block VMEM
accumulator; the tile axis is innermost so the accumulator carries across
window tiles and each read block's counts are emitted once.  Window
tiling means per-read length is unbounded — the reference silently
dropped positions beyond blockDim.x = 1024 (``src/kmer_kernel.cu:83-85``).

Invalid windows (N bases, padding, past end-of-read) arrive as the
sentinel index 4**k whose hi component is out of one-hot range, so they
contribute zero with no masking in the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import prep_indices, split_k

__all__ = [
    "count_perread_pallas",
    "count_perread_pallas_fused",
    "unpack_counts",
]


def _perread_kernel(
    idx_ref, out_ref, acc_ref, *, kl: int, fh: int, fl: int, rb: int, packed
):
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wt = idx_ref.shape[1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (wt, fh), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (wt, fl), 1)
    for r in range(rb):  # static unroll over the reads of this block
        col = idx_ref[0, :, r : r + 1]  # [wt, 1] — lane-broadcasts below
        oh_hi = ((col >> (2 * kl)) == iota_h).astype(jnp.bfloat16)
        oh_lo = ((col & (fl - 1)) == iota_l).astype(jnp.bfloat16)
        acc_ref[r, :, :] += jax.lax.dot_general(
            oh_hi,
            oh_lo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == nt - 1)
    def _emit():
        if packed == "reads":
            # Two reads per int32: read j in bits 31..16, read j+rb/2 in
            # bits 15..0 (values < 2**15, so the sign bit stays clear).
            a = acc_ref[...].astype(jnp.int32)
            half = rb // 2
            out_ref[0] = (a[:half] << 16) | a[half:]
        elif packed == "fh":
            # Two hi-bins per int32: bin h in bits 31..16 packs with bin
            # h + fh/2 in bits 15..0 — rank-3 output block (the rank-4
            # reads-packing compiles pathologically slowly on Mosaic).
            a = acc_ref[...].astype(jnp.int32)
            hhalf = fh // 2
            out_ref[...] = (a[:, :hhalf, :] << 16) | a[:, hhalf:, :]
        else:
            out_ref[...] = acc_ref[...].astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "canonical", "read_block", "window_block", "interpret", "packed"
    ),
)
def count_perread_pallas(
    codes: jax.Array,
    k: int,
    *,
    canonical: bool = False,
    read_block: int = 8,
    window_block: int = 512,
    interpret: bool | None = None,
    packed=False,
) -> jax.Array:
    """Dense per-read histograms: codes [B, L] int8 → [B, 4**k] int32.

    ``packed`` (requires windows/read < 2**15) halves the dominant HBM
    write and any D2H that keeps the packed layout:

    * ``"reads"`` (or True): read pair (j, j+rb/2) of each block packs
      as (hi16 << 16) | lo16 — rank-4 output [n_blocks, rb/2, fh, fl]
      (Mosaic compiles this rank-4 block pathologically slowly, ~14 min
      cold).
    * ``"fh"``: hi-bin pair (h, h+fh/2) packs per read — rank-3 output
      [B_padded, fh/2, fl], the same block rank as unpacked.

    Unpack with :func:`unpack_counts` (mode must match).  A plain int16
    VMEM output block was worse than either (>9 min compile).
    """
    if packed is True:
        packed = "reads"
    if codes.ndim != 2:
        raise ValueError(f"codes must be [B, L], got {codes.shape}")
    b, length = codes.shape
    w = length - k + 1
    if w <= 0:
        raise ValueError(f"read length {length} < k={k}")
    if k > 8:
        raise ValueError("per-read dense counting supports k <= 8")
    if w >= 2**24:
        # The f32 VMEM accumulator stays exact only below 2**24 per bin;
        # callers route such contigs to the int32 scatter impl
        # (ops/perread.py) — refuse rather than silently undercount.
        raise ValueError(
            f"{w} windows/read exceeds the f32 exactness bound (2**24); "
            "use impl='scatter'"
        )
    if packed and w >= 2**15:
        raise ValueError("packed counts unsafe for >= 2**15 windows/read")
    if packed == "reads" and read_block % 2:
        raise ValueError("packed mode needs an even read_block")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    kh, kl = split_k(k)
    fh, fl = 4**kh, 4**kl
    # Packed mode pairs reads j and j+rb/2 within a block, so rb must
    # stay even — keep the full (even) read_block and let row padding
    # fill small batches instead of shrinking rb to an odd b.
    rb = read_block if packed == "reads" else min(read_block, b)
    wt = min(window_block, max(8, w))

    wt = ((wt + 7) // 8) * 8  # sublane alignment
    pad_b = (-b) % rb
    if pad_b:
        codes = jnp.pad(codes, ((0, pad_b), (0, 0)), constant_values=-1)
    bb = codes.shape[0]
    idx, n_tiles = prep_indices(codes, k, canonical, wt, rb)

    kernel = functools.partial(
        _perread_kernel, kl=kl, fh=fh, fl=fl, rb=rb, packed=packed
    )
    if packed == "reads":
        out_specs = pl.BlockSpec(
            (1, rb // 2, fh, fl), lambda i, t: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((bb // rb, rb // 2, fh, fl), jnp.int32)
    elif packed == "fh":
        out_specs = pl.BlockSpec(
            (rb, fh // 2, fl), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((bb, fh // 2, fl), jnp.int32)
    else:
        out_specs = pl.BlockSpec(
            (rb, fh, fl), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((bb, fh, fl), jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(bb // rb, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, wt, rb), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((rb, fh, fl), jnp.float32)],
        interpret=interpret,
    )(idx)
    if packed:
        return out  # packed layout; see unpack_counts
    return out[:b].reshape(b, fh * fl)


def unpack_counts(packed, n_reads: int, mode: str = "reads"):
    """Unpack a packed kernel output back to [n_reads, 4**k] int32.

    Works on NumPy arrays (host side, after a halved D2H) or jax arrays.
    mode="reads": [n_blocks, rb/2, fh, fl], read j in the high 16 bits
    paired with read j+rb/2 in the low.  mode="fh": [B_pad, fh/2, fl],
    hi-bin h in the high 16 bits paired with bin h+fh/2 in the low.
    """
    import numpy as np

    xp = np if isinstance(packed, np.ndarray) else jnp
    hi = (packed >> 16) & 0x7FFF
    lo = packed & 0xFFFF
    if mode == "reads":
        nb, half, fh, fl = packed.shape
        counts = xp.concatenate([hi, lo], axis=1)  # [nb, rb, fh, fl]
        return counts.reshape(nb * 2 * half, fh * fl)[:n_reads].astype(
            xp.int32
        )
    if mode == "fh":
        bpad, hhalf, fl = packed.shape
        counts = xp.concatenate([hi, lo], axis=1)  # [bpad, fh, fl]
        return counts.reshape(bpad, 2 * hhalf * fl)[:n_reads].astype(xp.int32)
    raise ValueError(f"unknown packed mode {mode!r}")


def _perread_fused_kernel(
    codes_ref, out_ref, acc_ref, *, k: int, kl: int, fh: int, fl: int,
    rb: int, w: int, packed
):
    """Fused variant: window indexing (ComputeIndex) happens IN-KERNEL
    from raw int8 codes, removing the XLA prep pass and the idx matrix's
    HBM round trip (~17% of step time at 150 bp).  One grid step per
    read block; no window tiling (guarded: L must fit VMEM)."""
    c = codes_ref[0].astype(jnp.int32)  # [L, rb]
    views = [c[j : j + w, :] for j in range(k)]  # static shifted slices
    valid = views[0] >= 0
    for v in views[1:]:
        valid = valid & (v >= 0)
    idx = jnp.zeros_like(views[0])
    for v in views:
        idx = (idx << 2) | jnp.maximum(v, 0)
    idx = jnp.where(valid, idx, fh * fl)  # sentinel: out of one-hot range

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (w, fh), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (w, fl), 1)
    for r in range(rb):
        col = idx[:, r : r + 1]  # [w, 1] lane-broadcasts below
        oh_hi = ((col >> (2 * kl)) == iota_h).astype(jnp.bfloat16)
        oh_lo = ((col & (fl - 1)) == iota_l).astype(jnp.bfloat16)
        acc_ref[r, :, :] = jax.lax.dot_general(
            oh_hi,
            oh_lo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    a = acc_ref[...].astype(jnp.int32)
    if packed == "fh":
        hhalf = fh // 2
        out_ref[...] = (a[:, :hhalf, :] << 16) | a[:, hhalf:, :]
    else:
        out_ref[...] = a


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "read_block", "interpret", "packed"),
)
def count_perread_pallas_fused(
    codes: jax.Array,
    k: int,
    *,
    canonical: bool = False,
    read_block: int = 16,
    interpret: bool | None = None,
    packed="fh",
) -> jax.Array:
    """Fused index+histogram kernel (short/medium reads, k <= 8).

    codes [B, L] int8 → packed "fh" [B_pad, fh/2, fl] (default) or dense
    [B_pad, fh, fl] int32 when packed=False; unpack/slice as with
    :func:`count_perread_pallas`.  Guards: L <= 2048 (whole read block
    lives in VMEM; longer reads use the window-tiled kernel), no
    canonical yet (falls back upstream).
    """
    if codes.ndim != 2:
        raise ValueError(f"codes must be [B, L], got {codes.shape}")
    b, length = codes.shape
    w = length - k + 1
    if w <= 0:
        raise ValueError(f"read length {length} < k={k}")
    if k > 8:
        raise ValueError("per-read dense counting supports k <= 8")
    if length > 2048:
        raise ValueError("fused kernel supports L <= 2048; use the tiled kernel")
    if canonical:
        raise ValueError("fused kernel does not implement canonical; use "
                         "count_perread_pallas")
    if packed == "fh" and w >= 2**15:
        raise ValueError("packed counts unsafe for >= 2**15 windows/read")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    kh, kl = split_k(k)
    fh, fl = 4**kh, 4**kl
    rb = read_block
    pad_b = (-b) % rb
    if pad_b:
        codes = jnp.pad(codes, ((0, pad_b), (0, 0)), constant_values=-1)
    bb = codes.shape[0]
    # [nb, L, rb]: reads in lanes, positions in sublanes (same layout
    # rationale as prep_indices, but int8 codes instead of int32 idx).
    ct = codes.reshape(bb // rb, rb, length).transpose(0, 2, 1)

    kernel = functools.partial(
        _perread_fused_kernel, k=k, kl=kl, fh=fh, fl=fl, rb=rb, w=w,
        packed=packed,
    )
    if packed == "fh":
        out_specs = pl.BlockSpec(
            (rb, fh // 2, fl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((bb, fh // 2, fl), jnp.int32)
    else:
        out_specs = pl.BlockSpec(
            (rb, fh, fl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((bb, fh, fl), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(bb // rb,),
        in_specs=[
            pl.BlockSpec(
                (1, length, rb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((rb, fh, fl), jnp.float32)],
        interpret=interpret,
    )(ct)
