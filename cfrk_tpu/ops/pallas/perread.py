"""Pallas TPU kernel: dense per-read k-mer histograms.

The TPU-native replacement of the reference's ComputeIndex +
ComputeFreqNew CUDA kernels (reference ``src/kmer_kernel.cu:21-49`` and
``:73-90``).  Compared to the XLA einsum path (ops/perread.py), the win
is memory traffic: the one-hot operands and the float32 accumulator live
only in VMEM and the count matrix is written to HBM exactly once — the
XLA path materialises the one-hots and the f32 einsum output in HBM
(~6x the traffic at k=8).

Structure: a [n_read_blocks, n_window_tiles] grid over a transposed
window-index matrix (see ops/pallas/common.py for why transposed).  Each
step takes one [wt, rb] tile, builds per-read one-hot matrices
[wt, 4**kh] / [wt, 4**kl] by lane-broadcast compare, and accumulates
``one_hot(hi)^T @ one_hot(lo)`` on the MXU into a per-read-block VMEM
accumulator; the tile axis is innermost so the accumulator carries
across window tiles and each read block's counts are emitted once.
(A single batched rank-3 ``dot_general`` instead of the per-read unroll
was tried and measured WORSE on real Mosaic: 517 s cold compile and
7.1 ms/step vs ~150 s and ~2.9 ms — Mosaic's batched matmul lowering is
pathological, so the unroll stays.)  Window tiling means per-read
length is unbounded — the reference silently dropped positions beyond
blockDim.x = 1024 (``src/kmer_kernel.cu:83-85``).

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
    "DEFAULT_READ_BLOCK",
    "count_perread_pallas",
    "unpack_counts",
]

# Reads per kernel grid step (rb=16 measured best; rb=32 neutral — see
# docs/PERF.md).  Shared by the streaming driver's packed-mesh guard and
# the sharded packed op so their divisibility checks can never drift
# from the kernel's actual block size.
DEFAULT_READ_BLOCK = 16


def _perread_kernel(
    idx_ref, out_ref, *rest, kl: int, fh: int, fl: int, rb: int, packed,
    checksum: bool, oh_dtype, acc_dtype,
):
    if checksum:
        chk_ref, acc_ref = rest
    else:
        (acc_ref,) = rest
    i = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wt = idx_ref.shape[1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (wt, fh), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (wt, fl), 1)
    for r in range(rb):  # static unroll over the reads of this block
        # A batched (rank-3) dot_general was tried here and REJECTED by
        # measurement: Mosaic lowers it pathologically (517 s cold
        # compile, 7.1 ms/step vs ~150 s / ~2.9 ms for this unroll).
        col = idx_ref[0, :, r : r + 1]  # [wt, 1] — lane-broadcasts below
        oh_hi = ((col >> (2 * kl)) == iota_h).astype(oh_dtype)
        oh_lo = ((col & (fl - 1)) == iota_l).astype(oh_dtype)
        acc_ref[r, :, :] += jax.lax.dot_general(
            oh_hi,
            oh_lo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    @pl.when(t == nt - 1)
    def _emit():
        a = acc_ref[...].astype(jnp.int32)
        if checksum:
            # Fold the counts while they are still in VMEM: proves the
            # values were computed without charging an HBM read-back.
            # (chk is a full-array SMEM block — indexed by the read-block
            # id; per-block SMEM tiles are not lowerable.  Laid out as ONE
            # row (1, nblocks): SMEM windows pad every ROW to 512 B, so a
            # (nblocks, 1) layout costs nblocks*512 B and overflows the
            # 1 MB SMEM at 2048 blocks — batch 32768 / read_block 16.)
            chk_ref[0, i] = jnp.sum(a & 3)
        if packed == "fh":
            # Two hi-bins per int32: bin h in bits 31..16 packs with bin
            # h + fh/2 in bits 15..0 — rank-3 output block.
            hhalf = fh // 2
            out_ref[...] = (a[:, :hhalf, :] << 16) | (a[:, hhalf:, :])
        elif packed == "b4":
            # Four hi-bins per int32, one byte each (valid when every
            # count < 256): bins h, h+q, h+2q, h+3q with q = fh/4.
            q = fh // 4
            out_ref[...] = (
                (a[:, :q, :] << 24)
                | (a[:, q : 2 * q, :] << 16)
                | (a[:, 2 * q : 3 * q, :] << 8)
                | a[:, 3 * q :, :]
            )
        else:
            out_ref[...] = a


def packed_auto(impl: str, k: int, w: int) -> bool:
    """Packed-emit auto-eligibility, shared by every per-read driver
    (in-memory, streaming, streaming-on-mesh): the packed Pallas kernel
    applies on TPU in its k-range when windows/read fit the fh bound.
    Callers add their own constraints (mesh row divisibility, explicit
    --packed override)."""
    import jax

    return (
        impl in ("auto", "pallas")
        and 5 <= k <= 8
        and w < 2**15
        and jax.default_backend() == "tpu"
    )


def resolve_packed(packed, w: int):
    """Resolve a packed-mode request against the windows/read bound.

    ``True`` picks the densest safe packing: "b4" (1 byte/bin) when every
    count is provably < 256, else "fh" (2 bytes/bin) below 2**15.
    """
    if packed is True:
        if w < 256:
            return "b4"
        if w < 2**15:
            return "fh"
        raise ValueError(
            "packed counts unsafe for >= 2**15 windows/read"
        )
    if packed in (False, None):
        return False
    if packed == "b4" and w >= 256:
        raise ValueError("b4-packed counts unsafe for >= 256 windows/read")
    if packed == "fh" and w >= 2**15:
        raise ValueError("fh-packed counts unsafe for >= 2**15 windows/read")
    if packed not in ("b4", "fh"):
        raise ValueError(f"unknown packed mode {packed!r}")
    return packed


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "canonical", "read_block", "window_block", "interpret", "packed",
        "checksum", "mxu_dtype",
    ),
)
def count_perread_pallas(
    codes: jax.Array,
    k: int,
    *,
    canonical: bool = False,
    read_block: int = DEFAULT_READ_BLOCK,
    window_block: int = 512,
    interpret: bool | None = None,
    packed=False,
    checksum: bool = False,
    mxu_dtype: str = "int8",
):
    """Dense per-read histograms: codes [B, L] int8 → [B, 4**k] int32.

    ``packed`` halves or quarters the dominant HBM write and any D2H
    that keeps the packed layout:

    * ``"fh"``: hi-bin pair (h, h+fh/2) packs per read — rank-3 output
      [B_pad, fh/2, fl] int32, 2 bytes/bin (needs windows/read < 2**15).
    * ``"b4"``: four hi-bins (h, h+q, h+2q, h+3q), q = fh/4, one byte
      each — [B_pad, fh/4, fl] int32, 1 byte/bin (needs windows/read
      < 256, i.e. every count fits a byte — true for short-read data).
    * ``True``: densest safe mode for this shape.

    Unpack with :func:`unpack_counts` (mode must match).

    ``mxu_dtype``: "int8" (default — int8 one-hots, int32 accumulation:
    2x MXU peak on v5e, exact for ANY window count, measured 468 vs
    375 Mbases/s for bf16 at k=8/150 bp) or "bf16" (f32 accumulation,
    exact below 2**24 windows/read).

    ``checksum=True`` additionally returns a per-read-block int32 vector
    ``chk[nb] = sum(counts & 3)`` folded INSIDE the kernel while the
    counts sit in VMEM.  Consuming only ``chk`` forces the full compute
    and the HBM write of ``counts`` (both outputs come from one Pallas
    custom call XLA cannot split) without an artificial read-back —
    bench.py uses this for honest write-roofline measurement.
    """
    if codes.ndim != 2:
        raise ValueError(f"codes must be [B, L], got {codes.shape}")
    b, length = codes.shape
    w = length - k + 1
    if w <= 0:
        raise ValueError(f"read length {length} < k={k}")
    if k > 8:
        raise ValueError("per-read dense counting supports k <= 8")
    if mxu_dtype not in ("bf16", "int8"):
        raise ValueError(f"mxu_dtype must be 'bf16' or 'int8', got {mxu_dtype!r}")
    if w >= 2**24 and mxu_dtype == "bf16":
        # The f32 VMEM accumulator stays exact only below 2**24 per bin;
        # callers route such contigs to the int32 scatter impl
        # (ops/perread.py) or the int8 kernel — refuse rather than
        # silently undercount.
        raise ValueError(
            f"{w} windows/read exceeds the f32 exactness bound (2**24); "
            "use impl='scatter' or mxu_dtype='int8'"
        )
    packed = resolve_packed(packed, w)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    kh, kl = split_k(k)
    fh, fl = 4**kh, 4**kl
    if packed == "b4" and fh < 4:
        raise ValueError("b4 packing needs k >= 2")
    if packed == "fh" and fh < 2:
        raise ValueError("fh packing needs k >= 1")
    rb = min(read_block, b)
    wt = min(window_block, max(8, w))
    wt = ((wt + 7) // 8) * 8  # sublane alignment
    pad_b = (-b) % rb
    if pad_b:
        codes = jnp.pad(codes, ((0, pad_b), (0, 0)), constant_values=-1)
    bb = codes.shape[0]
    idx, n_tiles = prep_indices(codes, k, canonical, wt, rb)

    oh_dtype, acc_dtype = (
        (jnp.int8, jnp.int32) if mxu_dtype == "int8" else (jnp.bfloat16, jnp.float32)
    )
    kernel = functools.partial(
        _perread_kernel, kl=kl, fh=fh, fl=fl, rb=rb, packed=packed,
        checksum=checksum, oh_dtype=oh_dtype, acc_dtype=acc_dtype,
    )
    if packed == "fh":
        out_specs = pl.BlockSpec(
            (rb, fh // 2, fl), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((bb, fh // 2, fl), jnp.int32)
    elif packed == "b4":
        out_specs = pl.BlockSpec(
            (rb, fh // 4, fl), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((bb, fh // 4, fl), jnp.int32)
    else:
        out_specs = pl.BlockSpec(
            (rb, fh, fl), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((bb, fh, fl), jnp.int32)
    out_specs = [out_specs]
    out_shape = [out_shape]
    if checksum:
        out_specs.append(
            pl.BlockSpec(
                (1, bb // rb), lambda i, t: (0, 0), memory_space=pltpu.SMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((1, bb // rb), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(bb // rb, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, wt, rb), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((rb, fh, fl), acc_dtype)],
        interpret=interpret,
    )(idx)
    counts = outs[0]
    if not packed:
        counts = counts[:b].reshape(b, fh * fl)
    if checksum:
        return counts, outs[1].reshape(-1)
    return counts


def unpack_counts(packed, n_reads: int, mode: str = "fh"):
    """Unpack a packed kernel output back to [n_reads, 4**k] int32.

    Works on NumPy arrays (host side, after a halved D2H) or jax arrays.
    mode="fh": [B_pad, fh/2, fl], hi-bin h in the high 16 bits paired
    with bin h+fh/2 in the low.  mode="b4": [B_pad, fh/4, fl], four
    hi-bins one byte each, h in the highest byte.  The byte/halfword
    extraction masks after the shift, so arithmetic sign-extension of
    the int32 container is harmless.
    """
    import numpy as np

    xp = np if isinstance(packed, np.ndarray) else jnp
    if mode == "fh":
        bpad, hhalf, fl = packed.shape
        hi = (packed >> 16) & 0x7FFF
        lo = packed & 0xFFFF
        counts = xp.concatenate([hi, lo], axis=1)  # [bpad, fh, fl]
        return counts.reshape(bpad, 2 * hhalf * fl)[:n_reads].astype(xp.int32)
    if mode == "b4":
        bpad, q, fl = packed.shape
        parts = [(packed >> s) & 0xFF for s in (24, 16, 8, 0)]
        counts = xp.concatenate(parts, axis=1)  # [bpad, fh, fl]
        return counts.reshape(bpad, 4 * q * fl)[:n_reads].astype(xp.int32)
    raise ValueError(f"unknown packed mode {mode!r}")
