"""Pallas TPU kernel: global k-mer spectrum (one table over all reads).

Same VMEM-resident one-hot matmul strategy as the per-read kernel
(ops/pallas/perread.py), but every window tile of every read contracts
into a single [4**kh, 4**kl] float32 accumulator that persists across the
whole sequential grid and is written to HBM once, on the last step.

HBM traffic is one int32 read of the window-index matrix plus one 4**k
int32 write — this mode is compute-bound on the MXU, not bandwidth-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import prep_indices, split_k

__all__ = ["spectrum_pallas"]


def _spectrum_kernel(
    idx_ref, out_ref, acc_ref, *, kl: int, fh: int, fl: int, rb: int,
    oh_dtype, acc_dtype,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wt = idx_ref.shape[1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (wt, fh), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (wt, fl), 1)
    for r in range(rb):  # static unroll over the reads of this tile
        col = idx_ref[0, :, r : r + 1]  # [wt, 1] — lane-broadcasts below
        oh_hi = ((col >> (2 * kl)) == iota_h).astype(oh_dtype)
        oh_lo = ((col & (fl - 1)) == iota_l).astype(oh_dtype)
        acc_ref[...] += jax.lax.dot_general(
            oh_hi,
            oh_lo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        out_ref[...] = acc_ref[...].astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "canonical", "read_block", "window_block", "interpret",
        "mxu_dtype",
    ),
)
def spectrum_pallas(
    codes: jax.Array,
    k: int,
    *,
    canonical: bool = False,
    read_block: int = 8,
    window_block: int = 2048,
    interpret: bool | None = None,
    mxu_dtype: str = "int8",
) -> jax.Array:
    """Global dense spectrum: codes [B, L] int8 → [4**k] int32.

    This op is MXU-bound (deep contractions into one resident table),
    so ``mxu_dtype="int8"`` (default: int8 one-hots, int32 accumulation
    — 2x the bf16 MXU peak on v5e, exact for any window count) matters
    more here than for the HBM-bound per-read kernel; "bf16" keeps the
    f32-accumulator variant (exact below 2**24 windows per table cell,
    guarded by the caller in ops/spectrum.py).
    """
    if mxu_dtype not in ("bf16", "int8"):
        raise ValueError(f"mxu_dtype must be 'bf16' or 'int8', got {mxu_dtype!r}")
    if codes.ndim != 2:
        raise ValueError(f"codes must be [B, L], got {codes.shape}")
    b, length = codes.shape
    w = length - k + 1
    if w <= 0:
        raise ValueError(f"read length {length} < k={k}")
    if k > 10:
        # The [4**ceil(k/2), 4**floor(k/2)] f32 accumulator must stay in
        # VMEM: k=10 is 4 MB, k=11 would be 16 MB (on the ~16 MB limit).
        raise ValueError("pallas dense spectrum supports k <= 10")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    kh, kl = split_k(k)
    fh, fl = 4**kh, 4**kl
    rb = min(read_block, b)

    # The table is global, so reads need no separation: flatten the batch
    # into rb long pseudo-reads (one -1 separator column stops windows
    # from crossing real read boundaries; pseudo-read boundaries coincide
    # with read boundaries so no window is lost).  This makes every MXU
    # contraction deep (K = window_block) instead of K = reads' length —
    # ~2.5x faster for 150 bp reads.
    pad_b = (-b) % rb
    if pad_b:
        codes = jnp.pad(codes, ((0, pad_b), (0, 0)), constant_values=-1)
    codes = jnp.pad(codes, ((0, 0), (0, 1)), constant_values=-1)
    codes = codes.reshape(rb, -1)
    b2, length2 = codes.shape
    w = length2 - k + 1
    wt = min(window_block, max(8, w))
    wt = ((wt + 7) // 8) * 8  # sublane alignment
    idx, n_tiles = prep_indices(codes, k, canonical, wt, rb)

    oh_dtype, acc_dtype = (
        (jnp.int8, jnp.int32) if mxu_dtype == "int8" else (jnp.bfloat16, jnp.float32)
    )
    kernel = functools.partial(
        _spectrum_kernel, kl=kl, fh=fh, fl=fl, rb=rb,
        oh_dtype=oh_dtype, acc_dtype=acc_dtype,
    )
    # Flatten (read_block, tile) into ONE sequential grid axis so a single
    # accumulator survives the whole pass.
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, wt, rb),
                lambda s, nt=n_tiles: (s // nt, s % nt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((fh, fl), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((fh, fl), jnp.int32),
        scratch_shapes=[pltpu.VMEM((fh, fl), acc_dtype)],
        interpret=interpret,
    )(idx)
    return out.reshape(fh * fl)
