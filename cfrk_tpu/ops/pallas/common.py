"""Shared host/XLA-side preparation for the Pallas histogram kernels.

The kernels consume a TRANSPOSED window-index matrix ``idx_t [Wpad, B]``
(positions in sublanes, reads in lanes) rather than raw codes:

* the index math (k shifted slices + Horner) is a cheap elementwise
  pre-pass XLA fuses well — [B, W] int32 is ~100x smaller than the count
  output, so doing it outside the kernel costs nothing;
* inside the kernel a per-read COLUMN slice ``idx_blk[:, r:r+1]`` has
  shape [wt, 1], whose lane-broadcast against a [wt, 4**kh] bin iota is
  the one one-hot construction Mosaic supports natively (minor-dim
  insertion/reshape on vectors is not lowerable);
* invalid windows (N bases, padding, past end-of-read) carry the
  sentinel index ``4**k``, whose hi component is out of one-hot range —
  they contribute zero without any mask arithmetic in the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..encode import split_k, window_indices

__all__ = ["prep_indices", "split_k"]


def prep_indices(
    codes: jax.Array, k: int, canonical: bool, wt: int, rb: int
) -> tuple[jax.Array, int]:
    """codes [B, L] int8 (B divisible by rb) → (idx [nb, Wpad, rb] int32,
    n_tiles).

    Wpad = n_tiles * wt; positions past W carry the 4**k sentinel.  The
    per-read-block transposed layout keeps the kernel's lane dimension
    equal to the full rb axis (a Mosaic block-shape requirement) while
    windows run along sublanes; per-read column slices ``[:, r:r+1]``
    lane-broadcast against a [wt, 4**kh] bin iota — the rank-2 one-hot
    construction Mosaic lowers natively.  (A reads-major layout feeding
    a batched rank-3 matmul was measured and rejected — see
    ops/pallas/perread.py.)
    """
    b, length = codes.shape
    w = length - k + 1
    idx = window_indices(codes, k, canonical)  # [B, W], -1 invalid
    idx = jnp.where(idx < 0, 4**k, idx)
    n_tiles = -(-w // wt)
    pad_w = n_tiles * wt - w
    if pad_w:
        idx = jnp.pad(idx, ((0, 0), (0, pad_w)), constant_values=4**k)
    idx = idx.reshape(b // rb, rb, n_tiles * wt).transpose(0, 2, 1)
    return idx, n_tiles
