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
    codes: jax.Array,
    k: int,
    canonical: bool,
    wt: int,
    rb: int,
    reads_major: bool = False,
) -> tuple[jax.Array, int]:
    """codes [B, L] int8 (B divisible by rb) → (idx, n_tiles).

    Wpad = n_tiles * wt; positions past W carry the 4**k sentinel.

    ``reads_major=False`` (spectrum kernel): idx [nb, Wpad, rb] — windows
    in sublanes, reads in lanes; per-read column slices ``[:, r:r+1]``
    lane-broadcast against a [wt, 4**kh] bin iota (the rank-2 one-hot
    construction Mosaic lowers natively).

    ``reads_major=True`` (batched per-read kernel): idx [nb, rb, Wpad] —
    Mosaic's batched ``tpu.matmul`` requires batch dims at position 0,
    so the one-hots are built [rb, wt, 4**kh] from this layout.
    """
    b, length = codes.shape
    w = length - k + 1
    idx = window_indices(codes, k, canonical)  # [B, W], -1 invalid
    idx = jnp.where(idx < 0, 4**k, idx)
    n_tiles = -(-w // wt)
    pad_w = n_tiles * wt - w
    if pad_w:
        idx = jnp.pad(idx, ((0, 0), (0, pad_w)), constant_values=4**k)
    idx = idx.reshape(b // rb, rb, n_tiles * wt)
    if not reads_major:
        idx = idx.transpose(0, 2, 1)
    return idx, n_tiles
