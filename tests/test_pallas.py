"""Pallas kernel correctness vs the NumPy specification.

Runs in interpreter mode on CPU (compiled-mode parity on real TPU
hardware is exercised by bench.py and was validated chip-side for
k ∈ {2, 5, 8} × {plain, canonical}).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cfrk_tpu.ops.pallas.perread import count_perread_pallas
from cfrk_tpu.ops.pallas.spectrum import spectrum_pallas
from cfrk_tpu.ops.reference import count_perread_np, spectrum_np

from conftest import make_ragged_reads


def _batch(rng, b, l, p_invalid=0.03):
    codes = rng.integers(0, 4, size=(b, l)).astype(np.int8)
    codes[rng.random(codes.shape) < p_invalid] = -1
    return codes


@pytest.mark.parametrize("k", [1, 2, 4, 5, 8])
@pytest.mark.parametrize("canonical", [False, True])
def test_perread_pallas(rng, k, canonical):
    codes = _batch(rng, 13, 171)
    got = np.asarray(
        count_perread_pallas(jnp.asarray(codes), k, canonical=canonical)
    )
    want = count_perread_np(list(codes), k, canonical=canonical)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [1, 2, 4, 5, 8])
@pytest.mark.parametrize("canonical", [False, True])
def test_spectrum_pallas(rng, k, canonical):
    codes = _batch(rng, 13, 171)
    got = np.asarray(spectrum_pallas(jnp.asarray(codes), k, canonical=canonical))
    want = spectrum_np(list(codes), k, canonical=canonical)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_perread_pallas_window_tiling(rng):
    """Reads longer than one window tile must tile over positions
    (the reference capped reads at 1024, src/kmer_kernel.cu:83-85)."""
    codes = _batch(rng, 3, 1500)
    got = np.asarray(
        count_perread_pallas(jnp.asarray(codes), 4, window_block=256)
    )
    want = count_perread_np(list(codes), 4)
    np.testing.assert_array_equal(got, want)


def test_spectrum_pallas_no_cross_read_windows(rng):
    """Full-length reads sit adjacent after flattening; the separator
    column must stop windows from crossing read boundaries."""
    codes = rng.integers(0, 4, size=(16, 64)).astype(np.int8)  # no -1 pads
    got = np.asarray(spectrum_pallas(jnp.asarray(codes), 3))
    want = spectrum_np(list(codes), 3)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_perread_pallas_odd_batch(rng):
    """Batch not divisible by read_block: padding rows must count zero."""
    codes = _batch(rng, 9, 77)
    got = np.asarray(count_perread_pallas(jnp.asarray(codes), 5, read_block=4))
    want = count_perread_np(list(codes), 5)
    np.testing.assert_array_equal(got, want)


def test_perread_int16_output_parity():
    import jax.numpy as jnp
    import numpy as np

    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(16, 100)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.02] = -1
    for impl in ("compare", "matmul", "pallas"):
        k = 3 if impl == "compare" else 5
        c32 = np.asarray(count_perread(codes, k, impl=impl))
        c16 = np.asarray(
            count_perread(codes, k, impl=impl, out_dtype=jnp.int16)
        )
        assert c16.dtype == np.int16
        np.testing.assert_array_equal(c16.astype(np.int32), c32)


def test_perread_int16_overflow_guard():
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest

    from cfrk_tpu.ops.perread import count_perread

    codes = np.zeros((1, 2**15 + 8), dtype=np.int8)
    with _pytest.raises(ValueError, match="int16 counts unsafe"):
        count_perread(codes, 2, out_dtype=jnp.int16)


def test_perread_packed_output_parity():
    import numpy as np

    from cfrk_tpu.ops.pallas.perread import (
        count_perread_pallas,
        resolve_packed,
        unpack_counts,
    )
    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(1)
    for b in (16, 13):  # multiple of read_block and a padded case
        codes = rng.integers(0, 4, size=(b, 90)).astype(np.int8)
        codes[rng.random(codes.shape) < 0.03] = -1
        want = np.asarray(count_perread(codes, 5, impl="matmul"))
        mode = resolve_packed(True, 90 - 5 + 1)
        assert mode == "b4"  # short reads pick the 1-byte/bin packing
        packed = np.asarray(count_perread_pallas(codes, 5, packed=True))
        got = np.asarray(unpack_counts(packed, b, mode=mode))
        np.testing.assert_array_equal(got, want)


def test_resolve_packed_modes():
    import pytest as _pytest

    from cfrk_tpu.ops.pallas.perread import resolve_packed

    assert resolve_packed(True, 100) == "b4"
    assert resolve_packed(True, 1000) == "fh"
    assert resolve_packed(False, 100) is False
    with _pytest.raises(ValueError, match="packed counts unsafe"):
        resolve_packed(True, 2**15)
    with _pytest.raises(ValueError, match="b4-packed counts unsafe"):
        resolve_packed("b4", 300)
    with _pytest.raises(ValueError, match="unknown packed mode"):
        resolve_packed("reads", 10)


def test_perread_packed_window_guard():
    import numpy as np
    import pytest as _pytest

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas

    codes = np.zeros((8, 2**15 + 16), dtype=np.int8)
    with _pytest.raises(ValueError, match="packed counts unsafe"):
        count_perread_pallas(codes, 2, packed=True)


def test_spectrum_pallas_k9_matches_scatter():
    import numpy as np

    from cfrk_tpu.ops.spectrum import spectrum

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(12, 80)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.02] = -1
    got = np.asarray(spectrum(codes, 9, impl="pallas"))
    want = np.asarray(spectrum(codes, 9, impl="scatter"))
    np.testing.assert_array_equal(got, want)


def test_spectrum_pallas_batch_slicing(monkeypatch):
    """Batches above SPECTRUM_PALLAS_BATCH are sliced into kernel-optimal
    sub-batches whose tables sum exactly (incl. a ragged tail)."""
    import numpy as np

    from cfrk_tpu.ops import spectrum as spec_mod

    monkeypatch.setattr(spec_mod, "SPECTRUM_PALLAS_BATCH", 16)
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=(40, 60)).astype(np.int8)  # 16+16+8
    codes[rng.random(codes.shape) < 0.02] = -1
    got = np.asarray(spec_mod.spectrum(codes, 6, impl="pallas"))
    want = np.asarray(spec_mod.spectrum(codes, 6, impl="scatter"))
    np.testing.assert_array_equal(got, want)


def test_packed_odd_batch_pads_and_guards():
    import numpy as np
    import pytest as _pytest

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas, unpack_counts
    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(5, 60)).astype(np.int8)  # odd small b
    packed = np.asarray(count_perread_pallas(codes, 5, packed=True))
    got = np.asarray(unpack_counts(packed, 5, mode="b4"))
    want = np.asarray(count_perread(codes, 5, impl="matmul"))
    np.testing.assert_array_equal(got, want)
    with _pytest.raises(ValueError, match="b4-packed counts unsafe"):
        count_perread_pallas(np.zeros((8, 300), dtype=np.int8), 2, packed="b4")


def test_perread_packed_canonical_parity():
    import numpy as np

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas, unpack_counts
    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, size=(16, 70)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.02] = -1
    packed = np.asarray(count_perread_pallas(codes, 6, canonical=True, packed=True))
    got = np.asarray(unpack_counts(packed, 16, mode="b4"))
    want = np.asarray(count_perread(codes, 6, canonical=True, impl="matmul"))
    np.testing.assert_array_equal(got, want)


def test_perread_packed_fh_parity():
    import numpy as np

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas, unpack_counts
    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(5)
    for b in (16, 13):
        codes = rng.integers(0, 4, size=(b, 90)).astype(np.int8)
        codes[rng.random(codes.shape) < 0.03] = -1
        want = np.asarray(count_perread(codes, 5, impl="matmul"))
        packed = np.asarray(count_perread_pallas(codes, 5, packed="fh"))
        got = np.asarray(unpack_counts(packed, b, mode="fh"))
        np.testing.assert_array_equal(got, want)


def test_perread_fh_rb16_parity():
    import numpy as np

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas, unpack_counts
    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(6)
    codes = rng.integers(0, 4, size=(20, 90)).astype(np.int8)  # pads to 32
    want = np.asarray(count_perread(codes, 5, impl="matmul"))
    packed = np.asarray(
        count_perread_pallas(codes, 5, packed="fh", read_block=16)
    )
    got = np.asarray(unpack_counts(packed, 20, mode="fh"))
    np.testing.assert_array_equal(got, want)


def test_perread_b4_long_read_parity():
    """b4 packing across multiple window tiles (w close to the 256 bound)."""
    import numpy as np

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas, unpack_counts
    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=(6, 250)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.03] = -1
    want = np.asarray(count_perread(codes, 5, impl="matmul"))
    packed = np.asarray(
        count_perread_pallas(codes, 5, packed="b4", window_block=64)
    )
    got = np.asarray(unpack_counts(packed, 6, mode="b4"))
    np.testing.assert_array_equal(got, want)


def test_perread_checksum_output():
    """checksum=True returns per-block sums of (counts & 3), folded
    in-kernel — the honest-bench hook (see bench.py)."""
    import numpy as np

    from cfrk_tpu.ops.pallas.perread import count_perread_pallas, unpack_counts
    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(8)
    codes = rng.integers(0, 4, size=(20, 90)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.03] = -1
    want = np.asarray(count_perread(codes, 5, impl="matmul"))

    counts, chk = count_perread_pallas(codes, 5, read_block=8, checksum=True)
    np.testing.assert_array_equal(np.asarray(counts)[:20], want)
    # 20 reads pad to 24 = 3 blocks of 8; padded rows count zero.
    chk = np.asarray(chk)
    assert chk.shape == (3,)
    padded = np.zeros((24, want.shape[1]), dtype=np.int64)
    padded[:20] = want
    expect = (padded & 3).reshape(3, 8, -1).sum(axis=(1, 2))
    np.testing.assert_array_equal(chk, expect)

    # checksum composes with packing.
    packed, chk2 = count_perread_pallas(
        codes, 5, read_block=8, packed="b4", checksum=True
    )
    np.testing.assert_array_equal(np.asarray(chk2), expect)
    got = np.asarray(unpack_counts(np.asarray(packed), 20, mode="b4"))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [2, 5, 8])
def test_perread_int8_mxu_parity(rng, k):
    """int8 one-hots + int32 accumulation must match the bf16 kernel
    and the oracle exactly (and packed/checksum compose with it)."""
    from cfrk_tpu.ops.pallas.perread import unpack_counts

    codes = _batch(rng, 20, 120)
    want = count_perread_np(list(codes), k)
    got = np.asarray(
        count_perread_pallas(jnp.asarray(codes), k, mxu_dtype="int8")
    )
    np.testing.assert_array_equal(got, want)
    packed, chk = count_perread_pallas(
        jnp.asarray(codes), k, mxu_dtype="int8", packed=True, checksum=True
    )
    got2 = unpack_counts(np.asarray(packed), 20, mode="b4")
    np.testing.assert_array_equal(got2, want)
    assert int(np.asarray(chk).sum()) == int((want & 3).sum())


@pytest.mark.parametrize("k", [2, 5, 8])
def test_spectrum_int8_mxu_parity(rng, k):
    codes = _batch(rng, 16, 120)
    want = spectrum_np(list(codes), k)
    got = np.asarray(
        spectrum_pallas(jnp.asarray(codes), k, mxu_dtype="int8")
    )
    np.testing.assert_array_equal(got.astype(np.int64), want)
    got_bf = np.asarray(
        spectrum_pallas(jnp.asarray(codes), k, mxu_dtype="bf16")
    )
    np.testing.assert_array_equal(got_bf.astype(np.int64), want)


# ---------------------------------------------------------------------------
# Fused row-sort + RLE kernel (ops/pallas/rowsort.py): parity against the
# XLA lax.sort route it replaces on TPU.


@pytest.mark.parametrize("k", [1, 2, 8, 15])
@pytest.mark.parametrize("canonical", [False, True])
def test_rowsort_rle_parity(rng, k, canonical):
    from cfrk_tpu.ops.pallas.rowsort import rowsort_rle_pallas
    from cfrk_tpu.ops.perread_sparse import count_perread_sparse

    codes = _batch(rng, 13, 171)
    ref_i, ref_c = count_perread_sparse(jnp.asarray(codes), k, canonical)
    for mode in ("gather", "roll"):
        got_i, got_c = rowsort_rle_pallas(
            jnp.asarray(codes), k, canonical=canonical, mode=mode,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))


@pytest.mark.parametrize("k", [16, 24, 31])
@pytest.mark.parametrize("canonical", [False, True])
def test_rowsort_rle_large_parity(rng, k, canonical):
    from cfrk_tpu.ops.pallas.rowsort import rowsort_rle_pallas_large
    from cfrk_tpu.ops.perread_sparse import count_perread_sparse_large

    codes = _batch(rng, 13, 171, p_invalid=0.005)
    rh, rl, rc = count_perread_sparse_large(jnp.asarray(codes), k, canonical)
    gh, gl, gc = rowsort_rle_pallas_large(
        jnp.asarray(codes), k, canonical=canonical, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(gh), np.asarray(rh))
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(rl))
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(rc))


def test_rowsort_g2split_boundaries(rng):
    """The half-skip network (g=2 grouped layout) across its
    eligibility boundaries: W=129 (bspan 1), W=143 (the k=8/150 bp
    headline, bspan 16), W=192 (bspan 64, the last eligible width),
    W=193 (ineligible — standard network), plus a 2-key eligible shape
    and degenerate rows."""
    from cfrk_tpu.ops.pallas.rowsort import (
        _g2split_bspan,
        rowsort_rle_pallas,
        rowsort_rle_pallas_large,
    )
    from cfrk_tpu.ops.perread_sparse import (
        count_perread_sparse,
        count_perread_sparse_large,
    )

    assert _g2split_bspan(129, 256, 2, 128, "gather") == 1
    assert _g2split_bspan(143, 256, 2, 128, "gather") == 16
    assert _g2split_bspan(192, 256, 2, 128, "gather") == 64
    assert _g2split_bspan(193, 256, 2, 128, "gather") == 0
    assert _g2split_bspan(143, 256, 2, 128, "roll") == 0
    assert _g2split_bspan(100, 128, 1, 128, "gather") == 0

    for length in (136, 150, 199, 200):
        codes = _batch(rng, 11, length)
        codes[0] = 0  # poly-A
        codes[1] = -1  # poly-N
        ref_i, ref_c = count_perread_sparse(jnp.asarray(codes), 8)
        got_i, got_c = rowsort_rle_pallas(
            jnp.asarray(codes), 8, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))

    codes = _batch(rng, 7, 200, p_invalid=0.01)  # k=16: W=185, bspan 64
    rh, rl, rc = count_perread_sparse_large(jnp.asarray(codes), 16, True)
    gh, gl, gc = rowsort_rle_pallas_large(
        jnp.asarray(codes), 16, canonical=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(gh), np.asarray(rh))
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(rl))
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(rc))


def test_rowsort_bigcontig_layout_and_eligibility():
    """Round 4 extended the fast path to 64 kb contigs: eligibility cap
    at next_pow2(W) <= 65536, and _plan_layout keeps kernel blocks at
    ~1024 VMEM rows past g=128 (rb drops below the 8-read floor, rows
    stay 8-aligned) — the 16 MB scoped-VMEM limit that OOMed at rb=8 /
    g=256.  Compiled parity at 32/64 kb is pinned on-chip
    (TPU_VALID.json: contig_64kb_g)."""
    from cfrk_tpu.ops.pallas.rowsort import _plan_layout

    for w, want_g, want_rb in [
        (16384, 128, 8),   # the round-3 boundary: unchanged
        (32761, 256, 4),   # 32 kb contig
        (65514, 512, 2),   # 64 kb contig
    ]:
        n, g, span, rb = _plan_layout(w, 64, 512)
        assert (g, rb) == (want_g, want_rb), (w, g, rb)
        assert rb * g <= 1024 and (rb * g) % 8 == 0

    # eligibility mirrors the layout cap (TPU-only at runtime; the
    # predicate itself is backend-independent below the cap check).
    import jax

    from cfrk_tpu.ops.perread_sparse import rowsort_eligible

    on_tpu = jax.default_backend() == "tpu"
    assert rowsort_eligible(8, 65514) == on_tpu
    assert rowsort_eligible(8, 65537) is False  # > 64 kb: XLA/tiling


def test_rowsort_rle_long_reads_and_edge_rows(rng):
    """g > 2 sub-rows per read (n = 1024), odd batch size, plus the two
    degenerate rows: single-run (poly-A) and all-invalid (poly-N)."""
    from cfrk_tpu.ops.pallas.rowsort import rowsort_rle_pallas
    from cfrk_tpu.ops.perread_sparse import count_perread_sparse

    codes = _batch(rng, 5, 1000)
    codes[0] = 0  # poly-A: one run of the whole read
    codes[1] = -1  # poly-N: no valid window at all
    ref_i, ref_c = count_perread_sparse(jnp.asarray(codes), 8)
    got_i, got_c = rowsort_rle_pallas(jnp.asarray(codes), 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))


def test_rowsort_checksum_outputs(rng):
    """checksum=True returns the same pairs plus an in-kernel fold."""
    from cfrk_tpu.ops.pallas.rowsort import (
        rowsort_rle_pallas,
        rowsort_rle_pallas_large,
    )

    codes = _batch(rng, 16, 150)
    i0, c0 = rowsort_rle_pallas(jnp.asarray(codes), 8, interpret=True)
    i1, c1, chk = rowsort_rle_pallas(
        jnp.asarray(codes), 8, checksum=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    sent = 4**8
    want = int((np.asarray(c0) & 3).sum()) + int(
        (np.where(np.asarray(c0) > 0, np.asarray(i0), 0) & 3).sum()
    )
    assert int(np.asarray(chk).sum()) == want
    out = rowsort_rle_pallas_large(
        jnp.asarray(codes), 31, checksum=True, interpret=True
    )
    assert len(out) == 4 and out[3].shape[0] >= 1


def test_count_perread_rows_dispatcher(rng):
    """Off-TPU the dispatcher must resolve to the XLA sort route (the
    oracle) for both k ranges; impl='sort' forces it everywhere."""
    from cfrk_tpu.ops.perread_sparse import (
        count_perread_rows,
        count_perread_sparse,
        count_perread_sparse_large,
        rowsort_eligible,
    )

    codes = jnp.asarray(_batch(rng, 7, 150))
    a = count_perread_rows(codes, 8)
    b = count_perread_sparse(codes, 8, False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    a3 = count_perread_rows(codes, 31)
    b3 = count_perread_sparse_large(codes, 31, False)
    for x, y in zip(a3, b3):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # eligibility is shape- and impl-gated
    assert not rowsort_eligible(8, 143, impl="sort")
    assert not rowsort_eligible(8, 40000, impl="auto")  # > 16384 pad


def test_rowsort_large_16T_hi_sentinel_collision():
    """A 16-T prefix at k=31 makes the hi key half equal the sentinel
    value — validity must be judged on lo (always < 4**15 for real
    windows), never hi, or these k-mers vanish."""
    from cfrk_tpu.ops.pallas.rowsort import rowsort_rle_pallas_large
    from cfrk_tpu.ops.perread_sparse import count_perread_sparse_large

    codes = np.zeros((4, 60), np.int8)
    codes[:, :20] = 3  # TTTTTTTTTTTTTTTTTTTT... prefix
    got = rowsort_rle_pallas_large(jnp.asarray(codes), 31, interpret=True)
    want = count_perread_sparse_large(jnp.asarray(codes), 31, False)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the runs must actually exist (count > 0 somewhere)
    assert int(np.asarray(got[2]).sum()) > 0


@pytest.mark.parametrize("length,exp_span", [(36, 32), (70, 64)])
@pytest.mark.parametrize("canonical", [False, True])
def test_rowsort_short_read_span_packing(rng, length, exp_span, canonical):
    """Reads with <= 64 padded windows pack 128/span per 128-lane row
    (measured ~9 Gbases/s on-chip); parity must hold for both k ranges,
    odd batches, and both partner modes."""
    from cfrk_tpu.ops.pallas.rowsort import (
        _plan_layout,
        rowsort_rle_pallas,
        rowsort_rle_pallas_large,
    )
    from cfrk_tpu.ops.perread_sparse import (
        count_perread_sparse,
        count_perread_sparse_large,
    )

    n, g, span, rb = _plan_layout(length - 8 + 1, 37, 512)
    assert span == exp_span and g == 1
    codes = jnp.asarray(_batch(rng, 37, length))
    ri, rc = count_perread_sparse(codes, 8, canonical)
    for mode in ("gather", "roll"):
        gi, gc = rowsort_rle_pallas(
            codes, 8, canonical=canonical, mode=mode, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(gc), np.asarray(rc))
    if length >= 40:
        r = count_perread_sparse_large(codes, 31, canonical)
        got = rowsort_rle_pallas_large(
            codes, 31, canonical=canonical, interpret=True
        )
        for a, b in zip(got, r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
