"""XLA op correctness vs. the NumPy executable spec (ops/reference.py)."""

import numpy as np
import pytest

from conftest import make_ragged_reads

import jax.numpy as jnp

from cfrk_tpu.ops import reference as ref
from cfrk_tpu.ops.encode import split_k, window_components, window_indices
from cfrk_tpu.ops.perread import count_perread
from cfrk_tpu.ops.spectrum import spectrum
from cfrk_tpu.pipeline.batch import pad_reads


def test_split_k():
    assert split_k(2) == (1, 1)
    assert split_k(8) == (4, 4)
    assert split_k(31) == (16, 15)
    assert split_k(1) == (1, 0)


@pytest.mark.parametrize("k", [1, 2, 3, 5, 8, 15])
def test_window_indices_match_numpy(rng, k):
    reads = make_ragged_reads(rng, 16, max_len=90, min_len=k)
    batch = pad_reads(reads, max_len=128)
    got = np.asarray(window_indices(jnp.asarray(batch.codes), k))
    for r, codes in enumerate(reads):
        want = ref.window_indices_np(codes, k)
        w = len(want)
        assert (got[r, :w] == want).all(), f"read {r} k={k}"
        assert (got[r, w:] == -1).all(), "windows overlapping pad must be invalid"


@pytest.mark.parametrize("k", [2, 5, 11])
def test_canonical_indices_match_numpy(rng, k):
    reads = make_ragged_reads(rng, 8, max_len=60, min_len=k)
    batch = pad_reads(reads, max_len=64)
    got = np.asarray(window_indices(jnp.asarray(batch.codes), k, canonical=True))
    for r, codes in enumerate(reads):
        want = ref.canonical_indices_np(codes, k)
        assert (got[r, : len(want)] == want).all()


def test_revcomp_involution(rng):
    idx = rng.integers(0, 4**7, size=1000)
    rc = ref.revcomp_index_np(idx, 7)
    assert (ref.revcomp_index_np(rc, 7) == idx).all()


def test_revcomp_known():
    # ACGT (k=4) -> revcomp ACGT (palindrome); AAAA -> TTTT
    acgt = 0 * 64 + 1 * 16 + 2 * 4 + 3
    assert ref.revcomp_index_np(np.array([acgt]), 4)[0] == acgt
    assert ref.revcomp_index_np(np.array([0]), 4)[0] == 4**4 - 1


@pytest.mark.parametrize("impl", ["compare", "matmul"])
@pytest.mark.parametrize("k", [1, 2, 3, 4, 6, 8])
def test_count_perread_matches_numpy(rng, k, impl):
    reads = make_ragged_reads(rng, 24, max_len=150, min_len=1)
    batch = pad_reads(reads, max_len=256)
    got = np.asarray(count_perread(jnp.asarray(batch.codes), k, impl=impl))
    want = ref.count_perread_np(reads, k)
    assert (got[: len(reads)] == want).all()
    assert (got[len(reads) :] == 0).all(), "padding rows must count zero"


@pytest.mark.parametrize("k", [2, 5, 8])
def test_count_perread_canonical(rng, k):
    reads = make_ragged_reads(rng, 12, max_len=100, min_len=k)
    batch = pad_reads(reads, max_len=128)
    got = np.asarray(
        count_perread(jnp.asarray(batch.codes), k, canonical=True, impl="matmul")
    )
    want = ref.count_perread_np(reads, k, canonical=True)
    assert (got[: len(reads)] == want).all()


def test_count_perread_rejects_large_k(rng):
    batch = pad_reads(make_ragged_reads(rng, 2, max_len=64), max_len=64)
    with pytest.raises(ValueError):
        count_perread(jnp.asarray(batch.codes), 9)


def test_reads_shorter_than_k_count_zero():
    batch = pad_reads([np.array([0, 1], dtype=np.int8)], max_len=128)
    got = np.asarray(count_perread(jnp.asarray(batch.codes), 4))
    assert (got == 0).all()


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
@pytest.mark.parametrize("k", [1, 2, 4, 7])
def test_spectrum_matches_numpy(rng, k, impl):
    reads = make_ragged_reads(rng, 32, max_len=120, min_len=1)
    batch = pad_reads(reads, max_len=128)
    got = np.asarray(spectrum(jnp.asarray(batch.codes), k, impl=impl))
    want = ref.spectrum_np(reads, k)
    assert (got == want).all()


@pytest.mark.parametrize("impl", ["scatter", "matmul"])
def test_spectrum_canonical(rng, impl):
    k = 5
    reads = make_ragged_reads(rng, 16, max_len=80, min_len=k)
    batch = pad_reads(reads, max_len=128)
    got = np.asarray(spectrum(jnp.asarray(batch.codes), k, canonical=True, impl=impl))
    want = ref.spectrum_np(reads, k, canonical=True)
    assert (got == want).all()


def test_spectrum_equals_perread_sum(rng):
    k = 3
    reads = make_ragged_reads(rng, 20, max_len=90)
    batch = pad_reads(reads, max_len=128)
    codes = jnp.asarray(batch.codes)
    assert (
        np.asarray(spectrum(codes, k))
        == np.asarray(count_perread(codes, k)).sum(axis=0)
    ).all()


def test_all_invalid_read():
    batch = pad_reads([np.full(50, -1, dtype=np.int8)], max_len=128)
    assert np.asarray(count_perread(jnp.asarray(batch.codes), 2)).sum() == 0
    # host impl: the sort-route's empty composite-key edge
    got = np.asarray(count_perread(batch.codes, 4, impl="host"))
    assert got.shape == (1, 256) and got.sum() == 0


def test_perread_scatter_and_host_impl_parity():
    import numpy as np

    from cfrk_tpu.ops.perread import count_perread

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(10, 60)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.05] = -1
    for k in (4, 6):
        want = np.asarray(count_perread(codes, k, impl="matmul"))
        for impl in ("scatter", "host"):
            got = np.asarray(count_perread(codes, k, impl=impl))
            np.testing.assert_array_equal(got, want, err_msg=impl)
        got_c = np.asarray(count_perread(codes, k, impl="host", canonical=True))
        want_c = np.asarray(count_perread(codes, k, impl="matmul", canonical=True))
        np.testing.assert_array_equal(got_c, want_c)


def test_spectrum_huge_window_count_falls_back_to_int32_accum():
    """A batch with >= 2**24 windows must not use f32 accumulation."""
    import numpy as np

    from cfrk_tpu.ops.spectrum import spectrum

    # 2**24 windows of the SAME k-mer: f32 would stick at 2**24.
    n = 2**24 + 17
    # One giant all-A read: windows = n - k + 1.
    k = 4
    codes = np.zeros((1, n + k - 1), dtype=np.int8)
    table = np.asarray(spectrum(codes, k))
    assert table[0] == n
    assert table[1:].sum() == 0


def test_inmemory_mixed_lengths_bucket_per_batch():
    """One long contig must not widen every batch of the run."""
    import numpy as np

    from cfrk_tpu.ops.reference import count_perread_np
    from cfrk_tpu.pipeline.batch import iter_batches
    from cfrk_tpu.pipeline.count import count_reads

    rng = np.random.default_rng(0)
    reads = [rng.integers(0, 4, size=100).astype(np.int8) for _ in range(8)]
    reads.append(rng.integers(0, 4, size=5000).astype(np.int8))
    widths = [
        b.codes.shape[1] for b in iter_batches(reads, 4, None)
    ]
    assert widths[0] == 128 and widths[1] == 128  # short batches stay narrow
    assert widths[2] >= 5000                      # only the contig batch widens
    got = count_reads(reads, 5, batch_size=4)
    np.testing.assert_array_equal(got, count_perread_np(reads, 5))
