"""Sparse (large-k) counting: sort + RLE and all_to_all bucket routing.

NumPy oracle: collect window substrings as Python ints and Counter them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfrk_tpu.ops.reference import canonical_indices_np, window_indices_np
from cfrk_tpu.ops.sparse import (
    decode_key,
    kmer_keys,
    merge_sorted_spectra,
    sparse_spectrum,
)
from cfrk_tpu.parallel.bucket import sparse_spectrum_sharded
from cfrk_tpu.parallel.seqpar import make_seq_mesh


def _oracle(codes, k, canonical):
    """{kmer_code: count} over all reads (int codes, invalid excluded)."""
    out = {}
    fn = canonical_indices_np if canonical else window_indices_np
    for row in codes:
        for v in fn(row, k):
            if v >= 0:
                out[int(v)] = out.get(int(v), 0) + 1
    return out


def _batch(rng, b, l, p_invalid=0.03):
    codes = rng.integers(0, 4, size=(b, l)).astype(np.int8)
    codes[rng.random(codes.shape) < p_invalid] = -1
    return codes


@pytest.mark.parametrize("k", [3, 15, 16, 31])
@pytest.mark.parametrize("canonical", [False, True])
def test_sparse_spectrum_matches_oracle(rng, k, canonical):
    codes = _batch(rng, 6, 64)
    parts = [tuple(np.asarray(x) for x in sparse_spectrum(jnp.asarray(codes), k, canonical))]
    got = merge_sorted_spectra(parts)
    want = _oracle(codes, k, canonical)
    assert got == want


def test_kmer_keys_sentinel(rng):
    codes = np.full((2, 40), -1, dtype=np.int8)
    hi, lo = kmer_keys(jnp.asarray(codes), 31)
    assert (np.asarray(lo) == 0xFFFFFFFF).all()


def test_sparse_spectrum_multibatch_merge(rng):
    k = 21
    b1, b2 = _batch(rng, 4, 50), _batch(rng, 3, 80)
    parts = [
        tuple(np.asarray(x) for x in sparse_spectrum(jnp.asarray(b, ), k))
        for b in (b1, b2)
    ]
    got = merge_sorted_spectra(parts)
    want = _oracle(list(b1) + list(b2), k, False)
    assert got == want


def test_decode_key_roundtrip():
    # ACGT... pattern: code of "ACG" = 0*16 + 1*4 + 2 = 6
    assert decode_key(6, 3) == "ACG"
    assert decode_key(0, 5) == "AAAAA"


N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < N_DEV:
        pytest.skip(f"need {N_DEV} devices")
    return make_seq_mesh(devs[:N_DEV])


@pytest.mark.parametrize("k", [4, 15, 16, 17, 21, 31])
@pytest.mark.parametrize("n_dev", [1, 2, 3, 5, 8, 16])
def test_bucket_of_contiguous_and_in_range(k, n_dev):
    """Property: buckets are in [0, n_dev) and monotone in key order —
    concatenated per-device outputs stay one globally sorted spectrum
    for every (k, mesh size) combination."""
    import jax.numpy as jnp

    from cfrk_tpu.ops.sparse import LO_BASES
    from cfrk_tpu.parallel.bucket import _bucket_of

    r = np.random.default_rng(k * 100 + n_dev)
    kh = max(k - LO_BASES, 0)
    hi = jnp.asarray(r.integers(0, 4**kh, 2048), dtype=jnp.uint32)
    lo = jnp.asarray(
        r.integers(0, 4 ** min(k, LO_BASES), 2048), dtype=jnp.uint32
    )
    b = np.asarray(_bucket_of(hi, lo, k, n_dev))
    assert b.min() >= 0 and b.max() < n_dev
    full = (np.asarray(hi).astype(np.uint64) << np.uint64(2 * LO_BASES)) | (
        np.asarray(lo).astype(np.uint64)
    )
    order = np.argsort(full, kind="stable")
    assert (np.diff(b[order]) >= 0).all()


def test_bucket_of_uses_all_devices_at_k16():
    """k=16 leaves hi only 2 bits; the bucket must borrow lo bits so all
    8 devices own keys (and ranges stay contiguous by construction)."""
    import jax.numpy as jnp

    from cfrk_tpu.parallel.bucket import _bucket_of

    r = np.random.default_rng(0)
    hi = jnp.asarray(r.integers(0, 4, 4096), dtype=jnp.uint32)
    lo = jnp.asarray(r.integers(0, 2**30, 4096), dtype=jnp.uint32)
    b = np.asarray(_bucket_of(hi, lo, 16, 8))
    assert set(b.tolist()) == set(range(8))
    # bucket order must agree with (hi, lo) key order (contiguous ranges)
    full = (np.asarray(hi).astype(np.uint64) << np.uint64(30)) | np.asarray(
        lo
    ).astype(np.uint64)
    order = np.argsort(full)
    assert (np.diff(b[order]) >= 0).all()


@pytest.mark.parametrize(
    "k,canonical", [(8, False), (16, False), (21, False), (31, True)]
)
def test_sparse_sharded_matches_oracle(rng, mesh, k, canonical):
    codes = _batch(rng, 2 * N_DEV, 96)
    hi, lo, counts, overflowed = sparse_spectrum_sharded(
        jnp.asarray(codes), k, mesh, canonical=canonical
    )
    assert not np.asarray(overflowed).any()
    got = merge_sorted_spectra(
        [(np.asarray(hi), np.asarray(lo), np.asarray(counts))]
    )
    want = _oracle(codes, k, canonical)
    assert got == want


def test_sparse_sharded_flattens_multi_axis_mesh(rng):
    """A (dp, tp) mesh must flatten so ALL devices route buckets (a tp
    axis would otherwise replicate the exchange); results exact."""
    from cfrk_tpu.parallel.bucket import _flat_mesh
    from cfrk_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual devices")
    mesh2 = make_mesh(devs[:4], tp=2)
    flat = _flat_mesh(mesh2)
    assert len(flat.axis_names) == 1 and flat.size == 4

    codes = _batch(rng, 8, 96)
    hi, lo, counts, overflowed = sparse_spectrum_sharded(
        jnp.asarray(codes), 19, mesh2
    )
    assert not np.asarray(overflowed).any()
    got = merge_sorted_spectra(
        [(np.asarray(hi), np.asarray(lo), np.asarray(counts))]
    )
    assert got == _oracle(codes, 19, False)


def test_sparse_sharded_globally_sorted(rng, mesh):
    """Concatenated per-device outputs must be one sorted key stream."""
    codes = _batch(rng, 2 * N_DEV, 96)
    hi, lo, counts, _ = sparse_spectrum_sharded(jnp.asarray(codes), 21, mesh)
    hi, lo, counts = np.asarray(hi), np.asarray(lo), np.asarray(counts)
    mask = counts > 0
    full = (hi[mask].astype(np.uint64) << np.uint64(30)) | lo[mask].astype(np.uint64)
    assert (np.diff(full.astype(np.int64)) > 0).all()


def test_sparse_sharded_overflow_flag(rng, mesh):
    """Pathological skew (all-identical reads) must trip the overflow flag
    rather than silently undercount."""
    codes = np.tile(np.arange(4, dtype=np.int8).repeat(24)[None, :96], (2 * N_DEV, 1))
    hi, lo, counts, overflowed = sparse_spectrum_sharded(
        jnp.asarray(codes), 21, mesh, slack=0.05
    )
    assert np.asarray(overflowed).any()


def test_sparse_accumulator_matches_merge(rng):
    import numpy as np

    from cfrk_tpu.ops.sparse import (
        SparseAccumulator,
        merge_sorted_spectra,
        sparse_spectrum,
    )

    parts = []
    acc = SparseAccumulator(merge_every=2)  # force interior folds
    for seed in range(5):
        r = np.random.default_rng(seed)
        codes = r.integers(0, 4, size=(6, 50)).astype(np.int8)
        hi, lo, counts = sparse_spectrum(codes, 20, False)
        trip = (np.asarray(hi), np.asarray(lo), np.asarray(counts))
        parts.append(trip)
        acc.add(*trip)
    assert acc.result() == merge_sorted_spectra(parts)
    keys, counts = acc.result_arrays()
    assert list(keys) == sorted(keys)
    assert counts.sum() == sum(merge_sorted_spectra(parts).values())


def test_sparse_accumulator_fold_fuzz(rng):
    """The searchsorted-merge fold is exact against a dict oracle across
    heavy cross-batch overlap, empty batches, all-hit and all-new folds."""
    import numpy as np

    from cfrk_tpu.ops.sparse import SparseAccumulator

    r = np.random.default_rng(7)
    oracle: dict[int, int] = {}
    acc = SparseAccumulator(merge_every=3)
    for step in range(20):
        if step % 7 == 3:  # an all-zero-count batch folds to nothing
            n, lo = 8, np.zeros(8, dtype=np.int64)
            counts = np.zeros(8, dtype=np.int64)
            hi = np.zeros(8, dtype=np.int64)
        else:
            n = int(r.integers(1, 40))
            # tiny keyspace -> guaranteed collisions across batches
            lo = np.sort(r.integers(0, 37, n)).astype(np.int64)
            hi = np.zeros(n, dtype=np.int64)
            counts = r.integers(0, 5, n).astype(np.int64)
        acc.add(hi, lo, counts)
        # hi is all zeros, so the packed key is just lo
        for key, c in zip(lo.tolist(), counts.tolist()):
            if c > 0:
                oracle[key] = oracle.get(key, 0) + c
    keys, cnts = acc.result_arrays()
    got = dict(zip(keys.tolist(), cnts.tolist()))
    assert got == oracle
    assert list(keys) == sorted(keys.tolist())


def test_fetch_triples_skips_hi_exactly(rng):
    """fetch_triples' host-zero hi substitution (k <= LO_BASES) is
    indistinguishable from a full transfer once counts==0 rows are
    masked — for both small-k (hi skipped) and large-k (hi fetched)."""
    import numpy as np

    from cfrk_tpu.ops.sparse import fetch_triples, sparse_spectrum

    codes = rng.integers(0, 4, size=(4, 60)).astype(np.int8)
    codes[0, 10] = -1  # an invalid window: sentinel hi, count 0
    for k in (12, 20):
        hi, lo, counts = sparse_spectrum(codes, k, False)
        nh, nl, nc = fetch_triples(hi, lo, counts, k)
        fh, fl, fc = np.asarray(hi), np.asarray(lo), np.asarray(counts)
        mask = fc > 0
        assert np.array_equal(nl, fl) and np.array_equal(nc, fc)
        assert np.array_equal(nh[mask], fh[mask])


def _spill_feed(rng, acc, n_batches=30, keyspace=600):
    """Feed random collision-heavy triples; returns the dict oracle."""
    oracle: dict = {}
    for _ in range(n_batches):
        n = int(rng.integers(1, 200))
        lo = rng.integers(0, keyspace, n).astype(np.int64)
        hi = np.zeros(n, dtype=np.int64)
        counts = rng.integers(0, 4, n).astype(np.int64)
        acc.add(hi, lo, counts)
        for key, c in zip(lo.tolist(), counts.tolist()):
            if c > 0:
                oracle[key] = oracle.get(key, 0) + c
    return oracle


def test_spilling_accumulator_matches_unbounded(tmp_path, rng):
    """A budget small enough to force many disk runs must produce the
    exact result of the unbounded accumulator (VERDICT r4 #3)."""
    from cfrk_tpu.ops.sparse import SparseAccumulator, SpillingSparseAccumulator

    acc = SpillingSparseAccumulator(
        str(tmp_path / "spill"), budget_bytes=3 * 4096, merge_every=2
    )
    ref = SparseAccumulator(merge_every=2)
    r1 = np.random.default_rng(101)
    r2 = np.random.default_rng(101)
    want = _spill_feed(r1, ref)
    got_oracle = _spill_feed(r2, acc)
    assert want == got_oracle
    assert acc.run_files, "budget never forced a spill — test is vacuous"
    wk, wc = ref.result_arrays()
    gk, gc = acc.result_arrays()
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gc, wc)
    acc.cleanup_spill()
    assert not (tmp_path / "spill").exists()


def test_spilling_chunked_merge_exact(tmp_path, rng):
    """iter_merged_chunks: tiny chunks, every key in exactly one chunk,
    strictly ascending across chunks, sums exact."""
    from cfrk_tpu.ops.sparse import SparseAccumulator, SpillingSparseAccumulator

    acc = SpillingSparseAccumulator(
        str(tmp_path / "spill"), budget_bytes=3 * 2048, merge_every=1
    )
    ref = SparseAccumulator(merge_every=1)
    r1 = np.random.default_rng(7)
    r2 = np.random.default_rng(7)
    _spill_feed(r1, ref, n_batches=25, keyspace=2000)
    _spill_feed(r2, acc, n_batches=25, keyspace=2000)
    assert len(acc.run_files) >= 2
    chunks = list(acc.iter_merged_chunks(chunk=17))
    allk = np.concatenate([c[0] for c in chunks])
    allc = np.concatenate([c[1] for c in chunks])
    assert (np.diff(allk.astype(np.int64)) > 0).all()  # global sorted-unique
    wk, wc = ref.result_arrays()
    np.testing.assert_array_equal(allk, wk)
    np.testing.assert_array_equal(allc, wc)
    # chunk boundaries: strictly increasing across chunk edges
    for a, b in zip(chunks, chunks[1:]):
        assert a[0][-1] < b[0][0]


def test_spilling_adopt_runs_drops_stale(tmp_path):
    """Resume discipline: spill files not in the checkpointed run list
    (spilled after the last durable checkpoint) are deleted, so the
    replayed batches cannot double-count."""
    from cfrk_tpu.ops.sparse import SpillingSparseAccumulator

    d = str(tmp_path / "spill")
    acc = SpillingSparseAccumulator(d, budget_bytes=1, merge_every=1)
    acc.add(np.zeros(3), np.array([1, 2, 3]), np.array([1, 1, 1]))
    committed = acc.checkpoint_runs()
    acc.add(np.zeros(3), np.array([4, 5, 6]), np.array([1, 1, 1]))
    acc.checkpoint_runs()  # a second run the "checkpoint JSON" never saw
    assert len(acc.run_files) == 2

    fresh = SpillingSparseAccumulator(d, budget_bytes=1, merge_every=1)
    fresh.adopt_runs(committed)
    keys, cnts = fresh.result_arrays()
    assert keys.tolist() == [1, 2, 3]
    import os

    assert len(os.listdir(d)) == 2  # only the committed run's 2 files
    # missing run files must fail loudly, not silently undercount
    fresh2 = SpillingSparseAccumulator(d, budget_bytes=1, merge_every=1)
    with pytest.raises(ValueError):
        fresh2.adopt_runs(["run99999"])
