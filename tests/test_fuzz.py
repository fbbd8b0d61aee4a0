"""Cross-implementation fuzz: every impl must agree with the NumPy spec
across random shapes, k values, N rates, and canonical modes."""

import numpy as np
import pytest

from cfrk_tpu.ops.perread import count_perread
from cfrk_tpu.ops.reference import count_perread_np, spectrum_np
from cfrk_tpu.ops.spectrum import spectrum


def _case(seed):
    rng = np.random.default_rng(seed)
    b = int(rng.integers(1, 20))
    lo = int(rng.integers(1, 40))
    hi = lo + int(rng.integers(1, 120))
    n_frac = float(rng.choice([0.0, 0.02, 0.3]))
    reads = []
    for _ in range(b):
        ln = int(rng.integers(lo, hi + 1))
        r = rng.integers(0, 4, size=ln).astype(np.int8)
        r[rng.random(ln) < n_frac] = -1
        reads.append(r)
    ml = max(len(r) for r in reads)
    codes = np.full((b, ml), -1, dtype=np.int8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = r
    return reads, codes


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("canonical", [False, True])
def test_perread_impls_vs_numpy_spec(seed, canonical):
    _, codes = _case(seed)
    rng = np.random.default_rng(seed + 1000)
    k = int(rng.integers(1, 9))
    if codes.shape[1] < k:
        codes = np.pad(codes, ((0, 0), (0, k - codes.shape[1])),
                       constant_values=-1)
    # padding cols are invalid and count nothing, so the padded batch
    # must agree with the spec applied row-by-row.
    want_padded = count_perread_np(list(codes), k, canonical)
    impls = ["compare"] if 4**k <= 64 else ["matmul", "scatter", "host", "pallas"]
    for impl in impls:
        got = np.asarray(
            count_perread(codes, k, canonical=canonical, impl=impl)
        )
        np.testing.assert_array_equal(got, want_padded, err_msg=f"{impl} k={k}")


@pytest.mark.parametrize("seed", range(4))
def test_spectrum_impls_vs_numpy_spec(seed):
    _, codes = _case(seed + 50)
    rng = np.random.default_rng(seed + 2000)
    k = int(rng.integers(1, 9))
    if codes.shape[1] < k:
        codes = np.pad(codes, ((0, 0), (0, k - codes.shape[1])),
                       constant_values=-1)
    want = spectrum_np(list(codes), k).astype(np.int64)
    for impl in ("matmul", "scatter", "pallas"):
        got = np.asarray(spectrum(codes, k, impl=impl), dtype=np.int64)
        np.testing.assert_array_equal(got, want, err_msg=f"{impl} k={k}")
