"""Byte-exact golden equality with the reference implementation at k=2.

The contract (SURVEY.md §4): running on the sample FASTAs at k=2 must
produce `.cfrk` bytes identical to the reference's checked-in goldens.
The original sample FASTAs were LFS-stripped from the reference mirror,
so tests/data/seqN.fasta.gz are reconstructions from the goldens
themselves (tools/reconstruct_fasta.py, Eulerian trail decomposition) —
any read set with the same per-read dimer histograms is an equally valid
input, and byte equality of the output is what is being pinned.

Anchors: SHA256 of the golden files (tests/data/goldens.json).  When the
reference checkout is present (/root/reference), a direct byte diff runs
too.
"""

import hashlib
import json
import os
from pathlib import Path

import numpy as np
import pytest

from cfrk_tpu.format import format_file_bytes
from cfrk_tpu.io.fasta import read_fasta_encoded
from cfrk_tpu.ops.reference import count_perread_np
from cfrk_tpu.pipeline.count import count_reads

DATA = Path(__file__).parent / "data"
MANIFEST = json.loads((DATA / "goldens.json").read_text())
REFERENCE_TEST_DIR = Path("/root/reference/test")


def _cases():
    return sorted(MANIFEST["files"].items())


@pytest.mark.parametrize("fasta_name,meta", _cases())
def test_golden_sha256_byte_exact(fasta_name, meta):
    """Full pipeline (parse → batch → XLA count → format) vs golden hash."""
    reads = read_fasta_encoded(DATA / fasta_name)
    assert len(reads) == meta["n_reads"]
    counts = count_reads(reads, MANIFEST["k"])
    data = format_file_bytes(counts)
    assert hashlib.sha256(data).hexdigest() == meta["sha256"]


@pytest.mark.parametrize("fasta_name,meta", _cases())
def test_golden_direct_diff_when_reference_present(fasta_name, meta):
    golden_path = REFERENCE_TEST_DIR / meta["golden"]
    if not golden_path.exists():
        pytest.skip("reference checkout not available")
    reads = read_fasta_encoded(DATA / fasta_name)
    counts = count_reads(reads, MANIFEST["k"])
    assert format_file_bytes(counts) == golden_path.read_bytes()


@pytest.mark.parametrize("fasta_name,meta", _cases())
def test_numpy_spec_agrees_on_goldens(fasta_name, meta):
    """The NumPy executable spec independently reproduces the goldens."""
    reads = read_fasta_encoded(DATA / fasta_name)
    data = format_file_bytes(count_perread_np(reads, MANIFEST["k"]))
    assert hashlib.sha256(data).hexdigest() == meta["sha256"]
