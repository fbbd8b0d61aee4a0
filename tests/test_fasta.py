"""FASTA parser + 2-bit encoder tests (reference src/fastaIO.h semantics)."""

import gzip

import numpy as np
import pytest

from cfrk_tpu.io.fasta import (
    ENCODE_LUT,
    decode_codes,
    encode_seq,
    iter_fasta,
    read_fasta,
    read_fasta_encoded,
)


def test_encode_contract():
    # A/a→0 C/c→1 G/g→2 T/t→3, everything else → -1 (src/fastaIO.h:123-139)
    codes = encode_seq(b"ACGTacgtNnRYX-*")
    assert codes[:8].tolist() == [0, 1, 2, 3, 0, 1, 2, 3]
    assert (codes[8:] == -1).all()


def test_lut_covers_all_bytes():
    assert ENCODE_LUT.shape == (256,)
    assert set(np.unique(ENCODE_LUT)) == {-1, 0, 1, 2, 3}


def test_decode_roundtrip():
    assert decode_codes(encode_seq(b"ACGTN")) == b"ACGTN"


def _write(tmp_path, text, name="t.fasta"):
    p = tmp_path / name
    p.write_bytes(text)
    return str(p)


def test_basic_records(tmp_path):
    p = _write(tmp_path, b">r1 desc\nACGT\n>r2\nTTTT\n")
    headers, seqs = read_fasta(p)
    assert headers == [b"r1 desc", b"r2"]
    assert seqs == [b"ACGT", b"TTTT"]


def test_multiline_concatenated_without_newlines(tmp_path):
    # The reference keeps interior '\n' bytes in multi-line reads
    # (src/fastaIO.h:62-65) — a bug we fix: lines concatenate cleanly.
    p = _write(tmp_path, b">r\nAAA\nCCC\nGG\n")
    _, seqs = read_fasta(p)
    assert seqs == [b"AAACCCGG"]


def test_crlf_and_blank_lines(tmp_path):
    p = _write(tmp_path, b">r\r\nACGT\r\n\r\n>r2\nGG\n")
    headers, seqs = read_fasta(p)
    assert seqs == [b"ACGT", b"GG"]


def test_no_final_newline(tmp_path):
    p = _write(tmp_path, b">r\nACGT")
    _, seqs = read_fasta(p)
    assert seqs == [b"ACGT"]


def test_empty_file(tmp_path):
    p = _write(tmp_path, b"")
    assert read_fasta(p) == ([], [])


def test_gzip_transparent(tmp_path):
    raw = b">r\nACGTACGT\n>q\nTTTT\n"
    p = tmp_path / "t.fasta.gz"
    p.write_bytes(gzip.compress(raw))
    _, seqs = read_fasta(str(p))
    assert seqs == [b"ACGTACGT", b"TTTT"]


def test_read_fasta_encoded(tmp_path):
    p = _write(tmp_path, b">r\nACGN\n")
    reads = read_fasta_encoded(p)
    assert len(reads) == 1
    assert reads[0].tolist() == [0, 1, 2, -1]
    assert reads[0].dtype == np.int8
