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


def test_iter_fastq_and_sniffing(tmp_path):
    import gzip as _gzip

    import numpy as np

    from cfrk_tpu.io.fasta import iter_fastq, iter_reads, read_fasta_encoded

    fq = (
        b"@r0 desc\nACGT\n+\nIIII\n"
        b"@r1\nNNGCA\n+anything\n!!!!!\n"
    )
    p = tmp_path / "r.fastq"
    p.write_bytes(fq)
    recs = list(iter_fastq(p))
    assert recs == [(b"r0 desc", b"ACGT"), (b"r1", b"NNGCA")]
    # sniffed dispatch, plain + gzip
    assert list(iter_reads(p)) == recs
    gz = tmp_path / "r.fastq.gz"
    gz.write_bytes(_gzip.compress(fq))
    assert list(iter_reads(gz)) == recs
    # encoded through the top-level reader (native or fallback)
    reads = read_fasta_encoded(gz)
    np.testing.assert_array_equal(reads[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(reads[1], [-1, -1, 2, 1, 0])


def test_fastq_malformed_raises(tmp_path):
    import pytest as _pytest

    from cfrk_tpu.io.fasta import iter_fastq

    p = tmp_path / "bad.fastq"
    p.write_bytes(b"@r0\nACGT\nOOPS\nIIII\n")
    with _pytest.raises(ValueError, match="missing"):
        list(iter_fastq(p))


def test_native_fastq_matches_python(tmp_path):
    import numpy as np

    from cfrk_tpu.io.fasta import encode_seq, iter_fastq
    from cfrk_tpu.io.native import parse_encode_bytes

    rng = np.random.default_rng(0)
    blob = []
    seqs = []
    for i in range(50):
        s = bytes(bytearray(b"ACGTN"[c] for c in rng.integers(0, 5, 40)))
        seqs.append(s)
        blob.append(b"@r%d\n" % i + s + b"\n+\n" + b"I" * len(s) + b"\n")
    data = b"".join(blob)
    got = parse_encode_bytes(data)
    assert len(got) == 50
    for g, s in zip(got, seqs):
        np.testing.assert_array_equal(g, encode_seq(s))


def test_iter_reads_fastq_with_leading_blank_line(tmp_path):
    from cfrk_tpu.io.fasta import iter_reads

    p = tmp_path / "lead.fastq"
    p.write_bytes(b"\n@r0\nACGT\n+\nIIII\n")
    recs = list(iter_reads(p))
    assert recs == [(b"r0", b"ACGT")]


def test_crlf_line_endings_all_parsers(tmp_path):
    """Windows CRLF FASTA parses identically to LF in the pure-Python,
    native, and streaming parsers — '\\r' must never leak into codes."""
    import numpy as np

    from cfrk_tpu.io.fasta import read_fasta_encoded
    from cfrk_tpu.pipeline.stream import stream_batches

    data = b">r1\r\nACGTACGT\r\nACGT\r\n>r2\r\nTTTT\r\n"
    crlf = tmp_path / "crlf.fasta"
    lf = tmp_path / "lf.fasta"
    crlf.write_bytes(data)
    lf.write_bytes(data.replace(b"\r\n", b"\n"))

    def all_reads(path):
        out = [r.tolist() for r in read_fasta_encoded(path)]
        for b in stream_batches(path, 2, 4):
            for i in range(b.n_reads):
                out.append(b.codes[i, : b.lengths[i]].tolist())
        return out

    got_crlf, got_lf = all_reads(crlf), all_reads(lf)
    assert got_crlf == got_lf
    assert got_crlf[0] == [0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 3]
    assert all(-1 not in r for r in got_crlf)


def test_min_qual_masks_low_quality_bases(tmp_path):
    """Phred+33 quality filtering: bases with quality < Q become N
    (invalid code) in every parser entry point."""
    import io as _io

    from cfrk_tpu.io.fasta import (
        iter_encoded_with_offsets,
        iter_reads,
        read_fasta_encoded,
    )

    recs = b"@r0\nACGTACGT\n+\nIIII!!II\n@r1\nTTTT\n+\n!!!!\n"
    p = tmp_path / "q.fastq"
    p.write_bytes(recs)

    # 'I' = phred 40, '!' = phred 0; Q=20 masks the '!' positions.
    seqs = [s for _, s in iter_reads(_io.BytesIO(recs), 20)]
    assert seqs == [b"ACGTNNGT", b"NNNN"]

    codes = read_fasta_encoded(p, 20)
    np.testing.assert_array_equal(codes[0], [0, 1, 2, 3, -1, -1, 2, 3])
    np.testing.assert_array_equal(codes[1], [-1, -1, -1, -1])

    offs = [c for c, _ in iter_encoded_with_offsets(p, min_qual=20)]
    np.testing.assert_array_equal(offs[0], codes[0])
    np.testing.assert_array_equal(offs[1], codes[1])

    # Q=0 is off: identical to the unfiltered parse.
    base = read_fasta_encoded(p)
    for a, b in zip(read_fasta_encoded(p, 0), base):
        np.testing.assert_array_equal(a, b)


def test_min_qual_is_noop_on_fasta(tmp_path):
    """FASTA records carry no qualities — min_qual must not alter them."""
    from cfrk_tpu.io.fasta import read_fasta_encoded

    p = tmp_path / "a.fasta"
    p.write_bytes(b">r0\nACGT\n>r1\nTTNT\n")
    for a, b in zip(read_fasta_encoded(p, 30), read_fasta_encoded(p)):
        np.testing.assert_array_equal(a, b)
