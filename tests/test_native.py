"""Native C++ ingest/formatter vs pure-Python: byte-for-byte agreement.

All tests run against whichever backend is active; the equality tests
only assert when the compiled extension is present (it is built in CI via
``python setup.py build_ext --inplace`` and shipped in the repo image)."""

import gzip
import json
from pathlib import Path

import numpy as np
import pytest

from cfrk_tpu.format import format_file_bytes
from cfrk_tpu.io.fasta import encode_seq, iter_fasta, read_fasta_encoded
from cfrk_tpu.io.native import (
    HAVE_NATIVE,
    format_rows_bytes,
    parse_encode_bytes,
    read_fasta_encoded_native,
)

DATA = Path(__file__).parent / "data"

MESSY_FASTA = (
    b">r0 header with spaces\n"
    b"ACGTACGT\n"
    b"NNACGT\r\n"          # multi-line record, CRLF, ambiguity codes
    b"\n"                   # blank line inside a record
    b">r1\nacgtn\n"         # lower case
    b">empty\n"             # empty record
    b">r2\nTTTT"            # no trailing newline
)


def test_parse_encode_matches_python_messy():
    got = parse_encode_bytes(MESSY_FASTA)
    import io

    want = [encode_seq(s) for _, s in iter_fasta(io.BytesIO(MESSY_FASTA))]
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_parser_on_golden_samples():
    for name in ("seq1.fasta.gz", "seq2.fasta.gz"):
        native = read_fasta_encoded_native(DATA / name)
        python = read_fasta_encoded(DATA / name)
        assert len(native) == len(python)
        for g, w in zip(native, python):
            np.testing.assert_array_equal(g, w)


def test_format_rows_bytes_matches_python():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 2**31 - 1, size=(37, 16)).astype(np.int32)
    assert format_rows_bytes(counts) == format_file_bytes(counts)
    cont = format_rows_bytes(counts, first=False)
    assert cont == b"\n" + format_file_bytes(counts)


def test_format_rows_bytes_extremes():
    counts = np.array([[0, 1, 2147483647, 0]], dtype=np.int32)
    assert format_rows_bytes(counts) == b"0:0 1:1 2:2147483647 3:0 "


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_golden_sha256():
    """Native parse + XLA count + native format == golden bytes."""
    import hashlib

    from cfrk_tpu.pipeline.count import count_reads

    manifest = json.loads((DATA / "goldens.json").read_text())
    name, meta = sorted(manifest["files"].items())[1]  # seq2: small
    reads = read_fasta_encoded_native(DATA / name)
    counts = count_reads(reads, manifest["k"])
    data = format_rows_bytes(counts)
    assert hashlib.sha256(data).hexdigest() == meta["sha256"]


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_parser_throughput_sanity():
    """The native parser should beat the Python one on a large buffer."""
    import time

    rng = np.random.default_rng(1)
    blob = []
    for i in range(2000):
        seq = rng.integers(0, 4, size=200)
        blob.append(b">r%d\n" % i)
        blob.append(bytes(bytearray(b"ACGT"[c] for c in seq)) + b"\n")
    data = b"".join(blob)

    t0 = time.perf_counter()
    native = parse_encode_bytes(data)
    t_native = time.perf_counter() - t0

    import io

    t0 = time.perf_counter()
    python = [encode_seq(s) for _, s in iter_fasta(io.BytesIO(data))]
    t_python = time.perf_counter() - t0

    for g, w in zip(native, python):
        np.testing.assert_array_equal(g, w)
    # Deterministic dispatch guard (a wall-clock comparison is flaky on
    # loaded CI runners): the extension must actually be loaded here.
    from cfrk_tpu.io.native import HAVE_NATIVE, _fastaio

    assert HAVE_NATIVE and _fastaio is not None


def test_format_parallel_path_parity():
    """Outputs past the ~4 MB threshold format on multiple threads
    (row-contiguous segments); bytes must be identical to the Python
    formatter, including the leading-newline row framing."""
    import numpy as np

    from cfrk_tpu.format import format_file_bytes, format_rows_pairs
    from cfrk_tpu.io.native import format_pairs_bytes, format_rows_bytes

    rng = np.random.default_rng(1)
    counts = rng.integers(0, 150, size=(60000, 16)).astype(np.int32)
    want = format_file_bytes(counts)  # ~5.5 MB
    assert format_rows_bytes(counts, first=True) == want
    assert format_rows_bytes(counts, first=False) == b"\n" + want

    idx = np.sort(rng.integers(0, 65536, size=(8192, 143)), axis=1)
    cnt = rng.integers(0, 4, size=(8192, 143)).astype(np.int32)
    want2 = b"\n".join(format_rows_pairs(idx.astype(np.int32), cnt))
    assert format_pairs_bytes(idx.astype(np.int32), cnt, first=True) == want2


def test_parse_encode_bytes_fallback_sniffs_fastq(monkeypatch):
    """Without the extension, parse_encode_bytes must still accept FASTQ
    (the C++ parse_encode sniffs '@' records; the fallback has to match)."""
    import numpy as np

    import cfrk_tpu.io.native as native
    from cfrk_tpu.io.fasta import encode_seq

    monkeypatch.setattr(native, "_fastaio", None)
    data = b"@r0\nACGTN\n+\nIIIII\n@r1\nGGCC\n+\nIIII\n"
    got = native.parse_encode_bytes(data)
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], encode_seq(b"ACGTN"))
    np.testing.assert_array_equal(got[1], encode_seq(b"GGCC"))


def test_format_pairs_bytes_matches_python():
    import numpy as np

    from cfrk_tpu.format import format_rows_pairs
    from cfrk_tpu.io.native import format_pairs_bytes

    rng = np.random.default_rng(0)
    idx = np.sort(rng.integers(0, 1000, size=(9, 12)), axis=1).astype(np.int32)
    counts = rng.integers(0, 4, size=(9, 12)).astype(np.int32)  # zeros mixed in
    want = b"\n".join(format_rows_pairs(idx, counts))
    assert format_pairs_bytes(idx, counts) == want
    assert format_pairs_bytes(idx, counts, first=False) == b"\n" + want


def test_format_dense_pairs_matches_dense_formatter():
    """Dense-from-pairs == dense formatter on the densified matrix,
    with sentinel (count-0) cells interleaved anywhere in the row, and
    the pure-Python fallback byte-identical to the C path."""
    import numpy as np

    import cfrk_tpu.io.native as N
    from cfrk_tpu.io.native import format_dense_pairs_bytes, format_rows_bytes

    rng = np.random.default_rng(7)
    n, w, fk = 11, 9, 64
    dense = np.zeros((n, fk), np.int32)
    idx = np.full((n, w), fk, np.int32)
    cnt = np.zeros((n, w), np.int32)
    for r in range(n):
        m = int(rng.integers(0, w + 1))
        cols = np.sort(rng.choice(fk, size=m, replace=False))
        vals = rng.integers(1, 100, size=m).astype(np.int32)
        dense[r, cols] = vals
        pos = np.sort(rng.choice(w, size=m, replace=False))
        idx[r, pos] = cols
        cnt[r, pos] = vals
    for first in (True, False):
        got = format_dense_pairs_bytes(idx, cnt, fk, first=first)
        assert got == format_rows_bytes(dense, first=first)
    # Pure-Python fallback (extension absent / stale .so).
    real = N._fastaio
    N._fastaio = None
    try:
        fb = N.format_dense_pairs_bytes(idx, cnt, fk, first=False)
    finally:
        N._fastaio = real
    assert fb == format_dense_pairs_bytes(idx, cnt, fk, first=False)


def test_native_fastq_empty_read_stays_in_sync():
    """Zero-length reads (quality-trimmed FASTQ) must not desync the
    4-line cycle (code-review finding; the '+' line was being encoded)."""
    import numpy as np

    from cfrk_tpu.io.native import parse_encode_bytes

    data = b"@r1\nACGT\n+\nIIII\n@r2\n\n+\n\n@r3\nGGTT\n+\nIIII\n"
    reads = parse_encode_bytes(data)
    assert len(reads) == 3
    np.testing.assert_array_equal(reads[0], [0, 1, 2, 3])
    assert reads[1].size == 0
    np.testing.assert_array_equal(reads[2], [2, 2, 3, 3])


def test_format_pairs64_matches_python():
    import numpy as np

    from cfrk_tpu.format import format_rows_pairs
    from cfrk_tpu.io.native import format_pairs_bytes

    rng = np.random.default_rng(1)
    idx = np.sort(
        rng.integers(0, 2**62, size=(7, 9), dtype=np.uint64), axis=1
    )
    counts = rng.integers(0, 3, size=(7, 9)).astype(np.int32)
    want = b"\n".join(format_rows_pairs(idx, counts))
    assert format_pairs_bytes(idx, counts) == want
    assert format_pairs_bytes(idx, counts, first=False) == b"\n" + want


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_chunked_stream_parser_matches_python(tmp_path):
    """iter_record_blocks_native must reproduce iter_encoded_with_offsets
    (records, lengths AND byte offsets) across chunk boundaries: parse
    with a tiny block size so records straddle blocks."""
    from cfrk_tpu.io.fasta import iter_encoded_with_offsets
    from cfrk_tpu.io.native import iter_record_blocks_native

    rng = np.random.default_rng(0)
    reads = []
    for i in range(97):
        n = int(rng.integers(1, 300))
        reads.append(bytes(rng.choice(np.frombuffer(b"ACGTNacgt", dtype=np.uint8), size=n)))
    for fmt in ("fasta", "fastq"):
        p = tmp_path / f"x.{fmt}"
        with open(p, "wb") as f:
            for i, r in enumerate(reads):
                if fmt == "fasta":
                    # multi-line records exercise the carry logic
                    f.write(b">read%d\n" % i)
                    for j in range(0, len(r), 61):
                        f.write(r[j : j + 61] + b"\n")
                else:
                    f.write(b"@read%d\n" % i + r + b"\n+\n" + b"I" * len(r) + b"\n")
        want = list(iter_encoded_with_offsets(p))
        for block in (64, 1 << 20):  # straddling and single-block
            got_codes, got_lens, got_offs = [], [], []
            for flat, lens, offs in iter_record_blocks_native(p, block_size=block):
                starts = np.concatenate(([0], np.cumsum(lens)))
                for i in range(len(lens)):
                    got_codes.append(flat[starts[i] : starts[i + 1]])
                got_lens.extend(lens.tolist())
                got_offs.extend(offs.tolist())
            assert len(got_codes) == len(want)
            for (wc, woff), gc, goff in zip(want, got_codes, got_offs):
                np.testing.assert_array_equal(gc, wc)
                assert goff == woff


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_chunked_stream_parser_start_offset(tmp_path):
    """Resume from a checkpointed offset: records after it must match."""
    from cfrk_tpu.io.native import iter_record_blocks_native

    p = tmp_path / "x.fasta"
    p.write_bytes(b">a\nACGT\n>b\nGGTT\nAAC\n>c\nTT\n")
    all_offs = []
    all_reads = []
    for flat, lens, offs in iter_record_blocks_native(p):
        starts = np.concatenate(([0], np.cumsum(lens)))
        for i in range(len(lens)):
            all_reads.append(flat[starts[i] : starts[i + 1]])
        all_offs.extend(offs.tolist())
    resumed = []
    for flat, lens, offs in iter_record_blocks_native(p, start_offset=all_offs[0]):
        starts = np.concatenate(([0], np.cumsum(lens)))
        for i in range(len(lens)):
            resumed.append(flat[starts[i] : starts[i + 1]])
        assert (offs > all_offs[0]).all()
    assert len(resumed) == 2
    for g, w in zip(resumed, all_reads[1:]):
        np.testing.assert_array_equal(g, w)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_fastq_validation_matches_python():
    """Malformed FASTQ must raise ValueError from BOTH parsers with the
    same class of error (ADVICE round 1: the C++ branch was silent)."""
    import io

    from cfrk_tpu.io.fasta import iter_fastq
    from cfrk_tpu.io.native import _fastaio

    bad = {
        "missing '+' line": b"@r1\nACGT\nIIII\n@r2\nGG\n+\nII\n",
        "quality length mismatch": b"@r1\nACGT\n+\nIII\n",
        "malformed FASTQ header": b"@r1\nACGT\n+\nIIII\nr2\nGG\n+\nII\n",
        "truncated": b"@r1\nACGT\n",
    }
    for name, data in bad.items():
        with pytest.raises(ValueError):
            list(iter_fastq(io.BytesIO(data)))
        with pytest.raises(ValueError):
            _fastaio.parse_encode(data)
        with pytest.raises(ValueError):
            _fastaio.parse_encode_stream(data, True, True)


def test_pad_reads_flat_matches_pad_reads():
    from cfrk_tpu.pipeline.batch import pad_reads, pad_reads_flat

    rng = np.random.default_rng(5)
    reads = [
        rng.integers(-1, 4, size=int(rng.integers(0, 40))).astype(np.int8)
        for _ in range(23)
    ]
    flat = np.concatenate(reads) if reads else np.empty(0, np.int8)
    lens = np.array([len(r) for r in reads], dtype=np.int64)
    a = pad_reads(reads, 32, 64)
    b = pad_reads_flat(flat, lens, 32, 64)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.lengths, b.lengths)
    assert a.n_reads == b.n_reads
    with pytest.raises(ValueError, match="do not sum"):
        pad_reads_flat(flat[:-1], lens, 32, 64)


def test_stream_batches_native_vs_python_parity(tmp_path, monkeypatch):
    """stream_batches must produce IDENTICAL batches through the native
    flat path and the pure-Python per-record path."""
    import cfrk_tpu.pipeline.stream as st

    rng = np.random.default_rng(9)
    p = tmp_path / "x.fasta"
    with open(p, "wb") as f:
        for i in range(37):
            n = int(rng.integers(1, 200))
            f.write(b">r%d\n" % i + bytes(rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=n)) + b"\n")

    native = list(st.stream_batches(p, 5, 8))
    monkeypatch.setattr("cfrk_tpu.io.native.HAVE_STREAM_NATIVE", False)
    python = list(st.stream_batches(p, 5, 8))
    assert len(native) == len(python) == 5
    for a, b in zip(native, python):
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.lengths, b.lengths)
        assert a.n_reads == b.n_reads
        assert a.end_offset == b.end_offset


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_fastq_trailing_bare_cr_matches_python():
    """A stray final '\\r' after the last record is an rstripped-empty
    line the Python parser skips — the native stream parser must accept
    it identically instead of raising 'malformed FASTQ header'."""
    import io

    from cfrk_tpu.io.fasta import iter_fastq
    from cfrk_tpu.io.native import _fastaio

    data = b"@r1\nACGT\n+\nIIII\n\r"
    py = [s for _, s in iter_fastq(io.BytesIO(data))]
    assert py == [b"ACGT"]
    codes_b, lens_b, offs_b, consumed = _fastaio.parse_encode_stream(
        data, True, True
    )
    lens = np.frombuffer(lens_b, dtype=np.int64)
    assert lens.tolist() == [4]
    # Not final: the CR might start a line in the next chunk — it must
    # stay in the carry (consumed stops after the complete record).
    _, lens_b2, _, consumed2 = _fastaio.parse_encode_stream(
        data, True, False
    )
    assert np.frombuffer(lens_b2, dtype=np.int64).tolist() == [4]
    assert consumed2 == len(data) - 1


@pytest.mark.skipif(not HAVE_NATIVE, reason="native extension not built")
def test_native_min_qual_matches_python(tmp_path):
    """Quality masking parity: the C++ parsers (slurp AND chunked) must
    mask exactly the bases the Python parser masks, over random quality
    strings spanning the whole Phred+33 range."""
    from cfrk_tpu.io.fasta import iter_encoded_with_offsets
    from cfrk_tpu.io.native import (
        HAVE_QUAL_NATIVE,
        iter_record_blocks_native,
        parse_encode_bytes,
    )

    assert HAVE_QUAL_NATIVE  # fresh build must support the argument
    rng = np.random.default_rng(3)
    buf = bytearray()
    for i in range(61):
        n = int(rng.integers(0, 120))
        seq = bytes(rng.choice(np.frombuffer(b"ACGTNacgt", dtype=np.uint8), size=n))
        qual = bytes((33 + rng.integers(0, 42, size=n)).astype(np.uint8))
        buf += b"@r%d\n" % i + seq + b"\n+\n" + qual + b"\n"
    p = tmp_path / "q.fastq"
    p.write_bytes(bytes(buf))

    for q in (0, 1, 20, 41):
        import io as _io

        from cfrk_tpu.io.fasta import encode_seq, iter_reads

        want = [
            encode_seq(s) for _, s in iter_reads(_io.BytesIO(bytes(buf)), q)
        ]
        got = parse_encode_bytes(bytes(buf), q)
        assert len(got) == len(want)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(g, w)
        # chunked parser, straddling blocks
        got2 = []
        for flat, lens, _ in iter_record_blocks_native(
            p, block_size=64, min_qual=q
        ):
            starts = np.concatenate(([0], np.cumsum(lens)))
            got2.extend(flat[starts[i]: starts[i + 1]] for i in range(len(lens)))
        assert len(got2) == len(want)
        for w, g in zip(want, got2):
            np.testing.assert_array_equal(g, w)
        # pure-Python offsets path agrees too
        got3 = [c for c, _ in iter_encoded_with_offsets(p, min_qual=q)]
        for w, g in zip(want, got3):
            np.testing.assert_array_equal(g, w)


def test_fold_pairs_into_native_vs_fallback():
    """The threaded native fold and the NumPy fallback must produce the
    same table over every drain dtype combination (uint16/int32 idx x
    uint8/int16/int32/int64 counts), including sentinel/padding cells
    (count 0) and the uint16-wrapped sentinel at idx 0."""
    import cfrk_tpu.io.native as native
    from cfrk_tpu.io.native import fold_pairs_into

    rng = np.random.default_rng(9)
    k = 8
    n = 200_000
    base_idx = rng.integers(0, 4**k, size=n).astype(np.int64)
    base_cnt = rng.integers(0, 5, size=n).astype(np.int64)  # zeros included
    for idt in (np.uint16, np.int32, np.uint32):
        for cdt in (np.uint8, np.int16, np.int32, np.int64):
            idx = base_idx.astype(idt)
            cnt = base_cnt.astype(cdt)
            ref = np.zeros(4**k, dtype=np.int64)
            keep = base_cnt > 0
            ref += np.bincount(
                base_idx[keep], weights=base_cnt[keep], minlength=4**k
            ).astype(np.int64)
            got = np.zeros(4**k, dtype=np.int64)
            fold_pairs_into(got, idx, cnt)
            np.testing.assert_array_equal(got, ref)
            if native.HAVE_FOLD_NATIVE:
                # force the fallback path and re-check byte equality
                fb = np.zeros(4**k, dtype=np.int64)
                native.HAVE_FOLD_NATIVE = False
                try:
                    fold_pairs_into(fb, idx, cnt)
                finally:
                    native.HAVE_FOLD_NATIVE = True
                np.testing.assert_array_equal(fb, ref)
    # out-of-range idx (int32 sentinel 4**k) with positive count is
    # DROPPED, not a crash (defensive bound — kernels never emit it).
    t = np.zeros(4**k, dtype=np.int64)
    fold_pairs_into(
        t, np.array([4**k, 1], dtype=np.int32), np.array([3, 2], np.int32)
    )
    assert t.sum() == 2 and t[1] == 2


def test_format_kmer_tsv_native_matches_python():
    """Native sparse-tsv formatter must be byte-identical to the Python
    decode_key writer for random keys/counts, min_count filters, and
    the full k range."""
    import numpy as np

    from cfrk_tpu.io.native import HAVE_KMER_TSV_NATIVE, format_kmer_tsv_bytes
    from cfrk_tpu.ops.sparse import decode_key

    if not HAVE_KMER_TSV_NATIVE:
        import pytest

        pytest.skip("extension without format_kmer_tsv")
    rng = np.random.default_rng(21)
    for k in (1, 8, 15, 16, 31):
        n = 500
        keys = np.sort(
            rng.integers(0, 4**min(k, 31), n, dtype=np.uint64)
        )
        counts = rng.integers(0, 5, n).astype(np.int64)
        counts[7] = 10**12  # > 32-bit count
        for mc in (1, 2):
            want = "".join(
                f"{decode_key(int(key), k)}\t{cnt}\n"
                for key, cnt in zip(keys.tolist(), counts.tolist())
                if cnt >= mc
            ).encode()
            got = format_kmer_tsv_bytes(keys, counts, k, mc)
            assert got == want, (k, mc)


def test_fold_pairs_f_order_zero_copy_path():
    """Column-major (device-tunnel-layout) pair buffers must fold to
    the exact same table as C-order — the zero-copy transpose path."""
    import numpy as np

    from cfrk_tpu.io.native import fold_pairs_into

    rng = np.random.default_rng(33)
    idx_c = rng.integers(0, 4**9, size=(512, 142)).astype(np.int32)
    cnt_c = rng.integers(0, 3, size=(512, 142)).astype(np.uint8)
    idx_f = np.asfortranarray(idx_c)
    cnt_f = np.asfortranarray(cnt_c)
    assert idx_f.flags.f_contiguous and not idx_f.flags.c_contiguous
    t1 = np.zeros(4**9, np.int64)
    t2 = np.zeros(4**9, np.int64)
    fold_pairs_into(t1, idx_c, cnt_c)
    fold_pairs_into(t2, idx_f, cnt_f)
    np.testing.assert_array_equal(t1, t2)
    # mixed layouts (one C, one F) must still be exact (copy path)
    t3 = np.zeros(4**9, np.int64)
    fold_pairs_into(t3, idx_f, cnt_c)
    np.testing.assert_array_equal(t1, t3)


def test_fetched_to_triples_f_order_views():
    import numpy as np

    from cfrk_tpu.ops.sparse import fetched_to_triples

    rng = np.random.default_rng(34)
    idx = rng.integers(0, 100, size=(16, 9)).astype(np.int32)
    cnt = rng.integers(0, 3, size=(16, 9)).astype(np.uint8)
    hi0, lo0, c0 = fetched_to_triples([idx, cnt], 9)
    hiF, loF, cF = fetched_to_triples(
        [np.asfortranarray(idx), np.asfortranarray(cnt)], 9
    )
    # cell order may differ; the (key, count) MULTISET must not
    a = sorted(zip(lo0.tolist(), c0.tolist()))
    b = sorted(zip(loF.tolist(), cF.tolist()))
    assert a == b
