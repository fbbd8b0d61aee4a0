"""Pin the .cfrk byte-format contract (reference src/main.cu:26-62)."""

import io

import numpy as np
import pytest

from cfrk_tpu.format import CfrkWriter, format_file_bytes, format_rows, parse_cfrk


def test_single_row_format():
    counts = np.array([[7, 0, 3, 12]])
    assert format_file_bytes(counts) == b"0:7 1:0 2:3 3:12 "


def test_rows_joined_no_trailing_newline():
    counts = np.array([[1, 2], [3, 4], [0, 0]])
    data = format_file_bytes(counts)
    assert data == b"0:1 1:2 \n0:3 1:4 \n0:0 1:0 "
    assert not data.endswith(b"\n")


def test_every_row_has_trailing_space():
    counts = np.arange(32).reshape(2, 16)
    for row in format_rows(counts):
        assert row.endswith(b" ")
        assert not row.startswith(b" ")


def test_dense_including_zeros():
    counts = np.zeros((1, 16), dtype=np.int32)
    row = format_rows(counts)[0]
    assert row.count(b":") == 16


def test_fast_and_slow_paths_agree():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 1000, size=(200, 16))
    fast = format_file_bytes(counts)           # 16 <= 64 wide, >= 64 rows
    slow = b"\n".join(
        ("".join(f"{i}:{c} " for i, c in enumerate(r))).encode() for r in counts
    )
    assert fast == slow


def test_parse_roundtrip():
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 99, size=(37, 64)).astype(np.int64)
    assert (parse_cfrk(format_file_bytes(counts)) == counts).all()


def test_streaming_writer_matches_oneshot():
    rng = np.random.default_rng(2)
    counts = rng.integers(0, 50, size=(100, 16))
    buf = io.BytesIO()
    w = CfrkWriter(buf)
    for i in range(0, 100, 7):
        w.write_batch(counts[i : i + 7])
    assert buf.getvalue() == format_file_bytes(counts)


def test_empty_batches_between_writes():
    counts = np.array([[1, 2], [3, 4]])
    buf = io.BytesIO()
    w = CfrkWriter(buf)
    w.write_batch(counts[:1])
    w.write_batch(counts[:0])
    w.write_batch(counts[1:])
    assert buf.getvalue() == format_file_bytes(counts)


def test_golden_fragment():
    # First row of the reference golden test/out-seq2.cfrk, verified byte-wise.
    counts = np.array([[7, 6, 10, 8, 4, 5, 14, 5, 12, 15, 18, 15, 8, 3, 17, 3]])
    assert (
        format_file_bytes(counts)
        == b"0:7 1:6 2:10 3:8 4:4 5:5 6:14 7:5 8:12 9:15 10:18 11:15 12:8 13:3 14:17 15:3 "
    )


def test_format_rows_nonzero():
    import numpy as np

    from cfrk_tpu.format import format_rows_nonzero

    counts = np.array([[0, 3, 0, 1], [0, 0, 0, 0], [7, 0, 0, 0]])
    assert format_rows_nonzero(counts) == [b"1:3 3:1 ", b"", b"0:7 "]


def test_cfrk_writer_nonzero(tmp_path):
    import numpy as np

    from cfrk_tpu.format import CfrkWriter

    counts = np.array([[0, 2, 0, 0], [1, 0, 0, 5]], dtype=np.int32)
    p = tmp_path / "nz.cfrk"
    with CfrkWriter(str(p), nonzero=True) as w:
        w.write_batch(counts)
    assert p.read_bytes() == b"1:2 \n0:1 3:5 "


def test_cfrk_writer_gzip_output(tmp_path):
    import gzip

    import numpy as np

    from cfrk_tpu.format import CfrkWriter, format_file_bytes

    counts = np.arange(32, dtype=np.int32).reshape(2, 16)
    p = tmp_path / "o.cfrk.gz"
    with CfrkWriter(p) as w:
        w.write_batch(counts)
    assert gzip.decompress(p.read_bytes()) == format_file_bytes(counts)


def test_stream_rejects_gz_output(tmp_path):
    import pytest as _pytest

    from cfrk_tpu.pipeline.stream import stream_count_file

    with _pytest.raises(ValueError, match="gz output is unsupported"):
        stream_count_file("x.fasta", "y.cfrk.gz", 4)
