"""BGZF (blocked gzip) ingest: parallel inflate, full-path parity."""

import gzip

import numpy as np
import pytest

from cfrk_tpu.io.bgzf import BgzfReader, is_bgzf, open_maybe_bgzf, write_bgzf


def test_bgzf_roundtrip_and_gzip_validity(tmp_path):
    rng = np.random.default_rng(0)
    data = bytes(rng.integers(32, 127, size=1_500_000).astype(np.uint8))
    p = tmp_path / "t.bgzf"
    write_bgzf(p, data, block=50_000)
    # every bgzf file is a valid (multi-member) gzip file
    assert gzip.decompress(p.read_bytes()) == data
    assert is_bgzf(p)
    with BgzfReader(p) as r:
        got = []
        for n in (1, 777, 65536, 1 << 20, -1):
            got.append(r.read(n))
        assert b"".join(got) == data


def test_bgzf_sniff_rejects_plain_gzip(tmp_path):
    p = tmp_path / "t.gz"
    with gzip.open(p, "wb") as f:
        f.write(b"hello world" * 100)
    assert not is_bgzf(p)
    with open_maybe_bgzf(p) as f:
        assert f.read() == b"hello world" * 100


def test_bgzf_empty_and_eof_marker(tmp_path):
    p = tmp_path / "e.bgzf"
    write_bgzf(p, b"")
    with BgzfReader(p) as r:
        assert r.read() == b""


def test_bgzf_truncated_block_raises(tmp_path):
    rng = np.random.default_rng(1)
    data = bytes(rng.integers(32, 127, size=200_000).astype(np.uint8))
    p = tmp_path / "t.bgzf"
    write_bgzf(p, data, block=50_000)
    raw = p.read_bytes()
    (tmp_path / "cut.bgzf").write_bytes(raw[: len(raw) // 2])
    with pytest.raises(OSError):
        with BgzfReader(tmp_path / "cut.bgzf") as r:
            r.read()


def _fasta_blob(rng, n=300):
    from cfrk_tpu.io.fasta import decode_codes

    recs = []
    for i in range(n):
        codes = rng.integers(0, 4, size=rng.integers(30, 200)).astype(np.int8)
        recs.append(b">r%d\n" % i + decode_codes(codes) + b"\n")
    return b"".join(recs)


def test_bgzf_fasta_ingest_parity_all_paths(tmp_path):
    """bgzf FASTA parses identically to the plain file through the
    in-memory reader AND the streaming batch iterator."""
    from cfrk_tpu.io.fasta import read_fasta_encoded
    from cfrk_tpu.pipeline.stream import stream_batches

    rng = np.random.default_rng(3)
    blob = _fasta_blob(rng)
    plain = tmp_path / "r.fasta"
    plain.write_bytes(blob)
    bg = tmp_path / "r.fasta.bgzf"
    write_bgzf(bg, blob, block=4096)  # many blocks

    a = read_fasta_encoded(plain)
    b = read_fasta_encoded(bg)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    ba = list(stream_batches(plain, 5, 64))
    bb = list(stream_batches(bg, 5, 64))
    assert len(ba) == len(bb)
    for x, y in zip(ba, bb):
        np.testing.assert_array_equal(x.codes, y.codes)
        assert x.n_reads == y.n_reads


def test_bgzf_seek_decompressed_random_targets(tmp_path):
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(32, 127, size=800_000).astype(np.uint8))
    p = tmp_path / "t.bgzf"
    write_bgzf(p, data, block=10_000)
    for target in [0, 1, 9_999, 10_000, 10_001, 123_456, 799_999, 800_000]:
        with BgzfReader(p) as r:
            r.seek_decompressed(target)
            assert r.read() == data[target:], target


def test_bgzf_stream_batches_offsets_and_resume(tmp_path):
    """Native streaming ingest yields REAL end offsets for bgzf, and
    stream_count_file resumes through seek_decompressed — output equals
    the uninterrupted run byte-for-byte."""
    from cfrk_tpu.pipeline.stream import stream_batches, stream_count_file
    from cfrk_tpu.runtime.checkpoint import StreamCheckpoint, checkpoint_path

    rng = np.random.default_rng(6)
    blob = _fasta_blob(rng, n=96)
    bg = tmp_path / "r.fasta.gz"
    write_bgzf(bg, blob, block=1024)
    plain = tmp_path / "r.fasta"
    plain.write_bytes(blob)

    bb = list(stream_batches(bg, 4, 16))
    pb = list(stream_batches(plain, 4, 16))
    assert all(b.end_offset is not None for b in bb)
    assert [b.end_offset for b in bb] == [b.end_offset for b in pb]

    # full uninterrupted run vs a run resumed after 2 batches
    k, bs = 4, 16
    full = tmp_path / "full.cfrk"
    stream_count_file(bg, full, k, batch_size=bs)
    want = full.read_bytes()

    out = tmp_path / "resumed.cfrk"
    from cfrk_tpu.format import CfrkWriter
    from cfrk_tpu.pipeline.count import count_reads
    from cfrk_tpu.io.fasta import read_fasta_encoded

    reads = read_fasta_encoded(plain)
    cut = 2 * bs
    with open(out, "wb") as f:
        w = CfrkWriter(f)
        w.write_batch(count_reads(reads[:cut], k, batch_size=bs))
        f.flush()
        nbytes = f.tell()
    ckpt = StreamCheckpoint(
        fingerprint=StreamCheckpoint.fingerprint_of(bg, k, "perread", False),
        reads_done=cut,
        out_bytes=nbytes,
        input_offset=bb[1].end_offset,  # decompressed offset: seekable
    )
    ckpt.save(checkpoint_path(out))
    m = stream_count_file(bg, out, k, batch_size=bs, resume=True)
    assert m.reads == 96 - cut
    assert out.read_bytes() == want


def test_bgzf_byte_range_partition_exact(tmp_path):
    """Record-aligned byte ranges over a bgzf FASTA (decompressed
    coordinates) partition the records exactly — the multi-host
    single-file sharding story for compressed inputs."""
    from cfrk_tpu.io.bgzf import decompressed_size
    from cfrk_tpu.parallel.distributed import align_to_record, host_byte_range
    from cfrk_tpu.pipeline.stream import stream_batches

    rng = np.random.default_rng(8)
    blob = _fasta_blob(rng, n=120)
    plain = tmp_path / "r.fasta"
    plain.write_bytes(blob)
    bg = tmp_path / "r.fasta.gz"
    write_bgzf(bg, blob, block=700)  # many blocks, cuts mid-record
    assert decompressed_size(bg) == len(blob)
    # alignment agrees with the plain file at every probe point
    for t in range(0, len(blob), 997):
        assert align_to_record(bg, t) == align_to_record(plain, t)

    full = [
        b.codes[i, : b.lengths[i]].tolist()
        for b in stream_batches(bg, 4, 8)
        for i in range(b.n_reads)
    ]
    for n_hosts in (2, 3):
        got = []
        for pi in range(n_hosts):
            start, limit = host_byte_range(bg, pi, n_hosts)
            for b in stream_batches(
                bg, 4, 8, start_offset=start, limit_offset=limit
            ):
                for i in range(b.n_reads):
                    got.append(b.codes[i, : b.lengths[i]].tolist())
        assert got == full, f"bgzf partition mismatch at n_hosts={n_hosts}"


def test_bgzf_ranged_stream_count_splice(tmp_path):
    """Two abutting byte-range stream_count_file runs over a bgzf FASTA
    splice byte-identically to the whole-file run."""
    from cfrk_tpu.parallel.distributed import host_byte_range
    from cfrk_tpu.pipeline.stream import stream_count_file

    rng = np.random.default_rng(9)
    blob = _fasta_blob(rng, n=60)
    bg = tmp_path / "r.fasta.gz"
    write_bgzf(bg, blob, block=900)
    full = tmp_path / "full.cfrk"
    stream_count_file(bg, full, 4, batch_size=8)
    parts = []
    for pi in range(2):
        start, limit = host_byte_range(bg, pi, 2)
        p = tmp_path / f"part{pi}.cfrk"
        stream_count_file(
            bg, p, 4, batch_size=8, byte_range=(start, limit)
        )
        parts.append(p.read_bytes())
    assert b"\n".join(x for x in parts if x) == full.read_bytes()


def test_bgzf_ranged_resume(tmp_path):
    """Kill + resume INSIDE a byte-ranged bgzf run (the multi-host
    worker crash case): the resumed part equals the uninterrupted one."""
    from cfrk_tpu.format import CfrkWriter
    from cfrk_tpu.parallel.distributed import host_byte_range
    from cfrk_tpu.pipeline.stream import stream_batches, stream_count_file
    from cfrk_tpu.pipeline.count import count_reads
    from cfrk_tpu.runtime.checkpoint import StreamCheckpoint, checkpoint_path

    rng = np.random.default_rng(12)
    blob = _fasta_blob(rng, n=80)
    bg = tmp_path / "r.fasta.gz"
    write_bgzf(bg, blob, block=800)
    k, bs = 4, 8
    start, limit = host_byte_range(bg, 0, 2)

    full = tmp_path / "full.part"
    stream_count_file(bg, full, k, batch_size=bs, byte_range=(start, limit))
    want = full.read_bytes()

    batches = list(
        stream_batches(bg, k, bs, start_offset=start, limit_offset=limit)
    )
    assert len(batches) >= 2
    first = batches[0]
    out = tmp_path / "resumed.part"
    with open(out, "wb") as f:
        w = CfrkWriter(f)
        rows = [
            first.codes[i, : first.lengths[i]] for i in range(first.n_reads)
        ]
        w.write_batch(count_reads(rows, k, batch_size=bs))
        f.flush()
        nbytes = f.tell()
    ckpt = StreamCheckpoint(
        fingerprint=StreamCheckpoint.fingerprint_of(
            bg, k, f"perread-range{start}-{limit}", False
        ),
        reads_done=first.n_reads,
        out_bytes=nbytes,
        input_offset=first.end_offset,
    )
    ckpt.save(checkpoint_path(out))
    m = stream_count_file(
        bg, out, k, batch_size=bs, byte_range=(start, limit), resume=True
    )
    assert m.total_reads == sum(b.n_reads for b in batches)
    assert out.read_bytes() == want


def test_bgzf_fastq_stream_count_parity(tmp_path):
    """bgzf FASTQ (the config-5 input framing) through the full
    streaming driver == the plain-file run, byte-for-byte."""
    from cfrk_tpu.pipeline.stream import stream_count_file

    rng = np.random.default_rng(4)
    recs = []
    from cfrk_tpu.io.fasta import decode_codes

    for i in range(100):
        codes = rng.integers(0, 4, size=60).astype(np.int8)
        seq = decode_codes(codes)
        recs.append(b"@r%d\n" % i + seq + b"\n+\n" + b"I" * len(seq) + b"\n")
    blob = b"".join(recs)
    plain = tmp_path / "r.fastq"
    plain.write_bytes(blob)
    bg = tmp_path / "r.fastq.gz"
    write_bgzf(bg, blob, block=2048)
    assert is_bgzf(bg)

    out_p = tmp_path / "p.cfrk"
    out_b = tmp_path / "b.cfrk"
    stream_count_file(plain, out_p, 4, batch_size=32)
    stream_count_file(bg, out_b, 4, batch_size=32)
    assert out_b.read_bytes() == out_p.read_bytes()


def test_bgzf_repeated_seeks_one_reader(tmp_path):
    """A single reader seeked repeatedly (forwards and backwards) reads
    correctly each time — seek must fully reset the inflate pipeline."""
    rng = np.random.default_rng(2)
    data = bytes(rng.integers(32, 127, 300_000).astype(np.uint8))
    p = tmp_path / "ms.bgzf"
    write_bgzf(p, data, block=7000)
    with BgzfReader(p) as r:
        for t in range(25):
            target = int(rng.integers(0, len(data) + 1))
            n = int(rng.integers(1, 50_000))
            r.seek_decompressed(target)
            assert r.read(n) == data[target : target + n], (t, target, n)
