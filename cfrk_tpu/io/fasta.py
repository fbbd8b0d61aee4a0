"""FASTA parsing and 2-bit base encoding (host side, pure Python/NumPy).

Replaces the reference's C parser + encoder (``src/fastaIO.h:24-71`` ReadFasta,
``:105-148`` ReadFASTASequences).  Differences, by design (see SURVEY.md §4 —
the reference's quirks are bugs, not contract):

* multi-line records are concatenated WITHOUT the interior newlines (the
  reference keeps ``\\n`` bytes inside multi-line reads and encodes them as
  invalid symbols, ``src/fastaIO.h:62-65``);
* the read count comes from the parse itself, not from shelling out to
  ``grep -c '>'`` (``src/fastaIO.h:12-22``);
* gzip-compressed FASTA is supported transparently (the reference includes
  zlib.h but never uses it, ``src/fastaIO.h:7``).

Encoding contract (identical to ``src/fastaIO.h:123-139``):
A/a→0, C/c→1, G/g→2, T/t→3, anything else→-1 (invalid sentinel).

A faster native C++ parser lives in ``cfrk_tpu.io.native``; it must agree
with this module byte-for-byte and is tested against it.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import IO, Iterator

import numpy as np

__all__ = [
    "ENCODE_LUT",
    "DECODE_LUT",
    "is_stdin",
    "open_stdin_reads",
    "encode_seq",
    "decode_codes",
    "iter_fasta",
    "iter_fastq",
    "iter_reads",
    "peek_first_read_len",
    "iter_fasta_encoded",
    "iter_encoded_with_offsets",
    "read_fasta",
    "read_fasta_encoded",
]

# 256-entry LUT: byte -> 2-bit code, -1 for anything not in ACGTacgt.
ENCODE_LUT = np.full(256, -1, dtype=np.int8)
for _b, _v in ((b"Aa", 0), (b"Cc", 1), (b"Gg", 2), (b"Tt", 3)):
    ENCODE_LUT[_b[0]] = _v
    ENCODE_LUT[_b[1]] = _v

DECODE_LUT = np.frombuffer(b"ACGT", dtype=np.uint8)


def encode_seq(seq: bytes | np.ndarray) -> np.ndarray:
    """Encode raw bases into int8 codes (0..3 valid, -1 invalid)."""
    buf = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else seq
    return ENCODE_LUT[buf]


def _mask_low_qual(seq: bytes, qual: bytes, min_qual: int) -> bytes:
    """Replace bases whose Phred+33 quality is below ``min_qual`` with
    ``N`` (encodes to -1, so every window covering them is invalid —
    the standard quality-filtering semantics of k-mer counters).  The
    native parsers apply the identical rule (fastaio.cpp, qthr)."""
    s = np.frombuffer(seq, dtype=np.uint8).copy()
    q = np.frombuffer(qual, dtype=np.uint8)
    s[q < 33 + min_qual] = ord("N")
    return s.tobytes()


def decode_codes(codes: np.ndarray, invalid: bytes = b"N") -> bytes:
    """Decode int8 codes back to bases (invalid/-1 → ``invalid`` byte)."""
    codes = np.asarray(codes)
    out = np.where(codes >= 0, DECODE_LUT[np.clip(codes, 0, 3)], ord(invalid))
    return out.astype(np.uint8).tobytes()


def is_stdin(path) -> bool:
    """True for the conventional ``-`` stdin path (pipe ingest)."""
    return isinstance(path, (str, os.PathLike)) and str(path) == "-"


def open_stdin_reads() -> IO[bytes]:
    """Binary stdin as a buffered reader, gzip-decompressed when the
    pipe carries gzip bytes (``zcat x.gz | cfrk-tpu -`` works either
    way).  A pipe has no random access, so offsets/resume never apply —
    callers treat it exactly like the plain-gzip path."""
    import sys

    f: IO[bytes] = sys.stdin.buffer
    if not hasattr(f, "peek"):
        f = io.BufferedReader(f)  # type: ignore[arg-type]
    if f.peek(2)[:2] == b"\x1f\x8b":
        # GzipFile reads multi-member streams, so bgzf pipes inflate
        # too (sequentially — block-parallel needs a seekable file).
        return io.BufferedReader(gzip.GzipFile(fileobj=f))  # type: ignore[arg-type]
    return f


def _open_maybe_gzip(path: str | os.PathLike) -> IO[bytes]:
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        from .bgzf import is_bgzf, open_maybe_bgzf

        if is_bgzf(path):  # blocked gzip: parallel-inflating reader
            f.close()
            return open_maybe_bgzf(path)
        return gzip.open(f, "rb")  # type: ignore[return-value]
    return f


def iter_fasta(path_or_file: str | os.PathLike | IO[bytes]) -> Iterator[tuple[bytes, bytes]]:
    """Yield ``(header, sequence)`` pairs; header excludes ``>`` and newline,
    sequence is the concatenation of all its lines (no newlines)."""
    if isinstance(path_or_file, (str, os.PathLike)):
        f: IO[bytes] = _open_maybe_gzip(path_or_file)
        owns = True
    else:
        f, owns = path_or_file, False
    try:
        header: bytes | None = None
        parts: list[bytes] = []
        for line in f:
            line = line.rstrip(b"\r\n")
            if line.startswith(b">"):
                if header is not None:
                    yield header, b"".join(parts)
                header = line[1:]
                parts = []
            elif line:
                parts.append(line)
        if header is not None:
            yield header, b"".join(parts)
    finally:
        if owns:
            f.close()


def read_fasta(path) -> tuple[list[bytes], list[bytes]]:
    """Read all records; returns (headers, sequences)."""
    headers: list[bytes] = []
    seqs: list[bytes] = []
    for h, s in iter_fasta(path):
        headers.append(h)
        seqs.append(s)
    return headers, seqs


def iter_fastq(
    path_or_file: str | os.PathLike | IO[bytes], min_qual: int = 0
) -> Iterator[tuple[bytes, bytes]]:
    """Yield ``(header, sequence)`` from a (4-line-record) FASTQ file.

    FASTQ is a capability the reference never had (FASTA only,
    ``src/fastaIO.h:24-71``); metagenomic read sets are usually FASTQ,
    so ingest sniffs the format (see :func:`iter_reads`).

    ``min_qual`` > 0 masks bases whose Phred+33 quality is below it to
    ``N`` (quality filtering); 0 skips the quality line entirely.
    """
    if isinstance(path_or_file, (str, os.PathLike)):
        f: IO[bytes] = _open_maybe_gzip(path_or_file)
        owns = True
    else:
        f, owns = path_or_file, False
    try:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            hdr = hdr.rstrip(b"\r\n")
            if not hdr:
                continue
            if not hdr.startswith(b"@"):
                raise ValueError(f"malformed FASTQ header: {hdr[:40]!r}")
            seq = f.readline().rstrip(b"\r\n")
            plus = f.readline()
            if not plus.startswith(b"+"):
                raise ValueError("malformed FASTQ record: missing '+' line")
            qual = f.readline().rstrip(b"\r\n")
            if len(qual) != len(seq):
                raise ValueError("malformed FASTQ record: quality length mismatch")
            if min_qual:
                seq = _mask_low_qual(seq, qual, min_qual)
            yield hdr[1:], seq
    finally:
        if owns:
            f.close()


def iter_reads(
    path_or_file: str | os.PathLike | IO[bytes], min_qual: int = 0
) -> Iterator[tuple[bytes, bytes]]:
    """Yield ``(header, sequence)`` from FASTA or FASTQ, sniffed by the
    first byte (``>`` vs ``@``); gzip handled transparently for paths.
    ``min_qual`` masks low-quality FASTQ bases (no-op for FASTA, which
    carries no qualities)."""
    if isinstance(path_or_file, (str, os.PathLike)):
        f: IO[bytes] = _open_maybe_gzip(path_or_file)
        owns = True
    else:
        f, owns = path_or_file, False
    try:
        # Sniff the first NON-BLANK byte (a leading newline must not
        # silently route FASTQ to the FASTA parser — the native C++
        # parser sniffs the same way).
        if hasattr(f, "peek"):
            head = f.peek(64)
        else:
            pos = f.tell()
            head = f.read(64)
            f.seek(pos)
        first = head.lstrip(b"\r\n")[:1]
        if first == b"@":
            yield from iter_fastq(f, min_qual)
        else:
            yield from iter_fasta(f)
    finally:
        if owns:
            f.close()


def peek_first_read_len(path) -> int | None:
    """Length of the first record, or None (empty/unreadable input).

    A cheap read-length hint for :func:`..pipeline.batch.auto_batch_size`
    — opens the file, parses one record, closes.  Never raises: auto
    sizing must not turn an input error into a different error than the
    real run would produce.
    """
    try:
        for _, seq in iter_reads(path):
            return len(seq)
    except Exception:
        return None
    return None


def iter_fasta_encoded(path, min_qual: int = 0) -> Iterator[np.ndarray]:
    """Stream encoded records one at a time (constant memory).

    Accepts FASTA or FASTQ (sniffed), plain or gzipped."""
    for _, s in iter_reads(path, min_qual):
        yield encode_seq(s)


def iter_encoded_with_offsets(
    path, start_offset: int | None = None, min_qual: int = 0
) -> Iterator[tuple[np.ndarray, int | None]]:
    """Stream ``(codes, end_offset)`` with input byte offsets.

    ``end_offset`` is the byte position just PAST each record for PLAIN
    (uncompressed) files — the streaming driver checkpoints it so
    resume can ``seek`` instead of re-parsing gigabytes.  For gzip
    inputs offsets are None (resume falls back to record skipping).
    ``start_offset`` seeks there before parsing (plain files only; it
    must point at a record boundary, i.e. a previously yielded
    end_offset).
    """
    f = open(path, "rb")
    if f.peek(2)[:2] == b"\x1f\x8b":
        f.close()
        from .bgzf import is_bgzf, open_maybe_bgzf

        if not is_bgzf(path):
            # plain gzip: no random access, offsets meaningless
            if start_offset:
                raise ValueError("start_offset unsupported for gzip input")
            for codes in iter_fasta_encoded(path, min_qual):
                yield codes, None
            return
        # bgzf: decompressed offsets are valid resume points
        # (BgzfReader.seek_decompressed) — count positions manually,
        # since tell() on the unseekable raw stream is unavailable.
        bf = open_maybe_bgzf(path)
        try:
            if start_offset:
                bf.raw.seek_decompressed(start_offset)
            yield from _offset_records(
                _CountingReader(bf, start_offset or 0), min_qual
            )
        finally:
            bf.close()
        return
    try:
        if start_offset:
            f.seek(start_offset)
        yield from _offset_records(f, min_qual)
    finally:
        f.close()


class _CountingReader:
    """readline/tell/peek over an unseekable stream, counting positions
    (bgzf path of :func:`iter_encoded_with_offsets`)."""

    def __init__(self, f, pos: int):
        self._f = f
        self._pos = pos

    def readline(self) -> bytes:
        line = self._f.readline()
        self._pos += len(line)
        return line

    def tell(self) -> int:
        return self._pos

    def peek(self, n: int = 64) -> bytes:
        return self._f.peek(n)


def _offset_records(f, min_qual: int = 0) -> Iterator[tuple[np.ndarray, int]]:
    """The (codes, end_offset) record loop over an open byte stream
    positioned at a record boundary (shared by the plain-file and
    bgzf branches of :func:`iter_encoded_with_offsets`)."""
    head = f.peek(64)
    fastq = head.lstrip(b"\r\n")[:1] == b"@"
    if fastq:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            if not hdr.rstrip(b"\r\n"):
                continue
            if not hdr.startswith(b"@"):
                raise ValueError(f"malformed FASTQ header: {hdr[:40]!r}")
            seq = f.readline().rstrip(b"\r\n")
            plus = f.readline()
            if not plus.startswith(b"+"):
                raise ValueError("malformed FASTQ record: missing '+' line")
            qual = f.readline().rstrip(b"\r\n")
            if len(qual) != len(seq):
                raise ValueError(
                    "malformed FASTQ record: quality length mismatch"
                )
            if min_qual:
                seq = _mask_low_qual(seq, qual, min_qual)
            yield encode_seq(seq), f.tell()
    else:
        parts: list[bytes] = []
        in_record = False
        while True:
            line_start = f.tell()
            line = f.readline()
            if not line:
                if in_record:
                    yield encode_seq(b"".join(parts)), f.tell()
                return
            stripped = line.rstrip(b"\r\n")
            if stripped.startswith(b">"):
                if in_record:
                    yield encode_seq(b"".join(parts)), line_start
                in_record = True
                parts = []
            elif stripped and in_record:
                parts.append(stripped)


def read_fasta_encoded(path, min_qual: int = 0) -> list[np.ndarray]:
    """Read and encode all records into a ragged list of int8 code arrays.

    Dispatches to the native C++ parser when built (byte-identical,
    pinned by tests/test_native.py).  ``min_qual`` masks low-quality
    FASTQ bases to the invalid code.  ``-`` reads stdin (gzip pipes
    decompress transparently)."""
    from .native import HAVE_NATIVE, parse_encode_bytes, read_fasta_encoded_native

    if is_stdin(path):
        return parse_encode_bytes(open_stdin_reads().read(), min_qual)
    if HAVE_NATIVE:
        return read_fasta_encoded_native(path, min_qual)
    return list(iter_fasta_encoded(path, min_qual))
