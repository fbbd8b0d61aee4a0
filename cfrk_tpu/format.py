"""The `.cfrk` output format contract.

A `.cfrk` file holds, for each read of a FASTA file, the dense frequency
table of all ``4**k`` possible k-mers in that read.  The byte format is
pinned by the reference implementation's writer (CFRK ``PrintFreq``,
reference ``src/main.cu:26-62``) and by its checked-in golden files
(``test/out-seq1.cfrk``, ``test/out-seq2.cfrk``):

* one row per read, in input order;
* each row is ``"<index>:<count> "`` for EVERY index in ``[0, 4**k)``,
  i.e. dense including zeros, pairs separated by a single space and with a
  trailing space at the end of the row;
* rows are joined by a single ``"\\n"`` — there is NO trailing newline at
  the end of the file.

This module is pure NumPy/CPython; it is the single source of truth for
formatting, used by the CLI, the streaming pipeline, and the tests.  A
faster native writer (``cfrk_tpu.io.native``) must produce byte-identical
output and is tested against this one.
"""

from __future__ import annotations

import io
from typing import IO, Iterable

import numpy as np

__all__ = [
    "format_rows",
    "format_rows_nonzero",
    "format_rows_pairs",
    "format_file_bytes",
    "CfrkWriter",
    "parse_cfrk",
]


def _format_row_py(row: np.ndarray) -> bytes:
    """Format one read's dense count row: ``b"0:c0 1:c1 ... F-1:cF-1 "``."""
    return ("".join(f"{i}:{int(c)} " for i, c in enumerate(row))).encode("ascii")


def _format_rows_fast(counts: np.ndarray) -> list[bytes]:
    """Vectorised row formatting.

    Builds per-row byte strings using NumPy string kernels instead of a
    Python loop over every (index, count) pair.  Byte-identical to
    :func:`_format_row_py`.
    """
    counts = np.ascontiguousarray(counts)
    n_rows, four_k = counts.shape
    # "<idx>:" prefixes are shared by every row.
    prefixes = np.array([f"{i}:" for i in range(four_k)], dtype=np.str_)
    body = np.char.add(
        np.char.add(prefixes[None, :], counts.astype(np.int64).astype(np.str_)),
        " ",
    )
    # Join the 4^k cells of each row.
    rows = body[:, 0]
    for j in range(1, four_k):
        rows = np.char.add(rows, body[:, j])
    return [r.encode("ascii") for r in rows]


def format_rows(counts: np.ndarray) -> list[bytes]:
    """Format a ``[n_reads, 4**k]`` count matrix into per-read row bytes."""
    counts = np.asarray(counts)
    if counts.ndim != 2:
        raise ValueError(f"counts must be 2-D [n_reads, 4**k], got {counts.shape}")
    if counts.shape[1] <= 64 and counts.shape[0] >= 64:
        return _format_rows_fast(counts)
    return [_format_row_py(row) for row in counts]


def format_file_bytes(counts: np.ndarray) -> bytes:
    """Format a full `.cfrk` file: rows joined by b"\\n", no trailing newline."""
    return b"\n".join(format_rows(counts))


def format_rows_nonzero(counts: np.ndarray) -> list[bytes]:
    """Row bytes listing only NONZERO ``idx:count`` cells.

    The reference's writer had exactly this zero-filtering written but
    commented out (reference ``src/main.cu:51-56``) — the dense format won
    for its golden tests, but at k=8 a 150 bp read fills < 0.3% of its
    65,536 bins, so the sparse rows are ~100x smaller.  Cell and row
    separators match the dense format (trailing space, ``\\n``-joined).
    An empty row (no k-mers) is an empty byte string.
    """
    counts = np.asarray(counts)
    out = []
    for row in counts:
        (nz,) = np.nonzero(row)
        out.append(
            ("".join(f"{i}:{int(row[i])} " for i in nz)).encode("ascii")
        )
    return out


def format_rows_pairs(idx: np.ndarray, counts: np.ndarray) -> list[bytes]:
    """Row bytes from per-read (idx, counts) pair matrices.

    idx/counts: [B, W]; cells with count 0 are skipped (they carry the
    sparse sentinel).  Rows must already be ascending in idx — the
    sort-based sparse ops emit them that way — producing the same cell
    format as :func:`format_rows_nonzero`.
    """
    idx = np.asarray(idx)
    counts = np.asarray(counts)
    out = []
    for row_idx, row_cnt in zip(idx, counts):
        (nz,) = np.nonzero(row_cnt)
        out.append(
            (
                "".join(f"{int(row_idx[j])}:{int(row_cnt[j])} " for j in nz)
            ).encode("ascii")
        )
    return out


def _dense_to_pairs(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Dense ``[n, 4**k]`` block → rectangular (idx, counts) pair
    matrices whose count-0 cells are padding — the cell contract of
    :func:`format_rows_pairs` — so the --nonzero writer can use the
    ~10x native pair formatter instead of per-cell Python f-strings.
    Preserves empty rows (a row with no nonzero cells stays a row)."""
    counts = np.asarray(counts)
    n = counts.shape[0]
    nzr, nzc = np.nonzero(counts)
    rowcnt = np.bincount(nzr, minlength=n)
    m = int(rowcnt.max(initial=0))
    if m == 0:
        z = np.zeros((n, 1), dtype=np.int32)
        return z, z
    starts = np.concatenate([[0], np.cumsum(rowcnt)[:-1]])
    pos = np.arange(len(nzr)) - starts[nzr]
    idx = np.zeros((n, m), dtype=np.int32)
    cnt = np.zeros((n, m), dtype=np.int32)
    idx[nzr, pos] = nzc
    cnt[nzr, pos] = counts[nzr, nzc]
    return idx, cnt


class CfrkWriter:
    """Streaming `.cfrk` writer.

    Accepts count batches incrementally (the streaming pipeline emits one
    batch per device chunk) while preserving the exact file contract:
    a newline *before* every row except the first, none at the end.
    """

    def __init__(
        self,
        f: IO[bytes] | str,
        *,
        continuing: bool = False,
        nonzero: bool = False,
    ):
        """``continuing=True`` resumes mid-file: rows already exist, so a
        newline is emitted before the next row (used by checkpoint resume).
        ``nonzero=True`` writes only nonzero cells per row (the reference's
        commented-out zero-filtering, ``src/main.cu:51-56``)."""
        import os as _os

        if isinstance(f, (str, _os.PathLike)):
            # Transparent gzip output: dense rows compress ~10-20x.
            if str(f).endswith(".gz"):
                import gzip as _gzip

                self._f: IO[bytes] = _gzip.open(f, "wb")
            else:
                self._f = open(f, "wb")
            self._owns = True
        else:
            self._f = f
            self._owns = False
        self._first = not continuing
        self._nonzero = nonzero

    def write_batch(self, counts: np.ndarray) -> None:
        counts = np.asarray(counts)
        if counts.shape[0] == 0:
            return
        if self._nonzero:
            # Same bytes as format_rows_nonzero (pinned by tests), via
            # the native pair formatter — the per-cell f-string loop was
            # the hot spot of `--stream --nonzero` runs.  Row slabs of
            # ~64 MB keep the nonzero scan's bool temp cache-resident
            # (a whole 8192x4^8 block's temp thrashes this class of
            # host at ~0.5 GB/s).
            from .io.native import format_pairs_bytes

            rows = max(1, (1 << 26) // max(counts[0].nbytes, 1))
            for s in range(0, counts.shape[0], rows):
                idx, cnt = _dense_to_pairs(counts[s : s + rows])
                self._f.write(
                    format_pairs_bytes(idx, cnt, first=self._first)
                )
                self._first = False
            return
        # The native C++ formatter (byte-identical, tests/test_native.py)
        # is ~10x faster than the NumPy string kernels; fall back silently.
        from .io.native import format_rows_bytes

        self._f.write(format_rows_bytes(counts, first=self._first))
        self._first = False

    def write_pairs(self, idx: np.ndarray, counts: np.ndarray) -> None:
        """Write sparse per-read rows from (idx, counts) pair matrices
        (see :func:`format_rows_pairs`; used for 8 < k <= 15 where dense
        rows are impossible)."""
        idx = np.asarray(idx)
        if idx.shape[0] == 0:
            return
        from .io.native import format_pairs_bytes

        self._f.write(format_pairs_bytes(idx, counts, first=self._first))
        self._first = False

    def write_pairs_dense(
        self, idx: np.ndarray, counts: np.ndarray, fk: int
    ) -> None:
        """Write DENSE rows (all ``fk`` bins) from sparse (idx, counts)
        pair matrices — the densification happens inside the formatter's
        bin walk, so the dense matrix is never materialised on host.
        Byte-identical to :meth:`write_batch` on the densified block."""
        idx = np.asarray(idx)
        if idx.shape[0] == 0:
            return
        from .io.native import format_dense_pairs_bytes

        self._f.write(
            format_dense_pairs_bytes(idx, counts, fk, first=self._first)
        )
        self._first = False

    def close(self) -> None:
        if self._owns:
            self._f.close()

    def __enter__(self) -> "CfrkWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def parse_cfrk(data: bytes) -> np.ndarray:
    """Parse `.cfrk` bytes back into a ``[n_reads, 4**k]`` int64 matrix.

    Used by tests and by the FASTA reconstruction tool; tolerant only of the
    exact reference format.
    """
    rows = data.split(b"\n")
    out: list[list[int]] = []
    for row in rows:
        cells = row.strip().split(b" ")
        vals = []
        for cell in cells:
            idx, cnt = cell.split(b":")
            if int(idx) != len(vals):
                raise ValueError("non-dense or out-of-order .cfrk row")
            vals.append(int(cnt))
        out.append(vals)
    width = len(out[0])
    if any(len(v) != width for v in out):
        raise ValueError("ragged .cfrk rows")
    return np.array(out, dtype=np.int64)
