"""Compare two `.cfrk` outputs — byte-exact and semantically.

The reference's entire test harness was ``diff out.cfrk golden.cfrk``
(reference ``test/test.sh:15``).  This tool keeps that byte-exact check
and adds a semantic mode that ignores formatting (dense vs --nonzero
rows compare equal if the counts match), reporting the first differing
read and a summary.

Usage:
    python tools/diff_cfrk.py a.cfrk b.cfrk [--semantic]

Gzip inputs are detected automatically.  Exit code 0 = equal,
1 = different, 2 = usage/parse error.
"""

from __future__ import annotations

import argparse
import gzip
import sys


def _read(path: str) -> bytes:
    data = open(path, "rb").read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data


def _rows_to_dicts(data: bytes):
    for lineno, row in enumerate(data.split(b"\n")):
        d = {}
        for cell in row.split(b" "):
            if not cell:
                continue
            try:
                idx, cnt = cell.split(b":")
                c = int(cnt)
                key = int(idx)
            except ValueError:
                raise SystemExit(
                    f"parse error at row {lineno}: bad cell {cell[:40]!r}"
                ) from None
            if c:
                d[key] = c
        yield d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument(
        "--semantic",
        action="store_true",
        help="compare per-read nonzero counts, ignoring row formatting",
    )
    args = ap.parse_args()

    try:
        da, db = _read(args.a), _read(args.b)
    except OSError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    if not args.semantic:
        if da == db:
            print("byte-identical")
            return 0
        # Locate the first differing row for the report.
        ra, rb = da.split(b"\n"), db.split(b"\n")
        for i, (x, y) in enumerate(zip(ra, rb)):
            if x != y:
                print(f"differ at read {i}")
                return 1
        print(f"row counts differ: {len(ra)} vs {len(rb)}")
        return 1

    try:
        ra, rb = list(_rows_to_dicts(da)), list(_rows_to_dicts(db))
    except SystemExit as e:
        print(e, file=sys.stderr)
        return 2
    if len(ra) != len(rb):
        print(f"read counts differ: {len(ra)} vs {len(rb)}")
        return 1
    n_diff = 0
    first = None
    for i, (x, y) in enumerate(zip(ra, rb)):
        if x != y:
            n_diff += 1
            if first is None:
                first = i
    if n_diff:
        print(f"{n_diff}/{len(ra)} reads differ (first at read {first})")
        return 1
    print(f"semantically equal ({len(ra)} reads)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
