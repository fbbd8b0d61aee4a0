"""Query cfrk_tpu spectrum outputs: stats, top-N, per-k-mer lookup.

The reference had no way to interrogate its outputs at all (its workflow
left raw .cfrk text, SURVEY §2#14); this closes the loop for the
spectrum/sparse modes the way `jellyfish stats/query` does for hash
dumps.  Works on every spectrum artifact the CLI writes:

  .npy               dense int table (index = k-mer code)
  .tsv               `index<TAB>count` rows (dense spectra, min-count filtered)
  .kmers.tsv[.gz]    `KMERSTRING<TAB>count` rows (sparse mode)
  .cfrk              single dense spectrum row (reference cell format)

Exit status: 1 if any queried k-mer is absent from the table (so shell
scripts can gate on presence), 0 otherwise.

Usage:
  python tools/query_spectrum.py spect.npy --stats
  python tools/query_spectrum.py spect.npy --top 10 --k 8
  python tools/query_spectrum.py out.kmers.tsv.gz ACGTACGTACGT ...
  python tools/query_spectrum.py spect.tsv --k 8 ACGTACGT
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def encode_kmer(kmer: str) -> int:
    """Base string -> integer k-mer code (inverse of ops.sparse.decode_key)."""
    code = 0
    for ch in kmer.upper():
        if ch not in _CODE:
            raise SystemExit(f"invalid base {ch!r} in k-mer {kmer!r}")
        code = (code << 2) | _CODE[ch]
    return code


def load_table(path: str):
    """-> (keys uint64 sorted, counts int64, k_or_None).

    k is only known for .kmers.tsv inputs (from the string length);
    dense artifacts carry indices, decode with --k.
    """
    base = path[:-3] if path.endswith(".gz") else path
    opener = (lambda p, m: gzip.open(p, m)) if path.endswith(".gz") else open
    if base.endswith(".npy"):
        with opener(path, "rb") as f:
            dense = np.load(f)
        keys = np.flatnonzero(dense).astype(np.uint64)
        return keys, np.asarray(dense)[keys].astype(np.int64), None
    if base.endswith(".cfrk"):
        from cfrk_tpu.format import parse_cfrk

        with opener(path, "rb") as f:
            rows = parse_cfrk(f.read())
        if rows.shape[0] != 1:
            raise SystemExit(
                f"{path}: expected one dense spectrum row, got {rows.shape[0]} "
                "(per-read .cfrk files are not spectra)"
            )
        dense = rows[0]
        keys = np.flatnonzero(dense).astype(np.uint64)
        return keys, dense[keys].astype(np.int64), None
    if base.endswith(".tsv"):
        with opener(path, "rt") as f:
            first = f.readline()
        k = None
        if first and first.split("\t", 1)[0][:1].upper() in _CODE:
            k = len(first.split("\t", 1)[0])  # k-mer-string keyed
        with opener(path, "rt") as f:
            keys, counts = [], []
            for line in f:
                key, _, cnt = line.rstrip("\n").partition("\t")
                keys.append(encode_kmer(key) if k else int(key))
                counts.append(int(cnt))
        keys = np.asarray(keys, dtype=np.uint64)
        counts = np.asarray(counts, dtype=np.int64)
        order = np.argsort(keys)
        return keys[order], counts[order], k
    raise SystemExit(f"unrecognised spectrum artifact: {path}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("table", help="spectrum artifact (.npy/.tsv/.kmers.tsv[.gz]/.cfrk)")
    ap.add_argument("kmers", nargs="*", help="k-mer strings to look up")
    ap.add_argument("--stats", action="store_true",
                    help="print distinct/total/max-count summary")
    ap.add_argument("--top", type=int, default=0, metavar="N",
                    help="print the N most frequent k-mers")
    ap.add_argument("--hist", type=int, nargs="?", const=100, default=0,
                    metavar="MAX",
                    help="multiplicity histogram (jellyfish-histo style): "
                         "rows `c<TAB>#distinct k-mers seen c times` for "
                         "c = 1..MAX (default 100), last row aggregates "
                         ">= MAX")
    ap.add_argument("--k", type=int, default=None,
                    help="k (to decode indices of dense artifacts; "
                         "inferred for .kmers.tsv)")
    args = ap.parse_args()

    keys, counts, k = load_table(args.table)
    k = args.k if args.k is not None else k
    if not (args.stats or args.top or args.hist or args.kmers):
        ap.error("nothing to do: pass --stats, --top N, --hist, and/or k-mers")

    from cfrk_tpu.ops.sparse import decode_key

    def label(code: int) -> str:
        return decode_key(int(code), k) if k else str(int(code))

    if args.stats:
        total = int(counts.sum())
        print(f"distinct\t{len(keys)}")
        print(f"total\t{total}")
        if len(keys):
            am = int(np.argmax(counts))
            print(f"max\t{int(counts[am])}\t{label(keys[am])}")
            print(f"unique\t{int((counts == 1).sum())}")

    if args.hist:
        # Multiplicity histogram (the GenomeScope/jellyfish-histo input):
        # how many DISTINCT k-mers occur exactly c times, c clipped at MAX.
        mx = max(1, args.hist)
        h = np.bincount(
            np.minimum(counts, mx).astype(np.int64), minlength=mx + 1
        )
        for c in range(1, mx):
            if h[c]:
                print(f"{c}\t{int(h[c])}")
        if h[mx]:
            print(f"{mx}+\t{int(h[mx])}")

    if args.top and len(keys):
        # partial-select then sort: top-N of a config-4-size table
        # must not sort all of it.
        n = min(args.top, len(keys))
        sel = np.argpartition(counts, len(counts) - n)[len(counts) - n:]
        sel = sel[np.argsort(counts[sel])[::-1]]
        for i in sel:
            print(f"{label(keys[i])}\t{int(counts[i])}")

    missing = 0
    for km in args.kmers:
        if k is not None and len(km) != k:
            raise SystemExit(f"k-mer {km!r} has length {len(km)}, table k={k}")
        code = np.uint64(encode_kmer(km))
        pos = int(np.searchsorted(keys, code))
        if pos < len(keys) and keys[pos] == code:
            print(f"{km}\t{int(counts[pos])}")
        else:
            print(f"{km}\t0")
            missing += 1
    # exit 1 when any queried k-mer is absent (the jellyfish-query-style
    # contract: scripts can gate on presence), 0 otherwise
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
