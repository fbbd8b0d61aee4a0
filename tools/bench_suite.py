"""Benchmark suite over the BASELINE.json configs (one JSON line each).

1. golden       — time-to-exact-.cfrk on the reconstructed golden sample
                  (config 1: correctness + end-to-end wall time, hash-checked)
2. perread_k8   — dense per-read counting (config 2; bench.py's headline,
                  smaller here)
3. spectrum_k15 — global dense spectrum at k=15 via scatter (config 3's
                  single-chip core; the psum merge is exercised by
                  tools/scaling_bench.py / dryrun_multichip)
4. sparse_k31   — canonical k=31 sort+RLE sparse spectrum (config 4's
                  single-chip core; all_to_all routing in dryrun_multichip)

Sizes default small enough for the tunneled single chip; scale with
--reads.  Run: python tools/bench_suite.py [--reads N] [--cpu]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(name: str, seconds: float, work: float, unit: str, extra=None) -> None:
    rec = {
        "bench": name,
        "wall_s": round(seconds, 4),
        "value": round(work / seconds, 1) if seconds > 0 else 0.0,
        "unit": unit,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))
    sys.stdout.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--only", default=None,
        help="comma-separated subset: golden,perread_k8,spectrum_k15,sparse_k31",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(args.reads, args.read_len)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.01] = -1
    x = jnp.asarray(codes)
    bases = args.reads * args.read_len

    # 1. golden: full pipeline on the reconstructed sample, hash-checked.
    if want("golden"):
        from cfrk_tpu.format import format_file_bytes
        from cfrk_tpu.io.fasta import read_fasta_encoded
        from cfrk_tpu.pipeline.count import count_reads

        data_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
        manifest = json.load(open(os.path.join(data_dir, "goldens.json")))
        name, meta = sorted(manifest["files"].items())[1]  # seq2 (small)
        t0 = time.perf_counter()
        reads = read_fasta_encoded(os.path.join(data_dir, name))
        out = format_file_bytes(count_reads(reads, manifest["k"]))
        dt = time.perf_counter() - t0
        ok = hashlib.sha256(out).hexdigest() == meta["sha256"]
        n_bases = sum(len(r) for r in reads)
        _emit("golden_k2_exact", dt, n_bases, "bases/s", {"byte_exact": ok})
        assert ok, "golden mismatch!"

    # 2. dense per-read k=8.
    if want("perread_k8"):
        from cfrk_tpu.ops.perread import count_perread

        fn = jax.jit(lambda a: jnp.sum(count_perread(a, 8) & 3))
        _ = int(fn(x))
        t0 = time.perf_counter()
        chk = int(fn(x))
        dt = time.perf_counter() - t0
        _emit("perread_k8_dense", dt, bases, "bases/s", {"checksum": chk})

    # 3. dense spectrum at large k (scatter impl: 4**15 = 1 GiB int32
    #    table fits on TPU; matmul cannot).  CPU smoke runs shrink to
    #    k=11 — the 4**15 scatter is impractically slow off-TPU.
    if want("spectrum_k15"):
        from cfrk_tpu.ops.spectrum import spectrum

        ks = 15 if jax.default_backend() == "tpu" else 11
        fn = jax.jit(lambda a: jnp.sum(spectrum(a, ks, impl="scatter") & 3))
        _ = int(fn(x))
        t0 = time.perf_counter()
        chk = int(fn(x))
        dt = time.perf_counter() - t0
        _emit(f"spectrum_k{ks}_dense", dt, bases, "bases/s", {"checksum": chk})

    # 4. canonical k=31 sparse (sort + RLE).
    if want("sparse_k31"):
        from cfrk_tpu.ops.sparse import sparse_spectrum

        def run31(a):
            hi, lo, counts = sparse_spectrum(a, 31, True)
            return jnp.sum(counts & 3)

        fn = jax.jit(run31)
        _ = int(fn(x))
        t0 = time.perf_counter()
        chk = int(fn(x))
        dt = time.perf_counter() - t0
        _emit("sparse_k31_canonical", dt, bases, "bases/s", {"checksum": chk})


if __name__ == "__main__":
    main()
