"""Benchmark suite over the BASELINE.json configs (one JSON line each).

Device cases (steady-state 512-step scans, each with a vs_sol fraction
against its roofline model in cfrk_tpu/ops/roofline.py):

- perread_k8          — packed one-hot dense kernel (the family-floor bar)
- perread_k8_rowsort  — fused row-sort pairs (the flagship route)
- perread_k8_short    — 70 bp span-packed short reads
- spectrum_k8_pallas  — one-hot spectrum kernel (zero per-batch D2H)
- spectrum_k8_sort / spectrum_k15_sort — sorted spectrum, device side
- spectrum_k15        — XLA scatter (kept as the baseline sort beats)
- sparse_k31          — canonical 2-key row sort (config 4's core)

Host / end-to-end cases:

- golden  — time-to-exact-.cfrk on the golden sample, hash-checked
- ingest  — chunked C++ parser over an on-disk synthetic FASTA
            (--ingest-reads to scale to >= 10M reads)
- stream / stream_spectrum — the full streaming driver with per-stage
  breakdowns (NOTE: through the axon tunnel D2H runs ~5 MB/s, so large
  per-read streams only reflect real hardware when run directly on it)

--json-out writes the per-round BENCHSUITE_r{N}.json artifact
(tests/test_tools.py pins its freshness and shape).

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


RECORDS: list[dict] = []


def _emit(name: str, seconds: float, work: float, unit: str, extra=None) -> None:
    rec = {
        "bench": name,
        "wall_s": round(seconds, 4),
        "value": round(work / seconds, 1) if seconds > 0 else 0.0,
        "unit": unit,
    }
    if extra:
        rec.update(extra)
    RECORDS.append(rec)
    print(json.dumps(rec))
    sys.stdout.flush()


def _scan_case(step_val, xs, steps: int):
    """Steady-state step time of a jitted per-batch scalar-producing fn:
    jitted lax.scan cycling the DISTINCT batches of xs (loop-invariant
    inputs get the kernel hoisted — docs/PERF.md "Measurement
    methodology"), timed ending on a one-scalar fetch.  Returns
    (seconds_total, checksum)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    distinct = xs.shape[0]

    def run(xs):
        def body(c, i):
            return c + step_val(xs[i % distinct]), ()

        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(steps))
        return c

    fn = jax.jit(run)
    _ = int(np.asarray(step_val(xs[0])))  # compile the bare step first
    _ = int(np.asarray(fn(xs)))  # compile scan + warm
    t0 = time.perf_counter()
    chk = int(np.asarray(fn(xs)))
    return time.perf_counter() - t0, chk


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--reads", type=int, default=None,
        help="reads per device batch (default: auto_batch_size per "
             "case read length — 32768 at 150 bp on TPU)",
    )
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--ingest-reads", type=int, default=2_000_000,
        help="reads in the on-disk ingest bench (10_000_000 = config 5)",
    )
    ap.add_argument(
        "--stream-reads", type=int, default=100_000,
        help="reads through the full streaming driver bench",
    )
    ap.add_argument(
        "--only", default=None,
        help=(
            "comma-separated subset: golden,perread_k8,perread_k8_rowsort,perread_k8_short,"
            "contig_k8_32kb,contig_k8_128kb,spectrum_k15,spectrum_k8_pallas,"
            "spectrum_k8_sort,spectrum_k9_e2e,spectrum_k15_sort,sparse_k31,"
            "ingest,stream,stream_spectrum"
        ),
    )
    ap.add_argument(
        "--steps", type=int, default=512,
        help="scan steps per device case (>= 512 for quotable numbers: "
             "every jitted run carries ~27 ms fixed dispatch overhead — "
             "docs/PERF.md; sub-512 runs are tagged unquotable)",
    )
    ap.add_argument(
        "--json-out", default=None,
        help="also write all records to FILE as one JSON document "
             "(the per-round BENCHSUITE_r*.json artifact)",
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

    from cfrk_tpu.pipeline.batch import auto_batch_size

    explicit_reads = args.reads
    if args.reads is None:
        args.reads = auto_batch_size(args.read_len)

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
        # config-1 case: the SMALLEST golden sample (read count from the
        # manifest, not filename order — seq2 is 710 reads vs seq1's 7898)
        name, meta = min(
            manifest["files"].items(), key=lambda kv: kv[1]["n_reads"]
        )
        t0 = time.perf_counter()
        reads = read_fasta_encoded(os.path.join(data_dir, name))
        out = format_file_bytes(count_reads(reads, manifest["k"]))
        dt = time.perf_counter() - t0
        ok = hashlib.sha256(out).hexdigest() == meta["sha256"]
        n_bases = sum(len(r) for r in reads)
        _emit("golden_k2_exact", dt, n_bases, "bases/s", {"byte_exact": ok})
        assert ok, "golden mismatch!"

    # ---- device cases: steady-state scan step times with an explicit
    # per-implementation speed-of-light fraction each (the roofline
    # models live in cfrk_tpu/ops/roofline.py, shared with bench.py).
    from cfrk_tpu.ops.roofline import (
        onehot_family_sol,
        scatter_sol,
        sort_sol,
    )

    on_tpu = jax.default_backend() == "tpu"
    steps = args.steps if on_tpu else 2
    n_xs = 4

    def rowsort_step(k, canonical=False):
        """Per-batch scalar-producing step for the rowsort routes.

        On TPU: the kernel's in-kernel checksum (same measurement
        discipline as bench.py — the pair writes are part of the same
        custom call, no extra consumer read pass is charged to the
        kernel).  Off-TPU: the XLA oracle + a masked sum.
        """
        if on_tpu:
            from cfrk_tpu.ops.pallas.rowsort import (
                rowsort_rle_pallas,
                rowsort_rle_pallas_large,
            )

            def _step(a):
                if k <= 15:
                    out = rowsort_rle_pallas(
                        a, k, canonical=canonical, checksum=True
                    )
                else:
                    out = rowsort_rle_pallas_large(
                        a, k, canonical=canonical, checksum=True
                    )
                return jnp.sum(out[-1])
        else:
            from cfrk_tpu.ops.perread_sparse import count_perread_rows

            def _step(a):
                out = count_perread_rows(a, k, canonical)
                return jnp.sum(out[-1] & 3, dtype=jnp.int32)
        return jax.jit(_step)
    xs = jnp.asarray(
        np.stack([codes] + [
            rng.integers(0, 4, size=codes.shape).astype(np.int8)
            for _ in range(n_xs - 1)
        ])
    )
    step_bases = args.reads * args.read_len

    def emit_device(name, dt, chk, sol_bps, extra=None):
        rec = {
            "checksum": chk,
            "step_ms": round(dt / steps * 1e3, 3),
            "vs_sol": round(step_bases * steps / dt / sol_bps, 4),
        }
        if on_tpu and steps < 512:
            # Sub-512-step scans carry the ~27 ms per-run dispatch
            # artifact (docs/PERF.md): never quote these numbers.
            rec["unquotable"] = True
        if extra:
            rec.update(extra)
        _emit(name, dt, step_bases * steps, "bases/s", rec)

    # 2. dense per-read k=8 (the compare-built one-hot kernel family;
    #    its vs_sol charges the one-hot VPU build — the round-2 floor
    #    proof; the pairs route below is the one that escapes it).
    if want("perread_k8"):
        if on_tpu:
            # The packed one-hot Pallas kernel with in-kernel checksum —
            # the dense-matrix emitter the drivers used through round 2
            # (kept as the dense-emit route; the rowsort pairs route
            # below is what dense-row output consumes now).
            from cfrk_tpu.ops.pallas.perread import count_perread_pallas

            def _step_dense(a):
                _c, chk = count_perread_pallas(
                    a, 8, packed=True, checksum=True
                )
                return jnp.sum(chk)

            step = jax.jit(_step_dense)
        else:
            from cfrk_tpu.ops.perread import count_perread

            step = jax.jit(
                lambda a: jnp.sum(count_perread(a, 8) & 3, dtype=jnp.int32)
            )
        dt, chk = _scan_case(step, xs, steps)
        emit_device(
            "perread_k8_dense", dt, chk,
            onehot_family_sol(args.reads, args.read_len, 8),
            {"sol_model": "onehot_family"},
        )

    # 2a. per-read k=8 pairs via the fused row-sort kernel — the route
    #     dense-row AND --nonzero `.cfrk` output actually takes.
    if want("perread_k8_rowsort"):
        step = rowsort_step(8)
        dt, chk = _scan_case(step, xs, steps)
        emit_device(
            "perread_k8_rowsort", dt, chk,
            sort_sol(args.reads, args.read_len, 8),
            {"sol_model": "sort"},
        )

    # 2b. short-read pairs (70 bp): the span-packed layout — 128/span
    #     reads share each row, ~2x the per-base rate of 150 bp.
    if want("perread_k8_short"):
        from cfrk_tpu.ops.perread_sparse import count_perread_rows

        # Short reads get their own auto batch size (auto_batch_size(70)
        # = 65536 on TPU): dispatch overhead is the binding term at
        # 0.03-0.06 ms device steps (docs/PERF.md "Short reads PACK").
        n_short = explicit_reads or auto_batch_size(70)
        short = jnp.asarray(
            np.stack([
                rng.integers(0, 4, size=(n_short, 70)).astype(np.int8)
                for _ in range(n_xs)
            ])
        )
        step = rowsort_step(8)
        dt, chk = _scan_case(step, short, steps)
        rec = {
            "checksum": chk,
            "reads": n_short,
            "step_ms": round(dt / steps * 1e3, 3),
            "vs_sol": round(
                n_short * 70 * steps / dt
                / sort_sol(n_short, 70, 8), 4,
            ),
            "sol_model": "sort",
        }
        if on_tpu and steps < 512:
            rec["unquotable"] = True
        _emit("perread_k8_short70", dt, n_short * 70 * steps,
              "bases/s", rec)

    # 2c. 32 kb contigs (round 4: the fast path extends to 64 kb —
    #     g=256 sub-rows here; measured 5.1x the XLA row sort).
    if want("contig_k8_32kb"):
        from cfrk_tpu.ops.perread_sparse import count_perread_rows

        clen = 32700
        n_contig = explicit_reads or auto_batch_size(clen)
        # n_xs distinct inputs like every other case (CLAUDE.md bench
        # rule; ADVICE r4): ~8 MB per input at the auto batch, so four
        # fit HBM trivially.
        contig = jnp.asarray(
            np.stack([
                rng.integers(0, 4, size=(n_contig, clen)).astype(np.int8)
                for _ in range(n_xs)
            ])
        )

        step = rowsort_step(8)
        dt, chk = _scan_case(step, contig, steps)
        rec = {
            "checksum": chk,
            "reads": n_contig,
            "step_ms": round(dt / steps * 1e3, 3),
            "vs_sol": round(
                n_contig * clen * steps / dt
                / sort_sol(n_contig, clen, 8), 4,
            ),
            "sol_model": "sort",
        }
        if on_tpu and steps < 512:
            rec["unquotable"] = True
        _emit("contig_k8_32kb", dt, n_contig * clen * steps,
              "bases/s", rec)

    # 2d. 128 kb contigs (round 4 late: eligibility extends to 256 kb —
    #     g=1024, one read per block; measured 3.57 Gb/s vs an XLA
    #     fallback whose compile never finished at this width).
    if want("contig_k8_128kb"):
        clen = 131041
        n_contig = explicit_reads or auto_batch_size(clen)
        # n_xs distinct inputs (CLAUDE.md bench rule; ADVICE r4).
        contig = jnp.asarray(
            np.stack([
                rng.integers(0, 4, size=(n_contig, clen)).astype(np.int8)
                for _ in range(n_xs)
            ])
        )

        step = rowsort_step(8)
        dt, chk = _scan_case(step, contig, steps)
        rec = {
            "checksum": chk,
            "reads": n_contig,
            "step_ms": round(dt / steps * 1e3, 3),
            "vs_sol": round(
                n_contig * clen * steps / dt
                / sort_sol(n_contig, clen, 8), 4,
            ),
            "sol_model": "sort",
        }
        if on_tpu and steps < 512:
            rec["unquotable"] = True
        _emit("contig_k8_128kb", dt, n_contig * clen * steps,
              "bases/s", rec)

    # 3. dense spectrum at large k via XLA scatter (kept as the
    #    baseline the sort route beats; auto never picks it on TPU).
    if want("spectrum_k15"):
        from cfrk_tpu.ops.spectrum import spectrum

        ks = 15 if on_tpu else 11
        step = jax.jit(
            lambda a: jnp.sum(spectrum(a, ks, impl="scatter") & 3)
        )
        dt, chk = _scan_case(step, xs, steps)
        emit_device(
            f"spectrum_k{ks}_dense", dt, chk,
            scatter_sol(args.reads, args.read_len, ks),
            {"sol_model": "scatter"},
        )

    # 3a. dense spectrum k=8 via the Pallas int8 one-hot kernel (the
    #     TPU auto path for k <= 10: zero per-batch D2H).
    if want("spectrum_k8_pallas"):
        from cfrk_tpu.ops.spectrum import spectrum as _sp

        impl_sp = "pallas" if on_tpu else "scatter"
        step = jax.jit(lambda a: jnp.sum(_sp(a, 8, impl=impl_sp) & 3))
        dt, chk = _scan_case(step, xs, steps)
        emit_device(
            "spectrum_k8_pallas", dt, chk,
            onehot_family_sol(args.reads, args.read_len, 8, per_read=False),
            {"sol_model": "onehot_family"},
        )

    # 3b. spectrum k=8 via the row-sort route (device side of
    #     impl='sort': per-read sort+RLE pairs, host fold absorbs them).
    if want("spectrum_k8_sort"):
        step = rowsort_step(8)
        dt, chk = _scan_case(step, xs, steps)
        emit_device(
            "spectrum_k8_sort_device", dt, chk,
            sort_sol(args.reads, args.read_len, 8),
            {"sol_model": "sort"},
        )

    # 3c. k=15 spectrum via the sort+RLE route (the TPU auto path for
    #     k >= 11; the scatter number above is the baseline it beats).
    if want("spectrum_k15_sort"):
        from cfrk_tpu.ops.perread_sparse import count_perread_rows

        ks = 15 if on_tpu else 11
        step = rowsort_step(ks)
        dt, chk = _scan_case(step, xs, steps)
        emit_device(
            f"spectrum_k{ks}_sort", dt, chk,
            sort_sol(args.reads, args.read_len, ks),
            {"sol_model": "sort"},
        )

    # 3d. k=9 auto spectrum route END-TO-END: device rowsort pairs +
    #     threaded native host fold, overlapped exactly like
    #     stream_spectrum_file's drain loop (VERDICT r4 weak #1 — the
    #     device-only number must not stand in for the route).
    if want("spectrum_k9_e2e"):
        import time as _t

        from cfrk_tpu.ops.perread_sparse import (
            count_perread_rows,
            narrow_for_fetch,
            valid_pair_prefix,
        )
        from cfrk_tpu.ops.sparse import DenseFoldAccumulator

        ks9 = 9
        w9 = args.read_len - ks9 + 1

        @jax.jit
        def pairs_step(a):
            return valid_pair_prefix(
                narrow_for_fetch(count_perread_rows(a, ks9), ks9), w9
            )

        # (a) device-side steady state, 512-step scan (the sort bound).
        dt_dev, _chk = _scan_case(rowsort_step(ks9), xs, steps)
        dev_ms = dt_dev / steps * 1e3

        # (b) the real driver loop: async dispatch -> bounded pending ->
        #     fetch -> fold (same overlap as the streaming driver).
        n_loop = 8 if on_tpu else 3
        acc = DenseFoldAccumulator(ks9)
        warm = [np.asarray(a) for a in pairs_step(xs[0])]  # compile+warm
        batch_bytes = sum(a.nbytes for a in warm)
        t_fetch = t_fold = 0.0
        pending: list = []

        def drain():
            nonlocal t_fetch, t_fold
            rows = pending.pop(0)
            tf = _t.perf_counter()
            arrs = [np.asarray(a) for a in rows]
            t_fetch += _t.perf_counter() - tf
            tf = _t.perf_counter()
            acc.add_pairs(arrs[0], arrs[1])
            t_fold += _t.perf_counter() - tf
            return arrs

        t0 = _t.perf_counter()
        for i in range(n_loop):
            pending.append(pairs_step(xs[i % n_xs]))
            if len(pending) > 2:
                arrs = drain()
        while pending:
            arrs = drain()
        wall = _t.perf_counter() - t0

        # (c) host-fold floor: best-of on the drained buffers, plus a
        #     thread mini-ladder for the many-core extrapolation.
        fold_by_threads = {}
        for nt in (1, 2, 0):  # 0 = all cores (default)
            if nt:
                os.environ["CFRK_FOLD_THREADS"] = str(nt)
            else:
                os.environ.pop("CFRK_FOLD_THREADS", None)
            best = float("inf")
            for _ in range(5):
                tf = _t.perf_counter()
                acc.add_pairs(arrs[0], arrs[1])
                best = min(best, _t.perf_counter() - tf)
            fold_by_threads[nt or "all"] = round(best * 1e3, 3)
        fold_ms = fold_by_threads["all"]

        # Honest split: on THIS host the fetch crosses the ~5 MB/s dev
        # tunnel; a production host pays ~batch_bytes/16 GB/s of PCIe.
        bases_per_batch = args.reads * args.read_len
        pcie_ms = batch_bytes / 16e9 * 1e3
        bound_ms = max(dev_ms, fold_ms, pcie_ms)
        e2e_pcie = bases_per_batch / (bound_ms / 1e3)
        rec = {
            "e2e_this_host_bases_per_s": round(
                n_loop * bases_per_batch / wall, 1
            ),
            "fetch_ms_per_batch": round(t_fetch / n_loop * 1e3, 1),
            "fold_ms_per_batch": fold_ms,
            "fold_ms_by_threads": fold_by_threads,
            "device_step_ms": round(dev_ms, 3),
            "fetched_mb_per_batch": round(batch_bytes / 1e6, 1),
            "pcie16_fetch_ms_modeled": round(pcie_ms, 3),
            "e2e_model_pcie16_bases_per_s": round(e2e_pcie, 1),
            "binding_term": (
                "fold" if bound_ms == fold_ms
                else ("device" if bound_ms == dev_ms else "pcie")
            ),
            "distinct_kmers": int((acc.table > 0).sum()),
            # vs_sol: the PCIe-modeled fold-inclusive rate against the
            # route's device sort SOL — how much of the pure device
            # ceiling survives the full route on this host's cores.
            "vs_sol": round(
                e2e_pcie / sort_sol(args.reads, args.read_len, ks9), 4
            ),
            "sol_model": "sort (e2e: fold-inclusive, pcie-modeled)",
            "step_ms": round(bound_ms, 3),
            "note": (
                "this-host e2e crosses the ~5 MB/s dev tunnel (fetch "
                "column measures the tunnel); the pcie16 model swaps "
                "only the fetch term; fold scales with host cores "
                "(fold_ms_by_threads)"
            ),
        }
        if on_tpu and steps < 512:
            rec["unquotable"] = True
        _emit(
            "spectrum_k9_auto_e2e", wall, n_loop * bases_per_batch,
            "bases/s", rec,
        )

    # 4. canonical k=31 sparse: the fused 2-key row-sort kernel on TPU
    #    (lexicographic (hi, lo) network), lax.sort off it.
    if want("sparse_k31"):
        from cfrk_tpu.ops.perread_sparse import count_perread_rows

        step = rowsort_step(31, canonical=True)
        dt, chk = _scan_case(step, xs, steps)
        emit_device(
            "sparse_k31_canonical", dt, chk,
            sort_sol(args.reads, args.read_len, 31, keys=2),
            {"sol_model": "sort2"},
        )

    # 5 + 6: on-disk streaming benches share one synthetic FASTA.
    import tempfile

    def synth_fasta(path, n_reads, read_len, seed=0):
        """Write a synthetic FASTA; returns total bases.  Vectorised
        block writes — generating 10M reads takes seconds, not minutes."""
        block = 100_000
        lut = np.frombuffer(b"ACGT", dtype=np.uint8)
        g = np.random.default_rng(seed)
        total = 0
        with open(path, "wb") as f:
            for start in range(0, n_reads, block):
                n = min(block, n_reads - start)
                seqs = lut[g.integers(0, 4, size=(n, read_len))]
                rows = []
                for i in range(n):
                    rows.append(b">r%d\n" % (start + i))
                    rows.append(seqs[i].tobytes())
                    rows.append(b"\n")
                f.write(b"".join(rows))
                total += n * read_len
        return total

    if want("ingest"):
        from cfrk_tpu.pipeline.stream import stream_batches

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "ingest.fasta")
            n_bases = synth_fasta(path, args.ingest_reads, args.read_len)
            file_bytes = os.path.getsize(path)
            t0 = time.perf_counter()
            reads = 0
            for b in stream_batches(path, 8, 8192):
                reads += b.n_reads
            dt = time.perf_counter() - t0
            assert reads == args.ingest_reads
            _emit(
                "ingest_stream_batches", dt, file_bytes, "bytes/s",
                {"reads": reads, "mbases_per_s": round(n_bases / dt / 1e6, 1)},
            )

    if want("stream_spectrum"):
        # Global-spectrum streaming at scale, end-to-end: FASTA on disk
        # -> dense k=8 table, device-resident accumulator, ONE ~512 KB
        # fetch at the end.  k=8 keeps the case meaningful through the
        # axon tunnel; the k>=11 sort route ships ~13 MB of sorted
        # triples per batch to the host accumulator — ~0.4 ms on real
        # hardware's PCIe/ICI but ~3 s/batch through the ~5 MB/s
        # tunnel, where it measures the tunnel, not the framework
        # (the k=15 device-side steady state is spectrum_k15_sort).
        from cfrk_tpu.pipeline.stream import stream_spectrum_file
        from cfrk_tpu.runtime.metrics import RunMetrics

        ks = 8
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "spect.fasta")
            n_bases = synth_fasta(path, args.stream_reads, args.read_len)
            # Pre-warm the exact dispatch the stream driver compiles
            # (same shape/dtype/config -> same executable) so the timed
            # region measures steady-state streaming, not the one-time
            # compile: through the axon tunnel a remote Mosaic/XLA
            # compile is 150-650 s of "weather" that would otherwise
            # land in the final materialize stage (async dispatch
            # blocks there).  On real hardware the compile is local,
            # cached across runs, and irrelevant at config-5 scale.
            from cfrk_tpu.ops.spectrum import spectrum as spectrum_op
            from cfrk_tpu.pipeline.batch import len_bucket

            tw0 = time.perf_counter()
            wlen = len_bucket(args.read_len)  # stream pads to this
            dummy = jnp.zeros((8192, wlen), dtype=jnp.int8)
            np.asarray(spectrum_op(dummy, ks))
            warm_s = time.perf_counter() - tw0
            t0 = time.perf_counter()
            m = RunMetrics(k=ks, mode="spectrum")
            table, m = stream_spectrum_file(
                path, ks, batch_size=8192, metrics=m,
            )
            dt = time.perf_counter() - t0
            _emit(
                f"stream_spectrum_k{ks}", dt, n_bases, "bases/s",
                {
                    "reads": m.reads,
                    "distinct_kmers": int((np.asarray(table) > 0).sum()),
                    "warm_s": round(warm_s, 3),
                    "stages_s": {
                        n: round(t, 3) for n, t in sorted(m.stages.items())
                    },
                },
            )

    if want("stream"):
        # Time-to-exact-.cfrk at scale (BASELINE metric 2).  k=2 is the
        # reference's own at-scale workload (swift/roda.sh: 2.5 GB SRA
        # dataset at k=2; ~40 B/read of output).  A dense k=8 per-read
        # .cfrk is 513 KB/read of text — 51 GB at the default read
        # count — so the k=8 variant uses the --nonzero sparse-row
        # format (~1.3 KB/read), which is what any real k=8 per-read
        # run uses.
        from cfrk_tpu.pipeline.batch import len_bucket
        from cfrk_tpu.pipeline.stream import stream_count_file

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "stream.fasta")
            n_bases = synth_fasta(path, args.stream_reads, args.read_len)
            wlen = len_bucket(args.read_len)
            dummy = jnp.zeros((8192, wlen), dtype=jnp.int8)
            for tag, ks, nz in [
                ("stream_perread_k2_cfrk", 2, False),
                ("stream_perread_k8_nonzero", 8, True),
            ]:
                # Pre-warm the exact executables the stream dispatch
                # compiles (see the stream_spectrum comment: remote
                # compile weather must not land in the timed region).
                tw0 = time.perf_counter()
                if nz:
                    # nonzero routes through the row-sorted sparse op
                    # (stream_count_file's sparse_rows rule) — warm THAT
                    # executable (count_perread_rows resolves to the
                    # fused Pallas rowsort on TPU), not the dense kernel.
                    from cfrk_tpu.ops.perread_sparse import (
                        count_perread_rows,
                        narrow_for_fetch,
                    )

                    wi, wc = narrow_for_fetch(
                        count_perread_rows(dummy, ks, False), ks
                    )
                    np.asarray(wi)
                    np.asarray(wc)
                elif (
                    ks >= 5
                    and jax.default_backend() == "tpu"
                ):
                    from cfrk_tpu.ops.pallas.perread import (
                        DEFAULT_READ_BLOCK,
                        count_perread_pallas,
                        resolve_packed,
                    )

                    pm = resolve_packed(True, wlen - ks + 1)
                    np.asarray(count_perread_pallas(
                        dummy, ks, packed=pm, read_block=DEFAULT_READ_BLOCK
                    ))
                else:
                    from cfrk_tpu.ops.perread import count_perread

                    odt = (
                        jnp.int16 if wlen - ks + 1 < 2**15 else jnp.int32
                    )
                    np.asarray(count_perread(
                        dummy, ks, impl="auto", out_dtype=odt
                    ))
                warm_s = time.perf_counter() - tw0
                out = os.path.join(td, f"out_{tag}.cfrk")
                t0 = time.perf_counter()
                m = stream_count_file(
                    path, out, ks, batch_size=8192, nonzero=nz
                )
                dt = time.perf_counter() - t0
                _emit(
                    tag, dt, n_bases, "bases/s",
                    {
                        "reads": m.reads,
                        "warm_s": round(warm_s, 3),
                        "stages_s": {
                            n: round(t, 3) for n, t in sorted(m.stages.items())
                        },
                        "out_bytes": os.path.getsize(out),
                    },
                )
                os.remove(out)

    if args.json_out:
        import datetime

        doc = {
            "platform": jax.default_backend(),
            "device_kind": jax.devices()[0].device_kind,
            "timestamp": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
            "reads": args.reads,
            "read_len": args.read_len,
            "steps": args.steps,
            "cases": RECORDS,
        }
        with open(args.json_out, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"# wrote {args.json_out} ({len(RECORDS)} cases)")


if __name__ == "__main__":
    main()
