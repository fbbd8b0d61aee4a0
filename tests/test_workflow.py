"""Workflow orchestration (Swift/K analog): fan-out, retries, lazy errors,
provenance, and the multi-input CLI path."""

import json
from pathlib import Path

import numpy as np
import pytest

from cfrk_tpu.format import parse_cfrk
from cfrk_tpu.io.fasta import decode_codes
from cfrk_tpu.pipeline.count import count_reads
from cfrk_tpu.runtime.workflow import (
    count_one_factory,
    query_provenance,
    run_workflow,
)


def _write_fasta(path, reads):
    with open(path, "wb") as f:
        for i, codes in enumerate(reads):
            f.write(b">r%d\n" % i)
            f.write(decode_codes(np.asarray(codes, dtype=np.int8)) + b"\n")


def _make_shards(tmp_path, n_files=3, reads_per=8, seed=0):
    rng = np.random.default_rng(seed)
    shards = []
    for i in range(n_files):
        reads = [
            rng.integers(0, 4, size=int(rng.integers(20, 80))).astype(np.int8)
            for _ in range(reads_per)
        ]
        p = tmp_path / f"shard_{i}.fasta"
        _write_fasta(p, reads)
        shards.append((p, reads))
    return shards


def test_workflow_counts_all_shards(tmp_path):
    shards = _make_shards(tmp_path)
    pairs = [(str(p), str(p.with_suffix(".cfrk"))) for p, _ in shards]
    result = run_workflow(
        pairs, count_one_factory(3), max_parallel_tasks=2
    )
    assert result.ok and len(result.tasks) == 3
    for (p, reads), task in zip(shards, result.tasks):
        got = parse_cfrk(Path(task.output).read_bytes())
        np.testing.assert_array_equal(got, count_reads(reads, 3))
        assert task.reads == len(reads)
        assert task.attempts == 1


def test_workflow_retries_then_succeeds(tmp_path):
    calls = {"n": 0}

    def flaky(inp, out):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        Path(out).write_text("ok")
        return 1

    result = run_workflow([("a", str(tmp_path / "a.out"))], flaky, retries=2)
    assert result.ok
    assert result.tasks[0].attempts == 2


def test_workflow_lazy_errors_collects_failures(tmp_path):
    def sometimes(inp, out):
        if inp.endswith("bad"):
            raise ValueError("boom")
        Path(out).write_text("ok")
        return 1

    pairs = [("x", str(tmp_path / "x.out")), ("bad", str(tmp_path / "b.out"))]
    result = run_workflow(pairs, sometimes, lazy_errors=True)
    assert not result.ok
    assert len(result.failed) == 1
    assert "boom" in result.failed[0].error


def test_workflow_strict_errors_raises(tmp_path):
    def bad(inp, out):
        raise ValueError("boom")

    with pytest.raises(RuntimeError, match="workflow task failed"):
        run_workflow([("x", str(tmp_path / "x.out"))], bad, lazy_errors=False)


def test_workflow_provenance_log(tmp_path):
    shards = _make_shards(tmp_path, n_files=2)
    pairs = [(str(p), str(p.with_suffix(".cfrk"))) for p, _ in shards]
    prov = tmp_path / "prov.jsonl"
    run_workflow(pairs, count_one_factory(2), provenance_path=str(prov))
    records = query_provenance(str(prov))
    assert len(records) == 2
    assert all(r["ok"] and r["duration_s"] >= 0 for r in records)


def test_cli_multi_input_workflow(tmp_path):
    shards = _make_shards(tmp_path, n_files=3, seed=1)
    out_dir = tmp_path / "out"
    from cfrk_tpu.cli import main

    prov = tmp_path / "prov.jsonl"
    rc = main(
        [str(p) for p, _ in shards]
        + ["-k", "2", "--out-dir", str(out_dir), "--provenance", str(prov)]
    )
    assert rc == 0
    for p, reads in shards:
        got = parse_cfrk((out_dir / (p.stem + ".cfrk")).read_bytes())
        np.testing.assert_array_equal(got, count_reads(reads, 2))
    assert len(query_provenance(str(prov))) == 3


def test_factory_refuses_sparse_rows_with_seqpar(tmp_path):
    """k > 8 nonzero rows + seqpar must fail like the single-file CLI
    does, not silently drop seqpar (per-file behavior parity)."""
    shards = _make_shards(tmp_path, n_files=1)
    fn = count_one_factory(12, nonzero=True, seqpar=True)
    with pytest.raises(ValueError, match="seqpar"):
        fn(str(shards[0][0]), str(tmp_path / "out.cfrk"))
