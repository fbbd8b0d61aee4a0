"""Smoke tests for the tools/ scripts (subprocess, tiny sizes, CPU)."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOLS = REPO / "tools"


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
        check=True,
    )


def test_make_synthetic_and_count(tmp_path):
    out = tmp_path / "syn.fasta.gz"
    r = _run(
        [str(TOOLS / "make_synthetic.py"), str(out), "--reads", "50",
         "--read-len", "80", "--gzip", "--seed", "3"]
    )
    assert "wrote 50 reads" in r.stderr
    from cfrk_tpu.io.fasta import read_fasta_encoded

    reads = read_fasta_encoded(out)
    assert len(reads) == 50
    assert all(len(x) == 80 for x in reads)


def test_make_synthetic_fastq(tmp_path):
    out = tmp_path / "syn.fastq"
    _run(
        [str(TOOLS / "make_synthetic.py"), str(out), "--reads", "10",
         "--fastq", "--read-len", "60"]
    )
    from cfrk_tpu.io.fasta import iter_fastq

    recs = list(iter_fastq(out))
    assert len(recs) == 10
    assert all(len(s) == 60 for _, s in recs)


def test_scaling_bench_cpu():
    r = _run(
        [str(TOOLS / "scaling_bench.py"), "--cpu", "--k", "3",
         "--reads-per-device", "64", "--steps", "1"],
        timeout=300,
    )
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert [d["devices"] for d in lines] == [1, 2, 4, 8]
    assert all(d["reads_per_s"] > 0 for d in lines)
    # Same data sharded differently must give the same checksum per read
    # count ratio (weak scaling doubles reads with devices).
    assert lines[1]["reads"] == 2 * lines[0]["reads"]


def test_bench_suite_cpu_golden_only():
    r = _run(
        [str(TOOLS / "bench_suite.py"), "--cpu", "--reads", "64",
         "--only", "golden,sparse_k31"],
        timeout=300,
    )
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    names = [d["bench"] for d in lines]
    assert names == ["golden_k2_exact", "sparse_k31_canonical"]
    assert lines[0]["byte_exact"] is True


def test_diff_cfrk(tmp_path):
    import numpy as np

    from cfrk_tpu.format import CfrkWriter

    counts = np.array([[0, 2, 0, 1], [3, 0, 0, 0]], dtype=np.int32)
    a = tmp_path / "a.cfrk"
    b = tmp_path / "b.cfrk"  # same counts, nonzero format
    c = tmp_path / "c.cfrk"  # different counts
    with CfrkWriter(str(a)) as w:
        w.write_batch(counts)
    with CfrkWriter(str(b), nonzero=True) as w:
        w.write_batch(counts)
    with CfrkWriter(str(c)) as w:
        w.write_batch(counts + np.array([[0, 0, 0, 1], [0, 0, 0, 0]]))

    def run(*args):
        r = subprocess.run(
            [sys.executable, str(TOOLS / "diff_cfrk.py"), *args],
            capture_output=True, text=True, cwd=REPO,
        )
        return r.returncode, r.stdout.strip()

    assert run(str(a), str(a)) == (0, "byte-identical")
    rc, msg = run(str(a), str(b))
    assert rc == 1  # formats differ byte-wise
    assert run(str(a), str(b), "--semantic") == (0, "semantically equal (2 reads)")
    rc, msg = run(str(a), str(c), "--semantic")
    assert rc == 1 and "1/2 reads differ" in msg
