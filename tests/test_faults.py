"""Fault injection (runtime/faults.py): crash-consistency of the
streaming drivers, exercised by ACTUALLY crashing them at checkpoint
boundaries instead of hand-building checkpoint files.

The reference has no fault-injection or resume story at all (SURVEY.md
§5: executionRetries=0, restart = re-run the whole shard); these tests
pin this framework's stronger contract — byte-identical output across a
crash at any checkpoint save.
"""

from __future__ import annotations

import numpy as np
import pytest

from cfrk_tpu.io.fasta import decode_codes
from cfrk_tpu.pipeline.stream import stream_count_file, stream_spectrum_file
from cfrk_tpu.runtime import faults
from cfrk_tpu.runtime.checkpoint import checkpoint_path, cleanup_checkpoint


@pytest.fixture(autouse=True)
def _disarm():
    yield
    faults.disarm()


def test_trip_semantics():
    faults.arm("site", 2)
    faults.trip("site")  # 1st pass: survives
    with pytest.raises(faults.InjectedFault):
        faults.trip("site")  # 2nd pass: fires
    faults.trip("site")  # self-disarmed: no re-fire


def test_arm_validates():
    with pytest.raises(ValueError):
        faults.arm("site", 0)


def test_env_spec_parsing(monkeypatch):
    monkeypatch.setitem(faults._armed, "x", 99)  # isolated below
    faults.disarm()
    monkeypatch.setenv("CFRK_FAULT_INJECT", "checkpoint:3, other:1")
    faults._load_env()
    assert faults._armed == {"checkpoint": 3, "other": 1}
    faults.disarm()
    monkeypatch.setenv("CFRK_FAULT_INJECT", "bogus:notanint")
    with pytest.raises(ValueError):
        faults._load_env()


def _write_fasta(path, reads):
    with open(path, "wb") as f:
        for i, codes in enumerate(reads):
            f.write(b">r%d\n" % i + decode_codes(np.asarray(codes, np.int8)))
            f.write(b"\n")


def _random_reads(n, rng, lo=20, hi=60):
    return [
        rng.integers(0, 4, size=int(rng.integers(lo, hi))).astype(np.int8)
        for _ in range(n)
    ]


@pytest.mark.parametrize("crash_after", [1, 2, 4])
def test_stream_count_crash_resume(tmp_path, crash_after):
    """Die right after the Nth durable checkpoint; --resume must finish
    the run with bytes identical to an uninterrupted one."""
    rng = np.random.default_rng(7)
    reads = _random_reads(20, rng)
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta, reads)
    k, bs = 3, 4

    full = tmp_path / "full.cfrk"
    stream_count_file(fasta, full, k, batch_size=bs)
    want = full.read_bytes()

    out = tmp_path / "crashed.cfrk"
    faults.arm("checkpoint", crash_after)
    with pytest.raises(faults.InjectedFault):
        stream_count_file(fasta, out, k, batch_size=bs)
    assert (tmp_path / (out.name + ".ckpt.json")).exists()

    m = stream_count_file(fasta, out, k, batch_size=bs, resume=True)
    assert m.reads == len(reads) - crash_after * bs
    assert out.read_bytes() == want
    assert not (tmp_path / (out.name + ".ckpt.json")).exists()


def test_stream_spectrum_crash_resume(tmp_path):
    """Spectrum driver: the checkpointed accumulator sidecar must carry
    the partial table across the crash (no double counting either)."""
    rng = np.random.default_rng(11)
    reads = _random_reads(24, rng)
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta, reads)
    k, bs = 3, 4

    want, _ = stream_spectrum_file(fasta, k, batch_size=bs)

    out = tmp_path / "crashed.spec"
    faults.arm("checkpoint", 2)
    with pytest.raises(faults.InjectedFault):
        stream_spectrum_file(
            fasta, k, batch_size=bs, out_path=out,
            checkpoint_every=1, cleanup=False,
        )
    got, _ = stream_spectrum_file(
        fasta, k, batch_size=bs, out_path=out,
        checkpoint_every=1, resume=True, cleanup=False,
    )
    cleanup_checkpoint(out)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("crash_after", [1, 3])
def test_stream_count_torn_tail_resume(tmp_path, crash_after):
    """Die AFTER a batch's rows are written but BEFORE its checkpoint:
    the file has a torn, unclaimed tail.  Resume must truncate it, redo
    the batch, and still end byte-identical."""
    rng = np.random.default_rng(13)
    reads = _random_reads(20, rng)
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta, reads)
    k, bs = 3, 4

    full = tmp_path / "full.cfrk"
    stream_count_file(fasta, full, k, batch_size=bs)
    want = full.read_bytes()

    out = tmp_path / "torn.cfrk"
    faults.arm("batch-written", crash_after)
    with pytest.raises(faults.InjectedFault):
        stream_count_file(fasta, out, k, batch_size=bs)
    # the torn tail exists on disk; the checkpoint (if any) claims less
    ckpt_file = tmp_path / (out.name + ".ckpt.json")
    if crash_after > 1:
        import json

        claimed = json.loads(ckpt_file.read_text())["out_bytes"]
        assert out.stat().st_size > claimed
    else:
        assert not ckpt_file.exists()  # died before the first checkpoint

    m = stream_count_file(fasta, out, k, batch_size=bs, resume=True)
    assert m.reads == len(reads) - (crash_after - 1) * bs
    assert out.read_bytes() == want


def test_workflow_retry_resumes_from_checkpoint(tmp_path):
    """Elastic recovery: a streaming workflow task that crashes mid-file
    is retried AND resumes from its surviving checkpoint — the retry
    processes only the remaining reads, and the output is byte-identical
    to an uninterrupted run.  (The reference's Swift/K layer could only
    re-run a whole shard; swift/swift.conf:137 executionRetries=0.)"""
    from cfrk_tpu.runtime.workflow import count_one_factory, run_workflow

    rng = np.random.default_rng(17)
    reads = _random_reads(20, rng)
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta, reads)
    k, bs = 3, 4

    full = tmp_path / "full.cfrk"
    stream_count_file(fasta, full, k, batch_size=bs)
    want = full.read_bytes()

    out = tmp_path / "wf.cfrk"
    count_one = count_one_factory(k, stream=True, batch_size=bs)
    faults.arm("checkpoint", 2)  # attempt 1 dies after 8 reads are durable
    res = run_workflow([(str(fasta), str(out))], count_one, retries=1)
    assert res.ok
    task = res.tasks[0]
    assert task.attempts == 2
    assert task.reads == len(reads) - 2 * bs  # resumed, not restarted
    assert out.read_bytes() == want


def test_checkpoint_trip_is_noop_when_disarmed(tmp_path):
    rng = np.random.default_rng(3)
    reads = _random_reads(8, rng)
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta, reads)
    out = tmp_path / "out.cfrk"
    m = stream_count_file(fasta, out, 2, batch_size=4)
    assert m.reads == 8
    assert not (tmp_path / (out.name + ".ckpt.json")).exists()
    assert checkpoint_path(out).endswith(".ckpt.json")


def test_stream_sparse_spill_crash_resume(tmp_path):
    """Spill-mode (mem_budget_mb) checkpointing is an append-only run
    list: die after the 2nd checkpoint, resume, and the merged result
    must equal the uninterrupted run — including dropping any run
    spilled after the last durable checkpoint."""
    from cfrk_tpu.pipeline.stream import stream_sparse_spectrum_file

    rng = np.random.default_rng(17)
    reads = _random_reads(40, rng, lo=40, hi=80)
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta, reads)
    k, bs = 16, 8

    wk, wc, _ = stream_sparse_spectrum_file(fasta, k, batch_size=bs)

    out = tmp_path / "crashed.tsv"
    faults.arm("checkpoint", 2)
    with pytest.raises(faults.InjectedFault):
        stream_sparse_spectrum_file(
            fasta, k, batch_size=bs, out_path=out,
            mem_budget_mb=1, checkpoint_every=1, cleanup=False,
        )
    cj = tmp_path / (out.name + ".ckpt.json")
    assert cj.exists()
    import json as _json

    runs = _json.loads(cj.read_text())["sparse_runs"]
    assert runs  # append-only run list is the checkpoint payload

    gk, gc, _ = stream_sparse_spectrum_file(
        fasta, k, batch_size=bs, out_path=out,
        mem_budget_mb=1, checkpoint_every=1, resume=True, cleanup=False,
    )
    cleanup_checkpoint(out)
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gc, wc)
    assert not (tmp_path / (out.name + ".ckpt.json.spill")).exists()


def test_stream_sparse_spill_resume_without_budget(tmp_path):
    """Resuming a budgeted run WITHOUT --mem-budget-mb must still honour
    the checkpointed run list (the run list, not the caller's flags,
    defines the accumulator state)."""
    from cfrk_tpu.pipeline.stream import stream_sparse_spectrum_file

    rng = np.random.default_rng(23)
    reads = _random_reads(30, rng, lo=40, hi=80)
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta, reads)
    k, bs = 16, 8

    wk, wc, _ = stream_sparse_spectrum_file(fasta, k, batch_size=bs)

    out = tmp_path / "crashed.tsv"
    faults.arm("checkpoint", 2)
    with pytest.raises(faults.InjectedFault):
        stream_sparse_spectrum_file(
            fasta, k, batch_size=bs, out_path=out,
            mem_budget_mb=1, checkpoint_every=1, cleanup=False,
        )
    gk, gc, _ = stream_sparse_spectrum_file(
        fasta, k, batch_size=bs, out_path=out,
        checkpoint_every=1, resume=True,  # no budget on the resume
    )
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gc, wc)
