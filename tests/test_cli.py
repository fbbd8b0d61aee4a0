"""CLI behavior: reference-compatible positionals, modes, multi-file runs."""

import gzip
import json
import os

import numpy as np
import pytest

from cfrk_tpu.cli import main
from cfrk_tpu.format import parse_cfrk
from cfrk_tpu.io.fasta import read_fasta_encoded
from cfrk_tpu.ops.reference import count_perread_np, spectrum_np


@pytest.fixture
def fasta(tmp_path):
    p = tmp_path / "reads.fasta"
    p.write_bytes(b">r1\nACGTACGTAC\n>r2\nTTNGA\nCCGT\n>r3\nGGGG\n")
    return str(p)


def test_reference_positional_contract(fasta, tmp_path):
    out = str(tmp_path / "out.cfrk")
    # exact reference argv shape: fasta out k nt chunkSize
    assert main([fasta, out, "2", "12", "8192"]) == 0
    got = parse_cfrk(open(out, "rb").read())
    want = count_perread_np(read_fasta_encoded(fasta), 2)
    np.testing.assert_array_equal(got, want)


def test_flags_and_canonical(fasta, tmp_path):
    out = str(tmp_path / "c.cfrk")
    assert main([fasta, "-k", "3", "-o", out, "--canonical"]) == 0
    got = parse_cfrk(open(out, "rb").read())
    want = count_perread_np(read_fasta_encoded(fasta), 3, canonical=True)
    np.testing.assert_array_equal(got, want)


def test_spectrum_mode_tsv(fasta, tmp_path):
    out = str(tmp_path / "s.tsv")
    assert main([fasta, "-k", "2", "-o", out, "--mode", "spectrum",
                 "--spectrum-format", "tsv"]) == 0
    # tsv rows are idx<TAB>count for NONZERO bins only.
    rows = [l.split("\t") for l in open(out).read().splitlines()]
    got = {int(i): int(c) for i, c in rows}
    want = spectrum_np(read_fasta_encoded(fasta), 2)
    assert got == {i: int(c) for i, c in enumerate(want) if c}


def test_multi_file_out_dir(fasta, tmp_path):
    # gzipped second shard — the Swift/K workflow analog in one command
    gz = tmp_path / "shard2.fasta.gz"
    with gzip.open(gz, "wb") as f:
        f.write(b">a\nACGT\n>b\nTTTT\n")
    outd = tmp_path / "outs"
    assert main([fasta, str(gz), "-k", "2", "--out-dir", str(outd)]) == 0
    assert sorted(os.listdir(outd)) == ["reads.cfrk", "shard2.cfrk"]
    got = parse_cfrk(open(outd / "shard2.cfrk", "rb").read())
    want = count_perread_np(read_fasta_encoded(str(gz)), 2)
    np.testing.assert_array_equal(got, want)


def test_missing_k_errors(fasta):
    with pytest.raises(SystemExit):
        main([fasta])


def test_stats_line(fasta, tmp_path, capsys):
    out = str(tmp_path / "o.cfrk")
    assert main([fasta, out, "2", "--stats"]) == 0
    stats = json.loads(capsys.readouterr().err.strip())
    assert stats["reads"] == 3 and stats["k"] == 2


def test_sparse_mode(tmp_path):
    # Reads must be LONGER than k or the oracle and the output are both
    # empty and the assertion is vacuous.
    from cfrk_tpu.io.fasta import decode_codes, read_fasta_encoded
    from cfrk_tpu.ops.reference import window_indices_np
    from cfrk_tpu.ops.sparse import decode_key

    rng = np.random.default_rng(9)
    fasta = tmp_path / "long.fasta"
    with open(fasta, "wb") as f:
        for i in range(6):
            codes = rng.integers(0, 4, size=60).astype(np.int8)
            f.write(b">r%d\n" % i + decode_codes(codes) + b"\n")
    out = str(tmp_path / "k.tsv")
    assert main([str(fasta), "-k", "21", "-o", out, "--mode", "sparse"]) == 0
    rows = [l.split("\t") for l in open(out).read().splitlines()]
    want = {}
    for r in read_fasta_encoded(fasta):
        for v in window_indices_np(r, 21):
            if v >= 0:
                want[int(v)] = want.get(int(v), 0) + 1
    want_rows = {decode_key(kk, 21): c for kk, c in want.items()}
    got_rows = {kmer: int(c) for kmer, c in rows}
    assert len(got_rows) >= 6 * 30  # mostly-unique 21-mers: non-vacuous
    assert got_rows == want_rows


def test_config_file_defaults_and_argv_override(tmp_path, monkeypatch):
    """cfrk.json supplies defaults (swift.conf analog); argv wins."""
    import json as _json

    import numpy as np

    from cfrk_tpu.cli import main
    from cfrk_tpu.format import parse_cfrk
    from cfrk_tpu.io.fasta import decode_codes

    rng = np.random.default_rng(0)
    reads = [rng.integers(0, 4, size=30).astype(np.int8) for _ in range(5)]
    fasta = tmp_path / "r.fasta"
    with open(fasta, "wb") as f:
        for i, codes in enumerate(reads):
            f.write(b">r%d\n" % i + decode_codes(codes) + b"\n")
    cfg = tmp_path / "cfg.json"
    cfg.write_text(_json.dumps({"k": 3, "batch-size": 2}))
    out = tmp_path / "o.cfrk"
    rc = main([str(fasta), "-o", str(out), "--config", str(cfg)])
    assert rc == 0
    assert parse_cfrk(out.read_bytes()).shape == (5, 64)  # k from config

    out2 = tmp_path / "o2.cfrk"
    rc = main([str(fasta), "-o", str(out2), "-k", "2", "--config", str(cfg)])
    assert rc == 0
    assert parse_cfrk(out2.read_bytes()).shape == (5, 16)  # argv k wins


def test_config_unknown_key_fails(tmp_path):
    import json as _json

    import pytest as _pytest

    from cfrk_tpu.cli import main

    cfg = tmp_path / "cfg.json"
    cfg.write_text(_json.dumps({"no-such-flag": 1}))
    with _pytest.raises(SystemExit, match="unknown config key"):
        main(["x.fasta", "-k", "2", "--config", str(cfg)])


def test_cli_stream_sparse_mode(tmp_path):
    import numpy as np

    from cfrk_tpu.cli import main
    from cfrk_tpu.io.fasta import decode_codes
    from cfrk_tpu.pipeline.count import sparse_spectrum_file
    from cfrk_tpu.ops.sparse import decode_key

    rng = np.random.default_rng(5)
    reads = [rng.integers(0, 4, size=60).astype(np.int8) for _ in range(10)]
    fasta = tmp_path / "r.fasta"
    with open(fasta, "wb") as f:
        for i, codes in enumerate(reads):
            f.write(b">r%d\n" % i + decode_codes(codes) + b"\n")
    out = tmp_path / "o.kmers.tsv"
    rc = main([str(fasta), "-k", "19", "--mode", "sparse", "--stream",
               "-o", str(out), "--batch-size", "4"])
    assert rc == 0
    want = sparse_spectrum_file(str(fasta), 19)
    lines = out.read_text().strip().splitlines()
    assert len(lines) == len(want)
    got = {kv.split("\t")[0]: int(kv.split("\t")[1]) for kv in lines}
    assert got == {decode_key(key, 19): c for key, c in want.items()}


def test_cli_gz_output_is_really_gzip(tmp_path):
    """Every writer honors the '.gz' output contract — a .gz path must
    hold gzip bytes (merge_outputs and the query tool rely on it)."""
    import gzip

    import numpy as np

    from cfrk_tpu.cli import main
    from cfrk_tpu.io.fasta import decode_codes

    rng = np.random.default_rng(9)
    fasta = tmp_path / "r.fasta"
    with open(fasta, "wb") as f:
        for i in range(8):
            codes = rng.integers(0, 4, size=50).astype(np.int8)
            f.write(b">r%d\n" % i + decode_codes(codes) + b"\n")
    cases = [
        (["--mode", "sparse", "-k", "19"], "o.kmers.tsv.gz"),
        (["--mode", "spectrum", "-k", "4", "--spectrum-format", "tsv"],
         "o.tsv.gz"),
        (["--mode", "spectrum", "-k", "4", "--spectrum-format", "npy"],
         "o.npy.gz"),
        (["--mode", "spectrum", "-k", "4", "--spectrum-format", "hist"],
         "o.hist.gz"),
        (["-k", "4"], "o.cfrk.gz"),
    ]
    for extra, name in cases:
        out = tmp_path / name
        rc = main([str(fasta), *extra, "-o", str(out)])
        assert rc == 0, name
        raw = out.read_bytes()
        assert raw[:2] == b"\x1f\x8b", f"{name} is not gzip"
        assert gzip.decompress(raw), name


def test_cli_spectrum_hist_and_min_count(tmp_path):
    import numpy as np

    from cfrk_tpu.cli import main
    from cfrk_tpu.io.fasta import decode_codes

    # Two identical reads: every k-mer appears an even number of times.
    codes = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int8)
    fasta = tmp_path / "r.fasta"
    with open(fasta, "wb") as f:
        f.write(b">a\n" + decode_codes(codes) + b"\n")
        f.write(b">b\n" + decode_codes(codes) + b"\n")
    hist_out = tmp_path / "o.hist"
    rc = main([str(fasta), "-k", "4", "--mode", "spectrum",
               "--spectrum-format", "hist", "-o", str(hist_out)])
    assert rc == 0
    hist = dict(
        tuple(map(int, ln.split("\t")))
        for ln in hist_out.read_text().strip().splitlines()
    )
    # ACGTACGT has 5 4-mer windows: ACGT x2, CGTA, GTAC, TACG; doubled
    # across the two reads -> counts {4: 1 kmer, 2: 3 kmers}.
    assert hist == {2: 3, 4: 1}

    sparse_out = tmp_path / "o.tsv"
    rc = main([str(fasta), "-k", "4", "--mode", "sparse",
               "--min-count", "3", "-o", str(sparse_out)])
    assert rc == 0
    lines = sparse_out.read_text().strip().splitlines()
    assert lines == ["ACGT\t4"]


def test_cli_k_range_validation(tmp_path):
    import pytest as _pytest

    from cfrk_tpu.cli import main

    f = tmp_path / "r.fasta"
    f.write_bytes(b">a\nACGT\n")
    with _pytest.raises(SystemExit, match="out of range"):
        main([str(f), "-k", "0", "-o", str(tmp_path / "o")])
    with _pytest.raises(SystemExit, match="out of range"):
        main([str(f), "-k", "32", "-o", str(tmp_path / "o")])
    with _pytest.raises(SystemExit, match="mode sparse"):
        main([str(f), "-k", "16", "--mode", "spectrum", "-o", str(tmp_path / "o")])


def test_gz_output_positional_not_treated_as_input(tmp_path):
    import gzip

    import numpy as np

    from cfrk_tpu.cli import main
    from cfrk_tpu.format import parse_cfrk
    from cfrk_tpu.io.fasta import decode_codes

    rng = np.random.default_rng(1)
    reads = [rng.integers(0, 4, size=20).astype(np.int8) for _ in range(3)]
    fasta = tmp_path / "r.fasta"
    with open(fasta, "wb") as f:
        for i, codes in enumerate(reads):
            f.write(b">r%d\n" % i + decode_codes(codes) + b"\n")
    out = tmp_path / "o.cfrk.gz"
    rc = main([str(fasta), str(out), "2"])  # reference-style positionals
    assert rc == 0
    got = parse_cfrk(gzip.decompress(out.read_bytes()))
    assert got.shape == (3, 16)


def test_config_does_not_override_explicit_argv(tmp_path):
    import json as _json

    import numpy as np

    from cfrk_tpu.cli import main
    from cfrk_tpu.format import parse_cfrk
    from cfrk_tpu.io.fasta import decode_codes

    rng = np.random.default_rng(2)
    fasta = tmp_path / "r.fasta"
    with open(fasta, "wb") as f:
        f.write(b">a\n" + decode_codes(rng.integers(0, 4, 30).astype(np.int8)) + b"\n")
    cfg = tmp_path / "c.json"
    cfg.write_text(_json.dumps({"k": 4}))
    out = tmp_path / "o.cfrk"
    # Explicit -k 2 must beat the config's k=4 even though both differ
    # from the parser default.
    rc = main([str(fasta), "-k", "2", "-o", str(out), "--config", str(cfg)])
    assert rc == 0
    assert parse_cfrk(out.read_bytes()).shape == (1, 16)


def test_config_type_coercion_and_bad_value(tmp_path):
    import json as _json

    import pytest as _pytest

    from cfrk_tpu.cli import main

    cfg = tmp_path / "c.json"
    cfg.write_text(_json.dumps({"batch-size": "not-an-int"}))
    with _pytest.raises(SystemExit, match="cannot convert"):
        main(["x.fasta", "-k", "2", "--config", str(cfg)])


def test_spectrum_tsv_skips_zeros_and_filters(tmp_path):
    import numpy as np

    from cfrk_tpu.cli import main
    from cfrk_tpu.io.fasta import decode_codes

    codes = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int8)  # ACGTACGT
    fasta = tmp_path / "r.fasta"
    with open(fasta, "wb") as f:
        f.write(b">a\n" + decode_codes(codes) + b"\n")
    out = tmp_path / "o.tsv"
    rc = main([str(fasta), "-k", "4", "--mode", "spectrum",
               "--spectrum-format", "tsv", "-o", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4  # only the 4 distinct 4-mers, no zero rows
    rc = main([str(fasta), "-k", "4", "--mode", "spectrum",
               "--spectrum-format", "tsv", "--min-count", "2",
               "-o", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 1  # only ACGT (count 2)


def _rand_fasta(
    tmp_path, n=40, lo=20, hi=120, seed=11, name="m.fasta", p_n=0.03
):
    rng = np.random.default_rng(seed)
    p = tmp_path / name
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(p, "wb") as f:
        for i in range(n):
            ln = int(rng.integers(lo, hi))
            seq = rng.choice(bases, size=ln)
            seq[rng.random(ln) < p_n] = ord("N")
            f.write(b">r%d\n" % i + bytes(seq) + b"\n")
    return str(p)


def test_cli_mesh_perread_parity(tmp_path):
    """--devices 8 (dp mesh on the virtual CPU devices) must produce a
    byte-identical .cfrk to the single-device run (VERDICT round 1 #3:
    every multi-chip path must be CLI-reachable)."""
    fasta = _rand_fasta(tmp_path)
    out1 = str(tmp_path / "one.cfrk")
    out8 = str(tmp_path / "eight.cfrk")
    assert main([fasta, "-k", "5", "-o", out1, "--devices", "1"]) == 0
    assert main([fasta, "-k", "5", "-o", out8, "--devices", "8",
                 "--batch-size", "16"]) == 0
    assert open(out8, "rb").read() == open(out1, "rb").read()


def test_cli_mesh_spectrum_tp_parity(tmp_path):
    """--devices 8 --tp 4: dense spectrum via psum + psum_scatter must
    match the single-device table exactly (config-3 wiring at test k)."""
    fasta = _rand_fasta(tmp_path, seed=12)
    out1 = str(tmp_path / "one.tsv")
    out8 = str(tmp_path / "eight.tsv")
    base = [fasta, "-k", "7", "--mode", "spectrum",
            "--spectrum-format", "tsv"]
    assert main(base + ["-o", out1, "--devices", "1"]) == 0
    assert main(base + ["-o", out8, "--devices", "8", "--tp", "4",
                 "--batch-size", "16"]) == 0
    assert open(out8).read() == open(out1).read()


def test_cli_mesh_sparse_k31_parity(tmp_path):
    """--mode sparse -k 31 --canonical over the mesh: the all_to_all
    bucket routing (BASELINE config 4) end-to-end from the CLI, equal
    to the single-device sort+RLE output."""
    fasta = _rand_fasta(tmp_path, n=24, lo=40, hi=90, seed=13)
    out1 = str(tmp_path / "one.kmers.tsv")
    out8 = str(tmp_path / "eight.kmers.tsv")
    base = [fasta, "-k", "31", "--mode", "sparse", "--canonical"]
    assert main(base + ["-o", out1, "--devices", "1"]) == 0
    assert main(base + ["-o", out8, "--devices", "8",
                 "--batch-size", "16"]) == 0
    text = open(out8).read()
    assert text == open(out1).read()
    assert text  # non-trivial output


def test_cli_mesh_sparse_stream_parity(tmp_path):
    """Streaming sparse over the mesh (bucket routing per batch with
    overflow retry) must match the single-device streaming run."""
    fasta = _rand_fasta(tmp_path, n=30, lo=40, hi=90, seed=14)
    out1 = str(tmp_path / "one.kmers.tsv")
    out8 = str(tmp_path / "eight.kmers.tsv")
    base = [fasta, "-k", "21", "--mode", "sparse", "--stream"]
    assert main(base + ["-o", out1, "--devices", "1"]) == 0
    assert main(base + ["-o", out8, "--devices", "8",
                 "--batch-size", "16", "--slack", "0.5"]) == 0
    assert open(out8).read() == open(out1).read()


def test_cli_seqpar_parity(tmp_path):
    """--seqpar (position axis sharded, halo exchange) must reproduce
    the single-device per-read output byte-for-byte."""
    fasta = _rand_fasta(tmp_path, n=6, lo=300, hi=900, seed=15)
    out1 = str(tmp_path / "one.cfrk")
    outs = str(tmp_path / "sp.cfrk")
    assert main([fasta, "-k", "5", "-o", out1, "--devices", "1"]) == 0
    assert main([fasta, "-k", "5", "-o", outs, "--devices", "8",
                 "--seqpar"]) == 0
    assert open(outs, "rb").read() == open(out1, "rb").read()


def test_cli_mesh_stream_perread_parity(tmp_path):
    """--stream + mesh: sharded streaming driver, byte parity."""
    fasta = _rand_fasta(tmp_path, seed=16)
    out1 = str(tmp_path / "one.cfrk")
    out8 = str(tmp_path / "eight.cfrk")
    assert main([fasta, "-k", "4", "-o", out1, "--devices", "1",
                 "--stream"]) == 0
    assert main([fasta, "-k", "4", "-o", out8, "--devices", "8",
                 "--stream", "--batch-size", "16"]) == 0
    assert open(out8, "rb").read() == open(out1, "rb").read()


def test_cli_devices_validation(tmp_path):
    fasta = _rand_fasta(tmp_path, n=4)
    out = str(tmp_path / "x.cfrk")
    with pytest.raises(SystemExit):
        main([fasta, "-k", "4", "-o", out, "--devices", "99"])
    with pytest.raises(SystemExit):  # 8 devices not divisible by tp=3
        main([fasta, "-k", "4", "-o", out, "--mode", "spectrum",
              "--devices", "8", "--tp", "3"])
    with pytest.raises(SystemExit):  # sparse is 1-axis
        main([fasta, "-k", "20", "-o", out, "--mode", "sparse",
              "--devices", "8", "--tp", "2"])


def test_config_abbreviated_flag_counts_as_explicit(tmp_path, monkeypatch):
    """An abbreviated --batch=N (argparse prefix match for --batch-size)
    must beat a config-file value (ADVICE round 1 #4)."""
    fasta = _rand_fasta(tmp_path, n=4)
    cfg = tmp_path / "cfrk.json"
    cfg.write_text(json.dumps({"batch-size": 4}))
    out = str(tmp_path / "x.cfrk")
    seen = {}
    import cfrk_tpu.pipeline.count as pc

    # The default perread route is count_file_sparse_rows (dense output
    # from pairs); spy there.
    real = pc.count_file_sparse_rows

    def spy(path, out_path, k, **kw):
        seen["batch_size"] = kw.get("batch_size")
        return real(path, out_path, k, **kw)

    monkeypatch.setattr(pc, "count_file_sparse_rows", spy)
    assert main([fasta, "-k", "3", "-o", out, "--devices", "1",
                 "--batch=16", "--config", str(cfg)]) == 0
    assert seen["batch_size"] == 16  # argv (abbreviated) beat the config


def test_cli_inmemory_dense_pairs_route_parity(tmp_path):
    """The in-memory dense perread default (pairs + formatter-densify)
    writes the same bytes as an explicit dense impl."""
    fasta = _rand_fasta(tmp_path, n=12)
    a = str(tmp_path / "a.cfrk")
    b = str(tmp_path / "b.cfrk")
    assert main([fasta, "-k", "5", "-o", a, "--devices", "1",
                 "--canonical"]) == 0
    assert main([fasta, "-k", "5", "-o", b, "--devices", "1",
                 "--canonical", "--impl", "scatter"]) == 0
    assert open(a, "rb").read() == open(b, "rb").read()


def test_cli_impl_sort_validation_and_spectrum_small_k(tmp_path):
    """--impl sort: clean error outside spectrum mode; honored for any
    k in spectrum mode (review round 2, finding 3)."""
    fasta = _rand_fasta(tmp_path, n=8, seed=77)
    out = str(tmp_path / "o.tsv")
    with pytest.raises(SystemExit, match="only applies to --mode spectrum"):
        main([fasta, "-k", "8", "-o", out, "--impl", "sort"])
    # spectrum + small k: the sort route must work and match scatter.
    out2 = str(tmp_path / "o2.tsv")
    base = [fasta, "-k", "6", "--mode", "spectrum", "--spectrum-format",
            "tsv", "--devices", "1"]
    assert main(base + ["-o", out, "--impl", "sort"]) == 0
    assert main(base + ["-o", out2, "--impl", "scatter"]) == 0
    assert open(out).read() == open(out2).read()


def test_splice_perread_parts_empty_nonzero_row(tmp_path):
    """A 0-byte part holding ONE read (empty --nonzero row) must still
    contribute a row; a 0-read part must not (bytes are ambiguous, the
    .nreads sidecar disambiguates)."""
    from cfrk_tpu.cli import _splice_perread_parts

    specs = [(b"0:2 1:1", 1), (b"", 1), (b"", 0), (b"3:4 ", 1)]
    parts = []
    for i, (content, nreads) in enumerate(specs):
        p = tmp_path / f"o.part{i}"
        p.write_bytes(content)
        (tmp_path / f"o.part{i}.nreads").write_text(str(nreads))
        parts.append(str(p))
    out = tmp_path / "o.cfrk"
    _splice_perread_parts(parts, str(out))
    assert out.read_bytes() == b"0:2 1:1\n\n3:4 "  # 3 rows, middle empty


def test_sparse_hist_format(tmp_path):
    """--mode sparse --spectrum-format hist writes the count-of-counts
    curve (genome-size estimation workflow at k beyond dense reach)."""
    import numpy as np

    from cfrk_tpu.cli import main

    rng = np.random.default_rng(4)
    fa = tmp_path / "h.fasta"
    with open(fa, "w") as f:
        for i in range(12):
            f.write(f">r{i}\n" + "".join(
                "ACGT"[c] for c in rng.integers(0, 4, 50)) + "\n")
    tsv = tmp_path / "o.kmers.tsv"
    assert main([str(fa), "-k", "17", "--mode", "sparse", "-o", str(tsv),
                 "--devices", "1"]) == 0
    hist = tmp_path / "o.hist"
    assert main([str(fa), "-k", "17", "--mode", "sparse", "-o", str(hist),
                 "--spectrum-format", "hist", "--devices", "1"]) == 0
    # oracle: histogram of the tsv counts
    from collections import Counter
    occ = Counter(int(l.split("\t")[1]) for l in tsv.read_text().splitlines())
    got = dict(
        (int(a), int(b))
        for a, b in (l.split("\t") for l in hist.read_text().splitlines())
    )
    assert got == dict(occ)
    # streaming path produces the identical hist
    hist2 = tmp_path / "o2.hist"
    assert main([str(fa), "-k", "17", "--mode", "sparse", "-o", str(hist2),
                 "--spectrum-format", "hist", "--stream",
                 "--batch-size", "4", "--devices", "1"]) == 0
    assert hist2.read_text() == hist.read_text()


def test_missing_input_clean_error(tmp_path):
    import pytest

    from cfrk_tpu.cli import main

    with pytest.raises(SystemExit, match="input not found: nope.fasta"):
        main(["nope.fasta", "-k", "2", "-o", str(tmp_path / "x.cfrk")])


def test_cli_empty_input_all_modes(tmp_path):
    """A zero-record input is legal: empty .cfrk (no rows), an all-zero
    dense spectrum row, and an empty sparse table — rc 0 everywhere."""
    from cfrk_tpu.cli import main

    empty = tmp_path / "empty.fasta"
    empty.write_bytes(b"")
    p1 = tmp_path / "o.cfrk"
    assert main([str(empty), "-k", "4", "-o", str(p1)]) == 0
    assert p1.read_bytes() == b""
    p2 = tmp_path / "o2.cfrk"
    assert main([str(empty), "-k", "4", "-o", str(p2), "--stream"]) == 0
    assert p2.read_bytes() == b""
    p3 = tmp_path / "o.spec"
    assert main([str(empty), "-k", "3", "--mode", "spectrum",
                 "-o", str(p3)]) == 0
    from cfrk_tpu.format import parse_cfrk

    assert parse_cfrk(p3.read_bytes()).sum() == 0
    p4 = tmp_path / "o.kmers.tsv"
    assert main([str(empty), "-k", "19", "--mode", "sparse",
                 "-o", str(p4)]) == 0
    assert p4.read_bytes() == b""


def test_min_qual_end_to_end(tmp_path):
    """--min-qual masks low-quality FASTQ bases before counting, in both
    the in-memory and streaming drivers (byte-identical outputs)."""
    rng = np.random.default_rng(11)
    buf = bytearray()
    for i in range(23):
        n = int(rng.integers(4, 60))
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))
        qual = bytes((33 + rng.integers(0, 42, size=n)).astype(np.uint8))
        buf += b"@r%d\n" % i + seq + b"\n+\n" + qual + b"\n"
    p = tmp_path / "q.fastq"
    p.write_bytes(bytes(buf))

    out = str(tmp_path / "q.cfrk")
    assert main([str(p), "-k", "2", "-o", out, "--min-qual", "20"]) == 0
    got = parse_cfrk(open(out, "rb").read())
    want = count_perread_np(read_fasta_encoded(p, 20), 2)
    np.testing.assert_array_equal(got, want)

    out2 = str(tmp_path / "q2.cfrk")
    assert main([str(p), "-k", "2", "-o", out2, "--min-qual", "20",
                 "--stream"]) == 0
    assert open(out2, "rb").read() == open(out, "rb").read()

    # and it actually filters: Q=0 output differs (some qual < 20 exists)
    out3 = str(tmp_path / "q3.cfrk")
    assert main([str(p), "-k", "2", "-o", out3]) == 0
    assert open(out3, "rb").read() != open(out, "rb").read()


def test_min_qual_resume_fingerprint(tmp_path):
    """A checkpoint written at one --min-qual must not resume a run with
    a different value (differently masked counts would splice)."""
    from cfrk_tpu.pipeline.stream import _resume_fingerprint

    p = tmp_path / "f.fastq"
    p.write_bytes(b"@r0\nACGT\n+\nIIII\n")
    fp20, _ = _resume_fingerprint(str(p), 2, "perread", False, "o", None, 20)
    fp0, _ = _resume_fingerprint(str(p), 2, "perread", False, "o", None, 0)
    fp25, _ = _resume_fingerprint(str(p), 2, "perread", False, "o", None, 25)
    assert fp20 != fp0 and fp20 != fp25
    # unmasked fingerprints keep the pre-flag shape (old checkpoints match)
    assert "min_qual" not in fp0


class _FakeStdin:
    def __init__(self, data: bytes):
        import io as _io

        self.buffer = _io.BufferedReader(_io.BytesIO(data))


def test_stdin_input_matches_file(tmp_path, monkeypatch, fasta):
    """'-' reads stdin; output must equal the same file run, in both the
    in-memory and streaming drivers, plain and gzip-piped."""
    import gzip as _gzip
    import sys

    data = open(fasta, "rb").read()
    fout = str(tmp_path / "file.cfrk")
    assert main([fasta, "-k", "2", "-o", fout]) == 0
    want = open(fout, "rb").read()

    for blob, flags in [
        (data, []),
        (data, ["--stream"]),
        (_gzip.compress(data), ["--stream"]),  # zcat-less gzip pipe
        (data, ["--stream", "--devices", "2"]),  # pipe onto a dp mesh
    ]:
        out = str(tmp_path / "stdin.cfrk")
        monkeypatch.setattr(sys, "stdin", _FakeStdin(blob))
        assert main(["-", "-k", "2", "-o", out] + flags) == 0
        assert open(out, "rb").read() == want, flags


def test_stdin_refuses_resume_and_needs_output(monkeypatch, tmp_path):
    with pytest.raises(SystemExit, match="resume"):
        main(["-", "-k", "2", "-o", str(tmp_path / "o"), "--resume"])
    with pytest.raises(SystemExit, match="output"):
        main(["-", "-k", "2"])


def test_sparse_stream_budget_chunked_writer_byte_identical(tmp_path):
    """--mem-budget-mb routes output through the chunked writer
    (bounded finalize); bytes must equal the materialised writer's for
    both tsv and hist formats."""
    import numpy as np

    from cfrk_tpu.cli import main
    from cfrk_tpu.io.fasta import decode_codes

    rng = np.random.default_rng(5)
    fasta = tmp_path / "in.fasta"
    with open(fasta, "wb") as f:
        for i in range(300):
            f.write(
                b">r%d\n" % i
                + decode_codes(rng.integers(0, 4, 90).astype(np.int8))
                + b"\n"
            )
    for fmt in ("tsv", "hist"):
        outs = []
        for extra in (["--mem-budget-mb", "1"], []):
            out = tmp_path / f"{fmt}_{len(extra)}.out"
            rc = main([
                str(fasta), "-o", str(out), "--mode", "sparse", "--stream",
                "-k", "16", "--batch-size", "64",
                "--spectrum-format", fmt, *extra,
            ])
            assert rc == 0
            outs.append(out.read_bytes())
        assert outs[0] == outs[1], fmt
