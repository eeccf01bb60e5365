"""Golden stdout parity suite: every test here is a port of the reference's
CLI integration tests (reference tests/test_cmdline.rs) with the expected
stdout strings copied verbatim — the byte-exact parity contract
(BASELINE.md correctness gate)."""

import pytest

from smafa_tpu.cli import main

D = "tests/data"


def run(capsys, *argv):
    code = main(list(argv))
    captured = capsys.readouterr()
    return code, captured.out, captured.err


def test_dna_makedb_and_query(capsys, tmp_path):
    # reference tests/test_cmdline.rs:10-25
    t = str(tmp_path / "db")
    code, out, err = run(capsys, "makedb", "-i", f"{D}/random_3_2.fna", "-d", t)
    assert code == 0
    code, out, err = run(capsys, "query", "-d", t, "-q", f"{D}/random_3_2.fna")
    assert code == 0
    assert out == "0\t0\t0\tCTT\n1\t1\t0\tAGG\n"


def test_makedb_output_is_byte_identical_to_reference(capsys, tmp_path):
    t = tmp_path / "db"
    code, _, _ = run(capsys, "makedb", "-i", f"{D}/random_3_2.fna", "-d", str(t))
    assert code == 0
    assert t.read_bytes() == open(f"{D}/random_3_2.fna.smafadb", "rb").read()


def test_old_db_version(capsys):
    # reference tests/test_cmdline.rs:28-41
    code, out, err = run(
        capsys, "query", "-d", f"{D}/random_3_2.fna.v1.smafadb", "-q", f"{D}/random_3_2.fna"
    )
    assert code != 0
    assert "Unsupported db file version: 1." in err


def test_degenerate_makedb_and_query(capsys, tmp_path):
    # reference tests/test_cmdline.rs:44-74
    t = str(tmp_path / "db")
    assert run(capsys, "makedb", "-i", f"{D}/degenerate.fna", "-d", t)[0] == 0
    code, out, err = run(
        capsys, "query", "-d", t, "-q", f"{D}/degenerate.fna", "--max-num-hits", "99"
    )
    assert code == 0
    assert out == (
        "0\t0\t0\tCTTNGG\n"
        "0\t1\t5\tAGGTGA\n"
        "0\t2\t6\tNACTTT\n"
        "1\t1\t0\tAGGTGA\n"
        "1\t0\t5\tCTTNGG\n"
        "1\t2\t5\tNACTTT\n"
        "2\t2\t0\tNACTTT\n"
        "2\t1\t5\tAGGTGA\n"
        "2\t0\t6\tCTTNGG\n"
    )


def test_query_max_divergence_unlimited(capsys):
    # reference tests/test_cmdline.rs:77-99
    code, out, _ = run(
        capsys, "query", "-d", f"{D}/random_3_2.fna.smafadb", "-q", f"{D}/random_3_2.fna",
        "--max-divergence", "99", "--max-num-hits", "99",
    )
    assert code == 0
    assert out == "0\t0\t0\tCTT\n0\t1\t3\tAGG\n1\t1\t0\tAGG\n1\t0\t3\tCTT\n"


def test_query_max_divergence_limited(capsys):
    # reference tests/test_cmdline.rs:102-120
    code, out, _ = run(
        capsys, "query", "-d", f"{D}/random_3_2.fna.smafadb", "-q", f"{D}/random_3_2.fna",
        "--max-divergence", "2", "--max-num-hits", "99",
    )
    assert code == 0
    assert out == "0\t0\t0\tCTT\n1\t1\t0\tAGG\n"


def test_query_max_divergence_equal(capsys):
    # reference tests/test_cmdline.rs:123-141 (boundary: divergence == cutoff)
    code, out, _ = run(
        capsys, "query", "-d", f"{D}/random_3_2.fna.smafadb", "-q", f"{D}/random_3_2.fna",
        "--max-divergence", "3", "--max-num-hits", "99",
    )
    assert code == 0
    assert out == "0\t0\t0\tCTT\n0\t1\t3\tAGG\n1\t1\t0\tAGG\n1\t0\t3\tCTT\n"


def test_query_max_num_hits1(capsys):
    # reference tests/test_cmdline.rs:144-161 (K=1 == best-hit mode)
    code, out, _ = run(
        capsys, "query", "-d", f"{D}/random_3_2.fna.smafadb", "-q", f"{D}/random_3_2.fna",
        "--max-num-hits", "1",
    )
    assert code == 0
    assert out == "0\t0\t0\tCTT\n1\t1\t0\tAGG\n"


def test_query_max_num_hits_more(capsys):
    # reference tests/test_cmdline.rs:164-181 (K > num windows -> print all)
    code, out, _ = run(
        capsys, "query", "-d", f"{D}/random_3_2.fna.smafadb", "-q", f"{D}/random_3_2.fna",
        "--max-num-hits", "99",
    )
    assert code == 0
    assert out == "0\t0\t0\tCTT\n0\t1\t3\tAGG\n1\t1\t0\tAGG\n1\t0\t3\tCTT\n"


def test_fna_count(capsys):
    # reference tests/test_cmdline.rs:184-191
    code, out, _ = run(capsys, "count", "-i", f"{D}/random_3_2.fna")
    assert code == 0
    assert out == '[{"path":"tests/data/random_3_2.fna","num_reads":2,"num_bases":6}]\n'


def test_fq_gz_count(capsys):
    # reference tests/test_cmdline.rs:194-201 (gzip autodetect)
    code, out, _ = run(capsys, "count", "-i", f"{D}/random_30_4.fq.gz")
    assert code == 0
    assert out == '[{"path":"tests/data/random_30_4.fq.gz","num_reads":4,"num_bases":120}]\n'


def test_limit_per_sequence_max_num_hits_2_no_limit(capsys):
    # reference tests/test_cmdline.rs:204-224 (repeated subject in db)
    code, out, _ = run(
        capsys, "query", "-d", f"{D}/random_3_2_one_repeated.fna.smafadb",
        "-q", f"{D}/random_3_2.fna", "--max-num-hits", "99",
    )
    assert code == 0
    assert out == (
        "0\t0\t0\tCTT\n0\t1\t3\tAGG\n0\t2\t3\tAGG\n"
        "1\t1\t0\tAGG\n1\t2\t0\tAGG\n1\t0\t3\tCTT\n"
    )


def test_limit_per_sequence_max_num_hits_2_limit1(capsys):
    # reference tests/test_cmdline.rs:227-247
    code, out, _ = run(
        capsys, "query", "-d", f"{D}/random_3_2_one_repeated.fna.smafadb",
        "-q", f"{D}/random_3_2.fna", "--max-num-hits", "99", "--limit-per-sequence", "1",
    )
    assert code == 0
    assert out == "0\t0\t0\tCTT\n0\t1\t3\tAGG\n1\t1\t0\tAGG\n1\t0\t3\tCTT\n"


def test_limit_per_sequence_requires_k_mode(capsys):
    # reference lib.rs:301-303 panic text
    code, out, err = run(
        capsys, "query", "-d", f"{D}/random_3_2.fna.smafadb", "-q", f"{D}/random_3_2.fna",
        "--limit-per-sequence", "1",
    )
    assert code != 0
    assert "limit_per_sequence is implemented unless max_num_hits > 1" in err


def test_no_subcommand_prints_help(capsys):
    code, out, _ = run(capsys)
    assert code == 0
    assert "makedb" in out and "query" in out and "cluster" in out and "count" in out


def test_native_db_roundtrip(capsys, tmp_path):
    # framework extension: native format produces identical query output
    t = str(tmp_path / "db.native")
    assert run(capsys, "makedb", "-i", f"{D}/degenerate.fna", "-d", t, "--format", "native")[0] == 0
    code, out, _ = run(capsys, "query", "-d", t, "-q", f"{D}/degenerate.fna",
                       "--max-num-hits", "99")
    assert code == 0
    assert out.startswith("0\t0\t0\tCTTNGG\n")
    assert out.count("\n") == 9


def test_count_missing_input_usage_error(capsys):
    # Reference count's -i IS .required(true) (main.rs:111) — unlike
    # cluster's -d — so clap rejects a fully absent -i as a usage error
    # (exit 2) before main.rs:49's unwrap can run. `-i` with zero values
    # (num_args(0..), main.rs:113) stays the legal empty-array case.
    with pytest.raises(SystemExit) as ei:
        main(["count"])
    assert ei.value.code == 2
    capsys.readouterr()
    rc = main(["count", "-i"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "[]"


def test_max_num_hits_zero_exits_101(capsys, data_dir):
    # Reference underflows max_num_hits - 1 and panics on an out-of-
    # bounds index (lib.rs:253-256); we raise a clean message. Same exit
    # code (101), clearer text — documented divergence (docs/API.md).
    rc = main([
        "query", "-d", str(data_dir / "random_3_2.fna.smafadb"),
        "-q", str(data_dir / "random_3_2.fna"), "--max-num-hits", "0",
    ])
    assert rc == 101
    assert "max-num-hits must be >= 1" in capsys.readouterr().err


def test_cluster_missing_max_divergence_exits_101(capsys, data_dir):
    # Reference clap accepts a missing -d then dies on .unwrap() with the
    # Rust panic exit code (main.rs:43,104) — not an argparse usage error.
    rc = main(["cluster", "-i", str(data_dir / "cluster_bug1.fna")])
    assert rc == 101
    assert "unwrap()" in capsys.readouterr().err


def test_help_shows_author(capsys):
    with pytest.raises(SystemExit):
        main(["--help"])
    assert "Ben J. Woodcroft" in capsys.readouterr().out


def test_u32_flag_parsing_exit2(capsys, data_dir):
    # Reference clap parses these as u32: negative/non-integer values are
    # usage errors (exit 2) before any op runs (main.rs:87-97, 104-107).
    import pytest

    for argv in (
        ["query", "-d", "x", "-q", "y", "--max-divergence", "-1"],
        ["query", "-d", "x", "-q", "y", "--max-num-hits", "-3"],
        ["query", "-d", "x", "-q", "y", "--limit-per-sequence", "zz"],
        ["cluster", "-i", "x", "-d", "-2"],
    ):
        with pytest.raises(SystemExit) as ei:
            main(argv)
        assert ei.value.code == 2, argv
        capsys.readouterr()
