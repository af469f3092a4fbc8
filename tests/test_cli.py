"""CLI twins of the reference tools (scripts/ofst.py, scripts/lfsort.py)
— same subcommands/options as fst_cmd.cpp / large_file_sort_cmd.cpp,
driven in-process against the reference's own fixtures."""

import importlib.util
import os

import pytest

from orchid_fst_spark.functions.distance import levenshtein, osa
from orchid_fst_spark.sources.fixtures import gen_dict_kv

REF = "/root/reference/src/main/fst/testdata"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ofst():
    return _load("ofst_cli", os.path.join(ROOT, "scripts", "ofst.py"))


@pytest.fixture(scope="module")
def lfsort():
    return _load("lfsort_cli", os.path.join(ROOT, "scripts", "lfsort.py"))


def _out_lines(capsys):
    return [l for l in capsys.readouterr().out.splitlines() if l]


def test_ofst_map_and_queries(spark, tmp_path, capsys, ofst):
    kvs = gen_dict_kv()
    dict_file = tmp_path / "dict.txt"
    dict_file.write_text("".join(f"{k},{v}\n" for k, v in kvs))
    idx = str(tmp_path / "idx")
    assert ofst.main(["map", "-f", str(dict_file), "-o", idx, "-l", "4"]) == 0
    capsys.readouterr()

    truth = {}
    for k, v in kvs:
        truth[k] = v  # LAST occurrence in file order wins (fst.cpp:180-189)

    some_key = sorted(truth)[3]
    assert ofst.main(["match", "-f", idx, "-q", some_key]) == 0
    assert _out_lines(capsys) == [f"{some_key},{truth[some_key]}"]

    assert ofst.main(["match", "-f", idx, "-q", "definitely-missing"]) == 1
    capsys.readouterr()

    pre = some_key[:2]
    assert ofst.main(["prefix", "-f", idx, "-p", pre]) == 0
    exp = [f"{k},{truth[k]}" for k in sorted(truth) if k.startswith(pre)]
    assert _out_lines(capsys) == exp

    lo, hi = sorted(truth)[2], sorted(truth)[10]
    assert ofst.main(["range", "-f", idx, "-a", lo, "-e", hi]) == 0
    exp = [f"{k},{truth[k]}" for k in sorted(truth) if lo <= k < hi]
    assert _out_lines(capsys) == exp

    assert ofst.main(["fuzzy", "-f", idx, "-z", "scan", "-d", "2"]) in (0, 1)
    exp = [f"{k},{truth[k]}" for k in sorted(truth) if levenshtein(k, "scan") <= 2]
    assert _out_lines(capsys) == exp

    dot = tmp_path / "out.dot"
    assert ofst.main(["dot", "-f", idx, "-o", str(dot)]) == 0
    capsys.readouterr()
    assert "digraph fst" in dot.read_text()


def test_ofst_map_duplicate_key_last_wins(spark, tmp_path, capsys, ofst):
    """`ofst map` keeps the LAST value of a repeated key in file order —
    FstBuilder::Insert's in-place update semantics (fst.cpp:180-189).
    Values are chosen so every other dedup policy (max/min/sum/first)
    would answer differently."""
    dict_file = tmp_path / "dups.txt"
    dict_file.write_text("alpha,9\nbeta,2\nalpha,3\nalpha,1\nbeta,7\n")
    idx = str(tmp_path / "dupidx")
    assert ofst.main(["map", "-f", str(dict_file), "-o", idx, "-l", "2"]) == 0
    capsys.readouterr()
    assert ofst.main(["match", "-f", idx, "-q", "alpha"]) == 0
    assert _out_lines(capsys) == ["alpha,1"]
    assert ofst.main(["match", "-f", idx, "-q", "beta"]) == 0
    assert _out_lines(capsys) == ["beta,7"]

    # same semantics through the reference binary-artifact build path
    fst = str(tmp_path / "dup.fst")
    assert ofst.main(["map", "-f", str(dict_file), "-o", fst]) == 0
    capsys.readouterr()
    assert ofst.main(["match", "-f", fst, "-q", "alpha"]) == 0
    assert _out_lines(capsys) == ["alpha,1"]


def test_ofst_query_timing_line(spark, tmp_path, capsys, ofst):
    """Every query prints the reference's per-query timing summary
    (fst_cmd.cpp:225-239/284-301) on the log stream (stderr), leaving
    stdout pure results."""
    import re

    dict_file = tmp_path / "t.txt"
    dict_file.write_text("apple,1\napricot,2\nbanana,3\n")
    idx = str(tmp_path / "tidx")
    assert ofst.main(["map", "-f", str(dict_file), "-o", idx, "-l", "2"]) == 0
    capsys.readouterr()

    assert ofst.main(["prefix", "-f", idx, "-p", "ap"]) == 0
    err = capsys.readouterr().err
    assert re.search(
        r"Totally got \[2\] results, time consumed:\[\d+\] us\.", err
    )

    assert ofst.main(["match", "-f", idx, "-q", "missing"]) == 1
    err = capsys.readouterr().err
    assert re.search(
        r"Can not found any key in dictionary! time consumed:\[\d+\] us\.", err
    )


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference testdata absent")
def test_ofst_set_reference_golden(spark, tmp_path, capsys, ofst):
    """The CLI reproduces the reference's own fuzzy goldens: set-build
    its 82k-word dict, fuzzy('hair', 2) -> 214 hits (Levenshtein),
    -m -> 220 (Damerau/OSA), byte-for-byte in order."""
    idx = str(tmp_path / "refidx")
    assert (
        ofst.main(["set", "-f", f"{REF}/fst_test_dict2.txt", "-o", idx, "-l", "8"])
        == 0
    )
    capsys.readouterr()
    assert ofst.main(["fuzzy", "-f", idx, "-z", "hair", "-d", "2"]) == 0
    got = _out_lines(capsys)
    with open(f"{REF}/fst_test_dict2_standard.txt", encoding="utf-8") as f:
        golden = [l for l in f.read().split("\n") if l.strip()]
    assert got == golden  # 214 hits

    assert ofst.main(["fuzzy", "-f", idx, "-z", "hair", "-d", "2", "-m"]) == 0
    got = _out_lines(capsys)
    with open(f"{REF}/fst_test_dict3_standard.txt", encoding="utf-8") as f:
        golden = [l for l in f.read().split("\n") if l.strip()]
    assert got == golden  # 220 hits


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference testdata absent")
def test_lfsort_reference_golden(spark, tmp_path, capsys, lfsort):
    out1 = tmp_path / "keep.txt"
    assert (
        lfsort.main(
            ["-f", f"{REF}/large_file_sort_test1_input.txt", "-o", str(out1)]
        )
        == 0
    )
    with open(f"{REF}/large_file_sort_test1_standard_contain_empty.txt") as f:
        assert out1.read_text().rstrip("\n") == f.read().rstrip("\n")
    out2 = tmp_path / "drop.txt"
    assert (
        lfsort.main(
            ["-f", f"{REF}/large_file_sort_test1_input.txt", "-o", str(out2), "-i"]
        )
        == 0
    )
    with open(f"{REF}/large_file_sort_test1_standard_ignore_empty.txt") as f:
        exp = f.read()
    got = out2.read_text()
    assert [l for l in got.split("\n") if l.strip()] == [
        l for l in exp.split("\n") if l.strip()
    ]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference testdata absent")
def test_ofst_binary_fst_artifact_goldens(spark, tmp_path, capsys, ofst):
    """Reference .fst binary-artifact interop through the CLI: set-build
    the 82k-word dict into the reference's single-file format
    (sources/fst_file.py), then reproduce the 214/220 fuzzy goldens by
    MOUNTING that binary artifact — the migration path an existing
    reference user would take."""
    fst = str(tmp_path / "dict2.fst")
    assert (
        ofst.main(["set", "-f", f"{REF}/fst_test_dict2.txt", "-o", fst, "-l", "8"])
        == 0
    )
    assert os.path.isfile(fst)
    capsys.readouterr()
    assert ofst.main(["fuzzy", "-f", fst, "-z", "hair", "-d", "2"]) == 0
    got = _out_lines(capsys)
    with open(f"{REF}/fst_test_dict2_standard.txt", encoding="utf-8") as f:
        golden = [l for l in f.read().split("\n") if l.strip()]
    assert got == golden  # 214 hits off the mounted binary artifact

    assert ofst.main(["fuzzy", "-f", fst, "-z", "hair", "-d", "2", "-m"]) == 0
    got = _out_lines(capsys)
    with open(f"{REF}/fst_test_dict3_standard.txt", encoding="utf-8") as f:
        golden = [l for l in f.read().split("\n") if l.strip()]
    assert got == golden  # 220 hits (OSA)

    # point/prefix/range work off the mounted artifact too
    assert ofst.main(["match", "-f", fst, "-q", "hair"]) == 0
    assert _out_lines(capsys) == ["hair"]
    assert ofst.main(["prefix", "-f", fst, "-p", "hairb"]) == 0
    pre_hits = _out_lines(capsys)
    assert pre_hits and all(k.startswith("hairb") for k in pre_hits)
