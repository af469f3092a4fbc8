"""Reference .fst binary artifact interop (sources/fst_file.py):
byte-level format invariants from the spec (fst.cpp:33-121,
fst.h:199-217), writer/reader round-trips, and the Spark mount path."""

import struct

import pytest

from orchid_fst_spark.sources.fixtures import gen_dict_kv, gen_dict_words
from orchid_fst_spark.sources.fst_file import (
    FstWriter,
    fst_file_to_df,
    df_to_fst_file,
    read_fst_bytes,
    read_fst_file,
    write_fst_bytes,
)


def _u64(buf, off):
    return struct.unpack_from("<Q", buf, off)[0]


def test_header_and_terminate_node_layout():
    """Format invariants straight from the spec: 8-byte root address
    patched by Finish (fst.cpp:117-121), hasOutput byte at offset 8,
    the shared final terminate node dumped first at offset 9 with type
    byte 0x01 (final, no transitions, no finalOutput; fst.h:214-217)."""
    buf = write_fst_bytes([(b"ab", 0), (b"cd", 0)], has_output=False)
    assert buf[8] == 0  # set mode
    assert buf[9] == 0x01  # terminate node: isFinal, transCnt code 00
    root = _u64(buf, 0)
    assert 9 < root < len(buf)
    # root node: not final, two transitions ('a','c') -> type 0b100
    assert buf[root] == 0x04
    assert buf[root + 1] == 2  # transition count byte
    assert buf[root + 2] == ord("a")  # transitions sorted ascending

    bufm = write_fst_bytes([(b"ab", 5)], has_output=True)
    assert bufm[8] == 1  # map mode
    root = _u64(bufm, 0)
    # root: one transition, not final, no finalOutput -> type 0x02
    assert bufm[root] == 0x02


def test_single_transition_node_encoding():
    """A chain key produces transCnt-code-01 nodes with no count byte
    (fst.cpp:59-75): set-mode node size is exactly 1 + 1 + 8 bytes."""
    buf = write_fst_bytes([(b"ab", 0)], has_output=False)
    root = _u64(buf, 0)
    # root is a 1-transition node: type, input 'a', 8-byte target
    assert buf[root] == 0x02
    assert buf[root + 1] == ord("a")
    mid = _u64(buf, root + 2)
    assert buf[mid] == 0x02
    assert buf[mid + 1] == ord("b")
    assert _u64(buf, mid + 2) == 9  # 'b' leads to the terminate node


def test_roundtrip_set_mode():
    words = sorted(gen_dict_words(2000))
    buf = write_fst_bytes(
        [(w.encode(), 0) for w in words], has_output=False
    )
    got = [(k.decode(), v) for k, v in read_fst_bytes(buf)]
    assert [k for k, _ in got] == words  # lexicographic enumeration
    assert all(v is None for _, v in got)


def test_roundtrip_map_mode_value_redistribution():
    """Map-mode values survive the prefix push/re-distribution exactly
    (fst.cpp:132-219), including duplicate-key last-wins updates."""
    kv = sorted(gen_dict_kv())
    # collapse dups last-wins, as the byte-order insert stream would
    items = [(k.encode(), int(v)) for k, v in kv]
    buf = write_fst_bytes(items, has_output=True)
    truth = {}
    for k, v in items:
        truth[k] = v  # last wins
    got = {k: v for k, v in read_fst_bytes(buf)}
    assert got == truth


def test_suffix_sharing_dedup():
    """Shared suffixes dedup to shared nodes (FreezeNode's node map,
    fst.cpp:105-115): n keys with one shared long suffix must not cost
    n copies of the suffix chain."""
    suffix = "ing" * 20
    keys = sorted(f"{p}{suffix}" for p in ["aa", "bb", "cc", "dd"])
    buf_shared = write_fst_bytes([(k.encode(), 0) for k in keys], False)
    buf_one = write_fst_bytes([(keys[0].encode(), 0)], False)
    # the 4-key file is far smaller than 4x the 1-key file
    assert len(buf_shared) < 2 * len(buf_one)
    assert [k.decode() for k, _ in read_fst_bytes(buf_shared)] == keys


def test_out_of_order_and_oversized_rejected():
    w = FstWriter(has_output=False)
    w.insert(b"bb")
    with pytest.raises(ValueError):
        w.insert(b"aa")
    with pytest.raises(ValueError):
        write_fst_bytes(
            sorted((bytes([b]) * 2, 0) for b in range(256)), False
        )


def test_export_streams_off_driver(spark, tmp_path, monkeypatch):
    """The export path must never materialize the whole dictionary as a
    driver row list: collect() is forbidden (patched to raise) and the
    rows stream through toLocalIterator one partition at a time.  A
    multi-partition unsorted input also pins that the cluster-side
    orderBy on encoded bytes, not driver-side sorting, produces the
    byte order the format requires."""
    from pyspark.sql import DataFrame

    words = gen_dict_words(3000)
    df = (
        spark.createDataFrame([(w,) for w in words], "key string")
        .dropDuplicates(["key"])
        .repartition(8)
    )

    def _no_collect(self):
        raise AssertionError("df_to_fst_file must not collect()")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    path = str(tmp_path / "streamed.fst")
    df_to_fst_file(df, path)
    monkeypatch.undo()
    got = [k.decode() for k, _ in read_fst_file(path)]
    assert got == sorted(set(words))


def test_spark_mount_and_export(spark, tmp_path):
    """DataFrame -> .fst -> DataFrame round-trip through the migration
    entry points; mounted dictionary feeds the live fuzzy operator."""
    from orchid_fst_spark.operators import build_dict, fuzzy_lookup
    from orchid_fst_spark.sources.fixtures import fuzzy_golden

    words = gen_dict_words(1500)
    df = spark.createDataFrame([(w,) for w in words], "key string")
    d = build_dict(df, "key")
    path = str(tmp_path / "dict.fst")
    df_to_fst_file(d, path)
    mounted = fst_file_to_df(spark, path)
    assert sorted(r.key for r in mounted.collect()) == sorted(set(words))
    got = [r.key for r in fuzzy_lookup(mounted, "hair", 2).collect()]
    assert got == fuzzy_golden(words, "hair", 2, damerau=False)

    # map mode with values
    kv = spark.createDataFrame(gen_dict_kv(), "key string, value long")
    dkv = build_dict(kv, "key", "value", dedup="max")
    path2 = str(tmp_path / "dict_kv.fst")
    df_to_fst_file(dkv, path2)
    back = {(r.key, r.value) for r in fst_file_to_df(spark, path2).collect()}
    assert back == {(r.key, r.value) for r in dkv.collect()}
