"""Ingestion loaders (S4-S8) + example-based schema inference (A5)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from bids2table_spark.sources.text import (
    conform_to_example,
    csv_source,
    infer_field_type,
    json_dict_source,
    schema_from_example,
    tsv_array_column,
    tsv_source,
    with_source_path,
)


def test_csv_roundtrip_quoted(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'has,comma and "quote"'), (2, "plain")], "id long, s string"
    )
    path = str(tmp_path / "c")
    df.coalesce(1).write.option("header", True).csv(path)
    back = csv_source(spark, path, schema="id long, s string")
    assert {(r["id"], r["s"]) for r in back.collect()} == {
        (1, 'has,comma and "quote"'), (2, "plain")
    }


def test_tsv_array_cells(spark, tmp_path):
    df = spark.createDataFrame([(1, "1.5,2.5,3.0"), (2, "4.0")], "id long, v string")
    path = str(tmp_path / "t")
    df.coalesce(1).write.option("header", True).option("sep", "\t").csv(path)
    back = tsv_array_column(tsv_source(spark, path, schema="id long, v string"), "v", cast="double")
    got = {r["id"]: r["v"] for r in back.collect()}
    assert got == {1: [1.5, 2.5, 3.0], 2: [4.0]}


def test_json_dict_source(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 3, "s": "x"}'), (2, "not json"), (3, None)], "id long, j string"
    )
    out = json_dict_source(df, "j", "k int, s string")
    got = {r["id"]: (r["j_parsed"]["k"] if r["j_parsed"] else None) for r in out.collect()}
    assert got == {1: 3, 2: None, 3: None}


def test_with_source_path(spark, tmp_path):
    p = str(tmp_path / "p")
    spark.range(5).write.parquet(p)
    out = with_source_path(spark.read.parquet(p))
    assert all(r["source_path"].startswith("file:") for r in out.collect())


def test_infer_field_types():
    assert isinstance(infer_field_type(True), T.BooleanType)
    assert isinstance(infer_field_type(3), T.LongType)
    assert isinstance(infer_field_type(3.5), T.DoubleType)
    assert isinstance(infer_field_type(b"x"), T.BinaryType)
    assert isinstance(infer_field_type(dt.datetime.now()), T.TimestampType)
    assert isinstance(infer_field_type(dt.date.today()), T.DateType)
    arr = infer_field_type([1, 2])
    assert isinstance(arr, T.ArrayType) and isinstance(arr.elementType, T.LongType)
    st = infer_field_type({"a": 1, "b": "x"})
    assert isinstance(st, T.StructType) and st.fieldNames() == ["a", "b"]
    with pytest.raises(TypeError):
        infer_field_type(object())


def test_conform_to_example(spark):
    df = spark.createDataFrame([(1, "2.5", "zz")], "a int, b string, extra string")
    out = conform_to_example(df, {"b": 0.0, "missing": "", "a": 0})
    assert out.columns == ["b", "missing", "a"]
    row = out.collect()[0]
    assert row["b"] == 2.5 and row["missing"] is None and row["a"] == 1
    assert schema_from_example({"x": [1.0]}).simpleString() == "struct<x:array<double>>"


# ------------------------------------------------- S9 binary-file ingestion

def test_binary_file_source_roundtrip(spark, tmp_path):
    from bids2table_spark.operators.multimodal import media_payload
    from bids2table_spark.sources.binary import media_from_files, write_media_files

    root = write_media_files(str(tmp_path / "media"), n=30, seed=7)
    df = media_from_files(spark, root).orderBy("media_id")
    rows = df.collect()
    assert len(rows) == 30
    for r in rows:
        payload, kind = media_payload(7, r["media_id"])
        assert bytes(r["payload"]) == payload
        assert r["kind"] == kind
        assert r["n_bytes"] == len(payload)


def test_binary_file_source_is_idempotent_and_globbed(spark, tmp_path):
    from bids2table_spark.sources.binary import (
        binary_file_source,
        write_media_files,
    )

    root = write_media_files(str(tmp_path / "m"), n=10, seed=7)
    # second call: marker short-circuits (no rewrite)
    import os

    mtimes = {f: os.path.getmtime(os.path.join(root, f)) for f in os.listdir(root)}
    assert write_media_files(root, n=10, seed=7) == root
    assert mtimes == {f: os.path.getmtime(os.path.join(root, f)) for f in os.listdir(root)}
    # glob filter prunes at listing time (marker + non-matching never read)
    only_png = binary_file_source(spark, root, glob="*.png")
    assert only_png.count() == sum(1 for f in os.listdir(root) if f.endswith(".png"))


def test_binary_file_metadata_only_prunes_content(spark, tmp_path):
    """Selecting only path/length must not ship the payload bytes: the scan's
    ReadSchema excludes `content` (the lazy half of FilePointer)."""
    from bids2table_spark.plans import scan_pushdown
    from bids2table_spark.sources.binary import binary_file_source, write_media_files

    root = write_media_files(str(tmp_path / "m2"), n=5, seed=7)
    meta_only = binary_file_source(spark, root).select("path", "length")
    info = scan_pushdown(meta_only)
    assert info["read_schema"]  # the plan exposes the scan schema
    assert "content" not in info["read_schema"]


def test_path_list_source_parses_comments(spark, tmp_path):
    from bids2table_spark.sources.binary import path_list_source

    lst = tmp_path / "list.txt"
    lst.write_text("# comment\n\n/a/b.png\n  /c/d.wav  \n#skip\n/e/f.mp4\n")
    got = sorted(r["path"] for r in path_list_source(spark, str(lst)).collect())
    assert got == ["/a/b.png", "/c/d.wav", "/e/f.mp4"]


def test_binaries_from_path_list_loads_only_listed(spark, tmp_path):
    import os

    from bids2table_spark.sources.binary import (
        binaries_from_path_list,
        path_list_source,
        write_media_files,
    )

    root = write_media_files(str(tmp_path / "m"), n=12, seed=7)
    names = sorted(f for f in os.listdir(root) if f.startswith("media_"))
    picked = names[::3]
    lst = tmp_path / "wl.txt"
    lst.write_text("\n".join(os.path.join(root, f) for f in picked) + "\n")
    df = binaries_from_path_list(spark, root, path_list_source(spark, str(lst)))
    got = sorted(os.path.basename(r["path"]) for r in df.select("path").collect())
    assert got == sorted(picked)
    # large-list fallback path: force the semi-join branch
    df2 = binaries_from_path_list(
        spark, root, path_list_source(spark, str(lst)), max_driver_paths=1
    )
    got2 = sorted(os.path.basename(r["path"]) for r in df2.select("path").collect())
    assert got2 == sorted(picked)
    # empty work list -> empty result, driver branch
    empty = tmp_path / "empty.txt"
    empty.write_text("# nothing\n")
    assert binaries_from_path_list(spark, root, path_list_source(spark, str(empty))).count() == 0


def test_path_list_source_npy(spark, tmp_path):
    """.npy work lists (numpy array of path strings) load like .txt lists."""
    import numpy as np

    from bids2table_spark.sources.binary import path_list_source

    lst = tmp_path / "work.npy"
    np.save(lst, np.array(["/data/a.bin", "/data/b.bin", "  ", "#skip"]))
    got = sorted(r["path"] for r in path_list_source(spark, str(lst)).collect())
    assert got == ["/data/a.bin", "/data/b.bin"]

    bad = tmp_path / "bad.npy"
    np.save(bad, np.arange(4))
    import pytest

    with pytest.raises(TypeError, match="strings"):
        path_list_source(spark, str(bad))


def test_iceberg_probe_actually_loads_class(spark):
    """py4j returns a JavaPackage for missing classes without raising, so
    the availability probe must Class.forName — in this sandbox (no
    Iceberg jar) it must be False, keeping read_table on the parquet path."""
    from bids2table_spark.sources import iceberg_available

    assert iceberg_available(spark) is False


def test_tsv_array_metachar_separator(spark):
    from bids2table_spark.sources.text import tsv_array_column

    df = spark.createDataFrame([("1|2|3",), ("4.5|6",)], "v string")
    out = tsv_array_column(df, "v", sep="|").collect()
    assert [r["v"] for r in out] == [["1", "2", "3"], ["4.5", "6"]]
    df2 = spark.createDataFrame([("a.b.c",)], "v string")
    assert tsv_array_column(df2, "v", sep=".").collect()[0]["v"] == ["a", "b", "c"]


def test_media_fixture_rewrite_clears_stale_files(tmp_path):
    from bids2table_spark.sources.binary import write_media_files

    root = str(tmp_path / "media")
    write_media_files(root, n=10, seed=42)
    write_media_files(root, n=4, seed=7)
    import glob

    files = glob.glob(f"{root}/media_*.*")
    assert len(files) == 4
