"""Widened type-system round-trip: boolean, float32, date, binary,
list<primitive>, struct (flattened), with null patterns at every level.

Reference parity: the reference's cell type system covers nested
lists/structs (``bids2table/schema.py:101-150``), 1-D ndarrays
(``extensions/ndarray.py:19-74``) and opaque binary
(``extensions/pickle.py:43-66``); these tests pin the Spark-first
re-expression to exact equality."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bids2table_spark.blocks import decode_block, encode_block_arrow
from bids2table_spark.decode import decode_table
from bids2table_spark.encode import encode_table

KEY = ["conv_id", "turn_idx"]


def _typed_df(spark, n_conv=40):
    from pyspark.sql import functions as F

    from bids2table_spark.synth import synth_transcripts

    tr = synth_transcripts(spark, n_conv=n_conv, seed=11, n_pt=3)
    return tr.select(
        "conv_id",
        "turn_idx",
        "pt",
        (F.col("turn_idx") % 2 == 0).alias("flag"),
        F.when(F.col("turn_idx") % 9 == 0, F.lit(None))
        .otherwise((F.xxhash64("conv_id", "turn_idx") % 1000).cast("float") / 8)
        .alias("score"),
        F.to_date("ts").alias("day"),
        F.when(F.length("text") > 0, F.encode("text", "utf-8")).alias("payload"),
        F.when(
            F.col("turn_idx") % 5 == 0, F.array().cast("array<float>")
        )
        .otherwise(
            F.array(
                (F.xxhash64("conv_id") % 97).cast("float"),
                (F.xxhash64("turn_idx") % 89).cast("float"),
            )
        )
        .alias("vec"),
        F.when(F.col("turn_idx") % 7 == 0, F.lit(None))
        .otherwise(F.array(F.xxhash64("conv_id"), F.col("turn_idx").cast("long")))
        .alias("ids"),
        F.split("text", r"\s+").alias("tags"),
        F.when(
            F.col("turn_idx") % 4 == 0, F.lit(None)
        )
        .otherwise(
            F.struct(
                F.col("turn_idx").alias("k"),
                F.when(F.col("turn_idx") % 3 == 0, F.lit(None))
                .otherwise(F.col("role"))
                .alias("w"),
            )
        )
        .alias("meta"),
    )


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf[sorted(pdf.columns)].sort_values(KEY, ignore_index=True)


def _assert_frames_exact(a: pd.DataFrame, b: pd.DataFrame):
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype == object:
            for i, (x, y) in enumerate(zip(av, bv)):
                if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
                    assert list(x) == list(y), f"{c}[{i}]: {x!r} != {y!r}"
                else:
                    assert (x is None and y is None) or x == y, f"{c}[{i}]: {x!r} != {y!r}"
        else:
            pd.testing.assert_series_equal(av, bv, check_exact=True, obj=c)


def test_typed_table_roundtrip(spark):
    t = _typed_df(spark).cache()
    blocks = encode_table(t, block_rows=1024, target_group_rows=4096)
    dec = decode_table(blocks)
    _assert_frames_exact(_sorted_pdf(t), _sorted_pdf(dec))
    t.unpersist()


def test_typed_encode_job_roundtrip(spark, tmp_path):
    from bids2table_spark.manifest import decode_job, encode_job

    t = _typed_df(spark, n_conv=30).cache()
    out = str(tmp_path / "typed")
    s = encode_job(spark, t, out, run_id="typed", target_group_rows=4096)
    assert s["groups_failed"] == 0
    _assert_frames_exact(_sorted_pdf(t), _sorted_pdf(decode_job(spark, out)))
    t.unpersist()


# ------------------------------------------------------- block-level edges


def _roundtrip_arr(arr: pa.Array, phys: str, codec: str = "plain") -> pa.Array:
    row = encode_block_arrow("p", "g", 0, "c", arr, phys, codec)
    return decode_block(row, verify=True)


def test_bool_block_all_codecs(spark):
    arr = pa.array([True, True, None, False, True] * 100)
    for codec in ("plain", "rle", "forbp", "dict"):
        out = _roundtrip_arr(arr, "boolean", codec)
        assert out.cast(pa.bool_()).to_pylist() == arr.to_pylist()


def test_float32_block_exact_bits():
    vals = np.array([0.1, -1e30, 3.14159, np.inf, 65504.0], dtype=np.float32)
    arr = pa.array(vals, type=pa.float32())
    out = _roundtrip_arr(arr, "float", "plain")
    np.testing.assert_array_equal(
        out.to_numpy(zero_copy_only=False).view(np.uint32),
        vals.view(np.uint32),
    )


def test_date_block_delta():
    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(50)]
    arr = pa.array(days + [None], type=pa.date32())
    out = _roundtrip_arr(arr, "date", "delta")
    assert out.to_pylist() == arr.to_pylist()


def test_binary_block_nul_bytes():
    vals = [b"\x00\x01", b"", None, b"\x00", b"ab\x00cd", b"\xff" * 33]
    arr = pa.array(vals, type=pa.binary())
    for codec in ("plain", "dict", "rle", "fsst"):
        out = _roundtrip_arr(arr, "binary", codec)
        assert out.to_pylist() == vals, codec


def test_list_block_empty_and_null_lists():
    vals = [[1.5, 2.5], [], None, [3.25], [None, 4.0], []]
    arr = pa.array(vals, type=pa.list_(pa.float64()))
    out = _roundtrip_arr(arr, "list<double>", "plain")
    assert out.to_pylist() == vals


def test_list_block_string_child():
    vals = [["a", "b"], None, ["", "c", None], []]
    arr = pa.array(vals, type=pa.list_(pa.string()))
    for codec in ("plain", "dict", "fsst"):
        out = _roundtrip_arr(arr, "list<string>", codec)
        assert out.to_pylist() == vals, codec


def test_list_block_sliced_input():
    vals = [[1, 2], [3], [4, 5, 6], [7]]
    arr = pa.array(vals, type=pa.list_(pa.int64())).slice(1, 2)
    out = _roundtrip_arr(arr, "list<long>", "forbp")
    assert out.to_pylist() == [[3], [4, 5, 6]]


def test_checksum_catches_corruption():
    arr = pa.array([b"abc", b"def"], type=pa.binary())
    row = encode_block_arrow("p", "g", 0, "c", arr, "binary", "plain")
    row["payload"] = row["payload"][:-1] + bytes([row["payload"][-1] ^ 0xFF])
    with pytest.raises(ValueError, match="checksum"):
        decode_block(row, verify=True)


def test_nested_list_rejected():
    from pyspark.sql import types as T

    from bids2table_spark.blocks import spark_field_phys

    with pytest.raises(TypeError):
        spark_field_phys(T.ArrayType(T.ArrayType(T.IntegerType())))


def test_zone_key_value_order_preserving():
    """Lexicographic order of zone_key_value images must equal native order
    for every supported key type (the zone-map pruning contract)."""
    import datetime

    from bids2table_spark.blocks import zone_key_value

    cases = [
        [-(2**62), -1000, -1, 0, 1, 9, 11, 1000, 2**62],
        [-1e300, -3.5, -0.0, 0.0, 1e-9, 2.5, 1e300],
        [datetime.datetime(1969, 7, 20), datetime.datetime(2024, 1, 1),
         datetime.datetime(2024, 1, 1, 0, 0, 1)],
        [datetime.date(1969, 12, 31), datetime.date(1970, 1, 1),
         datetime.date(2024, 6, 1)],
        [b"", b"\x00", b"\x00\x01", b"ab", b"ab\x00", b"\xff"],
        ["", "a", "ab", "b"],
    ]
    for vals in cases:
        imgs = [zone_key_value(v) for v in vals]
        assert imgs == sorted(imgs), (vals, imgs)
    assert zone_key_value(None) is None


def test_decode_job_struct_leaf_column(spark, tmp_path):
    """Requesting a single struct LEAF must pull in the parent's validity
    leaf and decode cleanly (ADVICE round 2: KeyError inside the UDF)."""
    from pyspark.sql import functions as F

    from bids2table_spark.manifest import decode_job, encode_job

    t = _typed_df(spark, n_conv=20).cache()
    out = str(tmp_path / "leaf")
    encode_job(spark, t, out, run_id="leaf", target_group_rows=4096)
    dec = decode_job(spark, out, columns=["conv_id", "turn_idx", "meta·k"])
    pdf = _sorted_pdf(dec)
    want = _sorted_pdf(
        t.select(
            "pt", "conv_id", "turn_idx",
            F.when(
                F.col("meta").isNotNull(), F.struct(F.col("meta.k").alias("k"))
            ).alias("meta"),
        )
    )
    _assert_frames_exact(want, pdf)
    t.unpersist()


# ------------------------------------------------- round-3 nesting depth


def _nested_df(spark, n_conv=30):
    """Realistic agent-transcript nesting: tool-call struct with nested args
    struct, a list<struct> of content parts, and a 2-D ndarray packed as
    the reference's {data, shape} struct."""
    from pyspark.sql import functions as F

    from bids2table_spark.functions import pack_ndarray
    from bids2table_spark.synth import synth_transcripts

    tr = synth_transcripts(spark, n_conv=n_conv, seed=23, n_pt=3)
    mat = F.array(
        F.array((F.col("turn_idx") * 2).cast("float"), F.lit(1.5)),
        F.array(F.xxhash64("conv_id").cast("float"), F.lit(-0.25)),
        F.array(F.lit(0.0), (F.col("turn_idx") + 1).cast("float")),
    )
    return tr.select(
        "conv_id",
        "turn_idx",
        "pt",
        F.when(F.col("turn_idx") % 4 == 0, F.lit(None))
        .otherwise(
            F.struct(
                F.col("tool").alias("name"),
                F.when(F.col("turn_idx") % 3 == 0, F.lit(None))
                .otherwise(
                    F.struct(
                        F.col("turn_idx").cast("long").alias("timeout"),
                        F.substring("text", 1, 16).alias("cmd"),
                    )
                )
                .alias("args"),
                (F.col("turn_idx") % 2 == 0).alias("ok"),
            )
        )
        .alias("call"),
        F.when(F.col("turn_idx") % 5 == 0, F.lit(None))
        .otherwise(
            F.array(
                F.struct(F.lit("text").alias("kind"), F.substring("text", 1, 8).alias("body")),
                F.when(
                    F.col("turn_idx") % 2 == 0,
                    F.struct(F.col("role").alias("kind"), F.lit(None).cast("string").alias("body")),
                ),
            )
        )
        .alias("parts"),
        F.when(F.col("turn_idx") % 7 == 0, F.lit(None))
        .otherwise(pack_ndarray(mat, ndim=2))
        .alias("mat"),
    )


def test_nested_struct_and_list_struct_roundtrip(spark):
    t = _nested_df(spark).cache()
    blocks = encode_table(t, block_rows=1024, target_group_rows=4096)
    dec = decode_table(blocks)
    a, b = _sorted_pdf(t), _sorted_pdf(dec)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c], b[c])):
            assert _py_eq(x, y), f"{c}[{i}]: {x!r} != {y!r}"
    t.unpersist()


def _py_eq(x, y):
    import numpy as np

    if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
        if len(x) != len(y):
            return False
        return all(_py_eq(a, b) for a, b in zip(x, y))
    if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
        return len(x) == len(y) and all(_py_eq(a, b) for a, b in zip(x, y))
    if isinstance(x, dict) and isinstance(y, dict):
        return x.keys() == y.keys() and all(_py_eq(x[k], y[k]) for k in x)
    if x is None or y is None:
        return x is None and y is None
    if isinstance(x, float) and isinstance(y, float):
        return np.float64(x).tobytes() == np.float64(y).tobytes()
    return x == y


def test_ndarray_pack_unpack_inverse(spark):
    from pyspark.sql import functions as F

    from bids2table_spark.functions import pack_ndarray, unpack_ndarray

    df = spark.createDataFrame(
        [(1, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]), (2, [[7.5]]), (3, None), (4, [])],
        "id int, m array<array<double>>",
    )
    out = (
        df.withColumn("packed", pack_ndarray(F.col("m"), ndim=2))
        .withColumn("back", unpack_ndarray(F.col("packed"), ndim=2))
        .select("id", "m", "packed.shape", "back")
        .orderBy("id")
        .collect()
    )
    assert out[0]["shape"] == [3, 2] and out[0]["back"] == out[0]["m"]
    assert out[1]["shape"] == [1, 1] and out[1]["back"] == out[1]["m"]
    assert out[2]["shape"] is None and out[2]["back"] is None
    assert out[3]["shape"] == [0, 0] and list(out[3]["back"]) == []


def test_nested_encode_job_and_leaf_projection(spark, tmp_path):
    from bids2table_spark.manifest import decode_job, encode_job

    t = _nested_df(spark, n_conv=20).cache()
    out = str(tmp_path / "nested")
    s = encode_job(spark, t, out, run_id="nested", target_group_rows=4096)
    assert s["groups_failed"] == 0
    dec = decode_job(spark, out)
    a, b = _sorted_pdf(t), _sorted_pdf(dec)
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c], b[c])):
            assert _py_eq(x, y), f"{c}[{i}]: {x!r} != {y!r}"
    # deep leaf projection pulls in every ancestor validity leaf
    leaf = decode_job(spark, out, columns=["conv_id", "turn_idx", "call·args·timeout"])
    assert set(leaf.columns) == {"pt", "conv_id", "turn_idx", "call"}
    got = _sorted_pdf(leaf)
    want = _sorted_pdf(
        t.select(
            "pt", "conv_id", "turn_idx",
            __import__("pyspark.sql.functions", fromlist=["F"]).when(
                t["call"].isNotNull(),
                __import__("pyspark.sql.functions", fromlist=["F"]).struct(
                    __import__("pyspark.sql.functions", fromlist=["F"]).when(
                        t["call.args"].isNotNull(),
                        __import__("pyspark.sql.functions", fromlist=["F"]).struct(
                            t["call.args.timeout"].alias("timeout")
                        ),
                    ).alias("args")
                ),
            ).alias("call"),
        )
    )
    for c in got.columns:
        for i, (x, y) in enumerate(zip(want[c], got[c])):
            assert _py_eq(x, y), f"{c}[{i}]: {x!r} != {y!r}"
    t.unpersist()


def test_ndarray_rank3_and_rank1_inverse(spark):
    """pack/unpack must invert at arbitrary rank (reference ndarray is
    rank-N), including empty dims at any level."""
    from pyspark.sql import functions as F

    from bids2table_spark.functions import pack_ndarray, unpack_ndarray

    cube = [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]],
            [[9.0, 10.0], [11.0, 12.0]]]  # 3x2x2
    df3 = spark.createDataFrame(
        [(1, cube), (2, [[[42.0]]]), (3, None), (4, []), (5, [[], []])],
        "id int, m array<array<array<double>>>",
    )
    out = (
        df3.withColumn("packed", pack_ndarray(F.col("m"), ndim=3))
        .withColumn("back", unpack_ndarray(F.col("packed"), ndim=3))
        .select("id", "m", "packed.shape", "back")
        .orderBy("id")
        .collect()
    )
    assert out[0]["shape"] == [3, 2, 2] and out[0]["back"] == out[0]["m"]
    assert out[1]["shape"] == [1, 1, 1] and out[1]["back"] == out[1]["m"]
    assert out[2]["back"] is None
    assert list(out[3]["back"]) == []
    # 2x0x? : middle dim empty -> two empty inner lists reconstruct
    assert [list(x) for x in out[4]["back"]] == [[], []]

    df1 = spark.createDataFrame(
        [(1, [1.5, 2.5, 3.5]), (2, []), (3, None)], "id int, v array<double>"
    )
    o1 = (
        df1.withColumn("packed", pack_ndarray(F.col("v"), ndim=1))
        .withColumn("back", unpack_ndarray(F.col("packed"), ndim=1))
        .orderBy("id")
        .collect()
    )
    assert o1[0]["back"] == [1.5, 2.5, 3.5]
    assert list(o1[1]["back"]) == []
    assert o1[2]["back"] is None
