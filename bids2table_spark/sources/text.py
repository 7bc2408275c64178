"""Text-format ingestion loaders + example-based schema inference.

Reference parity for the loader registry's text family
(``bids2table/loaders/text.py:21-109``: single-row CSV/TSV, array TSV,
DataFrame TSV, JSON-dict) and the example-record schema inference of
``bids2table/handlers/wrap.py:44-66`` — all re-expressed on Spark's native
readers (``spark.read.csv`` scales these to any file count for free;
options surface the reference's knobs).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def csv_source(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    sep: str = ",",
    **options,
) -> DataFrame:
    """S5: CSV/TSV file(s) -> DataFrame (schema inferred unless given)."""
    reader = spark.read.option("header", header).option("sep", sep)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def tsv_source(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    """S7: DataFrame TSV source (tab-separated)."""
    return csv_source(spark, path, schema=schema, sep="\t", **options)


def tsv_array_column(df: DataFrame, col: str, sep: str = ",", cast: str | None = None):
    """S6: array-TSV cell -> typed array column (the reference parses
    delimiter-packed arrays out of single TSV cells).

    ``sep`` is a literal delimiter, not a regex — F.split takes a Java
    regex, so metachar separators ('|', '.', '+') must be escaped or they
    silently split between every character."""
    import re

    arr = F.split(F.col(col), re.escape(sep))
    if cast:
        arr = F.transform(arr, lambda x: x.cast(cast))
    return df.withColumn(col, arr)


def json_dict_source(df: DataFrame, col: str, schema) -> DataFrame:
    """S4: parse a JSON-dict string column into typed fields (from_json);
    fields surface as ``<col>_parsed.*``."""
    return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema))


def with_source_path(df: DataFrame, col: str = "source_path") -> DataFrame:
    """S8: attach the originating file path (``input_file_name``)."""
    return df.withColumn(col, F.input_file_name())


# ---------------------------------------------------- schema from example


def infer_field_type(value) -> T.DataType:
    """Spark type for one example python value (reference:
    ``bids2table/handlers/wrap.py:44-66`` infers the handler schema from a
    sample record)."""
    if isinstance(value, bool):  # before int: bool is an int subclass
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(value, dt.datetime):
        return T.TimestampType()
    if isinstance(value, dt.date):
        return T.DateType()
    if isinstance(value, (list, tuple)):
        if not value:
            return T.ArrayType(T.StringType())
        return T.ArrayType(infer_field_type(value[0]))
    if isinstance(value, dict):
        return T.StructType(
            [T.StructField(k, infer_field_type(v), True) for k, v in value.items()]
        )
    raise TypeError(f"cannot infer a Spark type from example value {value!r}")


def schema_from_example(record: dict) -> T.StructType:
    """Whole-record inference: {"a": 1, "b": "x"} -> struct<a:long, b:string>."""
    return T.StructType(
        [T.StructField(k, infer_field_type(v), True) for k, v in record.items()]
    )


def conform_to_example(df: DataFrame, record: dict) -> DataFrame:
    """Project/cast ``df`` to the schema inferred from an example record:
    declared order, casts, null-fill of missing columns — the WrapHandler
    behavior ('just point it at my table')."""
    schema = schema_from_example(record)
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(cols)
