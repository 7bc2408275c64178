"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (one JVM, N threads); on a real
cluster the same confs apply per executor.  AQE + skew-join are on because
the encode shuffle groups by (pt, grp) and hot conversations are expected
(north rule: explicit skew handling; AQE is the built-in backstop).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Each PySpark python worker inherits this environment.  Without it, every
# worker sizes its Arrow/BLAS thread pools at the machine core count —
# 32 workers x 32 threads thrashes the box and local[32] runs *slower*
# than local[8].  Kernels are already process-parallel via Spark tasks.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "ARROW_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

# numpy frees large temporaries immediately and glibc munmaps them, so every
# kernel invocation re-faults fresh zeroed pages — profiling showed ~95% of
# CPU in sys time during the encode stage.  Keeping big allocations on the
# reusable brk heap removes the mmap/fault churn.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "536870912")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "536870912")


def get_spark(
    app: str = "bids2table_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # prefer shuffled-hash over sort-merge when the per-partition build
        # side fits (guide §3.1): skips two full sorts per join.  Safe with
        # AQE partition sizing; identical results, different operator.  The
        # AQE threshold lets a planned sort-merge join convert to shuffled
        # hash at runtime once real partition sizes are known (<= advisory
        # partition size per the guide's starting config).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_df(spark: SparkSession, rows: list[tuple], schema_ddl: str):
    """Tiny driver-side DataFrame as a JVM LocalTableScan (via pandas/Arrow).

    ``spark.createDataFrame(list_of_tuples)`` builds a pickled-Python RDD:
    every downstream job forks python workers for all default partitions
    just to deserialize a handful of rows — measured 3-5 s per tiny job on
    local[32].  The pandas/Arrow path converts on the driver and plans a
    LocalTableScan: zero python workers, zero extra tasks."""
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(schema_ddl)
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    return spark.createDataFrame(pdf, schema=schema)
