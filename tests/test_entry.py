"""Driver-contract validation: every queries() entry runs, and each entry
with an oracle matches DuckDB on the same parquet tables (local replica of
the driver's CORRECTNESS gate, run at sf0.001 to stay fast)."""

from __future__ import annotations

import pytest

from tests.harness import run_all

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    return run_all(spark, SF_DIR)


def test_all_queries_present(results):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)
    # every query has a DuckDB oracle (codec stats check SQL-expressible
    # invariants since round 2)
    assert set(qs) == set(oracles)


def test_oracle_matches(results):
    failures = [p for probs in results.values() for p in probs]
    assert not failures, "\n".join(failures)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"pt", "conv_id", "turn_idx", "role", "text", "tool", "ts"}
