"""Guard: every oracle_sql() result column must have a standard DuckDB type.

DuckDB silently widens some aggregates past what Spark can emit — e.g.
``sum(INTEGER) OVER (...)`` produces HUGEINT (int128) — and the driver's
value-hash compare then fails on *type*, not values (the round-2 sessionize
red cell).  This test runs every oracle through DuckDB at sf0.001 and asserts
all output types are in the set both engines share, so the class of bug
cannot recur.
"""

from __future__ import annotations

import pytest

from tests.harness import duck_con

SF_DIR = "/root/testdata/sf0.001"

# Types Spark can emit 1:1.  HUGEINT / UHUGEINT / DECIMAL(*) are deliberately
# absent: any oracle producing one must cast it in its final SELECT.
ALLOWED = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "BLOB",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "TIMESTAMP WITH TIME ZONE",
}


def _base_type(t: str) -> str:
    # list/struct wrappers are fine as long as every leaf is allowed
    return str(t)


def _leaf_types(t) -> list[str]:
    s = str(t)
    if s.startswith("STRUCT("):
        import duckdb.typing  # noqa: F401

        return [lt for child in t.children for lt in _leaf_types(child[1])]
    if s.endswith("[]"):
        return [s[:-2]]
    return [s]


@pytest.mark.parametrize("name", sorted(__import__("__spark_entry__").oracle_sql()))
def test_oracle_result_types_standard(name):
    import __spark_entry__ as entry

    con = duck_con(SF_DIR)
    rel = con.sql(entry.oracle_sql()[name])
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        for leaf in _leaf_types(typ):
            if leaf not in ALLOWED:
                bad.append(f"{col}: {typ}")
    assert not bad, f"oracle {name!r} emits non-standard types: {bad}"
