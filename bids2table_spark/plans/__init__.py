"""Physical-plan inspection helpers — the EXPLAIN analog of the reference's
``--print-only`` plan dump (``bids2table/__main__.py:91-92``)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def scan_pushdown(df: DataFrame) -> dict:
    """Extract PushedFilters / ReadSchema evidence from the formatted plan
    (used by tests to assert predicate pushdown + column pruning)."""
    txt = plan_str(df)
    out = {"pushed_filters": [], "read_schema": None, "has_broadcast": "BroadcastHashJoin" in txt}
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out["pushed_filters"].append(line.split(":", 1)[1].strip())
        if line.startswith("ReadSchema:"):
            out["read_schema"] = line.split(":", 1)[1].strip()
    return out


def codec_plan_str(plan: dict[str, str]) -> str:
    """Human-readable codec plan (printed next to df.explain())."""
    lines = ["codec plan:"]
    for key in sorted(plan):
        lines.append(f"  {key:32s} -> {plan[key]}")
    return "\n".join(lines)
