"""Physical-plan inspection helpers.

The engine's 100 TB posture is carried by plan *shape*, not code
volume: filters must reach the parquet scan, projections must prune
the read schema, small dimensions must broadcast, and shuffle counts
must stay at the theoretical minimum for the query.  These helpers
turn those claims into assertable predicates; tests/test_plans.py
pins them so a refactor that silently de-optimizes a plan fails CI.

All helpers parse ``df._jdf.queryExecution()`` output — the same text
``df.explain("formatted")`` prints — via the public ``explainString``
API (no private Catalyst access).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (``explain`` without stdout)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def scan_infos(df: DataFrame) -> list[dict]:
    """One dict per parquet scan in the plan: ``location``,
    ``pushed_filters``, ``read_schema`` (raw strings)."""
    txt = plan_text(df)
    out = []
    # formatted mode lists each scan as "(N) Scan parquet \n Output ..."
    for block in re.split(r"\n\(\d+\) ", txt):
        if not block.startswith("Scan parquet"):
            continue
        info = {"location": "", "pushed_filters": "", "read_schema": ""}
        m = re.search(r"Location: \S+ \[(.*?)\]", block)
        if m:
            info["location"] = m.group(1)
        m = re.search(r"PushedFilters: \[(.*?)\]", block)
        if m:
            info["pushed_filters"] = m.group(1)
        m = re.search(r"ReadSchema: (.*)", block)
        if m:
            info["read_schema"] = m.group(1).strip()
        out.append(info)
    return out


def scan_for_table(df: DataFrame, table: str) -> dict:
    """The scan info whose location contains ``<table>.parquet``."""
    for info in scan_infos(df):
        if f"{table}.parquet" in info["location"]:
            return info
    raise AssertionError(
        f"no parquet scan of table {table!r} in plan:\n{plan_text(df)}"
    )


def read_columns(df: DataFrame, table: str) -> set[str]:
    """Column names the scan of ``table`` actually reads."""
    schema = scan_for_table(df, table)["read_schema"]
    return set(re.findall(r"(\w+):", schema))


def pushed_filter_columns(df: DataFrame, table: str) -> set[str]:
    """Columns with at least one filter pushed into the scan."""
    pushed = scan_for_table(df, table)["pushed_filters"]
    return set(re.findall(r"\b(?:IsNotNull|EqualTo|GreaterThan|LessThan|"
                          r"GreaterThanOrEqual|LessThanOrEqual|In|StringContains|"
                          r"StringStartsWith)\((\w+)", pushed))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges and
    AQE shuffle reads)."""
    txt = plan_text(df)
    return len(re.findall(r"\(\d+\) Exchange\b", txt))


def broadcast_join_count(df: DataFrame) -> int:
    txt = plan_text(df)
    return len(re.findall(r"\(\d+\) BroadcastHashJoin\b", txt))


def has_cartesian(df: DataFrame) -> bool:
    """True only for shuffle-based CartesianProduct.  A
    BroadcastNestedLoopJoin is NOT flagged: with a broadcast small
    side it is the correct physical strategy for non-equi joins
    (e.g. ``vec_id != query_id``)."""
    return "CartesianProduct" in plan_text(df)


def broadcast_exchange_count(df: DataFrame) -> int:
    """Broadcast exchanges of any join flavor (hash or nested-loop)."""
    txt = plan_text(df)
    return len(re.findall(r"\(\d+\) BroadcastExchange\b", txt))


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider/fewer spans = more
    of the plan fused into single JVM loops).

    AQE wraps un-executed plans in ``AdaptiveSparkPlan`` which hides
    codegen annotation, so the plan is re-derived with AQE off just
    for this inspection (session conf is restored)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # select("*") makes a new Dataset, hence a fresh QueryExecution
        # planned under the updated conf (the old one caches its plan)
        txt = plan_text(df.select("*"), mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", txt)
    return int(m.group(1)) if m else 0
