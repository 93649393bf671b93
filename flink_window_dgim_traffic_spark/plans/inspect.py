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


def _top_level_bracket_groups(s: str) -> int:
    """Number of top-level ``[...]`` groups in a plan Arguments line
    (nested brackets inside expressions don't count)."""
    depth = 0
    groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth -= 1
    return groups


def global_window_subtrees(df: DataFrame) -> list[str]:
    """For each UNPARTITIONED ``Window`` node in the physical plan,
    the formatted-detail text of its entire input subtree.

    A ``Window`` whose ``Arguments:`` line has two top-level bracket
    groups (functions, order) is global — no PARTITION BY — so its
    input sorts into ONE task.  That is only scale-safe when the
    input is structurally bounded first (a keyed aggregate over a
    small domain, or a ``TakeOrderedAndProject``/limit).  Callers
    assert a bound WITNESS inside the returned subtree text; the
    audit test in tests/test_plans.py pins one witness per operator
    that plans a global window (VERDICT r11 ask #4)."""
    txt = plan_text(df)
    # node details: "(N) NodeName [codegen id : x]\n...\n\n"
    details: dict[int, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) (.*?)(?=\n\(\d+\) |\n*\Z)",
        txt.split("\n\n", 1)[-1] if "\n\n" in txt else txt,
        re.S | re.M,
    ):
        details[int(m.group(1))] = m.group(2)
    # pre-order tree walk with depths from the ASCII tree section
    tree: list[tuple[int, int]] = []  # (depth, id)
    for line in txt.splitlines():
        tm = re.match(r"^([ :+|-]*)([A-Za-z]\w*(?: [a-z]\w*)*) \((\d+)\)\s*$", line)
        if tm:
            tree.append((len(tm.group(1)) // 3, int(tm.group(3))))
        elif tree and not line.strip():
            break  # end of tree section
    out = []
    for i, (depth, nid) in enumerate(tree):
        det = details.get(nid, "")
        if not det.startswith("Window"):
            continue
        am = re.search(r"Arguments: (.*)", det)
        if am and _top_level_bracket_groups(am.group(1)) != 2:
            continue  # partitioned window — fine at scale
        sub = []
        for d2, nid2 in tree[i + 1 :]:
            if d2 <= depth:
                break
            sub.append(details.get(nid2, ""))
        out.append("\n".join(sub))
    return out


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
