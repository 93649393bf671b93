"""Spark SQL surface: the reference is SQL-first (its three jobs are
``CREATE TABLE`` + ``INSERT INTO ... SELECT`` strings,
``StreamingJob.java:37-98``), so a migrating user gets the same
entry style here — register the tables as views, write Spark SQL.

``sql_tumble_exact`` is the flagship windowed query expressed purely
in SQL (same plan Catalyst produces for the DataFrame version;
oracle-checked for identical values).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from flink_window_dgim_traffic_spark.session import table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (idempotent)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_tumble_exact(
    spark: SparkSession, sf_dir: str, size_sec: int = 60
) -> DataFrame:
    """The reference's tumbling count as one Spark SQL statement
    (window TVF in GROUP BY, like the Flink SQL original)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS window_end,
               CAST(sum(pmod(event_id, 2)) AS BIGINT) AS ones_exact,
               count(*) AS n_rows
        FROM events
        GROUP BY window(ts, '{size_sec} seconds')
        """
    )


def sql_hop_exact(
    spark: SparkSession, sf_dir: str, size_sec: int = 60, slide_sec: int = 10
) -> DataFrame:
    """The reference's sliding (HOP) count as one Spark SQL statement."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
               date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS window_end,
               CAST(sum(pmod(event_id, 2)) AS BIGINT) AS ones_exact,
               count(*) AS n_rows
        FROM events
        GROUP BY window(ts, '{size_sec} seconds', '{slide_sec} seconds')
        """
    )


def register_dgim_udf(
    spark: SparkSession, size_sec: int = 60, mode: str = "java"
) -> None:
    """Register DGIM_ESTIMATE as a SQL function — the reference's
    registration shape (`createTemporarySystemFunction("DGIM_ESTIMATE",
    new DGIMAggregateFunction(60))`, StreamingJob.java:78): the window
    size is baked into the registered instance, not passed per call.
    Spark's SQL-registerable Python functions are scalar, so the
    aggregation boundary is COLLECT (the PyFlink job's shape,
    job.py:170-184): the windowed pair list is assembled and sorted
    JVM-side, and the registered (Arrow-batched) scalar UDF replays
    each window's list through the sketch."""
    from flink_window_dgim_traffic_spark.operators.windows import (
        _replay_pairs_udf,
    )

    spark.udf.register("DGIM_ESTIMATE", _replay_pairs_udf(size_sec, mode))


def sql_tumble_dgim(
    spark: SparkSession, sf_dir: str, size_sec: int = 60
) -> DataFrame:
    """The reference's flagship statement end-to-end in SQL: windowed
    DGIM estimate next to its exact twin, via the registered
    DGIM_ESTIMATE function."""
    register_views(spark, sf_dir)
    register_dgim_udf(spark, size_sec)
    return spark.sql(
        f"""
        SELECT date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS window_end,
               DGIM_ESTIMATE(sort_array(collect_list(struct(
                   unix_timestamp(ts) AS ts_sec,
                   CAST(pmod(event_id, 2) AS INT) AS bit)))) AS count_estimate,
               CAST(sum(pmod(event_id, 2)) AS BIGINT) AS exact_count,
               count(*) AS n_rows
        FROM events
        GROUP BY window(ts, '{size_sec} seconds')
        """
    )


def sql_session_exact(
    spark: SparkSession, sf_dir: str, gap_sec: int = 4 * 3600
) -> DataFrame:
    """Per-user session windows as one Spark SQL statement
    (``session_window`` TVF in GROUP BY) — the SQL twin of
    ``relational.session_window_counts``; same plan, same values
    (asserted equal in tests)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT user_id,
               date_format(min(ts), 'yyyy-MM-dd HH:mm:ss')
                 AS session_start,
               date_format(session_window.end, 'yyyy-MM-dd HH:mm:ss')
                 AS session_end_plus_gap,
               count(*) AS n_events
        FROM events
        GROUP BY user_id, session_window(ts, '{gap_sec} seconds')
        """
    )


def sql_streaming_tumble(parsed_stream, size_sec: int = 60):
    """The reference's job-submission UX end to end: a STREAMING
    windowed aggregation expressed as one SQL statement over a
    registered stream view (Flink's ``INSERT INTO agg SELECT ...
    TUMBLE(...)`` shape — reference StreamingJob.java submits exactly
    this statement class to the table environment).

    Spark temp views work on streaming DataFrames, so ``spark.sql``
    IS the streaming plan builder here; the returned DataFrame is
    unstarted (attach any sink + output mode).  Tested equal to both
    the DataFrame streaming twin and the batch result."""
    spark = parsed_stream.sparkSession
    view = f"_stream_traffic_{uuid.uuid4().hex}"
    parsed_stream.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT date_format(window.end, 'yyyy-MM-dd HH:mm:ss')
                     AS window_end,
                   sum(bit)  AS ones_exact,
                   count(*)  AS n_rows
            FROM {view}
            GROUP BY window(ts, '{size_sec} seconds')
            """
        )
    finally:
        # the view is resolved into the returned (lazy) plan at
        # spark.sql time — dropping it immediately keeps long-lived
        # sessions from leaking one catalog entry per built plan
        spark.catalog.dropTempView(view)


def sql_window_topn(
    spark: SparkSession, sf_dir: str, size_sec: int = 60, k: int = 3
) -> DataFrame:
    """Flink SQL Window Top-N, verbatim shape: ROW_NUMBER() OVER
    (PARTITION BY window ...) around a window TVF aggregate, filtered
    ``rownum <= N`` — the statement class Flink documents for
    per-window ranking, as one Spark SQL string.  Equal to the
    DataFrame twin ``operators.windows.window_topn`` (tested)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT window_end, user_id, n_events, rnk FROM (
          SELECT window_end, user_id, n_events,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY window_end
                   ORDER BY n_events DESC, user_id ASC) AS BIGINT)
                   AS rnk
          FROM (
            SELECT date_format(window.end, 'yyyy-MM-dd HH:mm:ss')
                     AS window_end,
                   user_id, count(*) AS n_events
            FROM events
            GROUP BY window(ts, '{size_sec} seconds'), user_id
          )
        ) WHERE rnk <= {int(k)}
        """
    )


def sql_seasonal_anomaly(
    spark: SparkSession, sf_dir: str, size_sec: int = 60,
    cycle_sec: int = 3600,
) -> DataFrame:
    """The seasonal slot-of-cycle anomaly rule expressed as ONE Spark
    SQL statement — the migrating-user view of
    ``windows.seasonal_anomaly`` (values oracle-checked identical;
    the rational 3/2 factor stays a multiply-compare in SQL too)."""
    register_views(spark, sf_dir)
    slots = cycle_sec // size_sec
    return spark.sql(
        f"""
        WITH cnt AS (
          SELECT event_type,
                 CAST(unix_timestamp(window.end) AS BIGINT) AS we_sec,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM events
          GROUP BY event_type, window(ts, '{size_sec} seconds')
        ),
        c2 AS (
          SELECT *, pmod(we_sec div {size_sec}, {slots}) AS slot
          FROM cnt
        ),
        base AS (
          SELECT event_type, slot,
                 CAST(sum(cnt) AS BIGINT) AS slot_total,
                 CAST(count(*) AS BIGINT) AS n_windows
          FROM c2 GROUP BY event_type, slot
        )
        SELECT c2.event_type,
               date_format(timestamp_seconds(we_sec),
                           'yyyy-MM-dd HH:mm:ss') AS window_end,
               c2.slot, cnt,
               CAST((slot_total * 1000000) div n_windows AS BIGINT)
                   AS baseline_e6,
               CASE WHEN cnt * n_windows * 2 > 3 * slot_total
                    THEN 'high' ELSE 'low' END AS direction
        FROM c2 JOIN base
          ON c2.event_type = base.event_type AND c2.slot = base.slot
        WHERE cnt * n_windows * 2 > 3 * slot_total
           OR cnt * n_windows * 3 < 2 * slot_total
        """
    )


def sql_window_dedup(
    spark: SparkSession, sf_dir: str, size_sec: int = 600
) -> DataFrame:
    """Flink SQL Window Deduplication, verbatim shape: ROW_NUMBER()
    OVER (PARTITION BY window, key ORDER BY time) = 1 around a window
    TVF — the statement class Flink documents for per-window
    first-row picking, as one Spark SQL string.  Equal to the
    DataFrame twin ``operators.windows.window_dedup`` (tested); note
    the DataFrame twin compiles to an ARGMIN aggregation instead of
    this rank window — same rows, better plan."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT window_end, user_id, event_id, event_type, value FROM (
          SELECT date_format(window.end, 'yyyy-MM-dd HH:mm:ss')
                   AS window_end,
                 user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY window, user_id
                   ORDER BY ts ASC, event_id ASC) AS rn
          FROM (SELECT *, window(ts, '{size_sec} seconds') AS window
                FROM events)
        ) WHERE rn = 1
        """
    )


def sql_window_join(
    spark: SparkSession, sf_dir: str, size_sec: int = 600
) -> DataFrame:
    """Flink SQL Window Join, verbatim shape: two windowed relations
    joined on window equality + key equality (``L.window_start =
    R.window_start AND L.user = R.user``), as one Spark SQL string.
    Equal to ``operators.windows.window_join`` (tested)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT date_format(l.w.end, 'yyyy-MM-dd HH:mm:ss')
                 AS window_end,
               l.user_id AS user_id,
               l.event_id AS l_event_id,
               r.event_id AS r_event_id
        FROM (SELECT user_id, event_id,
                     window(ts, '{size_sec} seconds') AS w
              FROM events WHERE event_type = 'view') l
        JOIN (SELECT user_id, event_id,
                     window(ts, '{size_sec} seconds') AS w
              FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.w = r.w
        """
    )

def sql_window_semijoin(
    spark: SparkSession, sf_dir: str, size_sec: int = 600
) -> DataFrame:
    """Flink SQL Window SEMI join, verbatim shape (the Flink docs'
    ``WHERE EXISTS (SELECT * FROM R WHERE L.window_start =
    R.window_start AND ...)`` form around window TVFs): left rows
    that HAD a right partner in the same window, as one Spark SQL
    string.  Equal to ``operators.windows.window_join(...,
    how='left_semi')`` (tested) — Catalyst rewrites the EXISTS to
    the same existential semi join the DataFrame twin plans."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT date_format(l.w.end, 'yyyy-MM-dd HH:mm:ss')
                 AS window_end,
               l.user_id AS user_id,
               l.event_id AS l_event_id
        FROM (SELECT user_id, event_id,
                     window(ts, '{size_sec} seconds') AS w
              FROM events WHERE event_type = 'view') l
        WHERE EXISTS (
          SELECT * FROM (SELECT user_id,
                                window(ts, '{size_sec} seconds') AS w
                         FROM events
                         WHERE event_type = 'purchase') r
          WHERE l.user_id = r.user_id AND l.w = r.w)
        """
    )


def sql_window_antijoin(
    spark: SparkSession, sf_dir: str, size_sec: int = 600
) -> DataFrame:
    """Flink SQL Window ANTI join, verbatim shape (``WHERE NOT
    EXISTS`` around window TVFs — the abandoned-browse query): left
    rows with NO right partner in their window, as one Spark SQL
    string.  Equal to ``operators.windows.window_join(...,
    how='left_anti')`` (tested)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT date_format(l.w.end, 'yyyy-MM-dd HH:mm:ss')
                 AS window_end,
               l.user_id AS user_id,
               l.event_id AS l_event_id
        FROM (SELECT user_id, event_id,
                     window(ts, '{size_sec} seconds') AS w
              FROM events WHERE event_type = 'view') l
        WHERE NOT EXISTS (
          SELECT * FROM (SELECT user_id,
                                window(ts, '{size_sec} seconds') AS w
                         FROM events
                         WHERE event_type = 'purchase') r
          WHERE l.user_id = r.user_id AND l.w = r.w)
        """
    )


def sql_window_hop_join(
    spark: SparkSession,
    sf_dir: str,
    size_sec: int = 600,
    slide_sec: int = 300,
) -> DataFrame:
    """Flink SQL window join over HOP TVFs as one Spark SQL string:
    Spark has no HOP TVF, so the statement performs the same
    constant per-row pane explode the DataFrame operator plans
    (``explode(sequence(...))`` is map-side) before the (user, slot)
    equi-join.  Equal to ``windows.window_join(..., slide_sec=N)``
    (tested)."""
    register_views(spark, sf_dir)
    step_us = slide_sec * 1_000_000
    size_us = size_sec * 1_000_000
    n = size_sec // slide_sec
    return spark.sql(
        f"""
        WITH l AS (
          SELECT user_id, event_id AS l_event_id,
                 explode(sequence(
                   unix_micros(ts) div {step_us} - {n - 1},
                   unix_micros(ts) div {step_us})) AS wslot
          FROM events WHERE event_type = 'view'),
        r AS (
          SELECT user_id, event_id AS r_event_id,
                 explode(sequence(
                   unix_micros(ts) div {step_us} - {n - 1},
                   unix_micros(ts) div {step_us})) AS wslot
          FROM events WHERE event_type = 'purchase')
        SELECT date_format(
                 timestamp_micros(l.wslot * {step_us} + {size_us}),
                 'yyyy-MM-dd HH:mm:ss') AS window_end,
               l.user_id AS user_id, l_event_id, r_event_id
        FROM l JOIN r
          ON l.user_id = r.user_id AND l.wslot = r.wslot
        """
    )


def sql_window_cumulate_join(
    spark: SparkSession,
    sf_dir: str,
    size_sec: int = 600,
    step_sec: int = 300,
) -> DataFrame:
    """Flink SQL window join over CUMULATE TVFs as one Spark SQL
    string: each row explodes into the ENDS of the cumulative
    windows of its span that cover it, then the (user, end) equi-
    join.  Equal to ``windows.window_join(...,
    cumulate_step_sec=N)`` (tested)."""
    register_views(spark, sf_dir)
    step_us = step_sec * 1_000_000
    size_us = size_sec * 1_000_000
    return spark.sql(
        f"""
        WITH l0 AS (
          SELECT user_id, event_id AS l_event_id,
                 unix_micros(ts) AS us,
                 unix_micros(ts) div {size_us} * {size_us} AS ws
          FROM events WHERE event_type = 'view'),
        l AS (
          SELECT user_id, l_event_id,
                 explode(sequence(
                   ws + ((us - ws) div {step_us} + 1) * {step_us},
                   ws + {size_us}, {step_us})) AS wslot
          FROM l0),
        r0 AS (
          SELECT user_id, event_id AS r_event_id,
                 unix_micros(ts) AS us,
                 unix_micros(ts) div {size_us} * {size_us} AS ws
          FROM events WHERE event_type = 'purchase'),
        r AS (
          SELECT user_id, r_event_id,
                 explode(sequence(
                   ws + ((us - ws) div {step_us} + 1) * {step_us},
                   ws + {size_us}, {step_us})) AS wslot
          FROM r0)
        SELECT date_format(timestamp_micros(l.wslot),
                           'yyyy-MM-dd HH:mm:ss') AS window_end,
               l.user_id AS user_id, l_event_id, r_event_id
        FROM l JOIN r
          ON l.user_id = r.user_id AND l.wslot = r.wslot
        """
    )
