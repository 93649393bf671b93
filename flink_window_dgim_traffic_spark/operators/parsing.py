"""Projection / cast / filter operators (SURVEY.md §2.2 P1-P7).

The reference's raw stream is JSON ``{"value": "0"|"1", "timestamp":
"<ISO-8601 microseconds>"}`` with permissive decoding and null-filters
(``StreamingJob.java:38-55,84-94``).  The driver testdata has no raw
traffic table, so :func:`traffic_strings` deterministically
reconstructs that pre-decode shape from ``events`` (including ~1%
malformed values/timestamps per FIXTURES.md §F1), and
:func:`traffic_parse` applies the reference's parse pipeline:
``TRY_CAST`` (P3/P6), ``UNIX_TIMESTAMP(str, fmt)`` (P4), ``IS NOT
NULL`` filters (P5), aliased projection (P1/P2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference payload timestamp format, StreamingJob.java:88 / job.py:177
ISO_US_SPARK = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def traffic_strings(events: DataFrame) -> DataFrame:
    """Rebuild the reference's raw Kafka payload columns from
    ``events``: ``value`` is the bit as a string (every 97th row
    malformed → ``'x'``), ``timestamp`` is ISO-8601 with microseconds
    (every 101st row malformed → ``'not-a-time'``)."""
    return events.select(
        F.col("event_id"),
        F.when(F.pmod("event_id", F.lit(97)) == 0, F.lit("x"))
        .otherwise(F.pmod("event_id", F.lit(2)).cast("string"))
        .alias("value"),
        F.when(F.pmod("event_id", F.lit(101)) == 0, F.lit("not-a-time"))
        .otherwise(F.date_format("ts", ISO_US_SPARK))
        .alias("timestamp"),
    )


def traffic_parse(raw: DataFrame) -> DataFrame:
    """The reference's source-side parse pipeline on the raw strings:

    - ``TRY_CAST(value AS INT)``          (P3/P6 — null on failure)
    - ``UNIX_TIMESTAMP(timestamp, fmt)``  (P4 — epoch seconds, floor)
    - drop rows where either is null      (P5)
    """
    parsed = raw.select(
        "event_id",
        F.col("value").try_cast("int").alias("bit"),
        F.unix_timestamp(
            F.try_to_timestamp(F.col("timestamp"), F.lit(ISO_US_SPARK))
        ).alias("ts_sec"),
    )
    return parsed.filter(
        F.col("bit").isNotNull() & F.col("ts_sec").isNotNull()
    )


def traffic_parse_summary(events: DataFrame) -> DataFrame:
    """End-to-end P1-P7 check as one aggregate row: how many rows
    survive the filters, how many 1-bits, and the max epoch second."""
    p = traffic_parse(traffic_strings(events))
    return p.agg(
        F.count(F.lit(1)).alias("n_valid"),
        F.sum("bit").cast("bigint").alias("n_ones"),
        F.max("ts_sec").alias("max_ts_sec"),
    )
