"""Streaming maintenance of a type-2 slowly-changing dimension —
the incremental twin of ``operators.relational.scd2_build`` (the
warehouse "streaming upsert into a versioned dimension" job).

Shape: the only cross-batch state a SCD2 build needs is the OPEN
version per key (closed versions are immutable once their successor
arrives).  Each micro-batch therefore unions the stored open
versions (as pseudo-observations at their ``valid_from``) with the
batch's change rows and runs the BATCH operator over that union —
correct under ordered replay (arrival order = timestamp order per
key, the same contract as ``streaming/pipeline.py``), because one
open row per key is exactly the lookback the batch lag/lead windows
need.  Versions closed by the batch are appended to an immutable
log; the new open set replaces the snapshot.

Exactly-once: the closed-version log and the open-set snapshot are
both batch-id-keyed and promoted by a ``_done/<id>`` marker written
LAST (the ``streaming/pipeline.py`` staging recipe) — a crash
between any write and the marker leaves only orphaned staged files
the replay overwrites from committed state; a replayed committed
batch returns immediately.  ``read_scd2`` reconstructs the full
dimension (closed log of committed batches + latest committed open
set), and equals the batch operator over the full change log —
including across kill-and-restart (tested).

Scale: the open set is one row per entity (dimension-sized, not
log-sized); each batch does the batch operator's one keyed exchange
over |batch| + |keys touched| rows.  At 100 TB the snapshot is a
bucketed table on the key and the union is co-located.

Deployment note: markers use the driver's local filesystem (no
object store in the sandbox); swap for the Hadoop FileSystem API or
a transactional table on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators.relational import scd2_build


def _committed_ids(root: str) -> list[int]:
    done = f"{root}/_done"
    if not os.path.isdir(done):
        return []
    return sorted(int(n) for n in os.listdir(done) if n.isdigit())


def make_scd2_batch_fn(
    root: str,
    key: list[str],
    attrs: list[str],
    ts_col: str = "ts",
    tiebreak: str | None = None,
):
    """foreachBatch maintaining the dimension under ``root``:
    ``closed/batch-<id>`` (immutable log), ``current/batch-<id>``
    (full open-set snapshot), ``_done/<id>`` markers."""
    tb = tiebreak or "_tb"

    def process(batch: DataFrame, batch_id: int) -> None:
        marker = f"{root}/_done/{batch_id}"
        if os.path.exists(marker):
            return
        spark = batch.sparkSession
        committed = _committed_ids(root)
        cols = [*key, ts_col, *attrs] + ([tiebreak] if tiebreak else [])
        if committed:
            prior = spark.read.parquet(
                f"{root}/current/batch-{committed[-1]}"
            )
        else:
            prior = None
        changes = batch.select(*cols)
        if not tiebreak:
            changes = changes.withColumn(tb, F.lit(0).cast("long"))
        if prior is not None:
            # the open versions re-enter as pseudo-observations at
            # their valid_from; a MIN tiebreak keeps them ordered
            # before any same-instant batch row (they were observed
            # first)
            pseudo = prior.select(
                *key,
                F.col("valid_from").alias(ts_col),
                *attrs,
                F.lit(-(1 << 62)).cast("long").alias(tb),
            )
            unioned = pseudo.unionByName(changes)
        else:
            unioned = changes
        versions = scd2_build(
            unioned, key=key, attrs=attrs, ts_col=ts_col, tiebreak=tb
        ).localCheckpoint(eager=True)
        closed = versions.filter(F.col("is_current") == 0)
        current = versions.filter(F.col("is_current") == 1).drop(
            "valid_to", "is_current"
        )
        closed.write.mode("overwrite").parquet(
            f"{root}/closed/batch-{batch_id}"
        )
        current.write.mode("overwrite").parquet(
            f"{root}/current/batch-{batch_id}"
        )
        os.makedirs(f"{root}/_done", exist_ok=True)
        open(marker, "w").close()

    return process


def read_scd2(spark, root: str) -> DataFrame:
    """The full dimension from COMMITTED state only: immutable closed
    versions of every committed batch + the latest open snapshot."""
    committed = _committed_ids(root)
    if not committed:
        raise ValueError(f"no committed scd2 state under {root!r}")
    closed = spark.read.parquet(
        *[f"{root}/closed/batch-{i}" for i in committed]
    )
    current = (
        spark.read.parquet(f"{root}/current/batch-{committed[-1]}")
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(1).cast("bigint"))
    )
    return closed.unionByName(current)


def scd2_stream(
    change_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    key: list[str],
    attrs: list[str],
    ts_col: str = "ts",
    tiebreak: str | None = None,
):
    """Start the incremental dimension-maintenance query
    (availableNow — rerun as changes arrive)."""
    return (
        change_stream.writeStream.foreachBatch(
            make_scd2_batch_fn(root, key, attrs, ts_col, tiebreak)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
