"""Shared plumbing for the registry family modules (split from
__spark_entry__.py in round 11): operator-module aliases, table
accessors, scratch-dir hygiene, and the helpers used by more than
one family."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from flink_window_dgim_traffic_spark.operators import bpe as BP
from flink_window_dgim_traffic_spark.operators import corpus as C
from flink_window_dgim_traffic_spark.operators import dedup as D
from flink_window_dgim_traffic_spark.operators import heavy_hitters as HH
from flink_window_dgim_traffic_spark.operators import multimodal as M
from flink_window_dgim_traffic_spark.operators import packing as PK
from flink_window_dgim_traffic_spark.operators import retrieval as RT
from flink_window_dgim_traffic_spark.operators import parsing as P
from flink_window_dgim_traffic_spark.operators import pipeline as PL
from flink_window_dgim_traffic_spark.operators import quality as QL
from flink_window_dgim_traffic_spark.functions import table_functions as TF
from flink_window_dgim_traffic_spark.operators import analytics as AN
from flink_window_dgim_traffic_spark.operators import sketches as SK
from flink_window_dgim_traffic_spark.operators import sql_surface as Q
from flink_window_dgim_traffic_spark.operators import itemsets as IT
from flink_window_dgim_traffic_spark.operators import matching as MT
from flink_window_dgim_traffic_spark.operators import relational as R
from flink_window_dgim_traffic_spark.operators import similarity as S
from flink_window_dgim_traffic_spark.operators import text as T
from flink_window_dgim_traffic_spark.operators import windows as W
from flink_window_dgim_traffic_spark.session import ship_package, table
from flink_window_dgim_traffic_spark.streaming import pipeline as SP




def _mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` registered for interpreter-exit cleanup.

    ADVICE r8: the streaming/index harness helpers each stage a
    parquet copy of a testdata table under /tmp and never removed it,
    so repeated driver / bench invocations accumulated unbounded /tmp
    usage.  Every scratch dir in this module now routes through here;
    ``atexit`` (not try/finally) because the returned DataFrames are
    lazy — the driver collects them AFTER the query callable returns,
    so the staged files must outlive the call but not the process."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path



def _t(name: str):
    """Table loader bound late so each callable is self-contained."""

    def load(spark, sf_dir):
        ship_package(spark)
        return table(spark, sf_dir, name)

    return load



def _session_token(s: SparkSession) -> str:
    """Session-unique cache key component: the Spark application id,
    which a stopped-and-replaced session never reuses — unlike
    ``id(session)``, which CPython can recycle for a NEW session
    after the old one is garbage-collected, handing out checkpointed
    DataFrames bound to a dead context.  Keying on the app id also
    self-evicts: entries of a stopped application are unreachable
    under the new application's key (the handful of stale entries
    cost dict slots, not executor memory — their blocks died with
    the context)."""
    return s.sparkContext.applicationId



def _fuzzy_supplier_edges(s: SparkSession, d: str) -> DataFrame:
    key = (_session_token(s), d)
    df = _FUZZY_EDGE_CACHE.get(key)
    if df is None:
        df = MT.edit_distance_join(
            _supplier(s, d), "s_suppkey", "s_name", 1
        ).localCheckpoint(eager=True)
        _FUZZY_EDGE_CACHE[key] = df
    return df



_events = _t("events")
_lineitem = _t("lineitem")
_orders = _t("orders")
_customer = _t("customer")
_supplier = _t("supplier")
_nation = _t("nation")
_region = _t("region")
_part = _t("part")
_documents = _t("documents")
_embeddings = _t("embeddings")


# The user co-occurrence edge list feeds THREE driver queries
# (pagerank_cowindow, ppr_cowindow at 600 s; kcore_users_60s at
# 60 s); like the supplier edges below, each (session, sf_dir, size)
# build is pinned once with an eager localCheckpoint so the graph
# iterations read materialized edges instead of re-running the
# window self-join.
_COWINDOW_EDGE_CACHE: dict[tuple[str, str, int], DataFrame] = {}


# The supplier name-similarity edge list feeds FOUR driver queries
# (fuzzy_supplier_pairs, triangles_, components_, bfs_); the PassJoin
# build dominated each one's runtime when rebuilt per query, so it is
# built once per (session, sf_dir) and pinned with an eager
# localCheckpoint — the graph iterations then read the materialized
# ≤|pairs| edge rows instead of re-running the segment join.
_FUZZY_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}



# export everything, including underscore-named helpers, for the
# registry family modules (import * honors __all__)
__all__ = [n for n in list(globals()) if not n.startswith('__')]
