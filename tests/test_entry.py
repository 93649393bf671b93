"""Surface-wide contract guards over ``__spark_entry__``.

The driver's correctness harness canonicalizes every sampled query
with pandas (``sort_values`` + hash over all columns), which dies on
non-atomic cells — CORRECTNESS_r08 recorded exactly this for
``pca_project`` (``TypeError: unhashable type: 'list'`` on a raw
``array<double>`` column).  These tests kill that whole defect class
locally: EVERY ``queries()`` entry must produce a top-level schema of
atomic columns only, and every key must round-trip the oracle-sql
dict contract.
"""
import os

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_all_query_outputs_atomic(spark):
    """No query may return ArrayType / MapType / StructType at the
    top level — the driver's pandas canonicalizer cannot sort or hash
    such cells, so the query would ERROR at the correctness gate even
    when it runs fine (the round-8 ``pca_project`` failure mode).
    Constructing the DataFrame is enough: the guard reads ``.schema``
    without collecting."""
    bad: list[str] = []
    errs: list[str] = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errs.append(f"{name}: {type(e).__name__}: {e}")
            continue
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not errs, "query construction failed:\n" + "\n".join(errs)
    assert not bad, "non-atomic top-level columns:\n" + "\n".join(bad)


def test_oracle_keys_subset_of_queries():
    """Every ``oracle_sql()`` key must name a real ``queries()``
    entry; a stale oracle key silently never runs at the driver."""
    q = set(entry.queries())
    extra = set(entry.oracle_sql()) - q
    assert not extra, f"oracle_sql keys with no queries() twin: {sorted(extra)}"


def test_query_keys_are_identifier_like():
    """Driver artifacts key on these names; keep them filesystem- and
    JSON-safe."""
    import re

    pat = re.compile(r"^[a-z0-9_]+$")
    bad = [k for k in entry.queries() if not pat.match(k)]
    assert not bad, bad
