"""Rolling-MIN carry contract (VERDICT r12 ask #1).

The bench's per-query rolling MIN may only be carried from a previous
committed record when the ENVIRONMENT key matches too: same cpus, same
sf, same package source hash — in addition to the per-query plan
fingerprint.  The r12 defect: the 8-core driver scaling run inherited
32-core minima and printed a total below its own fresh total.
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FRESH = {"q1": 2.0, "q2": 3.0}
FPS = {"q1": "aaa", "q2": "bbb"}


def _prev(**over):
    rec = {
        "cpus": 32,
        "sf": 0.1,
        "source_hash": "s0",
        "queries": {"q1": 1.0, "q2": 5.0},
        "fingerprints": {"q1": "aaa", "q2": "bbb"},
    }
    rec.update(over)
    return rec


def test_carry_applies_when_env_and_plan_match(bench):
    timings, carried = bench.apply_carry(
        dict(FRESH), FPS, _prev(), 32, 0.1, "s0"
    )
    # q1's previous min is faster and everything matches -> carried;
    # q2's previous min is slower -> fresh kept.
    assert timings == {"q1": 1.0, "q2": 3.0}
    assert carried == ["q1"]


@pytest.mark.parametrize(
    "cpus,sf,src",
    [(8, 0.1, "s0"), (32, 0.01, "s0"), (32, 0.1, "CHANGED")],
)
def test_no_carry_across_environment(bench, cpus, sf, src):
    # A different core count, scale factor, or package source hash
    # disables the carry wholesale: an 8-core run must report >= its
    # own fresh total, and a UDF-body change (plan-invisible) must
    # re-base on fresh samples.
    timings, carried = bench.apply_carry(
        dict(FRESH), FPS, _prev(), cpus, sf, src
    )
    assert timings == FRESH
    assert carried == []


def test_no_carry_from_legacy_record_without_env_fields(bench):
    prev = _prev()
    for k in ("cpus", "sf", "source_hash"):
        del prev[k]
    timings, carried = bench.apply_carry(
        dict(FRESH), FPS, prev, 32, 0.1, "s0"
    )
    assert timings == FRESH and carried == []


def test_plan_fingerprint_still_gates_per_query(bench):
    prev = _prev(fingerprints={"q1": "OLD", "q2": "bbb"})
    timings, carried = bench.apply_carry(
        dict(FRESH), FPS, prev, 32, 0.1, "s0"
    )
    # q1's plan changed -> no carry even though env matches.
    assert timings == {"q1": 2.0, "q2": 3.0}
    assert carried == []


def test_source_tree_hash_changes_with_udf_body(bench, tmp_path):
    pkg = tmp_path / "flink_window_dgim_traffic_spark"
    pkg.mkdir()
    (pkg / "op.py").write_text("def f(x):\n    return x + 1\n")
    (tmp_path / "__spark_entry__.py").write_text("# entry\n")
    h1 = bench.source_tree_hash(str(tmp_path))
    (pkg / "op.py").write_text("def f(x):\n    return x + 2\n")
    h2 = bench.source_tree_hash(str(tmp_path))
    assert h1 != h2
