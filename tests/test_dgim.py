"""Unit + property tests for the pure-Python DGIM sketch.

Covers the FIXTURES.md §F4 hand-computed vectors and the SURVEY.md §5.1
invariants: bucket-count bound, expiry, merge ≡ combined replay within
error bound, and the C/2 ≤ E ≤ 1.5·C estimate bound for Java mode.
No Spark dependency.
"""

import random
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_window_dgim_traffic_spark.dgim import (
    DGIM,
    MODE_JAVA,
    MODE_PYFLINK,
    dgim_estimate_stream,
)


def exact_count(ones, now, window):
    """Ground truth: 1-bits with ts in (now - window, now]."""
    return sum(1 for t in ones if now - t < window and t <= now)


# ----------------------------------------------------------------------
# F4 hand-computed vectors
# ----------------------------------------------------------------------
def test_empty_stream_estimates_zero():
    assert DGIM(60, mode=MODE_JAVA).estimate() == 0
    assert DGIM(60, mode=MODE_PYFLINK).estimate() == 0


def test_single_bit_java_exact_pyflink_floor():
    sk = DGIM(60)
    sk.add(100)
    assert sk.estimate() == 1  # java: single bucket is exact
    sk2 = DGIM(60, mode=MODE_PYFLINK)
    sk2.add(100)
    assert sk2.estimate() == 0  # pyflink: floor(1/2) even when single


def test_three_bits_one_merge_fires():
    sk = DGIM(60)
    for ts in (10, 11, 12):
        sk.add(ts)
    sizes = sorted(s for _, s in sk.buckets)
    assert sizes == [1, 2]
    # the merged (older pair) bucket keeps the newer member's timestamp
    assert sk.buckets == [[12, 1], [11, 2]]


def test_merge_keeps_newer_timestamp_and_le2_per_size():
    sk = DGIM(1000)
    for ts in range(100):
        sk.add(ts)
    counts = Counter(s for _, s in sk.buckets)
    assert all(c <= 2 for c in counts.values())
    # newest-first ordering maintained
    tss = [t for t, _ in sk.buckets]
    assert tss == sorted(tss, reverse=True)


def test_expiry_drops_old_buckets():
    sk = DGIM(60)
    sk.add(0)
    sk.add(100)  # 100 - 0 >= 60 → first bucket expires
    assert all(100 - t < 60 for t, _ in sk.buckets)
    assert sk.estimate() == 1


def test_expiry_boundary_is_half_open():
    # now - ts >= window expires: ts = now - window is OUT,
    # ts = now - window + 1 is IN.
    sk = DGIM(60)
    sk.add(40)
    sk.add(41)
    sk.add(100)
    sk._expire(100)
    assert [t for t, _ in sk.buckets] == [100, 41]


def test_estimate_at_explicit_time_expires_first():
    sk = DGIM(60)
    for ts in (0, 10, 20):
        sk.add(ts)
    assert sk.estimate(at=100) == 0  # everything expired at t=100
    sk2 = DGIM(60)
    for ts in (0, 10, 20):
        sk2.add(ts)
    # buckets compact to [[20,1],[10,2]] → 1 + ceil(2/2) = 2
    assert sk2.estimate(at=20) == 2


def test_merge_equivalent_to_union_replay_within_bound():
    rng = random.Random(7)
    a_ts = sorted(rng.randrange(0, 500) for _ in range(200))
    b_ts = sorted(rng.randrange(0, 500) for _ in range(200))
    a = DGIM(300)
    for t in a_ts:
        a.add(t)
    b = DGIM(300)
    for t in b_ts:
        b.add(t)
    merged = a.merge(b)
    est = merged.estimate()
    exact = exact_count(a_ts + b_ts, merged.latest_ts, 300)
    assert exact / 2 - 1 <= est <= 1.5 * exact + 1


def test_merge_commutative_deterministic():
    rng = random.Random(3)
    xs = [rng.randrange(0, 100) for _ in range(50)]
    ys = [rng.randrange(0, 100) for _ in range(50)]

    def build(ts_list):
        sk = DGIM(200)
        for t in sorted(ts_list):
            sk.add(t)
        return sk

    ab = build(xs).merge(build(ys))
    ba = build(ys).merge(build(xs))
    assert ab.buckets == ba.buckets
    assert ab.latest_ts == ba.latest_ts


def test_merge_window_mismatch_raises():
    with pytest.raises(ValueError):
        DGIM(60).merge(DGIM(61))


def test_flat_roundtrip():
    sk = DGIM(60)
    for t in (1, 2, 3, 50):
        sk.add(t)
    flat = sk.to_flat()
    back = DGIM.from_flat(60, flat)
    assert back.buckets == sk.buckets
    assert back.latest_ts == sk.latest_ts
    assert DGIM.from_flat(60, []).buckets == []


def test_add_bit_parse_tolerance():
    sk = DGIM(60)
    for bit, ts in [("1", 1), ("0", 2), ("x", 3), (None, 4), ("", 5), (1, 6), (1.0, 7)]:
        sk.add_bit(bit, ts)
    # "1", 1, 1.0 count (3 ones at ts 1,6,7 → buckets [[7,1],[6,2]] → est 2)
    assert sk.estimate() == 2


def test_stream_replay_helper_matches_manual():
    pairs = [("1", 10), ("0", 11), ("1", 12), ("bad", 13), ("1", 14)]
    # ones at 10,12,14 compact to [[14,1],[12,2]] → 1 + ceil(2/2) = 2
    assert dgim_estimate_stream(pairs, 60) == 2
    assert dgim_estimate_stream([], 60) == 0
    # unsorted input is sorted by ts before replay
    assert dgim_estimate_stream(list(reversed(pairs)), 60) == 2


# ----------------------------------------------------------------------
# properties (seeded, deterministic)
# ----------------------------------------------------------------------
@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(min_value=0, max_value=2000), min_size=0, max_size=500),
    st.integers(min_value=10, max_value=500),
)
def test_error_bound_java_mode(ts_list, window):
    ts_list = sorted(ts_list)
    sk = DGIM(window)
    for t in ts_list:
        sk.add(t)
    est = sk.estimate()
    exact = exact_count(ts_list, sk.latest_ts, window) if ts_list else 0
    assert exact / 2 - 1 <= est <= 1.5 * exact + 1
    counts = Counter(s for _, s in sk.buckets)
    assert all(c <= 2 for c in counts.values())
    assert all((s & (s - 1)) == 0 for _, s in sk.buckets)  # powers of two


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=5),
)
def test_partitioned_merge_matches_bound(ts_list, n_parts):
    """Two-phase (partition → merge) estimate stays within the error
    bound of the exact combined count — validates the Spark partial-agg
    design (SURVEY §7.4 item 3)."""
    ts_list = sorted(ts_list)
    window = 300
    parts = [DGIM(window) for _ in range(n_parts)]
    for i, t in enumerate(ts_list):
        parts[i % n_parts].add(t)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.merge(p)
    est = acc.estimate()
    exact = exact_count(ts_list, acc.latest_ts, window)
    assert exact / 2 - 1 <= est <= 1.5 * exact + 1


# ----------------------------------------------------------------------
# count-only fast path (the DGIM_ESTIMATE → g(sum(bit)) rewrite)
# ----------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=300),
    base=st.integers(min_value=0, max_value=10**9),
    data=st.data(),
    mode=st.sampled_from([MODE_JAVA, MODE_PYFLINK]),
)
def test_estimate_is_pure_function_of_count(n, base, data, mode):
    """When every bit lies within the horizon of the newest bit (ts
    spread < window size), full replay estimate == g(count): the
    validity proof of windows.tumble_dgim_fast / hop_dgim_fast."""
    from flink_window_dgim_traffic_spark.dgim import count_estimate_table

    offsets = data.draw(
        st.lists(st.integers(0, 59), min_size=n, max_size=n)
    )
    sk = DGIM(60, mode=mode)
    for t in sorted(base + o for o in offsets):
        sk.add(t)
    assert sk.estimate() == count_estimate_table(n, mode)[n]


def test_count_table_within_error_bound():
    """g(n) obeys the DGIM bound for every n (NOT monotone in n: the
    halved-oldest-bucket term can dip when the cascade restructures —
    e.g. java g(14)=12 but g(15)=11, and again at 31 and 63)."""
    from flink_window_dgim_traffic_spark.dgim import count_estimate_table

    tab = count_estimate_table(5000, MODE_JAVA)
    for n in range(1, 5001):
        assert n / 2 - 1 <= tab[n] <= 1.5 * n + 1  # DGIM error bound


@given(
    st.one_of(
        st.integers(min_value=0, max_value=4096),
        st.integers(min_value=0, max_value=10**9),
    ),
    st.sampled_from([MODE_JAVA, MODE_PYFLINK]),
)
@settings(max_examples=200, deadline=None)
def test_closed_form_matches_replay_table(n, mode):
    """count_estimate_closed (the DuckDB-oracle expression for
    tumble_dgim_bound) equals the sketch-replay-grown table — the
    link that makes the windowed DGIM estimate hash-checkable."""
    from flink_window_dgim_traffic_spark.dgim import (
        count_estimate_closed,
        count_estimate_table,
    )

    if n <= 200_000:  # replay table is O(n); spot-check big n by replay
        assert count_estimate_closed(n, mode) == count_estimate_table(n, mode)[n]
    else:
        # replaying 10^9 inserts is too slow; instead check the closed
        # form's invariants directly: est <= n, error == oldest/2-ish
        m = (n + 1).bit_length() - 2
        est = count_estimate_closed(n, mode)
        assert n - (1 << m) <= est <= n
        assert 2 * abs(est - n) <= n
