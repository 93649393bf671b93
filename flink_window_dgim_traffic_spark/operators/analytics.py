"""Product-analytics operators: grouped trend fitting, market-basket
association, marketing attribution, and distribution-drift scoring.

These are the four classic "beyond GROUP BY" analytics a warehouse
user reaches for next; each is expressed as a declarative one-or-two
shuffle DataFrame plan (no UDFs, no driver loops) and is exact
cross-engine: every floating-point expression is either built from
exact integer sums (the BIGINT/DECIMAL(38) quantization recipe proven
for word_entropy / ewma in this repo) or ordered identically to the
DuckDB oracle so the IEEE doubles match bit-for-bit.

Scale notes (100 TB): per-key trend is ONE partial-aggregated shuffle
on the key after a broadcast of per-key minima (x is centered per key
so the DECIMAL(38) moment sums are bounded by the TIME SPAN, not the
row count); association pairs self-join on the basket id (bounded
fan-out: baskets are user-days with ~items-per-basket² pair rows);
attribution is one window sweep per user partition; drift is a
two-branch scan folded into |bins| rows before the tiny join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

D38 = "decimal(38,0)"


def per_key_trend(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_type", "user_id"),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key ordinary-least-squares trend of ``value_col`` over
    time: slope (value units per DAY) and mean, for every key with at
    least two distinct timestamps.

    Exactness recipe: y is quantized ONCE to integer micro-units,
    x is epoch-microseconds CENTERED on the per-key minimum (keeps
    the DECIMAL(38,0) moment sums span-bounded: with a 30-day span
    and 1e5 rows/key the largest term, sx², is ~1e34 < 1e38), all
    four moments are exact integer sums, and only the final
    slope/mean are computed in doubles — ordered identically to the
    oracle SQL, so the rounded results hash-match."""
    keep = [F.col(k) for k in keys]
    base = events.select(
        *keep,
        F.unix_micros(F.col(ts_col)).alias("x_us"),
        F.round(F.col(value_col) * 1e6).cast("bigint").alias("y_micro"),
    )
    mins = base.groupBy(*keys).agg(F.min("x_us").alias("x0"))
    x = (F.col("x_us") - F.col("x0")).cast(D38)
    y = F.col("y_micro").cast(D38)
    agg = (
        base.join(F.broadcast(mins), list(keys))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast(D38).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    return (
        agg.filter(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0
        )
        .select(
            *keys,
            F.col("n").cast("bigint").alias("n"),
            F.round(num / den * 86400.0, 6).alias("slope_per_day"),
            F.round(
                F.col("sy").cast("double")
                / F.col("n").cast("double")
                / 1e6,
                6,
            ).alias("mean_value"),
        )
    )


def assoc_pairs(
    events: DataFrame,
    basket_keys: tuple[str, ...] = ("user_id",),
    basket_day: bool = True,
    item_col: str = "event_type",
    min_both: int = 1,
) -> DataFrame:
    """Market-basket association over event baskets (default: one
    basket per user-day): for every unordered item pair, co-occurrence
    count, per-item basket counts, support and lift.

    Plan shape: distinct (basket, item) → self-join on the basket id
    with ``item_a < item_b`` (fan-out bounded by items-per-basket²,
    never |baskets|²) → one aggregation on the pair; the per-item and
    total basket counts are tiny aggregates broadcast into the final
    projection.  Lift/support are doubles computed from exact BIGINT
    counts in oracle-identical order."""
    bcols = [F.col(k) for k in basket_keys]
    names = list(basket_keys)
    if basket_day:
        bcols.append(F.to_date("ts").alias("_day"))
        names.append("_day")
    s = events.select(
        *bcols, F.col(item_col).alias("item")
    ).distinct()
    n_item = s.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    n_total = s.select(*names).distinct().agg(
        F.count(F.lit(1)).alias("nb")
    )
    a = s.alias("a")
    b = s.alias("b")
    basket_eq = [
        F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in names
    ]
    cond = basket_eq[0]
    for c in basket_eq[1:]:
        cond = cond & c
    pairs = (
        a.join(b, cond & (F.col("a.item") < F.col("b.item")))
        .groupBy(
            F.col("a.item").alias("item_a"),
            F.col("b.item").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_both)
    )
    na = F.broadcast(
        n_item.select(
            F.col("item").alias("item_a"), F.col("c").alias("n_a")
        )
    )
    nb = F.broadcast(
        n_item.select(
            F.col("item").alias("item_b"), F.col("c").alias("n_b")
        )
    )
    return (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "item_a",
            "item_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_both").cast("double")
                * F.col("nb").cast("double")
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                ),
                6,
            ).alias("lift"),
            F.round(
                F.col("n_both").cast("double")
                / F.col("nb").cast("double"),
                6,
            ).alias("support"),
        )
    )


def attribution_touch(
    events: DataFrame,
    conversion: str = "purchase",
    user_col: str = "user_id",
) -> DataFrame:
    """First-touch / last-touch attribution: every ``conversion``
    event is credited to the user's FIRST and MOST RECENT preceding
    non-conversion event type (``'direct'`` when the conversion has no
    prior touch), and conversions are counted per channel.

    One window sweep per user partition (rows-preceding frame, no
    self-join), then a |channels|-row aggregate — the standard
    at-scale shape for path attribution."""
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != conversion, F.col("event_type")
    )
    tagged = events.select(
        "event_type",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
    ).filter(F.col("event_type") == conversion)
    last = tagged.groupBy(
        F.coalesce("last_touch", F.lit("direct")).alias("channel")
    ).agg(F.count(F.lit(1)).alias("n_last_touch"))
    first = tagged.groupBy(
        F.coalesce("first_touch", F.lit("direct")).alias("channel")
    ).agg(F.count(F.lit(1)).alias("n_first_touch"))
    return (
        last.join(first, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("n_last_touch", F.lit(0))
            .cast("bigint")
            .alias("n_last_touch"),
            F.coalesce("n_first_touch", F.lit(0))
            .cast("bigint")
            .alias("n_first_touch"),
        )
    )


def profile_drift(
    events: DataFrame,
    cut: str = "2024-01-16 00:00:00",
    value_col: str = "value",
    bin_width: float = 50.0,
    ts_col: str = "ts",
) -> DataFrame:
    """Population-stability-index drift of ``value_col`` between the
    reference period (``ts < cut``) and the current period
    (``ts >= cut``): fixed-width bins, Laplace-smoothed bin shares,
    per-bin PSI contribution in integer micro-nats.

    PSI_bin = (p - q)·ln(p/q) with p = (cnt_ref+1)/(n_ref+B),
    q = (cnt_cur+1)/(n_cur+B), B = number of observed bins — the +1
    smoothing keeps ln finite for bins present on one side only.
    Exactness: counts are exact BIGINTs; the double expression is
    ordered identically to the oracle and quantized once to micro-nats
    (the word_entropy ln recipe), so rows hash-match.  Total drift =
    SUM(psi_micro_nats) downstream; >0.2 nats is the classic
    "significant shift" alarm line."""
    side = (F.col(ts_col) < F.to_timestamp(F.lit(cut))).cast("int")
    binned = events.select(
        F.floor(F.col(value_col) / bin_width).cast("bigint").alias("bin"),
        side.alias("is_ref"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("bigint").alias("cnt_ref"),
        F.sum(1 - F.col("is_ref")).cast("bigint").alias("cnt_cur"),
    )
    tot = per_bin.agg(
        F.sum("cnt_ref").alias("n_ref"),
        F.sum("cnt_cur").alias("n_cur"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    p = (F.col("cnt_ref") + F.lit(1.0)) / (
        F.col("n_ref") + F.col("n_bins")
    )
    q = (F.col("cnt_cur") + F.lit(1.0)) / (
        F.col("n_cur") + F.col("n_bins")
    )
    ratio = (
        (F.col("cnt_ref") + F.lit(1.0)) * (F.col("n_cur") + F.col("n_bins"))
    ) / (
        (F.col("cnt_cur") + F.lit(1.0)) * (F.col("n_ref") + F.col("n_bins"))
    )
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "cnt_ref",
        "cnt_cur",
        F.round((p - q) * F.log(ratio) * 1e6)
        .cast("bigint")
        .alias("psi_micro_nats"),
    )


def session_paths(
    events: DataFrame,
    gap_sec: int = 4 * 3600,
    max_steps: int = 5,
    user_col: str = "user_id",
) -> DataFrame:
    """Top navigation paths: gap-sessionize (the repo's lag +
    running-sum recipe, microsecond-exact), take each session's first
    ``max_steps`` event types in time order, and count sessions per
    path string — the "how do users move through the product" query.

    Deterministic path assembly: the step structs are sorted by
    (epoch-micros, event_id) INSIDE the aggregate (``array_sort`` of
    collected structs), never relying on collect_list order.  Two
    window sweeps + one aggregation; path cardinality is bounded by
    |event_types|^max_steps, so the final aggregate is small."""
    base = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("u").orderBy("us", "event_id")
    prev_us = F.lag("us").over(w)
    new_sess = F.when(
        prev_us.isNull()
        | (F.col("us") - prev_us > gap_sec * 1_000_000),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = base.withColumn(
        "sess_id", F.sum(new_sess).over(wsum).cast("bigint")
    )
    ws = Window.partitionBy("u", "sess_id")
    ranked = sess.select(
        "u",
        "sess_id",
        "us",
        "event_id",
        "event_type",
        F.row_number().over(ws.orderBy("us", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("sess_len"),
    ).filter(F.col("rn") <= max_steps)
    per_sess = ranked.groupBy("u", "sess_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("us", "event_id", "event_type")
                    )
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.max("sess_len").alias("sess_len"),
    )
    return per_sess.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("sess_len").cast("bigint").alias("n_events"),
    )


def _dist_ntile(
    df: DataFrame,
    metric: str,
    n_tiles: int,
    out_col: str,
    id_col: str = "user_id",
    n_buckets: int = 256,
    id_buckets: int = 64,
    part_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact ANSI ``ntile(n_tiles)`` under the total order
    ``(metric DESC, id_col ASC)`` with NO unpartitioned
    data-proportional window — the sharded global-rank recipe.

    A global ntile is really ``tile(global_rank)``: with n rows,
    q = n div t, r = n mod t, ranks 1..(q+1)·r land in tiles 1..r
    and the rest in q-sized tiles (the ANSI remainder-first rule,
    identical in Spark and DuckDB).  So the problem reduces to an
    exact distributed rank, computed hierarchically:

    1. shard ``s1`` = equal-width bucket of the (negated) metric over
       its broadcast [min, max] — a pure monotone column function, so
       re-evaluation across plan branches is hazard-free (unlike
       ``spark_partition_id`` after a sampled range shuffle);
    2. tie-splitting sub-bucket ``ub`` = equal-width bucket of
       ``id_col`` — a metric value held by half the corpus (frequency
       ties, monetary=0) spreads over ``id_buckets`` groups instead
       of one task;
    3. per-(s1, metric, ub) counts (one keyed aggregation), cumulated
       into pair offsets by a window PARTITIONED BY s1 over the
       count table, s1 offsets by a window over the ≤ n_buckets
       shard totals (bounded), and the within-group rank by a window
       PARTITIONED BY (s1, metric, ub) — every window is partitioned
       and the only ordered-unpartitioned one sees ≤ n_buckets rows.

    global_rank = s1_offset + pair_offset + local_rank, exactly,
    because (s1, metric, ub, id) sorts identically to (metric, id):
    s1 is monotone in the metric and ub in the id.  All input columns
    pass through; ``out_col`` is the bigint tile.

    Preconditions: ``metric`` and ``id_col`` must be non-null NUMERIC
    columns (the equal-width bucket arithmetic needs integer
    subtraction; a null metric/id would land every affected row in
    bucket null and silently drop it from the rank).  Bucket math is
    the division form ``(x - min) div width`` with
    ``width = (max - min) div buckets + 1`` — monotone like the
    multiply form but immune to int64 overflow for any value range
    (the multiply form ``(x - min) * buckets`` wraps when the range
    exceeds ~3.6e16).

    The input is pinned with a lazy ``localCheckpoint`` (the repo's
    multi-consumer idiom, cf. dedup/_minhash_wide): the min/max
    scan, the pair aggregation, and the final join are three plan
    branches over the same rows — without the pin each chained pass
    would re-derive its whole upstream per branch (3^passes scans of
    the base aggregate)."""
    reserved = {"_nv", "_s1", "_ub", "_poff", "_soff", "_rnk",
                "_mn", "_mx", "_umn", "_umx", "_n", "_pc", "_sc"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"_dist_ntile: input columns collide with internal"
            f" helper names: {sorted(clash)}"
        )
    pc = list(part_cols)
    t = df.localCheckpoint(eager=False).withColumn(
        "_nv", -F.col(metric)
    )
    mm_aggs = [
        F.min("_nv").alias("_mn"),
        F.max("_nv").alias("_mx"),
        F.min(id_col).alias("_umn"),
        F.max(id_col).alias("_umx"),
        F.count(F.lit(1)).alias("_n"),
    ]
    if pc:
        mm = t.groupBy(*pc).agg(*mm_aggs)
        t = t.join(F.broadcast(mm), pc)
    else:
        mm = t.agg(*mm_aggs)
        t = t.crossJoin(F.broadcast(mm))
    t = (
        t.withColumn(
            "_s1",
            F.expr(
                f"(_nv - _mn) div ((_mx - _mn) div {n_buckets} + 1)"
            ),
        )
        .withColumn(
            "_ub",
            F.expr(
                f"({id_col} - _umn)"
                f" div ((_umx - _umn) div {id_buckets} + 1)"
            ),
        )
    )
    pairs = t.groupBy(*pc, "_s1", "_nv", "_ub").agg(
        F.count(F.lit(1)).alias("_pc")
    )
    w_pair = (
        Window.partitionBy(*pc, "_s1")
        .orderBy("_nv", "_ub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pairs = pairs.withColumn(
        "_poff", F.coalesce(F.sum("_pc").over(w_pair), F.lit(0))
    )
    s1tot = pairs.groupBy(*pc, "_s1").agg(F.sum("_pc").alias("_sc"))
    w_s1 = (
        Window.partitionBy(*pc) if pc else Window.partitionBy()
    ).orderBy("_s1").rowsBetween(Window.unboundedPreceding, -1)
    s1tot = s1tot.withColumn(
        "_soff", F.coalesce(F.sum("_sc").over(w_s1), F.lit(0))
    )
    w_loc = Window.partitionBy(*pc, "_s1", "_nv", "_ub").orderBy(id_col)
    q, r = f"(_n div {n_tiles})", f"(_n % {n_tiles})"
    tile = F.expr(
        f"CASE WHEN _rnk <= ({q} + 1) * {r}"
        f" THEN (_rnk - 1) div ({q} + 1) + 1"
        f" ELSE {r} + (_rnk - ({q} + 1) * {r} - 1)"
        f"       div greatest({q}, 1) + 1 END"
    )
    return (
        t.join(pairs.select(*pc, "_s1", "_nv", "_ub", "_poff"),
               pc + ["_s1", "_nv", "_ub"])
        .join(F.broadcast(s1tot.select(*pc, "_s1", "_soff")),
              pc + ["_s1"])
        .withColumn(
            "_rnk",
            F.col("_soff") + F.col("_poff")
            + F.row_number().over(w_loc),
        )
        .withColumn(out_col, tile.cast("bigint"))
        .drop("_nv", "_s1", "_ub", "_poff", "_soff", "_rnk",
              "_mn", "_mx", "_umn", "_umx", "_n")
    )


def rfm_segments(events: DataFrame, n_tiles: int = 5) -> DataFrame:
    """RFM customer segmentation: per user, recency (days since last
    event, against the corpus max timestamp), frequency (events), and
    monetary value (micro-quantized purchase sum), each cut into
    ``n_tiles`` ntile buckets (1 = best) under a DETERMINISTIC total
    order (metric, then user_id) so the tiling is reproducible and
    engine-portable — ANSI ntile distributes remainder rows to the
    first buckets identically in Spark and DuckDB.

    One aggregation on the user key + one broadcast scalar + ONE
    :func:`_dist_ntile` pass (r8: the r7 form chained three passes,
    each re-materializing the per-user table; unpivoting the three
    metrics into (user, metric, value) rows and tiling them in a
    single grouped pass runs the sharded-rank machinery once — same
    exact ANSI ntile per metric because every window and offset is
    additionally partitioned by the metric name).  Still no
    unpartitioned data-proportional window (the naive form is three
    single-task global sorts of every user: the scale-killer VERDICT
    r6 flagged).  The unpivoted rows carry the metric columns
    through, so the final pivot needs no re-join on user_id."""
    us = F.unix_micros(F.col("ts"))
    y = F.round(F.col("value") * 1e6).cast("bigint")
    per_user = events.groupBy("user_id").agg(
        F.max(us).alias("last_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", y)),
            F.lit(0),
        ).cast("bigint").alias("monetary_micro"),
    )
    ref = events.agg(F.max(us).alias("ref_us"))
    j = per_user.crossJoin(F.broadcast(ref))
    rec_days = F.floor(
        (F.col("ref_us") - F.col("last_us")) / F.lit(86_400_000_000)
    ).cast("bigint")
    base = j.select(
        "user_id",
        "last_us",
        rec_days.alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary_micro",
    )
    long = base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micro",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("_m"),
                    F.col("last_us").cast("bigint").alias("_mv"),
                ),
                F.struct(
                    F.lit("f").alias("_m"),
                    F.col("frequency").cast("bigint").alias("_mv"),
                ),
                F.struct(
                    F.lit("m").alias("_m"),
                    F.col("monetary_micro").cast("bigint").alias("_mv"),
                ),
            )
        ).alias("_x"),
    ).select(
        "user_id", "recency_days", "frequency", "monetary_micro",
        F.col("_x._m").alias("_m"), F.col("_x._mv").alias("_mv"),
    )
    tiles = _dist_ntile(
        long, "_mv", n_tiles, "_tile", part_cols=("_m",)
    )
    tile_of = {
        m: F.max(
            F.when(F.col("_m") == m, F.col("_tile"))
        ).cast("bigint")
        for m in ("r", "f", "m")
    }
    piv = tiles.groupBy("user_id").agg(
        F.max("recency_days").alias("recency_days"),
        F.max("frequency").alias("frequency"),
        F.max("monetary_micro").alias("monetary_micro"),
        tile_of["r"].alias("r_tile"),
        tile_of["f"].alias("f_tile"),
        tile_of["m"].alias("m_tile"),
    )
    return piv.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micro",
        "r_tile",
        "f_tile",
        "m_tile",
        F.concat_ws(
            "", F.col("r_tile"), F.col("f_tile"), F.col("m_tile")
        ).alias("segment"),
    )


def global_quantiles(
    events: DataFrame,
    ps_ppm: tuple[int, ...] = (500_000, 900_000, 990_000),
    value_col: str = "value",
) -> DataFrame:
    """EXACT global quantiles (type-1 / lower order statistic: the
    value at rank ``ceil(p·n)``) over the whole table WITHOUT a
    global sort — the order-statistic query that separates "works on
    a laptop" from "works on 100 TB" (``percentile_cont`` and naive
    ``ORDER BY + OFFSET`` both funnel every row through one task;
    ``approx_percentile`` gives bounds, not the answer).

    The sharded pair-table recipe (:func:`winsorized_stats`, global
    flavor): distinct-value counts → value-range shards → bounded
    ≤256-row shard-prefix → within-shard cumulation, then each
    requested rank selects the unique pair whose rank range contains
    it.  Raw rows cross exactly ONE aggregation; every window is
    partitioned except the ≤256-row shard prefix.

    Output: one row per requested ppm — (p_ppm, n, rank, value_e6),
    all BIGINT (value micro-quantized), bit-stable cross-engine."""
    base = events.select(
        F.round(F.col(value_col) * 1_000_000, 0)
        .cast("bigint")
        .alias("v_e6")
    )
    pairs0 = (
        base.groupBy("v_e6")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    mm = pairs0.agg(
        F.min("v_e6").alias("_mn"), F.max("v_e6").alias("_mx")
    )
    pairs = pairs0.crossJoin(F.broadcast(mm)).withColumn(
        "_s1", F.expr("(v_e6 - _mn) div ((_mx - _mn) div 256 + 1)")
    )
    shard = pairs.groupBy("_s1").agg(F.sum("cnt").alias("sc"))
    w_sh = Window.orderBy("_s1").rowsBetween(
        Window.unboundedPreceding, -1
    )
    shard = shard.withColumn(
        "soff", F.coalesce(F.sum("sc").over(w_sh), F.lit(0))
    )
    total = shard.agg(F.sum("sc").cast("bigint").alias("n"))
    w_in = Window.partitionBy("_s1").orderBy("v_e6").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = (
        pairs.withColumn(
            "icum", F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
        )
        .join(F.broadcast(shard.select("_s1", "soff")), "_s1")
        .crossJoin(F.broadcast(total))
        .withColumn("cb", F.col("soff") + F.col("icum"))
    )
    ps = F.explode(
        F.array(*[F.lit(int(p)) for p in ps_ppm])
    ).alias("p_ppm")
    want = cum.select("v_e6", "cnt", "cb", "n", ps).withColumn(
        "rank",
        F.expr("greatest(1, (n * p_ppm + 999999) div 1000000)"),
    )
    return (
        want.filter(
            (F.col("cb") < F.col("rank"))
            & (F.col("rank") <= F.col("cb") + F.col("cnt"))
        )
        .select(
            F.col("p_ppm").cast("bigint").alias("p_ppm"),
            F.col("n"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("v_e6").alias("value_e6"),
        )
    )


def ts_pattern_topk(
    events: DataFrame,
    pattern_e6: tuple[int, ...] = (
        10_000_000, 20_000_000, 40_000_000, 80_000_000,
    ),
    k: int = 20,
    value_col: str = "value",
    user_col: str = "user_id",
) -> DataFrame:
    """Distributed time-series SUBSEQUENCE similarity search (the
    EDBT'19 streaming-similarity / UCR-suite query class): over each
    user's value series ordered by (ts, event_id), find the top-``k``
    length-m subsequences closest to a query ``pattern`` under exact
    squared euclidean distance in 1e-6 units (integer — no float
    accumulation, bit-stable cross-engine).

    Output: (user_id, start_idx, dist_e12) ranked ascending with
    (user, start) tie-break.

    Scale shape: the sliding window is a GROUP BY, not a window
    function — each series element explodes into m (start-offset,
    pattern-slot) contribution rows (n·m total, map-side), and
    per-(user, start) sums reduce them in one keyed aggregation;
    subsequences crossing a series end are dropped by the count==m
    guard.  The only per-user window is the idx ranking (partitioned
    by user).  Top-k is ``orderBy().limit(k)`` =
    TakeOrderedAndProject — per-partition heads, never a global
    sort."""
    m = len(pattern_e6)
    v = F.round(F.col(value_col) * 1_000_000, 0).cast("bigint")
    w = Window.partitionBy("u").orderBy("us", "i")
    seq = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("i"),
        v.alias("v"),
    ).withColumn("idx", F.row_number().over(w))
    pat = F.array(*[F.lit(int(p)) for p in pattern_e6])
    contrib = (
        seq.select(
            "u",
            "idx",
            "v",
            F.explode(
                F.sequence(F.lit(0), F.lit(m - 1))
            ).alias("j"),
        )
        .withColumn("start", F.col("idx") - F.col("j"))
        .filter(F.col("start") >= 1)
        .withColumn("q", F.element_at(pat, F.col("j") + 1))
        # accumulate in DECIMAL(38,0): (v-q)² on raw BIGINT micro-units
        # exceeds 2^63 for |value| ≳ 3000 and would wrap silently with
        # ANSI off while the DuckDB twin errors — the all-integer
        # decimal recipe keeps both engines exact up to ~1e38
        .withColumn("dq", (F.col("v") - F.col("q")).cast("decimal(38,0)"))
        .withColumn("d2", F.col("dq") * F.col("dq"))
    )
    dists = (
        contrib.groupBy("u", "start")
        .agg(
            F.sum("d2").cast("bigint").alias("dist_e12"),
            F.count(F.lit(1)).alias("nm"),
        )
        .filter(F.col("nm") == m)
    )
    order = [
        F.col("dist_e12").asc(), F.col("u").asc(), F.col("start").asc()
    ]
    topk = dists.orderBy(*order).limit(k)
    wr = Window.orderBy(*order)
    return topk.withColumn(
        "rnk", F.row_number().over(wr).cast("bigint")
    ).select(
        F.col("u").alias("user_id"),
        F.col("start").cast("bigint").alias("start_idx"),
        "dist_e12",
        "rnk",
    )


def conversion_latency(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    bucket_sec: int = 600,
    user_col: str = "user_id",
) -> DataFrame:
    """Time-to-convert distribution: for every ``to_type`` event, the
    latency since the user's MOST RECENT preceding ``from_type``
    event, histogrammed into ``bucket_sec`` buckets (bucket −1 =
    unattributed conversions with no prior touch).  Exact: latencies
    are integer microseconds; one window sweep + one small aggregate.
    ``sum_latency_us`` makes downstream means exact."""
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_from = F.last(
        F.when(F.col("event_type") == from_type, us), ignorenulls=True
    ).over(w)
    conv = events.select(
        "event_type", us.alias("us"), last_from.alias("from_us")
    ).filter(F.col("event_type") == to_type)
    lat = F.col("us") - F.col("from_us")
    bucket = F.when(F.col("from_us").isNull(), F.lit(-1)).otherwise(
        F.floor(lat / F.lit(bucket_sec * 1_000_000))
    )
    return conv.groupBy(bucket.cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.coalesce(F.sum(lat), F.lit(0))
        .cast("bigint")
        .alias("sum_latency_us"),
    )


def value_deciles(
    events: DataFrame,
    n_tiles: int = 10,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Quantile-bucket feature transform: per key, rank rows into
    ``n_tiles`` equal-count tiles of ``value_col`` (ANSI ntile —
    remainder rows go to the earlier tiles, identical in Spark and
    DuckDB) under a deterministic total order (value, id), then
    profile each (key, tile): row count and the tile's exact value
    range.  The discretization step behind quantile feature binning
    and winsorization in feature pipelines — the per-row tile is
    computed, the profile is what's emitted.

    Scale shape: the ntile sort is partitioned BY KEY (one sort per
    key partition, never global); the profile is a keyed
    re-aggregation of the same partitioning, so the whole plan is
    one shuffle on ``key_col`` reused by both steps.  min/max of
    doubles are exact picks (no accumulation), so floats stay
    bit-stable."""
    # alias FIRST, window over the aliased column: partitioning on a
    # pre-window alias propagates to the downstream groupBy (hash on
    # "key" co-locates (key, tile) too), so Catalyst plans ONE
    # exchange for both steps — aliasing after the window breaks the
    # partitioning lineage and costs a second shuffle
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("v"),
        F.col(id_col).alias("i"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("v").asc(), F.col("i").asc()
    )
    tiled = base.select(
        "key",
        "v",
        F.ntile(n_tiles).over(w).cast("bigint").alias("tile"),
    )
    return tiled.groupBy("key", "tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )


def cross_tab_chi2(
    events: DataFrame,
    row_col: str = "event_type",
) -> DataFrame:
    """Chi-square contingency analysis of event type × day-of-week —
    the categorical-association test behind seasonality and segment
    dependence checks (is traffic mix independent of weekday?).  The
    day slot is computed as ``floor(epoch/86400) % 7`` — pure integer
    arithmetic, identical on every engine (never an engine-specific
    DAYOFWEEK whose week origin differs).

    All-integer cells: with O = observed, R/C = row/column totals,
    N = grand total, the expectation in micro-units is ``E_e6 =
    R·C·10^6 div N`` and the cell's chi-square contribution is the
    fixed-point textbook form ``(O·10^6 − E_e6)² div max(E_e6, 1)``
    (e12/e6 = micro-units) — truncation only in E_e6 (<1 µ-unit) and
    the final div, identical stepwise on both engines.  Intermediate
    bound: (N·10^6)² = N²·10^12, so DECIMAL(38,0) (DuckDB HUGEINT)
    is safe to N ≈ 10^13 rows — unlike the naive ``(O·N − R·C)²``
    form whose N⁴ deviation-square overflows 38 digits at N ≈ 3·10^9.
    Total chi² = Σ cells / 10^6 downstream.

    Scale shape: one keyed aggregation events→cells, two tiny total
    aggregations broadcast back; the cell table is |types|·7 rows."""
    slot = F.pmod(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint"),
        F.lit(7),
    )
    obs = events.groupBy(
        F.col(row_col).alias("row_key"), slot.alias("day_slot")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    rtot = obs.groupBy("row_key").agg(
        F.sum("observed").cast("bigint").alias("r_tot")
    )
    ctot = obs.groupBy("day_slot").agg(
        F.sum("observed").cast("bigint").alias("c_tot")
    )
    ntot = obs.agg(F.sum("observed").cast("bigint").alias("n_tot"))
    d38 = "decimal(38,0)"
    j = (
        obs.join(F.broadcast(rtot), "row_key")
        .join(F.broadcast(ctot), "day_slot")
        .crossJoin(F.broadcast(ntot))
    )
    e_e6 = (
        f"(CAST(r_tot AS {d38}) * CAST(c_tot AS {d38})"
        f" * 1000000) div CAST(n_tot AS {d38})"
    )
    return j.withColumn(
        "expected_e6", F.expr(f"CAST({e_e6} AS BIGINT)")
    ).select(
        "row_key",
        "day_slot",
        "observed",
        "expected_e6",
        F.expr(
            f"CAST(((CAST(observed AS {d38}) * 1000000"
            f" - CAST(expected_e6 AS {d38}))"
            f" * (CAST(observed AS {d38}) * 1000000"
            f" - CAST(expected_e6 AS {d38})))"
            f" div GREATEST(CAST(expected_e6 AS {d38}),"
            f" CAST(1 AS {d38})) AS BIGINT)"
        ).alias("chi2_cell_e6"),
    )


def lag_correlation(
    events: DataFrame,
    type_x: str = "view",
    type_y: str = "purchase",
    bucket_sec: int = 60,
    max_lag: int = 10,
) -> DataFrame:
    """Cross-correlation lag scan between two event types: bucket
    both series on a fixed grid (ZERO-FILLED — absent buckets count
    0, so quiet periods depress correlation instead of vanishing),
    then for every lag 0..max_lag emit the exact integer sufficient
    statistics of the aligned pairs (x_t, y_{t+lag}) plus the
    Pearson numerator ``n·Σxy − Σx·Σy``.  Which lag maximizes the
    lead-lag relationship ("views precede purchases by k minutes")
    is then a driver-side read of max_lag+1 rows; keeping the
    statistics integer avoids every cross-engine float hazard.

    Scale shape: two keyed aggregations events→bucket counts, a
    bucket-grid densification via one ``sequence`` explode (the grid
    is time-span/bucket_sec rows — independent of event volume), a
    (max_lag+1)-way explode of that grid, and one keyed equi-join
    grid×grid on the shifted bucket — never an inequality join."""
    b = F.floor(F.unix_timestamp("ts") / bucket_sec).cast("bigint")
    filt = events.filter(
        F.col("event_type").isin(type_x, type_y)
    ).select(F.col("event_type").alias("et"), b.alias("b"))
    rng = filt.agg(
        F.min("b").alias("bmin"), F.max("b").alias("bmax")
    )
    grid = rng.select(
        F.explode(F.sequence("bmin", "bmax")).alias("b")
    )
    cx = filt.filter(F.col("et") == type_x).groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    cy = filt.filter(F.col("et") == type_y).groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    dense = (
        grid.join(cx, "b", "left")
        .join(cy, "b", "left")
        .select(
            "b",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    lagged = dense.select(
        "b",
        "x",
        F.explode(
            F.sequence(F.lit(0), F.lit(max_lag))
        ).alias("lag"),
    ).withColumn("b2", F.col("b") + F.col("lag"))
    pairs = lagged.join(
        dense.select(F.col("b").alias("b2"), F.col("y").alias("y2")),
        "b2",
    )
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y2").cast("bigint").alias("sum_y"),
        F.sum(F.col("x") * F.col("y2")).cast("bigint").alias("sum_xy"),
    )
    return agg.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n_pairs",
        "sum_x",
        "sum_y",
        "sum_xy",
        (
            F.col("n_pairs") * F.col("sum_xy")
            - F.col("sum_x") * F.col("sum_y")
        ).cast("bigint").alias("pearson_num"),
    )


def percentile_rank(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key percentile-rank feature transform: each row's rank
    within its key under the deterministic (value, id) total order,
    scaled to exact ppm — ``pr_ppm = (rank−1)·10^6 div (n−1)`` (0
    for a single-row key), the ANSI percent_rank kept integer so
    both engines agree bit-for-bit.  The normalization step behind
    rank-based feature scaling (monotone, outlier-immune).

    Scale shape: one shuffle on the key feeding the rank window and
    a same-partitioning count window — the key is aliased BEFORE the
    windows so both reuse a single exchange (the value_deciles
    lesson)."""
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("v"),
        F.col(id_col).alias("i"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("v").asc(), F.col("i").asc()
    )
    wn = Window.partitionBy("key")
    ranked = base.select(
        "key",
        "i",
        "v",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    return ranked.select(
        "key",
        F.col("i").alias("event_id"),
        "v",
        F.when(F.col("n") > 1,
               F.expr("CAST(((rnk - 1) * 1000000) div (n - 1)"
                      " AS BIGINT)"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pr_ppm"),
    )


def winsorized_stats(
    events: DataFrame,
    lo_ppm: int = 50_000,
    hi_ppm: int = 950_000,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key winsorized mean — the robust-statistics feature
    transform that clamps each group's tails to its own rank-based
    cutoffs before averaging (outlier-immune location estimate for
    feature pipelines and data-quality drift rows).  Rank-based, not
    value-interpolated: the lo cutoff is the value at rank
    ``max(1, n·lo_ppm div 10^6)`` under the deterministic total
    order (value, id) and the hi cutoff the value at rank
    ``min(n, n·hi_ppm div 10^6 + 1)``, so both cutoffs are actual
    observed values (no float interpolation to drift cross-engine)
    and the whole statistic is exact in 1e-6 micro-units.

    Output per key: ``n``, ``lo_e6``/``hi_e6`` (the clamp values),
    ``wins_mean_e6`` (mean of clamped values, integer floor-div).

    Scale shape (r7 rewrite — the r6 form ranked every RAW row
    through one window task per key, the 2.0×-at-10× stress row):
    an ORDER STATISTIC never needs per-row ranks — the id tie-break
    only permutes equal values, so the value at rank r is determined
    by the (value → count) multiset alone.  So: (1) pre-aggregate to
    distinct ``(key, v_e6)`` pairs with counts (one distributed
    keyed aggregation — a dominant duplicate value collapses to one
    row); (2) the sharded cumulative-count recipe of
    :func:`_dist_ntile` over the PAIR table (value-range shard →
    per-(key, shard) totals → per-key prefix over ≤ 256 bounded
    shard rows → within-shard pair cumulation, every window
    partitioned); (3) the cutoff per key is the pair whose rank
    range [cum_before+1, cum_before+cnt] contains lo/hi_rank; (4)
    the winsorized sum is Σ cnt·clamp(v) over pairs.  Raw rows pass
    through exactly one aggregation; no per-key all-rows sort
    anywhere.  The shard/cut/total side tables are |keys|·256-,
    |keys|-, |keys|-sized and broadcast (for a very-high-cardinality
    ``key_col``, drop the broadcast hints and let AQE plan the
    joins)."""
    base = events.select(
        F.col(key_col).alias("key"),
        F.round(F.col(value_col) * 1_000_000, 0)
        .cast("bigint")
        .alias("v_e6"),
    )
    # one raw-row aggregation, pinned once (multi-consumer idiom):
    # shard totals, cumulation, and the final stats are three plan
    # branches over the pair table — and min/max come from the pairs
    # too, so raw events are scanned exactly ONCE
    pairs0 = (
        base.groupBy("key", "v_e6")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    mm = pairs0.agg(
        F.min("v_e6").alias("_mn"), F.max("v_e6").alias("_mx")
    )
    pairs = pairs0.crossJoin(F.broadcast(mm)).withColumn(
        "_s1", F.expr("(v_e6 - _mn) div ((_mx - _mn) div 256 + 1)")
    )
    shard = pairs.groupBy("key", "_s1").agg(F.sum("cnt").alias("sc"))
    w_sh = Window.partitionBy("key").orderBy("_s1").rowsBetween(
        Window.unboundedPreceding, -1
    )
    shard = shard.withColumn(
        "soff", F.coalesce(F.sum("sc").over(w_sh), F.lit(0))
    )
    totals = shard.groupBy("key").agg(
        F.sum("sc").cast("bigint").alias("n")
    )
    w_in = Window.partitionBy("key", "_s1").orderBy("v_e6").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = (
        pairs.withColumn(
            "icum", F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
        )
        .join(F.broadcast(shard.select("key", "_s1", "soff")),
              ["key", "_s1"])
        .join(F.broadcast(totals), "key")
        .withColumn("cb", F.col("soff") + F.col("icum"))
    )
    lo_rank = F.greatest(
        F.lit(1), F.expr(f"n * {int(lo_ppm)} div 1000000")
    )
    hi_rank = F.least(
        F.col("n"), F.expr(f"n * {int(hi_ppm)} div 1000000") + 1
    )
    in_lo = (F.col("cb") < lo_rank) & (
        lo_rank <= F.col("cb") + F.col("cnt")
    )
    in_hi = (F.col("cb") < hi_rank) & (
        hi_rank <= F.col("cb") + F.col("cnt")
    )
    cuts = (
        cum.select(
            "key",
            F.when(in_lo, F.col("v_e6")).alias("lo_v"),
            F.when(in_hi, F.col("v_e6")).alias("hi_v"),
        )
        .groupBy("key")
        .agg(
            F.max("lo_v").cast("bigint").alias("lo_e6"),
            F.max("hi_v").cast("bigint").alias("hi_e6"),
        )
    )
    return (
        pairs.join(F.broadcast(cuts), "key")
        .groupBy("key")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.min("lo_e6").cast("bigint").alias("lo_e6"),
            F.min("hi_e6").cast("bigint").alias("hi_e6"),
            F.expr(
                "CAST(sum(cnt * greatest(lo_e6, least(hi_e6, v_e6)))"
                " div sum(cnt) AS BIGINT)"
            ).alias("wins_mean_e6"),
        )
    )


def daily_movers(
    events: DataFrame,
    key_col: str = "event_type",
    day_col: str = "ts",
) -> DataFrame:
    """Day-over-day movers: per key and calendar day, the event count
    and its delta vs the key's previous OBSERVED day — the trending /
    regression-detector series dashboards sort by.  First observed
    day baselines against 0 (its appearance IS the move).

    Output: ``key, day, n, prev_n, delta`` (day formatted
    yyyy-MM-dd; counts/deltas BIGINT).

    Scale shape: one map-side-combinable (key, day) count, then a
    per-key lag window over the AGGREGATED day series (|keys| ×
    |days| rows, not event volume) — two keyed exchanges total, no
    join, no global sort."""
    daily = events.groupBy(
        F.col(key_col).alias("key"),
        F.date_format(day_col, "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("key").orderBy("day")
    return daily.select(
        "key",
        "day",
        "n",
        F.coalesce(F.lag("n").over(w), F.lit(0))
        .cast("bigint")
        .alias("prev_n"),
        (F.col("n") - F.coalesce(F.lag("n").over(w), F.lit(0)))
        .cast("bigint")
        .alias("delta"),
    )


def path_regex_match(
    events: DataFrame,
    pattern: str = "v(c|v)*p",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch MATCH_RECOGNIZE over whole user journeys: each user's
    full time-ordered event-type sequence is encoded one CHARACTER
    per event (first letter of the type — 'v'iew 'c'lick 'p'urchase
    's'ignup 'e'rror) and matched against a plain regex — the
    CEP-pattern query class (Flink MATCH_RECOGNIZE / Esper) reduced
    to a string match, which works because a journey IS a string
    once steps are deterministically ordered.  The default pattern
    finds a view leading through clicks/views to a purchase.

    Cross-engine exactness: the char encoding is injective on the
    fixture types and the pattern stays in the RE2-compatible subset
    both engines share; match COUNT uses non-overlapping left-to-
    right semantics (regexp_count), identical in Spark and DuckDB.

    Output: ``user_id, n_events, matched (0/1), n_matches``.

    Scale shape: one keyed aggregation builds the per-user string
    (structs sorted INSIDE the aggregate — never collect_list order),
    then the regex is a map-only projection.  Per-user state is the
    journey string: bounded by events-per-user; for power users cap
    upstream (the ``session_paths`` max_steps discipline)."""
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    journeys = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("us", "event_id", "ch"))
                ),
                lambda s: s["ch"],
            ),
            "",
        ).alias("journey"),
    )
    return journeys.select(
        "user_id",
        "n_events",
        F.col("journey").rlike(pattern).cast("bigint").alias("matched"),
        F.regexp_count("journey", F.lit(pattern))
        .cast("bigint")
        .alias("n_matches"),
    )
