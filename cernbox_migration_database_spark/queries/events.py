"""Batch event-time analytics over `events`: funnels, cohorts, attribution, time-series bucketing/interpolation.

Split out of the monolithic queries.py (round 8); registration behavior
is identical — every ``@register`` feeds the shared registry in
``._registry`` and the public names re-export through the package root.
"""

from __future__ import annotations

from ..functions.numeric import davg, dsum, dsum_decimal, dsum_expr
from ..operators.asof import asof_join
from ..util import ensure_parallelism, global_rank, topk_ranked, tracked_persist
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ._registry import _t, register


@register(
    "time_bucket_agg",
    """
    SELECT epoch_us(ts) // 600000000 AS bucket, event_type,
           COUNT(*) AS n,
           (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) AS total_value
    FROM events GROUP BY bucket, event_type
    """,
)
def time_bucket_agg(spark, sf_dir):
    """10-minute tumbling window as integer microsecond buckets — the batch
    twin of the streaming windowed aggregation (streaming/events.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.expr("unix_micros(ts) div 600000000"))
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
        )
    )


@register(
    "events_pivot",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)
def events_pivot(spark, sf_dir):
    """Pivot: event-type counts per user with a fixed column list (dynamic
    pivot would need a collect for the distinct values — fixed keeps the
    plan one-pass)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0, ["click", "error", "purchase", "signup", "view"])
    )


@register(
    "events_anomaly_zscore",
    """
    WITH h AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, hr),
    s AS (
      SELECT event_type, COUNT(*) AS nb, SUM(n) AS sn, SUM(n * n) AS snn
      FROM h GROUP BY event_type)
    SELECT h.event_type, CAST(h.hr AS BIGINT) AS hr, h.n,
           round((h.n - sn / CAST(nb AS DOUBLE))
                 / sqrt(snn / CAST(nb AS DOUBLE)
                        - (sn / CAST(nb AS DOUBLE))
                          * (sn / CAST(nb AS DOUBLE))), 6) AS z
    FROM h JOIN s ON s.event_type = h.event_type
    WHERE nb > 1 AND snn * nb > sn * sn
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Volume-anomaly detection: z-score of each (event_type, hour) bucket
    count against that type's own mean/std — the monitoring query a
    pipeline runs over its event firehose. Two aggregations (bucket counts,
    then per-type integer moment sums — counts are ints, so sum and
    sum-of-squares are EXACT, no decimal guard needed) and a broadcast
    join of the tiny per-type stats back onto the bucket table; the raw
    events shuffle once. The z formula is evaluated with an identical
    expression tree on both engines (single-rounding doubles + 6dp round);
    zero-variance types are excluded with an exact integer predicate."""
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3600000000)
        )
        .cast("long")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    s = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    mean = F.col("sn") / F.col("nb").cast("double")
    var = F.col("snn") / F.col("nb").cast("double") - mean * mean
    return (
        h.join(F.broadcast(s), "event_type")
        .where((F.col("nb") > 1) & (F.col("snn") * F.col("nb") > F.col("sn") * F.col("sn")))
        .select(
            "event_type",
            "hr",
            "n",
            F.round((F.col("n") - mean) / F.sqrt(var), 6).alias("z"),
        )
    )


@register(
    "ts_gap_fill",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS DOUBLE) / 100.0) AS hour_value
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    span AS (
      SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi
      FROM hourly GROUP BY event_type),
    grid AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM span),
    joined AS (
      SELECT g.event_type, g.hour,
             COALESCE(h.n_events, 0) AS n_events,
             (h.event_type IS NULL) AS is_gap,
             h.hour_value
      FROM grid g LEFT JOIN hourly h
        ON h.event_type = g.event_type AND h.hour = g.hour)
    SELECT event_type, hour, n_events, is_gap,
           LAST_VALUE(hour_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM joined
    """,
)
def ts_gap_fill(spark, sf_dir):
    """Time-series gap-fill + forward-fill: per-type hourly aggregates, a
    dense hour grid generated per type from its own observed span
    (``sequence`` + ``explode`` — no driver loop, no cross join; the grid
    derives from a per-type min/max aggregate so each series densifies only
    its own range), left-joined back and forward-filled with
    ``last(ignorenulls)`` over an ordered window. The standard shape for
    regularizing sensor/event streams before training or windowed features;
    at 100 TB the grid is tiny (types x hours) while the heavy side is
    pre-aggregated once. Leading rows can't be NULL: each series' grid
    starts at its first observed hour."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("hour_value"),
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    joined = grid.join(hourly, ["event_type", "hour"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("hour_value").isNull().alias("is_gap"),
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "events_funnel",
    """
    WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_type FROM events),
    v AS (SELECT user_id, MIN(tu) AS vt FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(tu) AS ct FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND tu >= vt GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(tu) AS pt FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND tu >= ct GROUP BY e.user_id)
    SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
           (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked,
           (SELECT COUNT(*) FROM p) AS n_purchased,
           round((SELECT COUNT(*) FROM c) / CAST((SELECT COUNT(*) FROM v)
                 AS DOUBLE), 6) AS view_to_click,
           round((SELECT COUNT(*) FROM p) / CAST((SELECT COUNT(*) FROM c)
                 AS DOUBLE), 6) AS click_to_purchase
    """,
)
def events_funnel(spark, sf_dir):
    """Sequential funnel (view -> click -> purchase) per user, aggregated to
    one conversion row. Spark-first shape: instead of the oracle's three
    aggregate+join passes, ONE hash shuffle on user_id feeds three stacked
    window operators with the same (partition, order) spec — Catalyst plans
    a single Exchange+Sort and evaluates the windows back-to-back, and the
    final groupBy(user_id) reuses the same hash partitioning. The windows
    use the default RANGE frame (unbounded preceding .. current row), so
    same-timestamp peers are included — exactly the oracle's `tu >= vt`
    tie semantics, independent of any secondary sort order. Each funnel
    stage is a running min over candidates gated on the previous stage's
    running min being non-null; a stage hit therefore means "an earlier (or
    simultaneous) qualifying event of the previous stage exists", which is
    precisely the min-join formulation."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = W.partitionBy("user_id").orderBy("ts")
    s1 = ev.withColumn(
        "v_run",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s2 = s1.withColumn(
        "c_run",
        F.min(
            F.when(
                (F.col("event_type") == "click") & F.col("v_run").isNotNull(),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "p_hit",
        (F.col("event_type") == "purchase") & F.col("c_run").isNotNull(),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max(F.col("v_run").isNotNull().cast("int")).alias("viewed"),
        F.max(F.col("c_run").isNotNull().cast("int")).alias("clicked"),
        F.max(F.col("p_hit").cast("int")).alias("purchased"),
    )
    agg = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("viewed").alias("n_viewed"),
        F.sum("clicked").alias("n_clicked"),
        F.sum("purchased").alias("n_purchased"),
    )
    return agg.select(
        "n_users",
        "n_viewed",
        "n_clicked",
        "n_purchased",
        F.round(
            F.col("n_clicked") / F.col("n_viewed").cast("double"), 6
        ).alias("view_to_click"),
        F.round(
            F.col("n_purchased") / F.col("n_clicked").cast("double"), 6
        ).alias("click_to_purchase"),
    )


@register(
    "events_retention_cohort",
    """
    WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk
               FROM events),
    c AS (SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cw
          FROM w)
    SELECT cw AS cohort_week, wk - cw AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM c GROUP BY cw, wk - cw
    """,
)
def events_retention_cohort(spark, sf_dir):
    """Cohort retention matrix: users bucketed by their first-activity week
    (integer epoch-week — pure int64 arithmetic, immune to engine week-
    truncation conventions), counted per (cohort, week offset). Two
    shuffles: the cohort window partitions by user_id, then the retention
    cells re-key by (cohort, offset); the distinct-user count is the
    standard partial-aggregated distinct. The week index divides epoch
    microseconds by 7*86400*10^6."""
    wk_us = 7 * 86400 * 1_000_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_micros(ts) div {wk_us}").alias("wk")
    )
    c = ev.withColumn("cw", F.min("wk").over(W.partitionBy("user_id")))
    return c.groupBy(
        F.col("cw").alias("cohort_week"),
        (F.col("wk") - F.col("cw")).alias("week_offset"),
    ).agg(
        F.countDistinct("user_id").alias("n_active"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_ohlc_bars",
    f"""
    WITH o AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           {dsum_expr('value')} AS value_sum
    FROM o GROUP BY event_type, bucket
    """,
)
def events_ohlc_bars(spark, sf_dir):
    """OHLC candlestick rollup — the hypertable/time-series downsample
    shape: per (event_type, hour) the first/highest/lowest/last value plus
    volume. Open/close are picked by row_number with a total (ts,
    event_id) tie-break rather than first()/last() window frames, so the
    result is deterministic under any partitioning; the per-bucket
    aggregate is map-side combinable and the only shuffle is the groupBy
    on (type, bucket) — the layout a 100 TB metrics table would already
    be partitioned by."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "bucket", F.date_trunc("hour", F.col("ts"))
    )
    wa = W.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            dsum("value").alias("value_sum"),
        )
    )


@register(
    "events_top_transitions",
    """
    WITH s AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    c AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE dst IS NOT NULL GROUP BY src, dst),
    r AS (
      SELECT src, dst, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, src, dst) AS rank
      FROM c)
    SELECT src, dst, n, rank FROM r WHERE rank <= 20
    """,
)
def events_top_transitions(spark, sf_dir):
    """Markov transition mining over per-user event streams: LEAD pairs
    each event with its successor (one shuffle on user_id — the stream's
    natural key), then a global count + top-20. The per-user window never
    materializes the full stream on one node, and the final rank runs on
    the tiny (src, dst) aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    c = s.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    # bounded top-k rank (util.topk_ranked): TakeOrdered heaps, no
    # unpartitioned window, no rank-offset job
    return topk_ranked(
        c, [F.col("n").desc(), F.col("src"), F.col("dst")], 20
    )


@register(
    "market_basket_pairs",
    """
    WITH pr AS (
      SELECT DISTINCT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    cnt AS (
      SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS support
      FROM pr GROUP BY p1, p2),
    r AS (
      SELECT p1, p2, support,
             ROW_NUMBER() OVER (ORDER BY support DESC, p1, p2) AS rank
      FROM cnt)
    SELECT p1, p2, support, rank FROM r WHERE rank <= 100
    """,
)
def market_basket_pairs(spark, sf_dir):
    """Market-basket co-occurrence (frequent itemset support, k=2): parts
    bought together in one order, counted across orders, top-100 with a
    total tie-break. The pair expansion is an equi-join on l_orderkey —
    co-partitioned, output bounded by (items per order choose 2), never a
    cross join; the support count is map-side combinable and the rank runs
    on the aggregated pair table only. This is the shape association-rule
    mining keeps at 100 TB: blow-up is bounded per basket, not per
    table."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .select("l_orderkey", "p1", "p2")
        .distinct()
    )
    cnt = pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("support"))
    # bounded top-k rank over the aggregated pair table: per-partition
    # top-100 heaps merge once, however many distinct pairs exist
    return topk_ranked(
        cnt, [F.col("support").desc(), F.col("p1"), F.col("p2")], 100
    )


@register(
    "events_attribution",
    f"""
    WITH touch AS (
      SELECT user_id, ts, arg_max(event_type, event_id) AS touch_type
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY user_id, ts),
    purch AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'),
    attributed AS (
      SELECT p.value,
             CASE WHEN t.ts IS NOT NULL
                       AND p.ts - t.ts <= INTERVAL 7 DAY
                  THEN t.touch_type ELSE 'none' END AS channel
      FROM purch p
      ASOF LEFT JOIN touch t
        ON p.user_id = t.user_id AND p.ts >= t.ts)
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS conversions,
           {dsum_expr('value')} AS revenue
    FROM attributed GROUP BY channel
    """,
)
def events_attribution(spark, sf_dir):
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent click/view within 7 days ('none' when cold). The
    lookup is the backward as-of join (operators/asof.py — union + last
    window, one shuffle on user_id, no range explosion); the oracle
    cross-checks with DuckDB's native ASOF JOIN plus a tolerance
    post-mask. Touches are pre-deduplicated to one row per (user, ts)
    with arg_max on event_id so the carried row is total-order
    deterministic."""
    ev = _t(spark, sf_dir, "events")
    touch = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.expr("max_by(event_type, event_id)").alias("touch_type"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join(
        purch,
        touch.select("user_id", "ts", "touch_type"),
        key="user_id",
        ts="ts",
        right_cols=["touch_type"],
        tolerance="INTERVAL 7 DAY",
    )
    attributed = j.select(
        "value",
        F.coalesce(F.col("asof_touch_type"), F.lit("none")).alias("channel"),
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("conversions"),
        dsum("value").alias("revenue"),
    )


@register(
    "events_sequence_match",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS nxt1,
             LEAD(event_type, 2) OVER w AS nxt2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, COUNT(*) AS n_matches
    FROM seq
    WHERE event_type = 'view' AND nxt1 = 'click' AND nxt2 = 'purchase'
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_sequence_match(spark, sf_dir):
    """Ordered-sequence pattern matching (MATCH_RECOGNIZE-lite): count,
    per user, the CONTIGUOUS view→click→purchase triples in the user's
    event stream — the conversion-path primitive behind funnel and
    clickstream mining. Two LEADs over one per-user window express the
    fixed-length pattern with a single shuffle on user_id (the stream's
    natural key); no self-joins, no per-user collect. Ties are broken by
    event_id so the sequence order is total and the differential exact.
    Variable-length patterns generalize to the same window + run-length
    encoding; the fixed-length form is the one that stays one-shuffle."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    return (
        seq.where(
            (F.col("event_type") == "view")
            & (F.col("nxt1") == "click")
            & (F.col("nxt2") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy("user_id")
    )


@register(
    "ts_interpolate",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS DOUBLE) / 100.0) AS hour_value
      FROM events WHERE event_type IN ('purchase', 'error')
      GROUP BY event_type, date_trunc('hour', ts)),
    span AS (
      SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi
      FROM hourly GROUP BY event_type),
    grid AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM span),
    joined AS (
      SELECT g.event_type, g.hour, h.hour_value,
             ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.hour)
               AS rn
      FROM grid g LEFT JOIN hourly h
        ON h.event_type = g.event_type AND h.hour = g.hour),
    bounded AS (
      SELECT event_type, hour, hour_value, rn,
        LAST_VALUE(hour_value IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY rn
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN hour_value IS NOT NULL THEN rn END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY rn
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prn,
        FIRST_VALUE(hour_value IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY rn
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN hour_value IS NOT NULL THEN rn END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY rn
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn
      FROM joined)
    SELECT event_type, hour,
           (hour_value IS NULL) AS interpolated,
           CASE WHEN hour_value IS NOT NULL THEN hour_value
                ELSE pv + (nv - pv) * (CAST(rn - prn AS DOUBLE)
                                       / CAST(nrn - prn AS DOUBLE))
           END AS value
    FROM bounded
    """,
)
def ts_interpolate(spark, sf_dir):
    """Time-series LINEAR interpolation of missing buckets (ts_gap_fill's
    forward-fill twin, upgraded to the resampling shape model-feature
    pipelines actually want): per-type hourly sums on a dense generated
    grid, gaps filled as pv + (nv - pv) * gap_fraction between the
    bracketing observed buckets. The gap fraction uses ROW positions on
    the equally-spaced grid (never epoch arithmetic — identical integer
    deltas on both engines), the bracketing values come from
    last/first-with-ignore-nulls frames over one per-type window, and the
    observed bucket sums are exact fixed-point — so the interpolated
    doubles assemble from exact inputs through one shared op sequence and
    match bitwise. Grid endpoints are observed by construction, so every
    gap is two-sided."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "error")
    )
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(dsum(F.col("value")).alias("hour_value"))
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    joined = grid.join(hourly, ["event_type", "hour"], "left").withColumn(
        "rn", F.row_number().over(W.partitionBy("event_type").orderBy("hour"))
    )
    wb = (
        W.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    has = F.col("hour_value").isNotNull()
    bounded = joined.select(
        "event_type",
        "hour",
        "hour_value",
        "rn",
        F.last("hour_value", ignorenulls=True).over(wb).alias("pv"),
        F.last(F.when(has, F.col("rn")), ignorenulls=True).over(wb).alias("prn"),
        F.first("hour_value", ignorenulls=True).over(wf).alias("nv"),
        F.first(F.when(has, F.col("rn")), ignorenulls=True).over(wf).alias("nrn"),
    )
    return bounded.select(
        "event_type",
        "hour",
        F.col("hour_value").isNull().alias("interpolated"),
        F.when(F.col("hour_value").isNotNull(), F.col("hour_value"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("rn") - F.col("prn")).cast("double")
                / (F.col("nrn") - F.col("prn")).cast("double")
            )
        )
        .alias("value"),
    )


@register(
    "events_rolling_distinct_users",
    """
    WITH hu AS (
      SELECT DISTINCT date_trunc('hour', ts) AS hour, user_id FROM events
    ),
    hours AS (SELECT DISTINCT hour FROM hu)
    SELECT h.hour,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users_24h
    FROM hours h
    JOIN hu u
      ON u.hour <= h.hour AND u.hour > h.hour - INTERVAL 24 HOURS
    GROUP BY h.hour
    ORDER BY h.hour
    """,
)
def events_rolling_distinct_users(spark, sf_dir):
    """Trailing-24h distinct active users per hour — the DAU/rolling-
    engagement metric. COUNT(DISTINCT) over a window FRAME is unsupported
    in both engines, so the correct formulation is: dedup to (hour, user)
    once (the only corpus-sized shuffle), then a bounded RANGE JOIN of
    the hour spine against the deduped pairs with a distinct-count per
    spine hour. The join fan-out is |hours| x 24-hour slices of the
    already-deduped pairs — at any scale the heavy input is pre-shrunk to
    distinct pairs, and the spine is metadata-sized. (The approximate
    twin at extreme scale swaps the distinct count for an HLL sketch
    merged over the window — sketches.py; this is the exact form.)"""
    ev = _t(spark, sf_dir, "events")
    hu = (
        ev.select(F.date_trunc("hour", "ts").alias("hour"), "user_id")
        .distinct()
    )
    hours = hu.select("hour").distinct()
    u = hu.select(F.col("hour").alias("u_hour"), "user_id")
    return (
        hours.join(
            u,
            (F.col("u_hour") <= F.col("hour"))
            & (
                F.col("u_hour")
                > F.col("hour") - F.expr("INTERVAL 24 HOURS")
            ),
        )
        .groupBy("hour")
        .agg(F.countDistinct("user_id").cast("long").alias("active_users_24h"))
        .orderBy("hour")
    )

