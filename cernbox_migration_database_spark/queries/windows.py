"""Window functions: ranking, frames, sessionization, EWMA, gaps-and-islands, and as-of joins (SURVEY §2.5 extended).

Split out of the monolithic queries.py (round 8); registration behavior
is identical — every ``@register`` feeds the shared registry in
``._registry`` and the public names re-export through the package root.
"""

from __future__ import annotations

from ..functions.numeric import davg, dsum, dsum_decimal, dsum_expr
from ..operators.asof import asof_join
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ._registry import _t, register


@register(
    "window_dedup_recency",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def window_dedup_recency(spark, sf_dir):
    """Keep the most recent event per user — the canonical window dedup
    (SURVEY §2.5). Total order via (ts, event_id) tie-break."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@register(
    "window_running_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    """,
)
def window_running_sum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "running_value"
        ),
    )


@register(
    "window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@register(
    "window_sessionize",
    """
    SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id FROM (
      SELECT event_id, user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM (
        SELECT event_id, user_id, us,
               CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                            ORDER BY us, event_id)
                         > 1800000000 OR
                         LAG(us) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)))
    """,
)
def window_sessionize(spark, sf_dir):
    """Sessionization: lag + gap>30min flag + running sum = session id.
    Microsecond integer arithmetic on both engines (unix_micros/epoch_us) —
    no float time math."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .select("event_id", "user_id", "session_id")
    )


@register(
    "batch_session_window",
    """
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                       > 1800000000
                    OR LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      SELECT user_id, us, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM seq)
    SELECT user_id, make_timestamp(MIN(us)) AS session_start,
           COUNT(*) AS n_events,
           (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS DOUBLE) / 100.0) AS total_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def batch_session_window(spark, sf_dir):
    """Native ``session_window`` in BATCH mode (30-minute gap) with a value
    aggregate — the third formulation of sessionization in the catalog,
    cross-checked against the lag+cumsum SQL derivation (window_sessionize
    proves lag+cumsum on both engines; streaming_session_window proves the
    native operator under Structured Streaming; this proves the native
    operator's batch planning — one shuffle on user_id, sessions assembled
    in the aggregate, no window function at all). Output keys on
    session_start, not session end: Spark defines end = last event + gap,
    which the oracle formulation has no analogue for."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "asof_join_purchases",
    """
    WITH purch AS (
      SELECT user_id, ts, MAX(event_id) AS p_event
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts)
    SELECT e.event_id, e.user_id, p.p_event AS asof_event_id
    FROM events e
    ASOF LEFT JOIN purch p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def asof_join_purchases(spark, sf_dir):
    """As-of join (operators/asof.py): each event enriched with the most
    recent purchase event at-or-before it per user. The oracle uses DuckDB's
    *native* ASOF JOIN — a strong cross-formulation differential against the
    union+last-window implementation."""
    ev = _t(spark, sf_dir, "events")
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))  # dedup: one row per (key, ts)
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purch.select("user_id", "ts", "event_id"),
        key="user_id",
        ts="ts",
        right_cols=["event_id"],
    )
    return out.select("event_id", "user_id", F.col("asof_event_id"))


@register(
    "asof_forward_tolerance",
    """
    WITH purch AS (
      SELECT user_id, ts, MAX(event_id) AS p_event
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts)
    SELECT e.event_id, e.user_id,
           CASE WHEN p.ts - e.ts <= INTERVAL 1 DAY THEN p.p_event
           END AS next_purchase
    FROM events e
    ASOF LEFT JOIN purch p
      ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def asof_forward_tolerance(spark, sf_dir):
    """FORWARD as-of join with a tolerance window: each event enriched with
    the user's next purchase, but only if it lands within 1 day — the
    attribution-style "did this click convert?" lookup. Same union+window
    plan as the backward as-of (operators/asof.py), traversed in reverse
    ts order, with the matched ts carried so out-of-tolerance matches
    null out instead of re-searching (pandas merge_asof semantics). The
    oracle is DuckDB's native forward ASOF JOIN (e.ts <= p.ts) with the
    tolerance applied as a post-mask — the same cross-formulation
    differential as `asof_join_purchases`."""
    ev = _t(spark, sf_dir, "events")
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purch.select("user_id", "ts", "event_id"),
        key="user_id",
        ts="ts",
        right_cols=["event_id"],
        direction="forward",
        tolerance="INTERVAL 1 DAY",
    )
    return out.select(
        "event_id", "user_id", F.col("asof_event_id").alias("next_purchase")
    )


@register(
    "window_distribution",
    """
    SELECT o_orderkey, o_orderstatus,
           round(percent_rank() OVER w, 9) AS pr,
           round(cume_dist() OVER w, 9) AS cd,
           nth_value(o_orderkey, 3) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS third_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark, sf_dir):
    """Distribution window functions — percent_rank / cume_dist / nth_value
    — completing the analytic-window family (`window_analytics` covers
    lag/lead/rank/ntile). Total order (o_totalprice, o_orderkey) makes the
    rank-derived doubles deterministic; the single division in both
    functions is identically ordered on both engines, rounded 9 dp for the
    cross-engine hash. nth_value needs the explicit unbounded frame — its
    default RANGE frame would return NULL until three rows accumulate."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_cheapest"),
    )


@register(
    "window_analytics",
    """
    SELECT event_id, user_id,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def window_analytics(spark, sf_dir):
    """The analytic-function family over a single total-ordered window
    (lag/lead/rank/dense_rank/ntile)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_range_frame",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_1h
    FROM events
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over integer microseconds: a 1-hour rolling sum — the
    value-based frame the ROWS variant can't express."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "rolling_1h"
        ),
    )


_EWMA_W = [0.8**j for j in range(8)]


_EWMA_NUM_SQL = " + ".join(
    f"COALESCE(LAG(value, {j}) OVER w * {w!r}, 0.0)"
    for j, w in enumerate(_EWMA_W)
)


_EWMA_DEN_SQL = " + ".join(
    f"(CASE WHEN LAG(value, {j}) OVER w IS NULL THEN 0.0 ELSE {w!r} END)"
    for j, w in enumerate(_EWMA_W)
)


@register(
    "window_ewma",
    f"""
    SELECT event_id, user_id,
           round(({_EWMA_NUM_SQL}) / ({_EWMA_DEN_SQL}), 9) AS ewma
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_ewma(spark, sf_dir):
    """Exponentially-weighted moving average over each user's purchase
    values — the smoothing kernel monitoring/forecast pipelines run over
    metric streams. The recurrence is unrolled to a fixed 8-term LAG
    kernel with literal 0.8^j weights (identical textual addition order on
    both engines, so the double arithmetic is bit-deterministic — a true
    recursive EWMA is order-exact only with unbounded-precision state),
    normalized by the weight mass actually present so leading rows are
    unbiased. One shuffle on user_id; weights are plan literals."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", j).over(w) for j in range(len(_EWMA_W))]
    num = None
    den = None
    for lg, wt in zip(lags, _EWMA_W):
        t = F.coalesce(lg * F.lit(wt), F.lit(0.0))
        d = F.when(lg.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = t if num is None else num + t
        den = d if den is None else den + d
    return ev.select(
        "event_id", "user_id", F.round(num / den, 9).alias("ewma")
    )


@register(
    "window_gap_islands",
    """
    WITH runs AS (
      SELECT user_id, event_id,
             event_id - ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY event_id) AS island
      FROM events
    ),
    islands AS (
      SELECT user_id, island,
             CAST(COUNT(*) AS BIGINT) AS run_len,
             MIN(event_id) AS run_start, MAX(event_id) AS run_end
      FROM runs GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           MAX(run_len) AS longest_run,
           CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS runs_ge_3,
           MIN(run_start) AS first_event,
           MAX(run_end) AS last_event
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def window_gap_islands(spark, sf_dir):
    """Gaps-and-islands: maximal runs of CONSECUTIVE event ids per user
    via the classic ``id - row_number()`` constant-within-a-run trick —
    the sequence-segmentation idiom behind contiguous-session detection,
    missing-range audits, and streak analytics (window_sessionize is the
    time-gap twin; this is the dense-key form). Two aggregations over one
    user-keyed window: the heavy shuffle is the single partitionBy on
    user_id; islands and the per-user rollup are combinable aggregates.
    All-integer arithmetic — bit-exact cross-engine."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    runs = ev.select(
        "user_id",
        "event_id",
        (F.col("event_id") - F.row_number().over(w)).alias("island"),
    )
    islands = runs.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min("event_id").alias("run_start"),
        F.max("event_id").alias("run_end"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("run_len").alias("longest_run"),
            F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0))
            .cast("long")
            .alias("runs_ge_3"),
            F.min("run_start").alias("first_event"),
            F.max("run_end").alias("last_event"),
        )
        .orderBy("user_id")
    )

