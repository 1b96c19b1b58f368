"""Structured Streaming counterparts (§2.9 generalization): windows, joins, stateful counts, dedup.

Split out of the monolithic queries.py (round 8); registration behavior
is identical — every ``@register`` feeds the shared registry in
``._registry`` and the public names re-export through the package root.
"""

from __future__ import annotations

from .. import streaming as ST
from ..functions.numeric import davg, dsum, dsum_decimal, dsum_expr
from pyspark.sql import functions as F
from ._registry import _t, register


@register(
    "streaming_window_agg",
    """
    SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000)
             AS window_start,
           event_type, COUNT(*) AS n,
           (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) AS total_value
    FROM events GROUP BY window_start, event_type
    """,
)
def streaming_window_agg(spark, sf_dir):
    """Watermarked tumbling-window aggregation executed as an actual
    streaming query (readStream -> window agg -> memory sink, drained
    synchronously); the oracle is the equivalent batch bucket aggregation."""
    stream = ST.read_event_stream(spark, sf_dir)
    agg = ST.windowed_counts(stream, window="10 minutes")
    ST.run_stream_to_memory(agg, "stream_window_agg_out", output_mode="complete")
    return spark.table("stream_window_agg_out")


@register(
    "streaming_sliding_window",
    """
    WITH e AS (SELECT epoch_us(ts) AS tu, event_type, value FROM events),
    w AS (SELECT event_type, value,
                 (tu // 300000000 - j) * 300000000 AS ws
          FROM e, (SELECT unnest(generate_series(0, 1)) AS j))
    SELECT make_timestamp(ws) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS DOUBLE) / 100.0) AS total_value
    FROM w GROUP BY window_start, event_type
    """,
)
def streaming_sliding_window(spark, sf_dir):
    """SLIDING (hopping) window aggregation — 10-minute windows every 5
    minutes, so each event lands in exactly window/slide = 2 overlapping
    buckets (and streaming state is 2x the tumbling equivalent, which is
    why the watermark matters more here). Drained as a real streaming
    query; the oracle replays the bucket assignment arithmetically: the 2
    window starts of an event are floor(t/slide)*slide - j*slide for
    j in {0, 1} — with size = 2*slide both always contain t, no filter
    needed."""
    stream = ST.read_event_stream(spark, sf_dir)
    agg = ST.windowed_counts(
        stream, window="10 minutes", slide="5 minutes"
    )
    ST.run_stream_to_memory(agg, "stream_slide_out", output_mode="complete")
    return spark.table("stream_slide_out")


@register(
    "streaming_enrich_join",
    """
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS DOUBLE) / 100.0) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY segment, e.event_type
    """,
)
def streaming_enrich_join(spark, sf_dir):
    """Stream-static broadcast enrichment (streaming/events.py:
    stream_static_enrich): the event stream joins a static customer dim on
    user_id = c_custkey — the streaming twin of the reference's per-row
    lookup join (main.go:120-137). Stream-static inner joins are stateless
    (each micro-batch joins the broadcast dim independently; no watermark,
    no join state), so the only stateful operator is the downstream
    segment/type aggregation, drained in complete mode. The oracle is the
    equivalent batch join+group-by with the engine's exact-decimal sum."""
    stream = ST.read_event_stream(spark, sf_dir)
    dim = _t(spark, sf_dir, "customer")
    joined = ST.stream_static_enrich(stream, dim, "user_id", "c_custkey")
    agg = joined.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("total_value"),
    )
    ST.run_stream_to_memory(agg, "stream_enrich_out", output_mode="complete")
    return spark.table("stream_enrich_out")


@register(
    "streaming_session_window",
    """
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                       > 1800000000
                    OR LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      -- ORDER BY (us, event_id): total tie-break — with duplicate (user, us)
      -- rows an us-only running sum is order-nondeterministic. Boundary note:
      -- Spark session_window MERGES events exactly gap apart (verified on
      -- fixtures: t and t+30min share a session), so strict '>' is correct.
      SELECT user_id, us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM seq)
    SELECT make_timestamp(MIN(us)) AS session_start, user_id,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def streaming_session_window(spark, sf_dir):
    """Native session_window (30-minute gap) as a streaming query; the
    oracle derives the identical sessions with the batch lag+cumsum method —
    a strong cross-check that the two formulations agree."""
    stream = ST.read_event_stream(spark, sf_dir)
    agg = ST.session_window_agg(stream, gap="30 minutes")
    ST.run_stream_to_memory(agg, "stream_session_out", output_mode="complete")
    return spark.table("stream_session_out")


@register(
    "streaming_interval_join",
    """
    SELECT p.event_id AS l_event, c.event_id AS r_event
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
     AND epoch_us(c.ts) <= epoch_us(p.ts)
    """,
)
def streaming_interval_join(spark, sf_dir):
    """Stream-stream interval join run as a REAL streaming query (two
    watermarked streams, bounded state, drained to memory); the oracle is
    the equivalent batch interval join — purchases matched to same-user
    clicks within the preceding 30 minutes."""
    purchases = ST.read_event_stream(spark, sf_dir).where("event_type = 'purchase'")
    clicks = ST.read_event_stream(spark, sf_dir).where("event_type = 'click'")
    joined = ST.stream_stream_join(purchases, clicks, within="30 minutes")
    out = joined.select(
        F.col("l_event").alias("l_event"), F.col("r_event").alias("r_event")
    )
    ST.run_stream_to_memory(out, "stream_ij_out", output_mode="append")
    return spark.table("stream_ij_out")


@register(
    "streaming_stateful_counts",
    """
    SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    """,
)
def streaming_stateful_counts(spark, sf_dir):
    """CUSTOM stateful streaming operator (applyInPandasWithState): a
    per-user running counter carried in explicit GroupState across
    micro-batches — the template for bespoke streaming state machines
    Spark has no built-in operator for. Drained to completion in update
    mode, the final state per user equals the batch COUNT(*) oracle; the
    memory sink may hold multiple updates per key, so the query keeps the
    LAST (max) count per user — deterministic because counts only grow."""
    stream = ST.read_event_stream(spark, sf_dir)
    counted = ST.stateful_user_counts(stream)
    ST.run_stream_to_memory(counted, "stream_state_out", output_mode="update")
    return (
        spark.table("stream_state_out")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )


@register(
    "streaming_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def streaming_dedup(spark, sf_dir):
    """Streaming dedup with BOUNDED state
    (``dropDuplicatesWithinWatermark`` — streaming/events.py
    dedup_within_watermark, promoted from test-only to an oracle-paired
    query): duplicates arriving inside the watermark horizon are dropped
    and state for expired keys is reclaimed, vs the unbounded
    ``dropDuplicates`` that would grow state forever on an infinite
    stream. The output projects ONLY the dedup keys — which row survives a
    duplicate group is arrival-order-dependent, the key SET is not. The
    fixture's event time spans ~30 days, inside the 90-day horizon, so the
    drained result equals batch DISTINCT exactly."""
    stream = ST.read_event_stream(spark, sf_dir)
    d = ST.dedup_within_watermark(
        stream.select("user_id", "event_type", "ts"),
        ["user_id", "event_type"],
        watermark="90 days",
    )
    out = d.select("user_id", "event_type")
    ST.run_stream_to_memory(out, "stream_dedup_out", output_mode="append")
    return spark.table("stream_dedup_out")


@register(
    "streaming_outer_join",
    """
    SELECT p.event_id AS l_event, COALESCE(c.event_id, -1) AS r_event
    FROM events p LEFT JOIN events c
      ON p.user_id = c.user_id AND c.event_type = 'click'
     AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
     AND epoch_us(c.ts) <= epoch_us(p.ts)
    WHERE p.event_type = 'purchase'
    """,
)
def streaming_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join as a REAL streaming query:
    purchases left-joined to same-user clicks in the preceding 30 minutes,
    with unmatched purchases emitted as (-1)-filled rows once the watermark
    passes their match window. Append-mode outer emission is watermark-
    gated, so the source is wrapped with a far-future horizon sentinel
    (streaming/events.py event_stream_with_horizon) that pushes the final
    watermark past every real row — making the one-shot drain equal the
    batch LEFT JOIN oracle exactly. The sentinel is removed from the
    DRAINED table, not inside the streaming plan: Catalyst would push a
    plan-side filter below the watermark operator on the preserved join
    side and re-strand the last hour of purchases (see the helper's
    docstring). Unmatched ids surface as -1 (not NULL) so the driver's
    pandas hasher keeps the column int64 on both engines."""
    horizon = ST.event_stream_with_horizon(spark, sf_dir)
    purchases = horizon.where("event_type = 'purchase'")
    clicks = horizon.where("event_type = 'click'")
    joined = ST.stream_stream_join(
        purchases, clicks, within="30 minutes", how="left_outer"
    )
    out = joined.select(
        "l_key",
        "l_event",
        F.coalesce("r_event", F.lit(-1)).alias("r_event"),
    )
    ST.run_stream_to_memory(out, "stream_oj_out", output_mode="append")
    return (
        spark.table("stream_oj_out")
        .where(F.col("l_key") < ST.HORIZON_USER)
        .select("l_event", "r_event")
    )

