"""Relational core: scans, aggregations, joins, set ops, and the general SQL-expression surface (SURVEY §2.1–2.4, §2.6–2.8 extended).

Split out of the monolithic queries.py (round 8); registration behavior
is identical — every ``@register`` feeds the shared registry in
``._registry`` and the public names re-export through the package root.
"""

from __future__ import annotations

from ..functions.numeric import davg, dsum, dsum_decimal, dsum_expr
from ..operators import similarity as S
from ..operators.merge import merge_updates
from ..operators.skew import salted_agg
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ._registry import _t, register
from .similarity import _SCALED_EL
from .similarity import _dot_sql
from .tpch import _REV


@register(
    "scan_filter_project_sort",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
    ORDER BY o_orderkey
    """,
)
def scan_filter_project_sort(spark, sf_dir):
    """S1 scan shape (main.go:86-97): projection to 4 cols, two constant
    equi-predicates, total sort — all pushed into the parquet scan by
    Catalyst (PushedFilters + ReadSchema in the physical plan)."""
    return (
        _t(spark, sf_dir, "orders")
        .where((F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    )


@register(
    "scan_param_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    """,
)
def scan_param_filter(spark, sf_dir):
    """S2 parameterized variant (main.go:89-91) — the -user flag as a bound
    filter, never string-interpolated SQL."""
    flag = "R"  # the 'parameter'
    return (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_returnflag") == F.lit(flag)) & (F.col("l_linestatus") == "F"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_orders(spark, sf_dir):
    """Top-k with total tie-break (extended §2.6). Spark plans this as
    TakeOrderedAndProject — no global sort materialized."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "agg_group_count",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           (CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) AS total
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def agg_group_count(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


@register(
    "agg_distinct_customers",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct_customers(spark, sf_dir):
    """Exact distinct — expands to a two-phase aggregate in Spark. (The
    approximate twin, approx_count_distinct/HLL, is deliberately not oracled:
    sketches differ across engines.)"""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_enrich_parts",
    """
    SELECT p_brand,
           COUNT(*) AS n_lines,
           (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY p_brand
    """,
)
def join_enrich_parts(spark, sf_dir):
    """J1 enrichment shape: fact ⋈ two dims — the set-at-a-time analogue
    of the reference's per-row `eos file info` lookups (main.go:120-137).
    The dims are left unhinted (they scale with SF); AQE broadcasts them
    while measured-small."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    return (
        # No broadcast hints: part/supplier scale linearly with SF
        # (part = SF*200k rows). AQE broadcasts them while measured-small
        # and switches to shuffle joins at scale (r9 verdict).
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_dims_region",
    """
    SELECT r_name, COUNT(*) AS n_customers,
           (CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_dims_region(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@register(
    "join_semi_returned_orders",
    """
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    """,
)
def join_semi_returned_orders(spark, sf_dir):
    """Left-semi join — the reference's router drop-branches are morally
    anti/semi eliminations (SURVEY §2.3 note)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return o.join(
        li, o.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus")


@register(
    "join_anti_customers_no_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers_no_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "merge_update_orders",
    """
    WITH upd AS (
      SELECT o_orderkey, o_totalprice + 100.0 AS new_total
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT o.o_orderkey,
           COALESCE(u.new_total, o.o_totalprice) AS o_totalprice,
           u.o_orderkey IS NOT NULL AS updated
    FROM orders o LEFT JOIN upd u ON o.o_orderkey = u.o_orderkey
    """,
)
def merge_update_orders(spark, sf_dir):
    """S6/J3 merge sink shape via operators.merge.merge_updates: computed
    update set joined back on the key, exactly-one cardinality asserted,
    non-matched rows pass through untouched (main.go:217-240)."""
    o = _t(spark, sf_dir, "orders")
    # +100.0 keeps the update bit-exact on both engines (x*1.1 would hit
    # double->decimal rounding-mode differences at the half-cent boundary)
    updates = o.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
    )
    merged = merge_updates(o, updates, key="o_orderkey", update_cols=["o_totalprice"])
    return merged.select("o_orderkey", "o_totalprice", "updated")


_SEG_A = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


_SEG_B = "SELECT c_custkey FROM customer WHERE c_nationkey < 10"


def _segments(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.where(F.col("c_nationkey") < 10).select("c_custkey")
    return a, b


@register("set_union", f"{_SEG_A} UNION {_SEG_B}")
def set_union(spark, sf_dir):
    a, b = _segments(spark, sf_dir)
    return a.union(b).distinct()


@register("set_intersect", f"{_SEG_A} INTERSECT {_SEG_B}")
def set_intersect(spark, sf_dir):
    a, b = _segments(spark, sf_dir)
    return a.intersect(b)


@register("set_except", f"{_SEG_A} EXCEPT {_SEG_B}")
def set_except(spark, sf_dir):
    a, b = _segments(spark, sf_dir)
    return a.subtract(b)  # EXCEPT DISTINCT semantics


@register(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
    FROM events
    """,
)
def json_extract_props(spark, sf_dir):
    """Semi-structured JSON extraction (extended F-layer): Spark side uses the
    real JSON path operator; the oracle re-derives the same value lexically."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
    )


@register(
    "quantile_binning",
    """
    WITH q AS (
      SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
             percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75
      FROM orders)
    SELECT o_orderkey,
           CAST(CASE WHEN o_totalprice <= p25 THEN 0
                     WHEN o_totalprice <= p50 THEN 1
                     WHEN o_totalprice <= p75 THEN 2
                     ELSE 3 END AS INTEGER) AS bucket
    FROM orders, q
    """,
)
def quantile_binning(spark, sf_dir):
    """Quantile discretization (feature binning): each order assigned its
    totalprice quartile. Thresholds are PERCENTILE_DISC values — actual
    data points, so the comparison is bit-exact cross-engine with no
    interpolation guard — computed in one aggregate and broadcast back via
    a 1-row cross join; the fact table is bucketed in a single scan-local
    CASE. The two-pass shape (tiny stats pass + map-side apply) is the
    standard feature-prep plan at any scale; a one-pass approximate
    variant would swap in approx_percentile."""
    o = _t(spark, sf_dir, "orders")
    pd_ = lambda q: F.expr(  # noqa: E731
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)"
    )
    thresholds = o.agg(
        pd_(0.25).alias("p25"), pd_(0.5).alias("p50"), pd_(0.75).alias("p75")
    )
    tp = F.col("o_totalprice")
    bucket = (
        F.when(tp <= F.col("p25"), 0)
        .when(tp <= F.col("p50"), 1)
        .when(tp <= F.col("p75"), 2)
        .otherwise(3)
        .cast("int")
    )
    return o.crossJoin(F.broadcast(thresholds)).select(
        "o_orderkey", bucket.alias("bucket")
    )


@register(
    "date_functions",
    """
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           COUNT(*) AS n,
           (CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) AS total
    FROM orders GROUP BY y, m
    """,
)
def date_functions(spark, sf_dir):
    """Date part extraction + grouping (extended §2.8 — the reference carries
    a timestamp but never computes on it; the engine surfaces the full
    date/time function family)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


@register(
    "percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentiles(spark, sf_dir):
    """Exact interpolated percentiles (both engines implement the same
    continuous-quantile formula; rounded 6dp to absorb last-ulp
    interpolation arithmetic differences)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
    )


@register(
    "array_agg_sorted",
    """
    SELECT o_orderstatus,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
             AS priorities,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def array_agg_sorted(spark, sf_dir):
    """Array aggregation with deterministic ordering: collect_set is
    unordered by construction, so a sort_array makes the result stable and
    comparable. Output is the joined string, not the array — the driver's
    pandas canonicalizer cannot hash list-typed columns, and the string form
    carries identical information."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond cube/rollup) via the SQL surface —
    DataFrame and SQL APIs share one Catalyst plan space."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "set_union_all",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_nationkey < 10
    """,
)
def set_union_all(spark, sf_dir):
    a, b = _segments(spark, sf_dir)
    return a.union(b)  # bag semantics (UNION ALL)


@register(
    "string_functions",
    """
    SELECT doc_id,
           upper(lang) AS lang_up,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_pad,
           substring(source, 4) AS src_num,
           replace(source, 'src', 'source-') AS src_long,
           concat_ws('|', lang, source) AS joined,
           length(trim(text)) AS trimmed_len
    FROM documents
    """,
)
def string_functions(spark, sf_dir):
    """The scalar string-function family (§2.8 extended: case, pad,
    substring, replace, concat_ws, trim)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_pad"),
        F.substring("source", 4, 2147483647).alias("src_num"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source-")).alias("src_long"),
        F.concat_ws("|", "lang", "source").alias("joined"),
        F.length(F.trim("text")).alias("trimmed_len"),
    )


@register(
    "from_json_struct",
    """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 10
             AS k_bucket
    FROM events
    """,
)
def from_json_struct(spark, sf_dir):
    """Schema-declared JSON parsing (from_json -> struct, then field
    access) — the typed counterpart of get_json_object."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "j", F.from_json("props", "k long")
    )
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        (F.col("j.k") % 10).alias("k_bucket"),
    )


@register(
    "conditional_agg",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
           COUNT(*) AS n_total,
           (CAST(SUM(CAST(CAST(CASE WHEN event_type = 'purchase' THEN value
                                    ELSE 0 END AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS DOUBLE) / 100.0) AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def conditional_agg(spark, sf_dir):
    """count_if / sum(case when) — conditional aggregation without
    pre-filter scans."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.count(F.lit(1)).alias("n_total"),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("purchase_value"),
    )


@register(
    "scalar_subquery",
    """
    SELECT c_custkey, c_name,
           (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
            WHERE o_custkey = c_custkey) AS max_order
    FROM customer
    """,
)
def scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates it into a left
    outer aggregate join (visible in the plan), the textbook subquery
    rewrite the reference never needed but a full engine must have."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c.createOrReplaceTempView("__sq_customer")
    o.createOrReplaceTempView("__sq_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT MAX(o_totalprice) FROM __sq_orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM __sq_customer
        """
    )


@register(
    "null_functions",
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'none') AS prio,
           o_totalprice IS NOT NULL AS has_price
    FROM orders
    """,
)
def null_functions(spark, sf_dir):
    """NULL-handling family: coalesce / nullif / ifnull / IS NOT NULL —
    the F9 null-semantics toolkit generalized."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.ifnull(
            F.nullif("o_orderpriority", F.col("o_orderpriority")), F.lit("none")
        ).alias("prio"),
        F.col("o_totalprice").isNotNull().alias("has_price"),
    )


@register(
    "salted_agg",
    """
    SELECT event_type, COUNT(*) AS n,
           (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS DOUBLE) / 100.0) AS total_value
    FROM events GROUP BY event_type
    """,
)
def salted_agg_query(spark, sf_dir):
    """Hot-key-safe aggregation: shuffle on (key, salt) then combine
    partials — the oracle is the PLAIN group-by, proving the salted plan is
    semantics-preserving (operators/skew.py)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "__v", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    )
    out = salted_agg(
        ev,
        key_cols=["event_type"],
        agg_exprs={"n": "count", "__sv": "sum_long:__v"},
        n_salts=16,
    )
    return out.select(
        "event_type", "n", (F.col("__sv").cast("double") / 100.0).alias("total_value")
    )


@register(
    "salted_join_skew",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items,
           (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(21,6)) * 1000000 AS BIGINT))
                 AS DOUBLE) / 1000000.0) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def salted_join_skew(spark, sf_dir):
    """Manually salted equi-join (operators/skew.py:salted_join): the probe
    side carries ONE deterministic whole-row-hash salt, the build side is
    exploded across ALL n_salts values, so a hot join key spreads over
    n_salts reducers instead of pinning one — the hand-rolled counterpart
    to AQE's skew-join split (test_skew_join.py), for the hash-aggregate
    downstream of the join and for paths where AQE is off. The oracle is
    the PLAIN join + group-by, proving the salting is semantics-preserving
    (every probe row meets each matching build row exactly once)."""
    from ..operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    su = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), "s_name"
    )
    j = salted_join(li, su, on=["k"], n_salts=8)
    return j.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("rev", scale=6, precision=21).alias("revenue"),
    )


@register(
    "unpivot_orders",
    """
    SELECT o_orderkey, metric, val FROM (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS price,
             CAST(o_totalprice AS DOUBLE) / 2 AS half
      FROM orders)
    UNPIVOT (val FOR metric IN (price, half))
    """,
)
def unpivot_orders(spark, sf_dir):
    """UNPIVOT/melt — the inverse of events_pivot: wide metric columns to
    (key, metric, value) rows via DataFrame.unpivot (Spark's native melt;
    no explode-of-structs hand-rolling). Division by 2 is IEEE-exact, so
    doubles match bit-for-bit cross-engine."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        (F.col("o_totalprice").cast("double") / 2).alias("half"),
    )
    return o.unpivot(["o_orderkey"], ["price", "half"], "metric", "val")


@register(
    "histogram_totalprice",
    """
    WITH b AS (
      SELECT CAST(floor(o_totalprice / 30000) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             (CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS DOUBLE) / 100.0) AS total
      FROM orders GROUP BY bin)
    SELECT bin, bin * 30000.0 AS lo, (bin + 1) * 30000.0 AS hi, n, total,
           round(CAST(n AS DOUBLE) / SUM(n) OVER (), 9) AS share,
           CAST(SUM(n) OVER (ORDER BY bin
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum_n
    FROM b
    """,
)
def histogram_totalprice(spark, sf_dir):
    """Equi-width histogram of order totals with per-bin share and
    cumulative counts — the distribution-profiling companion to
    `profile_orders` (and the exact-answer counterpart of the approx
    quantile sketch). One partial+final aggregation computes the ~20-row
    bin table; share and cumulative counts then derive from a broadcast
    scalar total and a broadcast triangular (bin2 <= bin) join — O(bins^2)
    pairs of a metadata-sized table. An unpartitioned running-sum window
    would be equally safe HERE, but the engine's own plan audit
    (tools/plan_audit.py) flags unpartitioned ordered windows
    unconditionally because it cannot see cardinality, and a
    deliberately-exempted query would blunt the rule that catches the real
    single-task windows. Counts are integers and sums exact-decimal, so
    bins are bit-identical cross-engine."""
    o = _t(spark, sf_dir, "orders")
    b = o.groupBy(
        F.floor(F.col("o_totalprice") / 30000).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )
    tot = b.agg(F.sum("n").alias("tot_n"))
    prior = b.select(F.col("bin").alias("bin2"), F.col("n").alias("n2"))
    return (
        b.join(F.broadcast(prior), F.col("bin2") <= F.col("bin"))
        .groupBy("bin", "n", "total")
        .agg(F.sum("n2").alias("cum_n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            (F.col("bin") * 30000.0).alias("lo"),
            ((F.col("bin") + 1) * 30000.0).alias("hi"),
            "n",
            "total",
            F.round(
                F.col("n").cast("double") / F.col("tot_n"), 9
            ).alias("share"),
            "cum_n",
        )
    )


@register(
    "hof_array_pipeline",
    f"""
    SELECT vec_id,
           CAST(length(list_filter(embedding, v -> v > 0)) AS BIGINT) AS n_pos,
           CAST(COALESCE(list_sum(list_transform(
                  list_filter(embedding, v -> v > 0),
                  v -> {_SCALED_EL.format(v='v')})), 0) AS DOUBLE)
             / 10000000.0 AS sum_pos,
           round({_dot_sql('embedding', 'list_reverse(embedding)')}, 9)
             AS rev_dot
    FROM embeddings
    """,
)
def hof_array_pipeline(spark, sf_dir):
    """Array higher-order function pipeline over the embedding column —
    ``filter``/``transform``/``aggregate``/``zip_with``/``reverse`` composed
    in one row-local projection (no shuffle, whole-stage codegen; the moral
    equivalent of the reference's per-row derivations at main.go:141-146 but
    over vectors). Outputs are scalars (driver hasher rejects list columns):
    positive-element count, exact scaled sum of the positive elements, and
    the vector's dot product with its own reversal (zip_with). All float
    math goes through the DECIMAL(12,7)->BIGINT fixed-point path so both
    engines sum exactly; empty positive set coalesces to 0 on both sides
    (Spark's aggregate returns the 0L seed, DuckDB's list_sum returns NULL)."""
    emb = _t(spark, sf_dir, "embeddings")
    pos = F.filter("embedding", lambda v: v > 0)
    sum_pos = F.aggregate(
        S.scaled_vector(pos), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    sv = S.scaled_vector(F.col("embedding"))
    rev_dot = S.dot_scaled(sv, F.reverse(sv))
    return emb.select(
        "vec_id",
        F.size(pos).cast("long").alias("n_pos"),
        (sum_pos.cast("double") / F.lit(1e7)).alias("sum_pos"),
        F.round(rev_dot, 9).alias("rev_dot"),
    )


@register(
    "range_join_price_bands",
    f"""
    WITH bands(band, lo, hi) AS (VALUES
      ('p00_under_75k',  CAST(0      AS DOUBLE), CAST(75000  AS DOUBLE)),
      ('p01_to_150k',    CAST(75000  AS DOUBLE), CAST(150000 AS DOUBLE)),
      ('p02_to_300k',    CAST(150000 AS DOUBLE), CAST(300000 AS DOUBLE)),
      ('p03_over_300k',  CAST(300000 AS DOUBLE), CAST('inf'  AS DOUBLE)))
    SELECT band, COUNT(*) AS n,
           {dsum_expr('o_totalprice')} AS revenue
    FROM orders JOIN bands
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_price_bands(spark, sf_dir):
    """Range (non-equi) join: orders matched to a small price-band dimension
    on ``lo <= price < hi`` — the interval-lookup shape Spark has no native
    operator for. With the dimension broadcast, Catalyst plans a
    BroadcastNestedLoopJoin: each executor streams its order partitions
    against the 4 in-memory bands, so cost is scan-linear and shuffle-free
    regardless of fact size — the 100 TB-safe plan for any small interval
    dimension (the same shape serves date calendars and SLA tiers). Exact
    DECIMAL revenue accumulator per the repo parity rules."""
    bands = spark.createDataFrame(
        [
            ("p00_under_75k", 0.0, 75000.0),
            ("p01_to_150k", 75000.0, 150000.0),
            ("p02_to_300k", 150000.0, 300000.0),
            ("p03_over_300k", 300000.0, float("inf")),
        ],
        "band string, lo double, hi double",
    )
    o = _t(spark, sf_dir, "orders")
    joined = o.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") < F.col("hi")),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("revenue")
    )


@register(
    "map_functions_pipeline",
    """
    SELECT event_id,
           CAST(2 AS INTEGER) AS n_keys,
           'uid=' || CAST(user_id * 2 AS VARCHAR) ||
           ',v=' || CAST(CAST(floor(value * 100) AS BIGINT) * 2 AS VARCHAR)
             AS canon
    FROM events
    """,
)
def map_functions_pipeline(spark, sf_dir):
    """Map higher-order functions — ``str_to_map`` build, ``map_filter`` (drop
    the non-numeric key), ``transform_values`` (double each value),
    ``map_entries``->sort->join for a canonical scalar rendering (the driver
    hasher rejects map columns, and a sorted k=v string is also the stable
    wire format for audit sinks, main.go:277). The oracle recomputes the
    same result from the base columns — an independent derivation, not a
    mirrored map pipeline. floor() before the cents cast on BOTH engines:
    Spark's double->long cast truncates while DuckDB's rounds. The wire
    format built here has three fixed, distinct keys (uid/type/v), so
    str_to_map can never see a duplicate and no mapKeyDedupPolicy conf is
    needed — the caller's session conf is left untouched."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("uid="),
            F.col("user_id").cast("string"),
            F.lit(" type="),
            F.col("event_type"),
            F.lit(" v="),
            F.floor(F.col("value") * 100).cast("long").cast("string"),
        ).alias("raw"),
    )
    m = F.expr("str_to_map(raw, ' ', '=')")
    numeric = F.map_filter(m, lambda k, v: k != F.lit("type"))
    doubled = F.transform_values(
        numeric, lambda k, v: (v.cast("long") * 2).cast("string")
    )
    entries = F.sort_array(F.map_entries(doubled))
    canon = F.array_join(
        F.transform(entries, lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        ",",
    )
    return ev.select(
        "event_id", F.size(doubled).alias("n_keys"), canon.alias("canon")
    )


@register(
    "bucketed_join_priority_revenue",
    f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {dsum_expr(_REV, scale=6)} AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_priority_revenue(spark, sf_dir):
    """Bucketed-write + co-located join: both fact tables are written
    ``bucketBy(8, key).sortBy(key)`` into the session warehouse, then
    joined WITHOUT any exchange — the bucketed scans already satisfy the
    sort-merge join's clustering+ordering requirement, so the only shuffle
    in the plan is the final small aggregation. This is the 100 TB lever
    for a join repeated every pipeline run (the migration's share/file
    join, main.go:150-170): pay the shuffle once at write time, never at
    read time. The ``merge`` hint pins sort-merge join so the plan shape
    is bucketing-driven, not broadcast-threshold-driven (no session conf
    touched). tests/test_bucketing.py asserts the zero-exchange plan; the
    oracle checks the join-agg result itself."""

    def _drop_managed(table: str) -> None:
        # A fresh in-memory catalog doesn't know about a previous session's
        # managed-table directory, so mode("overwrite") alone raises
        # LOCATION_ALREADY_EXISTS; drop from the catalog AND sweep the
        # leftover local warehouse path. (On a real cluster the warehouse
        # is durable storage and the DROP TABLE path is the operative one.)
        import os
        import shutil

        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir")
        local = wh[len("file:") :] if wh.startswith("file:") else wh
        if local.startswith("//"):
            local = local[local.find("/", 2) :]
        shutil.rmtree(os.path.join(local, table), ignore_errors=True)

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    _drop_managed("cbx_bucketed_orders")
    _drop_managed("cbx_bucketed_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("cbx_bucketed_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("cbx_bucketed_lineitem")
    bo = spark.table("cbx_bucketed_orders")
    bl = spark.table("cbx_bucketed_lineitem")
    joined = bo.hint("merge").join(
        bl, F.col("o_orderkey") == F.col("l_orderkey")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.expr(_REV), scale=6).alias("revenue"),
    )


@register(
    "rollup_incremental_merge",
    """
    WITH direct AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS DOUBLE) / 100.0) AS total_value,
             (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS DOUBLE) / 100.0) / COUNT(value) AS avg_value,
             MIN(value) AS min_value, MAX(value) AS max_value
      FROM events GROUP BY event_type),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE))
    SELECT d.event_type, d.n_events, d.total_value, d.avg_value,
           d.min_value, d.max_value,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(dl.n) AS BIGINT) AS peak_day_events
    FROM direct d JOIN daily dl ON dl.event_type = d.event_type
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
)
def rollup_incremental_merge(spark, sf_dir):
    """Incremental re-aggregation: per-(type, day) PARTIAL aggregates
    (count, integer-scaled sum, min, max) merged into per-type totals purely
    by combining partials — sum-of-sums, min-of-mins, count-of-partials —
    with avg derived at the end from the merged exact sum. This is the
    mergeable-rollup pattern a 100 TB pipeline uses to maintain daily
    partitions and serve monthly totals without rescanning raw data; the
    oracle computes the totals DIRECTLY from raw rows, so the differential
    proves the partial-merge algebra is lossless (the decimal-scaled-long
    accumulator makes the sum exact and associative, which is what makes it
    re-aggregatable at all — see functions/numeric.py). The daily level also
    yields n_days / peak_day_events for free."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        ).alias("sum_scaled"),
        F.count("value").alias("n_vals"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sum_scaled").alias("sum_scaled"),
            F.sum("n_vals").alias("n_vals"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
            F.count(F.lit(1)).alias("n_days"),
            F.max("n").alias("peak_day_events"),
        )
        .select(
            "event_type",
            "n_events",
            (F.col("sum_scaled").cast("double") / 100.0).alias("total_value"),
            (
                F.col("sum_scaled").cast("double") / 100.0 / F.col("n_vals")
            ).alias("avg_value"),
            "min_value",
            "max_value",
            "n_days",
            "peak_day_events",
        )
    )


@register(
    "percentile_disc_groups",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
           percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
           percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentile_disc_groups(spark, sf_dir):
    """Ordered-set aggregates: discrete percentiles per group via the
    SQL-standard PERCENTILE_DISC ... WITHIN GROUP syntax. Unlike the
    interpolating `percentiles` query (percentile_cont), _disc returns an
    actual data value — no interpolation arithmetic, so doubles are
    bit-identical cross-engine with no rounding guard. One shuffle on the
    group key; per-group sort happens inside the aggregate."""
    o = _t(spark, sf_dir, "orders")
    pd_ = lambda q: F.expr(  # noqa: E731
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)"
    )
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        pd_(0.25).alias("p25"),
        pd_(0.5).alias("p50"),
        pd_(0.75).alias("p75"),
        pd_(0.95).alias("p95"),
    )


@register(
    "agg_weighted_median",
    """
    WITH w AS (
      SELECT o_orderpriority AS grp,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents,
             CAST(o_orderkey % 7 + 1 AS BIGINT) AS wt
      FROM orders
    ),
    c AS (
      SELECT grp, price_cents, wt,
             SUM(wt) OVER (PARTITION BY grp ORDER BY price_cents
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_wt,
             SUM(wt) OVER (PARTITION BY grp) AS tot_wt
      FROM w
    )
    SELECT grp,
           (CAST(MIN(price_cents) AS DOUBLE) / 100.0) AS weighted_median,
           CAST(MAX(tot_wt) AS BIGINT) AS total_weight
    FROM c
    WHERE cum_wt * 2 >= tot_wt
    GROUP BY grp
    ORDER BY grp
    """,
)
def agg_weighted_median(spark, sf_dir):
    """EXACT weighted median per group (weights derived deterministically
    from the key): sort by value within the group, take the first value
    whose cumulative weight reaches half the total — one ordered
    cumulative-sum window + a MIN over the qualifying suffix, all integer
    arithmetic (cent-scaled values, integer weights), so the order
    statistic is bit-identical cross-engine. The estimator behind
    sample-weighted quality cutoffs and importance-weighted label
    aggregation; no UDAF, no collect, one shuffle on the group key. Ties
    in the value column are harmless: cumulative weights at equal values
    differ only in row order WITHIN the tie, and the selected MIN value
    is the same whichever tied row crosses the threshold."""
    w = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        (F.col("o_orderkey") % 7 + 1).cast("long").alias("wt"),
    )
    win = (
        W.partitionBy("grp")
        .orderBy("price_cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = w.select(
        "grp",
        "price_cents",
        F.sum("wt").over(win).alias("cum_wt"),
        F.sum("wt").over(W.partitionBy("grp")).alias("tot_wt"),
    )
    return (
        c.where(F.col("cum_wt") * 2 >= F.col("tot_wt"))
        .groupBy("grp")
        .agg(
            (F.min("price_cents").cast("double") / 100.0).alias(
                "weighted_median"
            ),
            F.max("tot_wt").alias("total_weight"),
        )
        .orderBy("grp")
    )

