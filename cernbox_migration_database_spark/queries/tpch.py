"""The TPC-H query family — the classic analytic join/agg shapes, each hash-differentialed against its DuckDB twin.

Split out of the monolithic queries.py (round 8); registration behavior
is identical — every ``@register`` feeds the shared registry in
``._registry`` and the public names re-export through the package root.
"""

from __future__ import annotations

from ..functions.numeric import davg, dsum, dsum_decimal, dsum_expr
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from ._registry import _t, register


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) AS sum_qty,
           (CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) AS sum_base_price,
           (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0) AS sum_disc_price,
           (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0) AS sum_charge,
           (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(l_quantity) AS avg_qty,
           (CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(l_extendedprice) AS avg_price,
           (CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the headline partial-aggregation benchmark. Map-side
    combine + 2-col group keys; decimal accumulators for run-to-run and
    cross-engine bit-equality."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc, scale=6).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .where(
            (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape — the join-reordering benchmark. Expressed
    declaratively; Catalyst+AQE pick broadcast for the dims and reorder."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        # supplier scales linearly with SF — no hard hint (AQE decides);
        # nation/region are fixed 25/5 rows, so their hints stay.
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT (CAST(SUM(CAST(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))
                          * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + multi-predicate filter + global agg —
    the pushdown/codegen stress test (zero shuffles beyond the final
    single-row combine)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey,
             (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS DOUBLE) / 100.0) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING (CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS DOUBLE) / 100.0) > 300)
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate-then-join with a HAVING filter — the
    aggregation output drives the join (semi-reduction before the fact
    join, the plan a naive join-first formulation would miss)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS (left-semi) feeding an aggregation."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q12_shipmode_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: join + CASE-based conditional counts (the fixture
    has no shipmode column; linestatus plays its role)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    """
    SELECT
      100.0 * (CAST(SUM(CAST(CAST(CASE WHEN p_type LIKE 'PROMO%'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END AS DECIMAL(18,6)) * 1000000
                             AS BIGINT)) AS DOUBLE) / 1000000.0)
            / (CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(18,6)) * 1000000
                             AS BIGINT)) AS DOUBLE) / 1000000.0) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: ratio of conditional revenue to total revenue over a
    broadcast-joined dimension; both sums exact fixed-point, one double
    division at the end."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    j = li.join(p, li.l_partkey == p.p_partkey)  # part ~ SF: no hint
    return j.agg(
        (F.lit(100.0) * dsum(promo, scale=6) / dsum(rev, scale=6)).alias("promo_pct")
    )


_REV_SUM = (
    "(CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"
    " * 1000000 AS BIGINT)) AS DOUBLE) / 1000000.0)"
)


@register(
    "q2_min_cost_supplier",
    """
    SELECT p_partkey, s_suppkey, s_name, l_extendedprice AS min_price
    FROM part JOIN lineitem ON l_partkey = p_partkey
              JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 10
      AND l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                             WHERE l2.l_partkey = p_partkey)
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted: lineitem is the part-supplier offer table —
    the fixture has no partsupp): for each small part, the supplier(s)
    offering its minimum price, selected by a CORRELATED scalar aggregate
    subquery. Catalyst decorrelates the inner MIN into an aggregate +
    join — the rewrite that makes this one pass over lineitem instead of a
    per-row rescan. Float equality against MIN is exact: both sides are
    stored values, no arithmetic."""
    for t in ("part", "lineitem", "supplier"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"__q2_{t}")
    return spark.sql(
        """
        SELECT p_partkey, s_suppkey, s_name, l_extendedprice AS min_price
        FROM __q2_part JOIN __q2_lineitem ON l_partkey = p_partkey
             JOIN __q2_supplier ON s_suppkey = l_suppkey
        WHERE p_size <= 10
          AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                                 FROM __q2_lineitem l2
                                 WHERE l2.l_partkey = p_partkey)
        """
    )


@register(
    "q11_important_parts",
    f"""
    SELECT l_partkey, {_REV_SUM} AS value
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING {_REV_SUM} >
      (SELECT {_REV_SUM} * 0.002
       FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                     JOIN nation ON n_nationkey = s_nationkey
       WHERE n_name = 'NATION_3')
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: per-part value within one nation, kept only above a
    fraction of the nation's total — an UNCORRELATED scalar subquery in
    HAVING, evaluated once and broadcast into the filter. Both the group
    sums and the threshold run through the exact fixed-point accumulator,
    so the strict > comparison is engine-stable."""
    for t in ("lineitem", "supplier", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"__q11_{t}")
    return spark.sql(
        f"""
        SELECT l_partkey, {_REV_SUM} AS value
        FROM __q11_lineitem JOIN __q11_supplier ON s_suppkey = l_suppkey
             JOIN __q11_nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
        HAVING {_REV_SUM} >
          (SELECT {_REV_SUM} * 0.002
           FROM __q11_lineitem JOIN __q11_supplier ON s_suppkey = l_suppkey
                JOIN __q11_nation ON n_nationkey = s_nationkey
           WHERE n_name = 'NATION_3')
        """
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_REV_SUM} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: a revenue VIEW over a ship-date quarter, the top
    supplier(s) selected by a scalar MAX subquery over that view. The view
    is referenced twice (join + subquery); exact fixed-point sums make the
    double equality at the MAX boundary deterministic, and ties at the max
    surface identically on both engines."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("__q15_supplier")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
            "total_revenue"
        )
    )
    rev.createOrReplaceTempView("__q15_revenue")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, total_revenue
        FROM __q15_supplier JOIN __q15_revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM __q15_revenue)
        """
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join with an extra predicate ON THE JOIN
    (not a post-filter — customers with only urgent orders must still appear
    with count 0), then a distribution-of-counts re-aggregation. Adapted to
    o_orderpriority (the fixture has no o_comment)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_QTY_AVG = (
    "(CAST(SUM(CAST(CAST(l2.l_quantity AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
    " AS DOUBLE) / 1000000.0 / COUNT(*))"
)


_PRICE_SUM = (
    "(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
    " AS DOUBLE) / 1000000.0)"
)


@register(
    "q17_small_quantity_revenue",
    f"""
    SELECT {_PRICE_SUM} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * {_QTY_AVG}
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: a CORRELATED scalar AVG subquery gating the fact
    filter (orders below 20% of the part's average quantity). Catalyst
    decorrelates the per-part average into an aggregate join. The average
    runs through the exact fixed-point accumulator on both engines, so the
    strict < threshold comparison cannot drift."""
    for t in ("lineitem", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"__q17_{t}")
    return spark.sql(
        f"""
        SELECT {_PRICE_SUM} / 7.0 AS avg_yearly
        FROM __q17_lineitem JOIN __q17_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (SELECT 0.2 * {_QTY_AVG}
                            FROM __q17_lineitem l2
                            WHERE l2.l_partkey = p_partkey)
        """
    )


_BAL_SUM = (
    "(CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
    " AS DOUBLE) / 1000000.0)"
)


@register(
    "q22_inactive_customers",
    f"""
    SELECT c_mktsegment, COUNT(*) AS numcust, {_BAL_SUM} AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT {_BAL_SUM} / COUNT(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q22_inactive_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with NO orders —
    an uncorrelated scalar AVG subquery plus NOT EXISTS, which Catalyst
    plans as a left-anti join (the same anti-join shape the migration's
    dead-letter split uses). Adapted: segment = c_mktsegment (no phone
    column) and 'inactive' = no URGENT order (every fixture customer has
    some order, so the literal Q22 predicate would be vacuously empty)."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"__q22_{t}")
    return spark.sql(
        f"""
        SELECT c_mktsegment, COUNT(*) AS numcust, {_BAL_SUM} AS totacctbal
        FROM __q22_customer c
        WHERE c_acctbal > (SELECT {_BAL_SUM} / COUNT(*)
                           FROM __q22_customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM __q22_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """
    )


_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {dsum_expr(_REV, scale=6)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: revenue between a nation PAIR in both directions,
    grouped by (supplier nation, customer nation, ship year). The symmetric
    OR predicate over two aliased copies of the nation dim is the structural
    point — Catalyst broadcasts both copies and the supplier dim, so the
    only shuffle is the final 3-key aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)  # supplier ~ SF: no hint
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, {dsum_expr(_REV, scale=6)} AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned items
    in a two-quarter window. Join-agg-topk: nation broadcasts, the date
    filter pushes to the orders scan, and the top-k is a TakeOrderedAndProject
    (no full sort). Total tie-break on c_custkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-07-01 00:00:00").cast("timestamp")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.where(F.col("l_returnflag") == "R"), F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .where((o.o_orderdate >= lo) & (o.o_orderdate < hi))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_join",
    f"""
    SELECT COUNT(*) AS n, {dsum_expr(_REV, scale=6)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_type = 'ECONOMY' AND p_size <= 10 AND l_quantity >= 20)
    """,
)
def q19_disjunctive_join(spark, sf_dir):
    """TPC-H Q19 shape: an OR-of-ANDs predicate that references BOTH join
    sides, so it cannot be pushed below the join — the planner keeps the
    equi-key broadcast hash join and evaluates the disjunction as a
    post-join filter, rather than degrading to a nested-loop theta join.
    Single-row aggregate output."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q, sz = F.col("l_quantity"), F.col("p_size")
    disj = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 30))
        | ((F.col("p_brand") == "Brand#2") & sz.between(5, 25) & q.between(10, 40))
        | ((F.col("p_type") == "ECONOMY") & (sz <= 10) & (q >= 20))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # part ~ SF: no hint
        .where(disj)
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            ),
        )
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers solely responsible for a returned line on
    a finished multi-supplier order — EXISTS (another supplier participated)
    plus NOT EXISTS (no other supplier also returned). Adapted to the
    fixture schema: 'kept waiting' = l_returnflag 'R' (no receipt/commit
    dates). Catalyst decorrelates the pair into a left-semi and a left-anti
    join on l_orderkey — the same anti-join machinery as the migration
    dead-letter split, exercised through correlated-subquery SQL."""
    for t in ("supplier", "lineitem", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"__q21_{t}")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM __q21_supplier
          JOIN __q21_lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN __q21_orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM __q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM __q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           round({dsum_expr("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END", scale=6)}
                 / {dsum_expr('volume', scale=6)}, 9) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_REV} AS volume, n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY')
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier-nation's share of ECONOMY-part revenue
    into EUROPE customers, per order year — a ratio of two conditional
    aggregates over a 7-table join. Every dimension broadcasts; the
    conditional numerator folds into the same aggregate pass as the
    denominator (one shuffle on o_year). Round 9dp: the ratio is the one
    double division after exact fixed-point sums."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        # part/supplier ~ SF: no hints (AQE decides); nation/region fixed
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(r), F.col("rk1") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    num = F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0.0))
    return base.groupBy("o_year").agg(
        F.round(dsum(num, scale=6) / dsum(F.col("volume"), scale=6), 9).alias(
            "mkt_share"
        )
    )


@register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, {dsum_expr('profit', scale=6)} AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
               AS profit
      FROM part JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit per (supplier nation, order year) for parts
    whose name matches a pattern. Adapted: no partsupp fixture, so unit cost
    is p_retailprice (profit = revenue - retail cost of quantity); the LIKE
    filter prunes the broadcast part dim before the join. Doubles multiply
    identically on both engines; the difference quantizes through one
    DECIMAL(18,6) fixed-point accumulator."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        # part/supplier ~ SF: no hints; nation fixed 25 rows keeps its
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("profit"), scale=6).alias("sum_profit"))
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 11, 15, 23, 31, 37, 41)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    excluding blacklisted suppliers via NOT IN — the null-aware anti-join
    Catalyst plans specially (adapted: the supplier-part relation comes
    from lineitem, there is no partsupp fixture; 'complaints' =
    negative account balance). COUNT(DISTINCT) expands to a two-phase
    partial-distinct aggregate."""
    for t in ("lineitem", "part", "supplier"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"__q16_{t}")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM __q16_lineitem JOIN __q16_part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 11, 15, 23, 31, 37, 41)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM __q16_supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


@register(
    "q20_dominant_supplier",
    """
    WITH per AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS DOUBLE) / 100.0 AS q
      FROM lineitem GROUP BY l_suppkey, l_partkey),
    tot AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS DOUBLE) / 100.0 AS tq
      FROM lineitem GROUP BY l_partkey)
    SELECT DISTINCT s_name
    FROM supplier JOIN per ON s_suppkey = l_suppkey
                  JOIN tot USING (l_partkey)
    WHERE q > 0.2 * tq
    ORDER BY s_name
    """,
)
def q20_dominant_supplier(spark, sf_dir):
    """TPC-H Q20 shape: suppliers holding a dominant share (>20%) of any
    part's total shipped quantity. Adapted from the partsupp formulation:
    lineitem is scanned ONCE: the per-(supplier, part) aggregate carries an
    exact scaled-long quantity sum, and the per-part total is a window SUM
    over those longs (partition by part) — no second scan, no self-join.
    Long sums are exact, so the 0.2 threshold compares identical doubles on
    both engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    qs_long = F.sum(
        (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    )
    per = li.groupBy("l_suppkey", "l_partkey").agg(qs_long.alias("qs"))
    tot_win = F.sum("qs").over(W.partitionBy("l_partkey"))
    return (
        per.withColumn("q", F.col("qs").cast("double") / 100.0)
        .withColumn("tq", tot_win.cast("double") / 100.0)
        .where(F.col("q") > 0.2 * F.col("tq"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # s ~ SF
        .select("s_name")
        .distinct()
        .orderBy("s_name")
    )

