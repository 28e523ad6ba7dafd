"""Remaining TPC-H query shapes (Q4, Q6, Q8-Q13, Q15-Q17, Q19, Q20),
adapted to the synthetic star schema (TESTDATA.md).

Together with queries_relational.py (Q1/Q2/Q3/Q5/Q7/Q14/Q18/Q21/Q22)
this completes all 22 TPC-H query *shapes*. The testdata schema lacks
``partsupp``, ``l_commitdate``/``l_receiptdate``, ``l_shipmode``,
``p_container`` and comment columns, so those queries keep their plan
shape (the optimizer pattern being exercised) while substituting
available columns; each docstring notes the substitution.

Determinism rules (SCALE.md): money aggregates in DECIMAL with ONE
double cast at the output boundary; correlated-average thresholds
rewritten to integer cross-multiplication (no double avg on the
comparison path); every top-k carries a unique-key tiebreaker.

Reference parity: the reference repo has no query engine of its own
(dags/transform/airport.py:5-7 is its only Spark job); these forms
cover the analytic surface its star-schema spec implies
(Capstone Project Template.ipynb, SURVEY.md §2 B10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query
from .session import prep
from .plans.strategies import gated_broadcast
from .sources.testdata import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep(spark)
    return load_table(spark, sf_dir, name)


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def _rev() -> F.Column:
    """Exact decimal revenue: price * (1 - discount)."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


# --------------------------------------------------------------------------
# Q4 — priority counting via EXISTS (semi join with residual predicate)
# --------------------------------------------------------------------------

@query(
    "q4_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-decorrelation with a non-equi residual
    (here "any line shipped >60 days after order", standing in for the
    absent l_commitdate < l_receiptdate).

    Round-10 rewrite (round-9 verdict task 4): the residual references
    o_orderdate, so Catalyst cannot push any lineitem-side filter — but
    a DERIVED bound is free: every satisfying lineitem has
    ``l_shipdate > min(o_orderdate) + 60 = 1996-03-01`` (the orders
    window is a literal), so supplying that filter by hand
    zone-map-prunes the early shipyears at the parquet scan BEFORE the
    semi-join shuffle. 256× race of record (tools/r10_races.py):
    plain semi 11.53 s → semi+pushdown 5.47 s (2.1×). The
    anti_semi-style collapse (EXISTS ⟺ per-order MAX(l_shipdate) >
    odate+60, partial-agg map-side) was also raced and LOST to this
    form (6.76 s): lineitem has only ~1.6 surviving lines per order, so
    the max-collapse saves little exchange volume and pays a hash
    aggregate the semi join doesn't — the distinct-key law needs a
    many:1 key ratio to win. All three forms verified row-identical at
    the replica.
    """
    from .sources.pqmeta import fact_width

    return q4_plan(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        width=fact_width(spark, sf_dir, "lineitem"),
    )


def q4_plan(orders: DataFrame, lineitem: DataFrame,
            width: int | None = None) -> DataFrame:
    """The shipped q4 plan over supplied inputs — factored out so the
    scale tools (the round-11 view-doubled 4096× point) race the EXACT
    entry plan on synthetic unions instead of re-implementing it.

    ``width`` pins the semi join's exchange width plan-side (round-11
    width law). Only the LINEITEM side repartitions: Catalyst's
    PushdownLeftSemiAntiJoin would re-park an orders-side repartition
    above the join, and EnsureRequirements aligns the orders exchange
    to the lineitem side's explicit width anyway (measured — one
    REPARTITION_BY_NUM side propagates its width to the partner's
    ENSURE exchange)."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = (
        lineitem
        .select("l_orderkey", "l_shipdate")
        # derived bound: min possible o_orderdate in the window + 60 days
        .filter(
            F.col("l_shipdate")
            > F.lit("1996-01-01").cast("timestamp") + F.expr("INTERVAL 60 DAYS")
        )
    )
    if width is not None:
        l = l.repartition(width, "l_orderkey")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q6 — single-table filter + agg (pushdown showcase)
# --------------------------------------------------------------------------

@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — every predicate reaches the
    parquet scan (PushedFilters), only 3 columns are read, and the
    single global sum is map-side partial. The cheapest possible plan at
    100 TB: no shuffle of data rows at all, just partial-agg merge.
    """
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue")
    )


# --------------------------------------------------------------------------
# Q8 — national market share (two nation roles, derived ratio)
# --------------------------------------------------------------------------

@query(
    "q8_market_share",
    oracle=f"""
    SELECT YEAR(o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_7' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    GROUP BY 1 ORDER BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one fact scan, five broadcast dim joins with
    nation playing two roles (supplier nation for the share numerator,
    customer nation→region for the market filter). The ratio divides
    two exact decimal sums as doubles ONCE at the boundary — IEEE
    division of identical operands is engine-independent.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    rev = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    nat_rev = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(zero)
    return (
        l.join(gated_broadcast(sf_dir, p, "part", key="p_partkey"), l.l_partkey == p.p_partkey)
        .join(gated_broadcast(sf_dir, s, "supplier", key="s_suppkey"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(sf_dir, c, "customer", key="c_custkey"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nat_rev).cast("double") / F.sum(rev).cast("double")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit (substituted supply cost)
# --------------------------------------------------------------------------

@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
           CAST(SUM({_REV_SQL}
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(0.01 AS DECIMAL(4,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over
    name-matched parts. ``partsupp.ps_supplycost`` doesn't exist in the
    testdata, so unit cost is substituted with 1% of p_retailprice —
    same plan: fact⋈3 dims⋈orders, LIKE filter on the part name, 2-key
    hash agg. All money math stays in decimal until the boundary.

    Round-10: the fact-fact exchange width scales with the fact
    (~4M rows/reducer from parquet footers, sources/pqmeta.py) —
    applied AFTER the broadcast-dim prune so only surviving lineitems
    cross the exchange, and shared by both sides so the join adds no
    extra exchange. At the 2048× octave the fixed session width (32)
    put ~10M rows in each SMJ sorter and died UNABLE_TO_ACQUIRE_MEMORY
    (BASELINE.md Round 10); the plan-encoded width survives any octave
    without per-run session tuning.
    """
    from .sources.pqmeta import scaled_width

    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    width = scaled_width(f"{sf_dir}/orders.parquet",
                         spark.sparkContext.defaultParallelism)
    cost = (
        _dec("p_retailprice")
        * F.lit("0.01").cast("decimal(4,2)")
        * _dec("l_quantity")
    )
    pruned = (
        l.join(gated_broadcast(sf_dir, p, "part", key="p_partkey"), l.l_partkey == p.p_partkey)
        .join(gated_broadcast(sf_dir, s, "supplier", key="s_suppkey"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .repartition(width, "l_orderkey")
    )
    return (
        pruned.join(o.repartition(width, "o_orderkey"),
                    F.col("l_orderkey") == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev() - cost).cast("double").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# --------------------------------------------------------------------------

@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY SUM({_REV_SQL}) DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer, top 20. The
    top-k sorts on the EXACT decimal sum (ties on the double projection
    would make the cutoff engine-dependent) with c_custkey as the
    unique tiebreaker, then projects to double.
    """
    from .plans.strategies import footer_fits_broadcast
    from .sources.pqmeta import fact_width

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    # Round-11 width law, gated form: customer⋈orders is fact-fact at
    # scale but customer broadcasts comfortably at probe SFs — so the
    # gate hints the broadcast under budget, and PAST the gate both
    # sides take the footer width (a bare un-hinted join there would
    # ride session width — the q9 OOM class). The lineitem join takes a
    # one-sided width either way (EnsureRequirements aligns the
    # partner; measured, see q4_plan).
    width = fact_width(spark, sf_dir, "lineitem")
    if footer_fits_broadcast(sf_dir, "customer"):
        c_side, o_side = F.broadcast(c), o
    else:
        w_co = fact_width(spark, sf_dir, "orders")
        c_side = c.repartition(w_co, "c_custkey")
        o_side = o.repartition(w_co, "o_custkey")
    return (
        c_side.join(o_side, c.c_custkey == o.o_custkey)
        .join(l.repartition(width, "l_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey", "c_name",
            F.col("_rev_dec").cast("double").alias("revenue"),
            "c_acctbal", "n_name",
        )
    )


# --------------------------------------------------------------------------
# Q11 — important stock (group-HAVING vs global scalar subquery)
# --------------------------------------------------------------------------

@query(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, CAST(SUM({_REV_SQL}) AS DECIMAL(18,4)) AS value_dec
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = 2
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM pv
    WHERE 2 * value_dec * (SELECT COUNT(*) FROM pv)
          > 3 * (SELECT CAST(SUM(value_dec) AS DECIMAL(18,4)) FROM pv)
    ORDER BY l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part traded value within one region, kept
    when above 1.5x the average part value — a scalar subquery over the
    same aggregate (no partsupp table; lineitem revenue stands in for
    ps_supplycost*ps_availqty). The threshold is scale-FREE (a fixed
    fraction of the global total, as in stock TPC-H, selects 0 rows
    once part count grows 10x) and the compare is cross-multiplied so
    it stays in exact decimals: v > 1.5*total/cnt <=> 2*v*cnt > 3*total.
    Spark evaluates the scalar via a single-row broadcast (crossJoin)
    so the big side streams once.
    """
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    pv = (
        l.join(gated_broadcast(sf_dir, s, "supplier", key="s_suppkey"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).cast("decimal(18,4)").alias("value_dec"))
    )
    pv = pv.localCheckpoint(eager=False)  # reuse one computation for both branches
    totals = pv.agg(
        F.sum("value_dec").cast("decimal(18,4)").alias("__total"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    return (
        pv.crossJoin(F.broadcast(totals))
        .filter(
            F.lit(2) * F.col("value_dec") * F.col("__cnt")
            > F.lit(3) * F.col("__total")
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
        # no final orderBy: display-only on fact-grain output (SCALE.md final-sort policy)
    )


# --------------------------------------------------------------------------
# Q12 — shipping-delay classes (conditional counting)
# --------------------------------------------------------------------------

@query(
    "q12_ship_delay_classes",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 'late'
                ELSE 'ontime' END AS delay_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_ship_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lines bucketed by shipping delay (no l_shipmode
    in testdata — the derived late/ontime class exercises the same
    group-by-computed-key plan), priorities counted conditionally in
    one pass. One fact-fact join, one shuffle.
    """
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .withColumn(
            "delay_class",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("late"),
            ).otherwise(F.lit("ontime")),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregate)
# --------------------------------------------------------------------------

@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: orders-per-customer histogram via LEFT OUTER join with
    an extra join-side predicate (priority filter substitutes the
    absent o_comment NOT LIKE), then a second aggregation over the
    first's result — two shuffles, the second tiny (distinct counts).
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q15 — top supplier (aggregate reused against its own max)
# --------------------------------------------------------------------------

@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: quarterly revenue per supplier, keep the max. The
    aggregate is computed once (localCheckpoint) and compared against
    its own max via a 1-row broadcast; equality is tested on EXACT
    decimals, so "the" max is the same set in every engine.
    """
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_dec"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_dec").alias("__mx"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_dec") == F.col("__mx"))
        .select("s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — supplier counts per part class (NOT IN + count distinct)
# --------------------------------------------------------------------------

@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with an exclusion list via NOT IN → LEFT ANTI join (lineitem stands
    in for partsupp; the low-balance supplier filter substitutes the
    complaint-comment exclusion). Anti join is on the small side —
    broadcast — so the fact never shuffles for it.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select("s_suppkey")
    return (
        l.join(gated_broadcast(sf_dir, p, "part", key="p_partkey"), l.l_partkey == p.p_partkey)
        .join(gated_broadcast(sf_dir, bad, "supplier", key="s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity revenue (correlated average, integer-exact)
# --------------------------------------------------------------------------

@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sq,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pa USING (l_partkey)
    WHERE p_brand = 'Brand#13'
      AND 5 * CAST(l_quantity AS BIGINT) * cnt < sq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: lines below 20% of their part's average quantity. The
    correlated AVG is decorrelated into a per-part (sum, count)
    aggregate, and the threshold test is cross-multiplied to INTEGER
    arithmetic (qty < 0.2*avg ⟺ 5*qty*cnt < sum) — quantities are
    integral, so the comparison is exact and engine-independent (a
    double avg would make the boundary depend on summation order).
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    pa = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        l.join(gated_broadcast(sf_dir, p, "part", key="p_partkey"), l.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .filter(5 * F.col("l_quantity").cast("bigint") * F.col("cnt") < F.col("sq"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive predicate revenue (OR-of-ANDs pushdown)
# --------------------------------------------------------------------------

@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides (brand/size from
    part, quantity from lineitem). Catalyst extracts the common
    per-side disjuncts below the join (p_brand IN (...) reaches the
    part scan; the quantity envelope reaches lineitem), so the join
    probes a pre-filtered build side — the pattern that matters when
    the fact is 100 TB and the disjunction is 0.1% selective.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#11") & sz.between(1, 15) & q.between(1, 20))
        | ((br == "Brand#22") & sz.between(10, 30) & q.between(10, 30))
        | ((br == "Brand#13") & sz.between(20, 50) & q.between(20, 40))
    )
    return (
        l.join(gated_broadcast(sf_dir, p, "part", key="p_partkey"), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q20 — part-promotion suppliers (IN over a HAVING aggregate)
# --------------------------------------------------------------------------

@query(
    "q20_promo_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 100
    )
    ORDER BY s_suppkey
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved >100 units of PROMO parts in
    a year — IN over a grouped-HAVING subquery → aggregate then LEFT
    SEMI join (partsupp availability stands in as shipped quantity).
    The HAVING sum is integer-exact on integral quantities.
    """
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # Round-11 width law: the join's two supplier-cardinality sides
    # carry the footer-scaled width (supplier is SF-proportional; a
    # session-width build is the q9 OOM class at enough octaves). The
    # qualifying aggregate keeps its map-side combine — its exchange
    # carries partially-combined suppkey rows, a ~|lineitem|/|supplier|
    # (~30×) reduction the raw-row width form would forfeit — so only
    # the post-agg supplier-scale rows pay the extra widthed exchange.
    # The semi join became an INNER join (identical rows: qualifying's
    # groupBy output is unique per l_suppkey) because Catalyst's
    # PushdownLeftSemiAntiJoin pushes a LEFT SEMI below the supplier
    # repartition, re-parking that side on session width; an inner join
    # stays put, so the width reaches both exchanges.
    from .sources.pqmeta import fact_width

    width = fact_width(spark, sf_dir, "supplier")
    qualifying = (
        l.join(gated_broadcast(sf_dir, p, "part", key="p_partkey"), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("__tot"))
        .filter(F.col("__tot") > 100)
        .select("l_suppkey")
        .repartition(width, "l_suppkey")
    )
    s2 = s.repartition(width, "s_suppkey")
    return (
        s2.join(qualifying, s2.s_suppkey == qualifying.l_suppkey)
        .select("s_suppkey", "s_name")
        # no final orderBy: display-only on fact-grain output (SCALE.md final-sort policy)
    )
