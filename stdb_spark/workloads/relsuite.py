"""Relational workloads over the TPC-H-ish tables — the queries that
exercise Spark's join/aggregation machinery at scale (broadcast dims,
partial aggregation, AQE).

Decimal arithmetic is shared verbatim between the Spark side
(selectExpr) and the DuckDB oracle so sums are exact and engine-order
independent.  The final decimal->double conversion differs per engine:
Spark's CAST is correctly rounded (BigDecimal), while DuckDB's direct
CAST divides the scaled integer in float — so the oracle goes through
VARCHAR (decimal -> exact string -> strtod, correctly rounded) to match
bit-for-bit once sums exceed 2^53 in scaled-integer form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stdb_spark import model

# exact decimal fragments (valid in both Spark SQL and DuckDB)
QTY = "CAST(l_quantity AS DECIMAL(18,2))"
PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
DISC = "CAST(l_discount AS DECIMAL(9,4))"
TAX = "CAST(l_tax AS DECIMAL(9,4))"
DISC_PRICE = f"CAST({PRICE} * (1 - {DISC}) AS DECIMAL(18,6))"
CHARGE = f"{DISC_PRICE} * (1 + {TAX})"


def sum_spark(e: str) -> str:
    return f"CAST(sum({e}) AS DOUBLE)"


def sum_duck(e: str) -> str:
    return f"CAST(CAST(sum({e}) AS VARCHAR) AS DOUBLE)"


QUERIES = {}
ORACLES = {}


def _q(name, fn, sql=None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


def _q1_aggs(sumd) -> list[tuple[str, str]]:
    return [
        (sumd(QTY), "sum_qty"),
        (sumd(PRICE), "sum_base_price"),
        (sumd(DISC_PRICE), "sum_disc_price"),
        (sumd(CHARGE), "sum_charge"),
        (f"{sumd(QTY)} / count(*)", "avg_qty"),
        (f"{sumd(PRICE)} / count(*)", "avg_price"),
        (f"{sumd(DISC)} / count(*)", "avg_disc"),
        ("count(*)", "count_order"),
    ]


# ------------------------------------------------------------------ Q1-like
def _tpch_q1(spark, sf):
    li = model.load_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*[F.expr(e).alias(a) for e, a in _q1_aggs(sum_spark)])
    )


_q(
    "rel_q1_pricing_summary",
    _tpch_q1,
    f"""
SELECT l_returnflag, l_linestatus,
  {", ".join(f"{e} AS {a}" for e, a in _q1_aggs(sum_duck))}
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)


# ------------------------------------------------------------------ Q3-like
def _tpch_q3(spark, sf):
    cust = model.load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = model.load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    li = model.load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.expr(sum_spark(DISC_PRICE)).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_q(
    "rel_q3_shipping_priority",
    _tpch_q3,
    f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {sum_duck(DISC_PRICE)} AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
)


# ------------------------------------------------------------------ Q5-like
def _tpch_q5(spark, sf):
    t = model.load_tables(
        spark, sf,
        ("region", "nation", "customer", "supplier", "orders", "lineitem"),
    )
    region = t["region"].filter(F.col("r_name") == "ASIA")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    # dims broadcast; the customer-nation==supplier-nation constraint is
    # TPC-H Q5's co-location condition
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.expr(sum_spark(DISC_PRICE)).alias("revenue"))
    )


_q(
    "rel_q5_local_supplier_volume",
    _tpch_q5,
    f"""
SELECT n_name, {sum_duck(DISC_PRICE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
""",
)


# -------------------------------------------------------- window ranking
def _top_suppliers(spark, sf):
    from pyspark.sql import Window

    t = model.load_tables(spark, sf, ("supplier", "nation"))
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        t["supplier"]
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_name", "s_acctbal", "rk")
    )


_q(
    "rel_top3_suppliers_per_nation",
    _top_suppliers,
    """
SELECT n_name, s_name, s_acctbal, rk FROM (
  SELECT s_name, s_acctbal, s_nationkey,
         row_number() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey) AS rk
  FROM supplier) s
JOIN nation ON s_nationkey = n_nationkey
WHERE rk <= 3
""",
)


# -------------------------------------------------------- big orders (Q18-ish)
def _big_orders(spark, sf):
    li = model.load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.expr(sum_spark(QTY)).alias("total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )


_q(
    "rel_big_orders",
    _big_orders,
    f"""
SELECT l_orderkey, {sum_duck(QTY)} AS total_qty
FROM lineitem GROUP BY l_orderkey HAVING {sum_duck(QTY)} > 150.0
""",
)


# ------------------------------------------------------------------ Q6-like
def _tpch_q6(spark, sf):
    """Forecast-revenue: the pushdown showcase — every predicate reaches
    the parquet scan, the agg is a single partial+final pair."""
    li = model.load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.expr(sum_spark(f"{PRICE} * {DISC}")).alias("revenue"))
    )


_q(
    "rel_q6_forecast_revenue",
    _tpch_q6,
    f"""
SELECT {sum_duck(f"{PRICE} * {DISC}")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)


# ----------------------------------------------------------------- Q10-like
def _tpch_q10(spark, sf):
    """Returned-item reporting: top-20 customers by lost revenue in a
    quarter — fact-fact join shuffles, nation broadcasts."""
    t = {n: model.load_table(spark, sf, n) for n in ("customer", "orders", "lineitem", "nation")}
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(sum_spark(DISC_PRICE)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_q(
    "rel_q10_returned_items",
    _tpch_q10,
    f"""
SELECT c_custkey, c_name, n_name, {sum_duck(DISC_PRICE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)


# --------------------------------------------------------------- Q14-like
# Promotion effect: conditional aggregation over a broadcast part join.
def _tpch_q14(spark, sf):
    li = model.load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
    )
    part = model.load_table(spark, sf, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = f"CASE WHEN p_type LIKE 'PROMO%' THEN {DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,6)) END"
    return joined.agg(
        F.expr(
            f"100.0 * {sum_spark(promo)} / {sum_spark(DISC_PRICE)}"
        ).alias("promo_revenue")
    )


_q(
    "rel_q14_promo_effect",
    _tpch_q14,
    f"""
SELECT 100.0 * {sum_duck(f"CASE WHEN p_type LIKE 'PROMO%' THEN {DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,6)) END")}
     / {sum_duck(DISC_PRICE)} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
""",
)


# --------------------------------------------------------------- Q18-like
# Large-volume customers: semi-join against a HAVING subquery, then a
# three-way join with re-aggregation.  The HAVING set is tiny, so the
# semi-join broadcasts under AQE; the big fact shuffles once on
# l_orderkey (reused by both the subquery agg and the final agg).
def _tpch_q18(spark, sf):
    li = model.load_table(spark, sf, "lineitem")
    orders = model.load_table(spark, sf, "orders")
    cust = model.load_table(spark, sf, "customer")
    qty = "CAST(l_quantity AS DECIMAL(18,2))"
    # Every output group key is functionally dependent on o_orderkey, so
    # the classic Q18 re-aggregation after the semi-join is redundant:
    # aggregate lineitem ONCE per order, filter the HAVING threshold,
    # and join the (tiny) survivor set to orders + broadcast customer.
    # One fact scan and one fact shuffle instead of two of each.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr(f"sum({qty})").alias("_sq"))
        .filter(F.col("_sq") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.expr("CAST(_sq AS DOUBLE)").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


_q(
    "rel_q18_large_volume_customers",
    _tpch_q18,
    """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
)
