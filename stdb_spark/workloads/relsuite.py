"""Relational workloads over the TPC-H-ish tables — the queries that
exercise Spark's join/aggregation machinery at scale (broadcast dims,
partial aggregation, AQE).  Decimal arithmetic is shared verbatim
between the Spark side (selectExpr) and the DuckDB oracle so sums are
bit-identical (every intermediate decimal type below is exact for
2-decimal prices and discounts)."""

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

QUERIES = {}
ORACLES = {}


def _q(name, fn, sql=None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


# ------------------------------------------------------------------ Q1-like
_Q1_AGGS = f"""
  CAST(sum({QTY}) AS DOUBLE) AS sum_qty,
  CAST(sum({PRICE}) AS DOUBLE) AS sum_base_price,
  CAST(sum({DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
  CAST(sum({CHARGE}) AS DOUBLE) AS sum_charge,
  CAST(sum({QTY}) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum({PRICE}) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum({DISC}) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
"""


def _tpch_q1(spark, sf):
    li = model.load_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *[
                F.expr(e.strip().rsplit(" AS ", 1)[0]).alias(
                    e.strip().rsplit(" AS ", 1)[1]
                )
                for e in _Q1_AGGS.strip().split(",\n")
            ]
        )
    )


_q(
    "rel_q1_pricing_summary",
    _tpch_q1,
    f"""
SELECT l_returnflag, l_linestatus, {_Q1_AGGS}
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
        .agg(F.expr(f"CAST(sum({DISC_PRICE}) AS DOUBLE)").alias("revenue"))
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
       CAST(sum({DISC_PRICE}) AS DOUBLE) AS revenue
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
    t = model.load_tables(spark, sf)
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
        .agg(F.expr(f"CAST(sum({DISC_PRICE}) AS DOUBLE)").alias("revenue"))
    )


_q(
    "rel_q5_local_supplier_volume",
    _tpch_q5,
    f"""
SELECT n_name, CAST(sum({DISC_PRICE}) AS DOUBLE) AS revenue
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

    t = model.load_tables(spark, sf)
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
        .agg(F.expr(f"CAST(sum({QTY}) AS DOUBLE)").alias("total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )


_q(
    "rel_big_orders",
    _big_orders,
    f"""
SELECT l_orderkey, CAST(sum({QTY}) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY l_orderkey HAVING CAST(sum({QTY}) AS DOUBLE) > 150.0
""",
)
