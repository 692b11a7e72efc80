"""Composite benchmark queries: TPC-H Q3 / Q5 / Q10 adapted to the
testdata star schema.

The reference's entire analytical surface is one SPJ star query
(`ETLCNPJFinalEmpresaEstabelecimentos.py:191-234`); every single-operator
plan in this registry exercises one capability at a time. These three are
the opposite: standard multi-join + aggregate + top-k workloads
(join order, broadcast selection, partial aggregation, and sort/limit all
in one plan) — the shapes Catalyst's optimizer exists for, and the
headline entries for bench.py beyond the flagship.

Adaptations to the driver schema (TESTDATA.md): o_shippriority does not
exist → Q3 carries o_orderpriority; dates are TIMESTAMP columns → literal
cutoffs are timestamps inside the 1995–2001 data range.

Determinism: revenue accumulates in decimal (registry convention) and the
top-k ORDER BY sorts on the EXACT decimal with a unique-key tiebreaker,
so the LIMIT selects an identical set in both engines; the double cast
happens after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.plans.registry import register

_DEC = "decimal(27,6)"
_REV_SQL = f"SUM(CAST(l_extendedprice * (1 - l_discount) AS {_DEC}))"


def _rev_dec() -> F.Column:
    return F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST({_REV_SQL} AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY {_REV_SQL} DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "agg", "topk"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 Shipping Priority: unshipped high-value BUILDING orders.
    customer⋈orders⋈lineitem with selective filters on all three tables
    (each pushed to its scan), aggregate on the order grain, exact-decimal
    top-10. Physical: customer (filtered) broadcasts under AQE; the
    orders⋈lineitem join shuffles on the shared orderkey so the groupBy
    on l_orderkey reuses that partitioning."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev_dec().alias("rev_dec"))
        .orderBy(F.desc("rev_dec"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 Local Supplier Volume: revenue from orders where customer and
    supplier share an ASIA nation. Six-table join with a non-key equality
    (c_nationkey = s_nationkey) folded into the supplier join — the
    join-reordering / broadcast-selection stress test. nation and region
    always broadcast (bounded cardinality, catalog.ALWAYS_BROADCAST
    rationale); supplier is sf-scaled but small → AQE promotes it."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_rev_dec().cast("double").alias("revenue"))
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST({_REV_SQL} AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY {_REV_SQL} DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "agg", "topk"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 Returned Item Reporting: top-20 customers by revenue lost to
    returns in one quarter. Join on the fact side first (orders filter is
    the selective one), aggregate on the customer grain, exact-decimal
    top-20 via TakeOrderedAndProject — the k-row answer never
    materializes the full sorted result."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_dec().alias("rev_dec"))
        .orderBy(F.desc("rev_dec"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


_Q18_QTY = 250


@register(
    "tpch_q18",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS {_DEC})) > {_Q18_QTY})
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "join", "agg", "subquery", "topk"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 Large Volume Customer: orders whose total quantity exceeds the
    threshold, decorated with customer and re-aggregated. The IN-subquery
    over an aggregate decorrelates to an aggregate + LEFT SEMI join
    (Catalyst, not us); the qty sums accumulate in decimal on both
    engines so HAVING cuts identical sets. Top-100 by (o_totalprice,
    o_orderkey) — a total order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q"))
        .filter(F.col("q") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "__bk"), F.col("o_orderkey") == F.col("__bk"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty_dec"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
    )


@register(
    "tpch_q6",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS {_DEC})) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "filter", "agg"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 Forecasting Revenue Change: pure scan + conjunctive range
    filters + global aggregate — the pushdown benchmark. Every predicate
    reaches the parquet scan (min/max row-group skipping does the work at
    100 TB); no join, no shuffle beyond the final partial-agg merge."""
    li = table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "exists", "semi", "agg"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 Order Priority Checking (adapted: no commit/receipt dates in
    the driver schema → 'shipped after the order date' is the lateness
    predicate). The EXISTS becomes a LEFT SEMI join with a non-equi
    residual (l_shipdate > o_orderdate) — the semi join dedups matches
    for free, where an inner join + distinct would pay a second shuffle."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q14",
    oracle=f"""
    SELECT CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END AS {_DEC})) AS DOUBLE) * 100
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {_DEC})) AS DOUBLE)
             AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 Promotion Effect: one month's promo revenue share. Conditional
    aggregation over a fact⋈dim join — part is sf-scaled small, so AQE
    broadcasts it and the month filter prunes the fact scan; the ratio's
    numerator and denominator both accumulate in decimal."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(p, li.l_partkey == p.p_partkey)
    return j.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)).cast(_DEC))
            .cast("double")
            * 100
            / F.sum(rev.cast(_DEC)).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
    GROUP BY c_count
    """,
    tags=("tpch", "join", "agg", "distribution"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 Customer Distribution (adapted: no o_comment filter in the
    driver schema): orders-per-customer histogram via LEFT join (zero
    counts survive — count(o_orderkey) skips the nulls the outer join
    manufactures) then a second aggregate over the counts. Two shuffles:
    custkey, then the tiny c_count domain."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q22",
    oracle=f"""
    SELECT c_nationkey AS cntry,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS {_DEC})) AS DOUBLE)
                              / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("tpch", "anti", "scalar_subquery", "agg"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 Global Sales Opportunity (adapted: nation key stands in for
    the phone country code): above-average-balance customers with NO
    orders. The scalar subquery (global positive-balance average,
    decimal-accumulated so the threshold is bit-identical) broadcasts to
    every row; NOT EXISTS is a left-anti join. The anti join's build side
    is just order custkeys — at 100 TB project the join column before
    the anti join, never ship whole rows."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    lonely = rich.join(o.select("o_custkey"), rich.c_custkey == F.col("o_custkey"), "left_anti")
    return lonely.groupBy(F.col("c_nationkey").alias("cntry")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
    )


@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
           CAST({_REV_SQL} AS DOUBLE)                           AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS {_DEC})) AS DOUBLE)                 AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE)      / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS {_DEC})) AS DOUBLE)      / COUNT(*) AS avg_disc,
           COUNT(*)                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "agg"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 Pricing Summary Report: the canonical full-scan aggregate —
    eight measures over ~all of lineitem, grouped on a 6-ish-value key.
    Physical shape is the best case for Spark: the scan reads only the 7
    needed columns (ReadSchema pruning), partial aggregation collapses
    each input partition to a handful of rows map-side, and the exchange
    ships six groups, not 60k rows. Averages divide the exact decimal
    sum (cast to double) by the group count so both engines perform the
    same single IEEE division; sum_charge keeps the oracle's left-assoc
    product order so the double multiplies are bit-identical."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-02")

    def _sdec(c: F.Column) -> F.Column:
        return F.sum(c.cast(_DEC))

    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sdec(F.col("l_quantity")).cast("double").alias("sum_qty"),
            _sdec(F.col("l_extendedprice")).cast("double").alias("sum_base_price"),
            _rev_dec().cast("double").alias("sum_disc_price"),
            _sdec(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).cast("double").alias("sum_charge"),
            (_sdec(F.col("l_quantity")).cast("double") / n).alias("avg_qty"),
            (_sdec(F.col("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (_sdec(F.col("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name                                   AS supp_nation,
           n2.n_name                                   AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT)  AS l_year,
           CAST({_REV_SQL} AS DOUBLE)                  AS revenue
    FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 Volume Shipping (nation names adapted to the testdata domain):
    bilateral trade volume between two nations by ship year. The two
    nation aliases broadcast (25 rows, ALWAYS_BROADCAST class); the OR
    pair-filter lands after both nation joins but Catalyst still pushes
    the single-nation IN(1,2) residuals onto each broadcast side. The
    big shape is lineitem⋈orders on orderkey (one shuffle) with
    supplier/customer joined on their keys; AQE broadcasts whichever of
    those dims the filters shrink below threshold at runtime."""
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_rev_dec().cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_dec
                         ELSE CAST(0 AS {_DEC}) END) AS DOUBLE)
             / CAST(SUM(vol_dec) AS DOUBLE)             AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS {_DEC}) AS vol_dec,
             n2.n_name AS supp_nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 National Market Share (adapted: p_type domain is single words,
    nation names are NATION_n): the fraction of ASIA's ECONOMY-part
    revenue supplied by NATION_3, by order year. The deepest join tree
    in the registry (8 tables). part filtered on p_type is the most
    selective input — joining lineitem to it FIRST cuts the fact rows
    ~6× before the orderkey shuffle; region/nation broadcast always,
    and the market-share division happens once per year-group after two
    exact decimal sums. The conditional numerator uses the same decimal
    volume term as the denominator so no row is valued differently
    between the two sums."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("vol_dec"), "supp_nation")
    )
    zero = F.lit(0).cast(_DEC)
    return (
        j.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("vol_dec")).otherwise(zero)
                ).cast("double")
                / F.sum(F.col("vol_dec")).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_rev_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM revenue0)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "agg", "subquery"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 Top Supplier: the supplier(s) with maximum quarterly revenue.
    The classic view-plus-scalar-subquery shape becomes: aggregate
    lineitem once on l_suppkey (one shuffle of ~|suppliers| partial
    sums), then an unpartitioned max window over that tiny aggregate —
    NOT a second scan of lineitem the way the SQL view is naively
    evaluated twice. The equality filter compares exact decimals, so
    'the max' is one deterministic set in both engines; the supplier
    dim joins broadcast-side. At 100 TB the window-over-aggregate
    trick matters: revenue0 is O(suppliers) rows, so the global max
    costs a single-partition pass over kilobytes, not a re-aggregation."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev_dec().alias("total_rev_dec")
    )
    best = rev.withColumn("max_rev", F.max("total_rev_dec").over(Window.partitionBy())).filter(
        F.col("total_rev_dec") == F.col("max_rev")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(s), best.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev_dec").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )
