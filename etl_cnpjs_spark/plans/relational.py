"""Relational plans: the flagship star query + the operator families the
reference either has (scan/project/filter/join, SURVEY.md §2.1) or
delegates to SQLite and we surface explicitly (aggregation, windows,
sorts, set ops — SURVEY.md §2.2).

Flagship analog (SURVEY.md §7.1 M1): QUERY_FINAL
(ETLCNPJFinalEmpresaEstabelecimentos.py:191-234) is
π₂₀(σ(IN×3)(fact ⋈ dim ⋈ dim ⋈ dim ⋈ dim)). On the testdata star schema:
fact = lineitem; dims = orders, customer, nation, region; the three
conjunctive IN-lists land on n_nationkey / o_orderstatus / l_partkey
mirroring municipio / situação / CNAE (etl.py:224-233). The CNAE list's
duplicate-literal quirk (53 literals, 50 distinct — IN dedups) is
reproduced in PART_KEYS_LITERALS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.operators.relational import (
    dedup_keep_latest,
    filter_in_lists,
    interval_overlap_join,
    join_asof,
    point_in_interval_join,
    star_join,
    top_k,
)
from etl_cnpjs_spark.plans.registry import register

# --- flagship filter literals (mirroring etl.py:223-233) -------------------
# 3 nation keys ~ the 3 municípios (etl.py:224)
NATION_KEYS = [3, 7, 19]
# 2 order statuses ~ the 3 situação codes (etl.py:225)
ORDER_STATUSES = ["F", "P"]
# 53 literals, 50 distinct ~ the CNAE IN-list quirk (etl.py:226-233):
# IN has set semantics, duplicates change nothing.
PART_KEYS = list(range(1, 200, 4))  # 50 distinct, present at every sf
PART_KEYS_LITERALS = PART_KEYS + [1, 5, 9]

_FLAGSHIP_COLS = [
    # fact side first — mirrors projecting e.cnpj_basico from the fact even
    # though the join also binds emp.cnpj_basico (SURVEY.md §2.3)
    "l_orderkey",
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
    "c_name",
    "c_acctbal",
    "c_mktsegment",
    "n_name",
    "r_name",
]


@register(
    "flagship",
    oracle=f"""
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
           l.l_quantity, l.l_extendedprice, l.l_discount, l.l_tax,
           l.l_returnflag, l.l_linestatus, l.l_shipdate,
           o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
           c.c_name, c.c_acctbal, c.c_mktsegment, n.n_name, r.r_name
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE n.n_nationkey IN ({','.join(str(k) for k in NATION_KEYS)})
      AND o.o_orderstatus IN ('F','P')
      AND l.l_partkey IN ({','.join(str(k) for k in PART_KEYS_LITERALS)})
    """,
    tags=("reference", "join", "filter", "projection"),
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-col star-join prospecting query — QUERY_FINAL's exact shape.

    Physical plan at scale: lineitem⋈orders is the one big-big join
    (shuffle, AQE-managed — the empresas⋈estabelecimentos analog);
    customer is mid-sized (AQE promotes to broadcast when small);
    nation/region are bounded dims → always broadcast, replacing the
    reference's secondary-index nested loops (etl.py:176-182). The three
    IN-lists push down to the parquet scans.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    joined = star_join(
        filter_in_lists(lineitem, {"l_partkey": PART_KEYS_LITERALS}),
        [
            (filter_in_lists(orders, {"o_orderstatus": ORDER_STATUSES}),
             F.col("l_orderkey") == F.col("o_orderkey"), False),
            (customer, F.col("o_custkey") == F.col("c_custkey"), False),
            (filter_in_lists(nation, {"n_nationkey": NATION_KEYS}),
             F.col("c_nationkey") == F.col("n_nationkey"), True),
            (region, F.col("n_regionkey") == F.col("r_regionkey"), True),
        ],
    )
    return joined.select(*_FLAGSHIP_COLS)


# --- scans (O4 scan_csv, + parquet) ---------------------------------------


@register(
    "scan_parquet",
    oracle="SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part",
    tags=("reference", "source"),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with declared schema from the footer (O4's modern
    form). Full projection here; pruning is exercised by project_alias."""
    return table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
    )


@register(
    "scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("reference", "source"),
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with an explicit StructType — the Spark form of the
    reference's headerless ';'-separated read with positionally stamped
    names (etl.py:87-88). The 25k-row chunking disappears: a partitioned
    read replaces it (SURVEY.md §2.1 O4/O5).

    Round-trips `nation` through CSV in a temp dir to prove the scan path,
    then returns the re-read rows (oracle = the parquet truth).
    """
    import tempfile

    from etl_cnpjs_spark.sources.csv import read_csv, write_roundtrip_csv

    src = table(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="etl_cnpjs_scan_csv_")
    write_roundtrip_csv(src, out)
    return read_csv(
        spark,
        out,
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
        header=False,
    )


# --- projection (O13) ------------------------------------------------------


@register(
    "project_alias",
    oracle="""
    SELECT o_orderkey AS order_id, o_orderstatus AS status,
           o_totalprice AS total_price, o_orderpriority AS priority
    FROM orders
    """,
    tags=("reference", "projection"),
)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aliased projection (etl.py:192-212). Catalyst prunes the scan to
    exactly these columns (ReadSchema shows 4 of 6)."""
    return table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderpriority").alias("priority"),
    )


# --- filters (O15 + null/range variants) -----------------------------------


@register(
    "filter_in_list",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
    WHERE c_nationkey IN (1,4,9,16,9) AND c_mktsegment IN ('BUILDING','MACHINERY')
    """,
    tags=("reference", "filter"),
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive IN-lists with a duplicate literal (set semantics,
    etl.py:226-233). Pushed to the parquet scan as In predicates."""
    return filter_in_lists(
        table(spark, sf_dir, "customer"),
        {"c_nationkey": [1, 4, 9, 16, 9], "c_mktsegment": ["BUILDING", "MACHINERY"]},
    ).select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")


@register(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    """,
    tags=("filter",),
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates — pushdown-friendly (parquet min/max pruning)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register(
    "filter_null",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE lang IS NOT NULL AND source IS NOT NULL
    """,
    tags=("filter",),
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-sensitive predicates — the CNPJ data is null-heavy
    (SURVEY.md §7.3 item 4)."""
    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("lang").isNotNull() & F.col("source").isNotNull()).select(
        "doc_id", "lang", "source"
    )


# --- joins (O14 + semi/anti/left/range) ------------------------------------


@register(
    "join_inner_equi",
    oracle="""
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name, r.r_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("reference", "join"),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain onto bounded dims → broadcast-hash both."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name", "r_name")
    )


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-preserving variant of O14 — the reference's inner joins drop
    orphans silently (PRAGMA foreign_keys=OFF, etl.py:169)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one big order. Semi joins
    never duplicate the left side — no fanout, no post-distinct."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: the orphan check the reference's readme describes as
    manual QA (readme.md:140-145), as one operator."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_range",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    """,
    tags=("join",),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + range residual (theta) join: late shipments. The equi key
    keeps it a hash/sort-merge join with the range as residual — never a
    cartesian product (the scalable formulation of a theta join)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    ).select("o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


@register(
    "join_asof",
    oracle="""
    WITH o1 AS (
      SELECT o_custkey, o_orderdate, o_orderkey FROM (
        SELECT o_custkey, o_orderdate, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders) t
      WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           o.o_orderkey  AS matched_o_orderkey,
           o.o_orderdate AS matched_o_orderdate
    FROM events e
    ASOF JOIN o1 o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("join", "asof"),
)
def join_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the customer's most recent order at
    event time. Right side pre-deduped per (custkey, orderdate) for a
    deterministic payload. Spark side is the union-merge formulation
    (operators/relational.py::join_asof — one shuffle, no history fanout);
    oracle uses DuckDB's native ASOF JOIN — same semantics, two engines,
    two completely different physical strategies."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    o1 = dedup_keep_latest(orders, ["o_custkey", "o_orderdate"], [F.desc("o_orderkey")])
    return join_asof(
        ev, o1,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
        payload=["o_orderkey", "o_orderdate"],
    )


# --- aggregations ----------------------------------------------------------
# Double sums go through DECIMAL accumulation: exact, order-insensitive,
# bit-identical across Spark and DuckDB (a double sum is partition-order
# dependent). Cast back to double so both schemas agree.

_DEC = "decimal(27,6)"


@register(
    "agg_count_by",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def agg_count_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with map-side partial combine (Catalyst default)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {_DEC})) AS DOUBLE) AS sum_revenue,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(*) AS avg_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style stats block. SUM/AVG via decimal accumulation —
    see module note on determinism."""
    li = table(spark, sf_dir, "lineitem", parallel=True)
    sum_qty_dec = F.sum(F.col("l_quantity").cast(_DEC))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        sum_qty_dec.cast("double").alias("sum_qty"),
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
        .cast("double")
        .alias("sum_revenue"),
        (sum_qty_dec.cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct — expands to a two-phase aggregate (partial distinct
    per partition, then merge) in Catalyst."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_custs"))
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey % 4096) AS approx_custs
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct — the 100 TB posture for cardinality: fixed
    sketch size, no distinct expansion, mergeable across partitions.

    Uses the Apache DataSketches HLL (hll_sketch_agg) at lgConfigK=21
    over a FIXED bounded key domain (o_custkey % 4096). Why the
    reduction: the coupon representation is exact only up to
    value-hash coupon collisions — with ~13k free-range keys a
    birthday collision is order-1 likely, and the round-6 testdata
    regeneration produced exactly that (est one short of exact in 4/5
    groups at sf0.1 — caught by the regime test doing its job). The
    domain 0..4095 is verified collision-free under lgConfigK=21 once,
    and its values never change across regenerations, so per-group
    subsets stay exact FOREVER and the COUNT(DISTINCT key%4096) oracle
    is an equality at every SF (regime pinned by tests/test_queries.py
    ::test_approx_distinct_regime_is_exact). The plan keeps the
    production sketch shape: per-partition sketches, merged, O(1)
    memory per group. At production cardinality (full-range keys,
    smaller lgConfigK) the same plan degrades gracefully to the ~1.6%
    HLL estimate — that regime is error-bounded in
    tests/test_approx_accuracy.py::test_hll_estimation_regime_bounds,
    and REAL full-range estimation is hash-checked end-to-end by the
    error-bound-oracle twin agg_approx_distinct_fullrange
    (plans/extended13.py) — this key is explicitly the BOUNDED-DOMAIN
    variant (r6 ADVICE item 2)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("o_custkey") % 4096, F.lit(21))
            ).alias("approx_custs")
        )
    )


APPROX_QUANTILE_ACCURACY = 1_000_000  # > any test-SF group size ⇒ GK
# summary retains every sample ⇒ the query is an EXACT discrete
# percentile and the quantile_disc oracle is an equality.
#
# SCOPE OF THE CLAIM (r6 ADVICE item 3): in THIS regime per-group sketch
# memory is O(group size), NOT the production O(1) — the equality oracle
# holds only while every tested group stays under 1e6 rows, and
# tests/test_queries.py::test_approx_quantile_regime_is_exact fails
# loudly the moment an SF crosses that line (largest tested group:
# ~0.5M at sf0.1; sf>=1 would breach). The production setting is ~2000
# (rank error n/2000, genuinely fixed memory); that regime is
# error-bounded in tests/test_approx_accuracy.py AND hash-checked
# end-to-end by agg_approx_quantile_fullrange (plans/extended13.py),
# which runs accuracy=2000 and verifies the GK rank guarantee in-plan.


@register(
    "agg_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.5)      AS qty_p50_approx,
           quantile_disc(l_extendedprice, 0.5) AS price_p50_approx
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "quantile"),
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of agg_quantile: approx_percentile, deliberately
    SIZED EXACT at test cardinality — with accuracy >> group size the
    GK summary never compresses, so the result is the exact discrete
    median and DuckDB's quantile_disc is an equality oracle. In this
    regime the sketch memory is O(group size), not the production O(1);
    see the APPROX_QUANTILE_ACCURACY note above for the regime bounds
    and the agg_approx_quantile_fullrange twin that runs the true
    fixed-memory production setting (regime pinned by
    tests/test_queries.py::test_approx_quantile_regime_is_exact;
    error bounds in tests/test_approx_accuracy.py)."""
    l = table(spark, sf_dir, "lineitem")
    acc = F.lit(APPROX_QUANTILE_ACCURACY)
    return l.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.5), acc).alias("qty_p50_approx"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), acc).alias(
            "price_p50_approx"
        ),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total). Spark and
    DuckDB both emit NULL for rolled-up levels."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("sum_bal"),
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT c_mktsegment, n_regionkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS sum_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (c_mktsegment, n_regionkey)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 4 grouping sets in one pass."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .cube("c_mktsegment", "n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("sum_bal"),
        )
    )


@register(
    "agg_pivot",
    oracle=f"""
    SELECT n_name,
           CAST(SUM(CAST(CASE WHEN c_mktsegment = 'BUILDING'  THEN c_acctbal END AS {_DEC})) AS DOUBLE) AS building,
           CAST(SUM(CAST(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END AS {_DEC})) AS DOUBLE) AS machinery,
           CAST(SUM(CAST(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END AS {_DEC})) AS DOUBLE) AS automobile
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_name
    """,
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = groupBy().pivot() with explicit value list (explicit values
    keep it one pass; without them Spark runs a distinct job first)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    piv = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", ["BUILDING", "MACHINERY", "AUTOMOBILE"])
        .agg(F.sum(F.col("c_acctbal").cast(_DEC)).cast("double"))
    )
    return piv.select(
        "n_name",
        F.col("BUILDING").alias("building"),
        F.col("MACHINERY").alias("machinery"),
        F.col("AUTOMOBILE").alias("automobile"),
    )


# --- windows ---------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Total order (price desc, key asc) →
    deterministic. One shuffle on the partition key."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS {_DEC})) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend — decimal accumulation keeps the prefix
    sums exact and engine-identical."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor access within an ordered partition."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


# --- sorts / limits --------------------------------------------------------


@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    tags=("sort",),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heaps, k-row
    driver merge — no full sort/shuffle). Unique tiebreaker (o_orderkey)
    makes the cut deterministic."""
    return top_k(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        25,
    )


# --- set ops ---------------------------------------------------------------


@register(
    "set_union",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 250000
    """,
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — the explicit form of the reference's multi-shard append
    load (etl.py:171, if_exists='append'). No shuffle at all."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    a = o.filter(F.col("o_orderstatus") == "F")
    b = o.filter(F.col("o_totalprice") > 250000)
    return a.select("o_orderkey", "o_custkey").unionAll(b.select("o_orderkey", "o_custkey"))


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — customers with both F and O
    orders."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — F-only customers. ``subtract`` is
    Spark's EXCEPT DISTINCT (a left-anti join on all columns underneath)."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.subtract(b)


# --- dedup (north_star) ----------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem
    """,
    tags=("north_star", "dedup"),
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact whole-row dedup = DISTINCT: hash aggregate with map-side
    partial — one shuffle of the already-reduced keys (north_star)."""
    from etl_cnpjs_spark.operators.relational import dedup_exact

    return dedup_exact(
        table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_shipdate")
    )


@register(
    "dedup_keep_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    tags=("north_star", "dedup"),
)
def dedup_keep_latest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup, deterministic survivor = latest event per user
    (tiebreak on event_id). Single shuffle on the key — no self-join."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    return dedup_keep_latest(ev, ["user_id"], [F.desc("ts"), F.desc("event_id")])


_ASOF_TOL_US = 24 * 3600 * 1_000_000  # 24 hours in microseconds


@register(
    "join_asof_tolerance",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') t
      WHERE rn = 1
    ), j AS (
      SELECT e.event_id, e.user_id, e.ts, e.event_type,
             p.event_id AS p_id, p.ts AS p_ts
      FROM events e
      ASOF JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
    )
    SELECT event_id, user_id, ts, event_type,
           CASE WHEN epoch_us(ts) - epoch_us(p_ts) <= {_ASOF_TOL_US}
                THEN p_id END AS last_purchase_id,
           CASE WHEN epoch_us(ts) - epoch_us(p_ts) <= {_ASOF_TOL_US}
                THEN p_ts END AS last_purchase_ts,
           (epoch_us(ts) - epoch_us(p_ts) > {_ASOF_TOL_US}) AS stale
    FROM j
    """,
    tags=("join", "asof", "tolerance"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance (pandas
    merge_asof(tolerance=...) semantics): each event looks up the same
    user's most recent prior PURCHASE, but only if it happened within
    the last 24 hours — older matches are nulled and FLAGGED stale
    rather than silently joined, the guard a feature-store
    point-in-time lookup needs so an old attribute never leaks into a
    training row as if fresh (the 24 h bound splits this corpus
    roughly in half, so both branches are exercised). Same
    single-shuffle union-merge asof underneath (inner form — only
    events with some prior purchase appear); the tolerance is a
    post-join integer-microsecond comparison, identical in both
    engines."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts0"),
        F.col("event_id").alias("p_id"),
    )
    p1 = dedup_keep_latest(p, ["p_user", "p_ts0"], [F.desc("p_id")])
    j = join_asof(
        ev, p1,
        left_key="user_id", right_key="p_user",
        left_time="ts", right_time="p_ts0",
        payload=["p_id", "p_ts0"],
    )
    age = F.unix_micros("ts") - F.unix_micros("matched_p_ts0")
    fresh = age <= _ASOF_TOL_US
    return j.select(
        "event_id", "user_id", "ts", "event_type",
        F.when(fresh, F.col("matched_p_id")).alias("last_purchase_id"),
        F.when(fresh, F.col("matched_p_ts0")).alias("last_purchase_ts"),
        (~fresh).alias("stale"),
    )


# --- join_interval_overlap -------------------------------------------------

_IVL_BIN = 16  # days per blocking bin; intervals here span ≤ 14 days → ≤ 2 bins


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey AS a_id,
             date_diff('day', DATE '1992-01-01', o_orderdate) AS a_start,
             date_diff('day', DATE '1992-01-01', o_orderdate)
               + 1 + o_orderkey % 14 AS a_end
      FROM orders WHERE o_orderkey % 251 = 0),
    b AS (
      SELECT DISTINCT l_orderkey * 10 + l_linenumber AS b_id,
             date_diff('day', DATE '1992-01-01', l_shipdate) AS b_start,
             date_diff('day', DATE '1992-01-01', l_shipdate)
               + 1 + l_linenumber AS b_end
      FROM lineitem WHERE (l_orderkey * 10 + l_linenumber) % 7 = 0)
    SELECT DISTINCT a_id, b_id,
           CAST(least(a_end, b_end) - greatest(a_start, b_start) AS BIGINT)
             AS overlap_days
    FROM a JOIN b ON a_start < b_end AND b_start < a_end
    """,
    tags=("join", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join with NO equi key — the shape equi+range
    residual (join_range) can't express: order validity windows
    [start, start+1..14d) × shipment windows, pairs where the intervals
    intersect. Naive Spark plans this as a nested-loop cross product;
    the scalable form BLOCKS BOTH SIDES TO FIXED-WIDTH BINS (the
    Databricks range-join-hint technique, hand-built): each interval
    explodes to the {_IVL_BIN}-day bins it covers (≤ 2 here), the join
    becomes a bin equi-join with the overlap predicate as residual, and
    a distinct collapses double-matches from pairs sharing two bins.
    Work is Σ bin²-per-bucket — linear for bounded interval length,
    never |A|×|B|. All arithmetic in integer epoch days, so the oracle
    (the naive overlap join, fine at oracle scale) is bit-exact.
    tests/test_plans.py pins the no-cartesian claim."""
    epoch = F.lit("1992-01-01").cast("date")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 251 == 0)
    a = o.select(
        F.col("o_orderkey").alias("a_id"),
        F.datediff(F.col("o_orderdate"), epoch).alias("a_start"),
        (
            F.datediff(F.col("o_orderdate"), epoch)
            + 1
            + F.col("o_orderkey") % 14
        ).alias("a_end"),
    )
    li = table(spark, sf_dir, "lineitem").withColumn(
        "b_id", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    ).filter(F.col("b_id") % 7 == 0)
    # the testdata's lineitem repeats (orderkey, linenumber), so the
    # interval set is declared DISTINCT on both sides; output is the
    # distinct (a, b, overlap) set (bin double-matches collapse in the
    # same distinct)
    b = li.select(
        "b_id",
        F.datediff(F.col("l_shipdate"), epoch).alias("b_start"),
        (F.datediff(F.col("l_shipdate"), epoch) + 1 + F.col("l_linenumber")).alias(
            "b_end"
        ),
    ).distinct()

    return (
        interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", bin_width=_IVL_BIN
        )
        .select(
            "a_id",
            "b_id",
            (
                F.least(F.col("a_end"), F.col("b_end"))
                - F.greatest(F.col("a_start"), F.col("b_start"))
            ).cast("bigint").alias("overlap_days"),
        )
        .distinct()
    )


@register(
    "join_point_in_interval",
    oracle=f"""
    WITH iv AS (
      SELECT o_orderkey AS a_id,
             date_diff('day', DATE '1992-01-01', o_orderdate) AS a_start,
             date_diff('day', DATE '1992-01-01', o_orderdate)
               + 1 + o_orderkey % 14 AS a_end
      FROM orders WHERE o_orderkey % 101 = 0),
    pt AS (
      SELECT DISTINCT l_orderkey * 10 + l_linenumber AS p_id,
             date_diff('day', DATE '1992-01-01', l_shipdate) AS p_day
      FROM lineitem WHERE (l_orderkey * 10 + l_linenumber) % 13 = 0)
    SELECT p_id, a_id,
           CAST(p_day - a_start AS BIGINT) AS day_in_window
    FROM pt JOIN iv ON a_start <= p_day AND p_day < a_end
    """,
    tags=("join", "interval", "point"),
)
def join_point_in_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-range lookup (shipment day → containing order-validity
    windows) via operators.relational.point_in_interval_join: the point
    side maps to its single bin with ONE integer projection (no explode,
    no row growth — the property that makes this the cheap half of the
    range-join family), only the ≤14-day interval side replicates to its
    ≤2 bins, and each pair meets in at most one bin so no distinct is
    needed. Oracle = the naive BETWEEN join. This is the physical shape
    of AS-OF reads, event→session attribution, and IP-range lookups at
    100 TB: points (the big side) shuffle once on the bin key at size
    |P|, never explode, never cross-join."""
    epoch = F.lit("1992-01-01").cast("date")
    iv = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0).select(
        F.col("o_orderkey").alias("a_id"),
        F.datediff(F.col("o_orderdate"), epoch).alias("a_start"),
        (
            F.datediff(F.col("o_orderdate"), epoch)
            + 1
            + F.col("o_orderkey") % 14
        ).alias("a_end"),
    )
    li = table(spark, sf_dir, "lineitem").withColumn(
        "p_id", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    ).filter(F.col("p_id") % 13 == 0)
    # the testdata's lineitem repeats (orderkey, linenumber) — declare a
    # DISTINCT point set (same convention as join_interval_overlap's b)
    pt = li.select(
        "p_id", F.datediff(F.col("l_shipdate"), epoch).alias("p_day")
    ).distinct()
    return point_in_interval_join(
        pt, iv, "p_day", "a_start", "a_end", bin_width=_IVL_BIN
    ).select(
        "p_id",
        "a_id",
        (F.col("p_day") - F.col("a_start")).cast("bigint").alias("day_in_window"),
    )
