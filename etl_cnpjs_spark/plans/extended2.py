"""Second extended-surface batch: gap-based sessionization, full-frame
value windows, URL parsing, weighted aggregates.

The reference is strictly batch SPJ over the CNPJ registry
(`ETLCNPJFinalEmpresaEstabelecimentos.py:191-234`) and has none of these
(SURVEY.md §2.2 marks the categories ∅); they are standard pieces of a
training-data / clickstream pipeline at 100 TB:

- sessionization turns a raw event log into the per-session grain every
  engagement metric needs — here the batch (deterministic, oracle-able)
  twin of `stream_session`'s `session_window`;
- first/last/nth over an unbounded frame is the "attribute of the whole
  group, kept per row" shape (first-touch attribution, latest-state
  decoration) that would otherwise cost a self-join;
- URL parsing is the first step of web-corpus curation (host-level
  dedup/filtering, e.g. C4);
- weighted averages are how per-document quality scores roll up to
  corpus level without letting short documents dominate.

Determinism: all window orderings carry the unique-key tiebreaker; time
arithmetic stays in bigint microseconds (`unix_micros` / `epoch_us` —
identical ns→µs truncation on both engines, see catalog.table); double
sums go through decimal accumulation per the registry convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.operators.relational import sessionize
from etl_cnpjs_spark.plans.registry import register

_DEC = "decimal(27,6)"

# 6 hours in microseconds: events average one per ~10 h per user, so this
# yields a mix of singleton and multi-event sessions at sf0.01.
_SESSION_GAP_US = 21_600_000_000


@register(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sess GROUP BY user_id, session_seq
    """,
    tags=("events", "window", "sessionize"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >6 h of user
    inactivity. lag → flag → running sum assigns session ids in ONE
    window pass, then per-session aggregation.

    Physical shape: ONE exchange on user_id feeds both window passes
    (lag, then the running sum) and the final groupBy(user_id,
    session_seq) — hash(user_id) already clusters (user_id,
    session_seq), so EnsureRequirements inserts no second exchange
    (asserted in tests/test_plans.py). At 100 TB this is the scalable
    alternative to collecting per-user event lists."""
    ev = table(spark, sf_dir, "events")
    return sessionize(ev, "user_id", "ts", "event_id", _SESSION_GAP_US)


@register(
    "window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over the full-partition frame: decorate every
    order with its customer's first, latest, and second order — the
    first-touch-attribution shape. One shuffle + one sort; the unbounded
    frame makes Spark evaluate the whole-partition answer once and
    replicate it per row (no self-join, no second aggregate)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first_value(F.col("o_orderkey")).over(w).alias("first_order"),
        F.last_value(F.col("o_orderkey")).over(w).alias("last_order"),
        F.nth_value(F.col("o_orderkey"), 2).over(w).alias("second_order"),
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             'https://shop.example.com/'
               || lower(replace(o_orderpriority, ' ', '-'))
               || '/' || CAST(o_orderkey AS VARCHAR)
               || '?cust=' || CAST(o_custkey AS VARCHAR)
               || '&status=' || o_orderstatus AS url
      FROM orders)
    SELECT o_orderkey, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]cust=([^&#]*)', 1) AS cust_param
    FROM u
    """,
    tags=("fn", "url"),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing kernel: build deterministic URLs, then split them back
    into protocol / host / path / query-param with `parse_url` (JVM-side,
    codegen). Host extraction is step one of web-corpus curation —
    host-level dedup, blocklists, per-domain caps. The oracle mirrors
    each part with anchored regexes, proving the extraction semantics
    rather than echoing the same builtin."""
    o = table(spark, sf_dir, "orders", parallel=True)
    url = F.concat(
        F.lit("https://shop.example.com/"),
        F.lower(F.regexp_replace(F.col("o_orderpriority"), " ", "-")),
        F.lit("/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?cust="),
        F.col("o_custkey").cast("string"),
        F.lit("&status="),
        F.col("o_orderstatus"),
    )
    d = o.select("o_orderkey", url.alias("url"))
    return d.select(
        "o_orderkey",
        "url",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("cust")).alias("cust_param"),
    )


@register(
    "agg_weighted_avg",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS {_DEC})) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE)
             AS qty_weighted_price,
           CAST(SUM(CAST(l_discount * l_extendedprice AS {_DEC})) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE)
             AS price_weighted_discount,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "weighted"),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted averages per group: quantity-weighted price and
    price-weighted discount — the corpus-rollup shape (weighting
    per-document quality by token count so short docs don't dominate).
    One hash aggregate with map-side partials; numerator and denominator
    accumulate in decimal so the result is order-insensitive and
    bit-identical to the oracle."""
    li = table(spark, sf_dir, "lineitem", parallel=True)
    wsum = F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast(_DEC))
    qsum = F.sum(F.col("l_quantity").cast(_DEC))
    dsum = F.sum((F.col("l_discount") * F.col("l_extendedprice")).cast(_DEC))
    psum = F.sum(F.col("l_extendedprice").cast(_DEC))
    return li.groupBy("l_returnflag").agg(
        (wsum.cast("double") / qsum.cast("double")).alias("qty_weighted_price"),
        (dsum.cast("double") / psum.cast("double")).alias("price_weighted_discount"),
        qsum.cast("double").alias("total_qty"),
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product — the grid-building shape (every region
    × every nation; in a pipeline: every model × every eval slice).
    Spark requires the explicit crossJoin() call precisely because the
    blowup is quadratic; at scale the small side must broadcast
    (BroadcastNestedLoopJoin) so only one side streams."""
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


@register(
    "agg_hll_sketch",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority,
             COUNT(DISTINCT o_custkey % 4096) AS est_distinct,
             COUNT(DISTINCT o_custkey % 4096) AS exact_distinct
      FROM orders GROUP BY o_orderpriority),
    tot AS (SELECT COUNT(DISTINCT o_custkey % 4096) AS est_total_distinct
            FROM orders)
    SELECT per.o_orderpriority, per.est_distinct, per.exact_distinct,
           tot.est_total_distinct
    FROM per, tot
    """,
    tags=("agg", "sketch", "approx"),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-priority HyperLogLog over
    a bounded key domain (o_custkey % 4096, hll_sketch_agg at
    lgConfigK=21), re-aggregated with hll_union_agg into a grand-total
    estimate carried on every row. THE 100 TB distinct pattern: sketch
    once at the finest grain (per partition/day), then ANY rollup is a
    cheap sketch union — no second pass over raw data, unlike exact
    countDistinct whose expansion can't be reused across grains.

    Why the bounded domain: coupon-mode exactness holds only modulo
    value-hash coupon collisions — free-range keys at ~13k distinct
    hit an order-1 birthday collision, and the round-6 testdata regen
    DID (est one short in 4/5 priority groups at sf0.1; the regime
    test caught it). Domain 0..4095 is verified collision-free once
    and its values never change across regenerations, so per-group
    subsets AND the union stay exact at every SF — the
    COUNT(DISTINCT key%4096) oracle is an equality (regime pinned in
    tests/test_queries.py). This key is explicitly the BOUNDED-DOMAIN
    variant (r6 ADVICE item 2); real full-range estimation is
    hash-checked end-to-end by agg_approx_distinct_fullrange
    (plans/extended13.py), and the production estimation regime
    (default lgConfigK=12, full-range keys) keeps its error-bound test
    in tests/test_approx_accuracy.py."""
    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg(F.col("o_custkey") % 4096, F.lit(21)).alias("sk"),
        F.count_distinct(F.col("o_custkey") % 4096).alias("exact_distinct"),
    )
    total = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total_distinct")
    )
    return (
        per.select(
            "o_orderpriority",
            F.hll_sketch_estimate("sk").alias("est_distinct"),
            "exact_distinct",
        )
        .crossJoin(F.broadcast(total))
    )


@register(
    "fn_array_outer",
    oracle="""
    WITH t AS (
      SELECT p_partkey,
             CASE WHEN p_size >= 30 THEN CAST([] AS VARCHAR[])
                  ELSE string_split(p_type, ' ') END AS words
      FROM part)
    SELECT p_partkey,
           CAST(len(words) AS INT) AS n_words,
           unnest(CASE WHEN len(words) = 0 THEN [CAST(NULL AS VARCHAR)]
                       ELSE words END) AS word
    FROM t
    """,
    tags=("fn", "array", "null"),
)
def fn_array_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: null-preserving array fan-out. Plain explode DROPS
    rows with empty arrays (inner-join semantics against the elements);
    explode_outer keeps them with a NULL element — the difference between
    silently losing every document with no secondary CNAE codes
    (cf. the packed `cnae_fiscal_secundaria` string, etl.py:48) and
    keeping them visible. Empty arrays manufactured deterministically
    (p_size >= 30) so both behaviors are exercised; the oracle models
    the outer semantics with a [NULL] sentinel."""
    p = table(spark, sf_dir, "part")
    words = F.when(F.col("p_size") >= 30, F.array().cast("array<string>")).otherwise(
        F.split("p_type", " ")
    )
    t = p.select("p_partkey", words.alias("words"))
    return t.select(
        "p_partkey",
        F.size("words").alias("n_words"),
        F.explode_outer("words").alias("word"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS INTEGER) AS k,
           props->>'k'                  AS k_str,
           CAST(props->>'missing' AS INTEGER) AS missing
    FROM events
    """,
    tags=("fn", "variant", "json"),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT ingestion (Spark 4): parse_json once into
    the binary variant encoding, then typed path extraction with
    variant_get — unlike get_json_object (string re-parse per access),
    the variant parse cost is paid once per row however many fields are
    read. try_variant_get on a missing path yields NULL instead of
    failing: the schema-drift posture a 100 TB event log needs. Oracle
    mirrors with DuckDB's JSON operators."""
    ev = table(spark, sf_dir, "events", parallel=True)
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "int").alias("k"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
        F.try_variant_get("v", "$.missing", "int").alias("missing"),
    )


@register(
    "sql_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
    tags=("sql", "lateral", "subquery"),
)
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: per-customer top-2 orders written the
    way an analyst writes it. Catalyst DECORRELATES the per-row subquery
    into a relational plan (no nested-loop re-execution per customer) —
    same result as the window_topk_group formulation, different surface.
    Deterministic via the (o_totalprice, o_orderkey) total order."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM __lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM __lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )


# --- agg_countmin ----------------------------------------------------------
#
# Count-Min sketch (Cormode & Muthukrishnan 2005): a depth × width counter
# matrix where row d counts collisions under hash_d; point estimate =
# min over rows — an UPPER bound on the true frequency with error
# ≤ e/width · N at probability 1 - (1/2)^depth. Unlike agg_hll_sketch
# (engine-private sketch bytes, rows-only check), the hash family here is
# EXPLICIT affine-mod arithmetic, so the whole matrix is deterministic
# bigint math both engines reproduce — a sketch key with a full
# hash-green oracle.
_CMS_W = 256  # width (buckets per row)
_CMS_P = 1_000_003  # prime for the affine family
_CMS_HASHES = [(433, 17), (389, 251), (911, 643), (607, 89)]  # (a_d, b_d)


@register(
    "agg_countmin",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT {d} AS depth,
           ((user_id * {a} + {b}) % {_CMS_P}) % {_CMS_W} AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 2"""
        for d, (a, b) in enumerate(_CMS_HASHES)
    ),
    tags=("agg", "sketch", "approx", "north_star"),
)
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch build over the events stream's user_id frequency
    (heavy-hitter / rate-limit accounting): each row lands in one bucket
    per depth via the affine family h_d(x) = ((a_d·x + b_d) mod P) mod W,
    and the sketch is the (depth, bucket, cnt) matrix — ≤ depth·width =
    1024 cells regardless of input size. The estimate-side contract
    (read: min over depths of the probed cells, always ≥ the true count,
    within e/W·N w.h.p.) is pinned by
    tests/test_approx_accuracy.py::test_countmin_point_estimates.

    Scale shape: one explode(depth-array) — constant 4× row growth that
    partial aggregation collapses to ≤ 1024 cells per task BEFORE the
    exchange, so the shuffle moves ≤ tasks·1024 tiny rows however big
    the input; the reduce is the standard mergeable-sketch sum (sketches
    add cell-wise, the property that lets per-partition/per-day sketches
    roll up without touching raw data again). All arithmetic is
    nonnegative bigint mod — hash-exact across engines."""
    ev = table(spark, sf_dir, "events")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                (((F.col("user_id") * a + b) % _CMS_P) % _CMS_W).alias("bucket"),
            )
            for d, (a, b) in enumerate(_CMS_HASHES)
        ]
    )
    return (
        ev.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


_CMS_TOPK = 20


def _cms_heavy_oracle() -> str:
    mats = ",\n".join(
        f"""
    m{d} AS (
      SELECT ((user_id * {a} + {b}) % {_CMS_P}) % {_CMS_W} AS bucket,
             count(*) AS cnt
      FROM events GROUP BY 1)"""
        for d, (a, b) in enumerate(_CMS_HASHES)
    )
    joins = "\n".join(
        f"    JOIN m{d} a{d} ON ((p.user_id * {a} + {b}) % {_CMS_P}) % {_CMS_W} = a{d}.bucket"
        for d, (a, b) in enumerate(_CMS_HASHES)
    )
    least = ", ".join(f"a{d}.cnt" for d in range(len(_CMS_HASHES)))
    return f"""
    WITH {mats},
    probes AS (SELECT DISTINCT user_id FROM events)
    SELECT p.user_id, CAST(least({least}) AS BIGINT) AS est
    FROM probes p
{joins}
    ORDER BY est DESC, p.user_id
    LIMIT {_CMS_TOPK}
    """


@register(
    "agg_countmin_heavy",
    oracle=_cms_heavy_oracle(),
    tags=("agg", "sketch", "approx", "north_star", "topk"),
)
def agg_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ side of the Count-Min story — heavy hitters from the
    sketch: probe every candidate key against the matrix agg_countmin
    builds, estimate = min over depths of the probed cells (the CMS
    point query), return the top-K by estimate with a user_id total-
    order tiebreak. est ≥ true count always (the upper-bound property
    tests/test_approx_accuracy.py pins), so CMS top-K has no false
    NEGATIVES — the reason rate limiters and hot-key detectors use it.

    Scale shape: the matrix is ≤ depth·width = 1024 rows whatever the
    input, so it BROADCASTS; the probe explodes each candidate to its 4
    (depth, bucket) coordinates — constant growth — hash-joins the tiny
    matrix with zero shuffle, and the min folds in the per-key groupBy
    (one exchange on the candidate key, partial-min combined). At
    100 TB the candidate set is itself sketch-derived (or the key
    dictionary); nothing rescans raw events to answer a point query —
    that is the entire point of maintaining the sketch."""
    matrix = agg_countmin(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    probes = ev.select("user_id").distinct()
    coords = probes.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        (((F.col("user_id") * a + b) % _CMS_P) % _CMS_W).alias(
                            "bucket"
                        ),
                    )
                    for d, (a, b) in enumerate(_CMS_HASHES)
                ]
            ).alias("c")
        ).alias("c"),
    ).select("user_id", F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
    return (
        coords.join(F.broadcast(matrix), ["depth", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").cast("bigint").alias("est"))
        .orderBy(F.desc("est"), "user_id")
        .limit(_CMS_TOPK)
    )


def _cms_cells_sql(extra_key: str = "") -> str:
    """UNION ALL of the per-depth bucket aggregates, optionally keyed by
    an extra column (e.g. the day, for the merge proof)."""
    sel = f"{extra_key}, " if extra_key else ""
    grp = "1, 3" if extra_key else "2"
    return "\n    UNION ALL\n".join(
        f"""
    SELECT {sel}{d} AS depth,
           ((user_id * {a} + {b}) % {_CMS_P}) % {_CMS_W} AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY {grp}"""
        for d, (a, b) in enumerate(_CMS_HASHES)
    )


@register(
    "agg_countmin_merge",
    oracle=f"""
    WITH g AS ({_cms_cells_sql()}),
    daily AS ({_cms_cells_sql("CAST(ts AS DATE) AS day")}),
    m AS (SELECT depth, bucket, CAST(sum(cnt) AS BIGINT) AS cnt_merged
          FROM daily GROUP BY 1, 2)
    SELECT g.depth, g.bucket, g.cnt AS cnt_global, m.cnt_merged
    FROM g JOIN m ON g.depth = m.depth AND g.bucket = m.bucket
    """,
    tags=("agg", "sketch", "approx", "mergeable"),
)
def agg_countmin_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY, verified as a key: Count-Min sketches add
    cell-wise, so per-day sketches summed must equal the sketch of the
    whole stream — the property that makes the 100 TB pattern work
    (sketch at the finest grain — per partition, per day, per file —
    and answer any coarser question by merging matrices, never
    re-touching raw data; the CMS analog of agg_hll_sketch's
    hll_union_agg rollup). Output carries BOTH derivations side by side
    — (depth, bucket, cnt_global, cnt_merged) — so the oracle hash pins
    their equality cell-by-cell, and the inner join doubles as the
    completeness check (a cell present in one derivation but not the
    other would drop rows and fail the count).

    Scale shape: the daily pass is one exchange of ≤ tasks·days·1024
    partial cells (map-side combined); the merge groups a
    days×1024-row frame — trivially small; the global matrix broadcasts
    into the final join. Nothing rescans events twice at scale — the
    global column here exists only as the verification twin."""
    ev = table(spark, sf_dir, "events")

    def cells(extra=None):
        arr = F.array(
            *[
                F.struct(
                    F.lit(d).alias("depth"),
                    (((F.col("user_id") * a + b) % _CMS_P) % _CMS_W).alias(
                        "bucket"
                    ),
                )
                for d, (a, b) in enumerate(_CMS_HASHES)
            ]
        )
        cols = ["c.depth", "c.bucket"] + ([extra] if extra else [])
        base = ev.select(
            F.explode(arr).alias("c"),
            *( [F.col("ts").cast("date").alias("day")] if extra else [] ),
        )
        return base.groupBy(
            *([F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket")]
              + ([F.col("day")] if extra else []))
        ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))

    global_m = cells()
    merged = (
        cells(extra="day")
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt_merged"))
    )
    return (
        global_m.withColumnRenamed("cnt", "cnt_global")
        .join(merged, ["depth", "bucket"])
        .select("depth", "bucket", "cnt_global", "cnt_merged")
    )
