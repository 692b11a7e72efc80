"""Round-6 stress extensions (VERDICT r5 item #5): 10× the three
round-5 families the main sweep (tools/stress.py) doesn't cover yet —

- graph_triangle_count: DENSITY growth (k× edges on a FIXED node set),
  the axis where the oriented 2-path join's volume grows ~k^2 — the
  measured exponent is the check on SCALE.md's prediction. (Disjoint-
  copy growth, the other axis, is linear by construction and already
  representative via the LPA row in stress.py.)
- mm_image_dedup: decode throughput — k× more images through the
  Arrow-batched BMP parse + digest groupBy; expectation linear wall,
  constant per-image decode cost.
- dedup_containment_capped: k× docs multiply every shingle's df by k,
  pushing the head across the df≤64 cap — candidate volume must stay
  bounded (the cap is the claim), verify stays per-candidate.

Usage: python tools/stress_r6.py [K]   (default 10; prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_cnpjs_spark.catalog import table  # noqa: E402
from etl_cnpjs_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
KEY_STRIDE = 100_000_000
TRI_N = 5_000  # larger node space than the plan's 500 so the edge set
# is far from saturation and density growth stays visible at k=10


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress-r6")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stress_r6_")

    # --- triangle counting under edge-density growth ----------------------
    # k replicas of orders re-keyed by +i (NOT +i*stride): every replica
    # lands new edges on the SAME TRI_N node set, so |E| grows ~k× and
    # oriented 2-path volume grows ~k² (degree² per middle node).
    def tri_edges(k_reps: int):
        # per-replica odd multiplier + offset decorrelates the
        # congruential edge map, so replicas contribute mostly-new edges
        # on the SAME node set (true density growth)
        o = table(spark, SF_DIR, "orders").select("o_orderkey")
        parts = [
            o.select(
                (F.col("o_orderkey") * (2 * i + 3) + i * 149_933).alias("key")
            )
            for i in range(k_reps)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        raw = out.select(
            (F.col("key") % TRI_N).alias("a"),
            (
                (F.expr(f"key DIV {TRI_N}") * 13 + (F.col("key") % TRI_N) * 7 + 1)
                % TRI_N
            ).alias("b"),
        ).filter(F.col("a") != F.col("b"))
        return (
            raw.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
        )

    def triangles(e):
        e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c"))
        e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
        tri = (
            e1.join(e2, F.col("b") == F.col("b2"))
            .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
            .select("a", "b", "c")
        )
        corners = (
            tri.select(F.col("a").alias("node"))
            .unionAll(tri.select(F.col("b").alias("node")))
            .unionAll(tri.select(F.col("c").alias("node")))
        )
        return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))

    e1f = tri_edges(1).localCheckpoint()
    ekf = tri_edges(k).localCheckpoint()
    ne1, nek = e1f.count(), ekf.count()
    # 2-path volume = sum over middle nodes of outdeg*(outdeg-1)/2 on the
    # oriented graph — the quantity SCALE.md predicts grows ~ (|E| ratio)²
    def two_paths(e):
        d = e.groupBy("u").agg(F.count(F.lit(1)).alias("dd"))
        return d.agg(
            F.sum(F.expr("dd * (dd - 1) / 2")).cast("bigint").alias("p")
        ).collect()[0].p

    tp1, tpk = two_paths(e1f), two_paths(ekf)
    tt1, tr1 = timed(lambda: triangles(e1f).count())
    ttk, trk = timed(lambda: triangles(ekf).count())

    # --- BMP decode throughput (mm_image_dedup shape) ---------------------
    from etl_cnpjs_spark.operators.multimodal import bmp_fingerprint_map_in_pandas

    def image_frame(k_reps: int):
        d0 = table(spark, SF_DIR, "documents").select("doc_id")
        parts = [
            d0.select((F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"))
            for i in range(k_reps)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select(
            "doc_id",
            (F.col("doc_id") % 64).alias("seed"),
            (8 + (F.col("doc_id") % 64) % 9).cast("int").alias("width"),
            (8 + (F.col("doc_id") % 64) % 7).cast("int").alias("height"),
        )

    def image_dedup(d):
        return (
            bmp_fingerprint_map_in_pandas(d)
            .groupBy("px_md5")
            .agg(
                F.count(F.lit(1)).alias("n_dups"),
                F.min("doc_id").alias("canonical_id"),
            )
            .filter(F.col("n_dups") >= 2)
        )

    n_img_1 = table(spark, SF_DIR, "documents").count()
    # absorb the one-time Arrow/Python worker-pool start so both timed
    # runs measure decode, not infra (bench.py's arrow_infra_warmup)
    spark.range(1).mapInPandas(lambda it: it, "id long").count()
    image_dedup(image_frame(1)).count()
    mt1, mg1 = timed(lambda: image_dedup(image_frame(1)).count())
    mtk, mgk = timed(lambda: image_dedup(image_frame(k)).count())

    # --- capped containment under df growth -------------------------------
    from etl_cnpjs_spark.functions.text import shingles, tokens

    docs = table(spark, SF_DIR, "documents")
    rep = [
        docs.select(
            (F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"), "text"
        )
        for i in range(k)
    ]
    docs_k = rep[0]
    for p in rep[1:]:
        docs_k = docs_k.unionByName(p)
    docs_k.write.mode("overwrite").parquet(f"{tmp}/documents")
    docs_k = spark.read.parquet(f"{tmp}/documents")

    def containment_capped(d, cap=64, thresh=0.9):
        sh = (
            d.select("doc_id", shingles(tokens(F.col("text"))).alias("sh"))
            .filter(F.size("sh") > 0)
            .localCheckpoint()
        )
        e = sh.select("doc_id", F.explode("sh").alias("s"))
        ek = (
            e.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("s")))
            .filter(F.col("__df") <= cap)
            .drop("__df")
        )
        a, b = ek.alias("a"), ek.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
            .distinct()
        )
        la = sh.select(F.col("doc_id").alias("i"), F.col("sh").alias("__sa"))
        lb = sh.select(F.col("doc_id").alias("j"), F.col("sh").alias("__sb"))
        inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
        pairs = cand.join(la, "i").join(lb, "j").select(
            "i", "j", inter.alias("x"), F.size("__sa").alias("na"),
            F.size("__sb").alias("nb"),
        )
        directed = pairs.select(
            F.col("i").alias("src"), (F.col("x") / F.col("na")).alias("c")
        ).unionByName(
            pairs.select(F.col("j").alias("src"), (F.col("x") / F.col("nb")).alias("c"))
        )
        return directed.filter(F.col("c") >= thresh)

    ct1, cr1 = timed(lambda: containment_capped(docs).count())
    ctk, crk = timed(lambda: containment_capped(docs_k).count())

    import math

    print(
        json.dumps(
            {
                "k": k,
                "triangle_edges": [ne1, nek],
                "triangle_2paths": [tp1, tpk],
                "triangle_2path_exponent_vs_edges": round(
                    math.log(tpk / tp1) / math.log(nek / ne1), 2
                ),
                "triangle_1x_sec": tt1,
                "triangle_kx_sec": ttk,
                "triangle_ratio": round(ttk / tt1, 1),
                "triangle_nodes": [tr1, trk],
                "image_dedup_1x_sec": mt1,
                "image_dedup_kx_sec": mtk,
                "image_dedup_ratio": round(mtk / mt1, 1),
                "image_groups": [mg1, mgk],
                "decode_imgs_per_sec": [
                    round(n_img_1 / mt1), round(n_img_1 * k / mtk)
                ],
                "containment_1x_sec": ct1,
                "containment_kx_sec": ctk,
                "containment_ratio": round(ctk / ct1, 1),
                "containment_rows": [cr1, crk],
            }
        )
    )


if __name__ == "__main__":
    main()
