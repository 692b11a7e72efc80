"""Round-9b stress: the crawl-ingest screen's delta axis.

corpus_ingest_incremental's scale claim is that every exchange is
DELTA-sized except the one posting probe (the corpus side is a
pre-staged posting table a session bands once). This tool measures the
claim directly: the SAME pre-built corpus posting/shingle frames
(staged untimed, as production would), screened by a 1× and a 10× delta
(structure-preserving replicas with shifted doc_ids, so every replica
keeps its near-dup relationships to the corpus) — wall time should grow
~linearly in the delta while the corpus cost stays out of the loop.

Shapes are rebuilt from the plan's own operators (shingles ->
minhash_band_keys -> posting probe -> exact-Jaccard verify -> outcome
attribution), timed through the noop sink. Writes /tmp/stress_r9b.json.

Usage: python tools/stress_r9b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_cnpjs_spark.catalog import table  # noqa: E402
from etl_cnpjs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SPLIT = 2_500  # stress split: half the sf0.1 corpus on each side
ID_STRIDE = 1_000_000  # replica id shift (keeps ids disjoint)


def timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    from etl_cnpjs_spark.functions.text import shingles, tokens
    from etl_cnpjs_spark.operators.dedup import minhash_band_keys
    from etl_cnpjs_spark.plans.dedup import JACCARD_THRESHOLD
    from etl_cnpjs_spark.plans.extended import _KEEP
    from etl_cnpjs_spark.plans.registry import knuth32

    spark = get_spark(app_name="stress-r9b-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")

    # corpus side: staged ONCE, untimed (the persisted posting-table
    # role — dedup_minhash_persist / _banded8x2 at production)
    corpus = (
        docs.filter(F.col("doc_id") < SPLIT)
        .select(
            "doc_id",
            shingles(tokens(F.col("text"))).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            "sh",
            minhash_band_keys(F.col("sh"), bands=8, rows=2).alias("bk"),
        )
        .localCheckpoint()
    )
    cposts = corpus.select(
        F.col("doc_id").alias("corpus_id"),
        F.posexplode("bk").alias("band", "key"),
    ).localCheckpoint()
    csh = corpus.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("sh").alias("sha"),
        (knuth32(F.col("doc_id")) < F.lit(_KEEP)).alias("vs_eval"),
    ).localCheckpoint()

    base_delta = docs.filter(F.col("doc_id") >= SPLIT)

    def replicate(mult: int):
        if mult == 1:
            return base_delta.localCheckpoint()
        reps = [
            base_delta.select(
                (F.col("doc_id") + F.lit(r * ID_STRIDE)).alias("doc_id"),
                "lang",
                "text",
            )
            for r in range(mult)
        ]
        out = reps[0]
        for d in reps[1:]:
            out = out.unionAll(d)
        return out.localCheckpoint()

    def screen(delta):
        # the full in-flight screen: tokenize/shingle/band the delta,
        # probe the staged postings, verify exact Jaccard, attribute
        meta = delta.filter(F.length(F.trim("text")) > 0).select(
            "doc_id",
            "lang",
            F.size(tokens(F.col("text"))).alias("n_tokens"),
            shingles(tokens(F.col("text"))).alias("shb"),
        )
        posts = meta.filter(F.size("shb") > 0).select(
            "doc_id",
            F.posexplode(
                minhash_band_keys(F.col("shb"), bands=8, rows=2)
            ).alias("band", "key"),
        )
        cands = (
            posts.join(cposts, ["band", "key"])
            .select("doc_id", "corpus_id")
            .distinct()
        )
        inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
        union = F.size("sha") + F.size("shb") - inter
        hits = (
            cands.join(csh, "corpus_id")
            .join(meta.select("doc_id", "shb"), "doc_id")
            .filter((inter / union) >= JACCARD_THRESHOLD)
            .groupBy("doc_id")
            .agg(F.max("vs_eval").alias("leaked"))
        )
        return (
            meta.select("doc_id", "lang", "n_tokens")
            .join(hits, "doc_id", "left")
            .select(
                "doc_id",
                "lang",
                "n_tokens",
                F.when(F.col("leaked"), F.lit("leaked"))
                .when(F.col("leaked").isNotNull(), F.lit("dup"))
                .otherwise(F.lit("ingested"))
                .alias("outcome"),
            )
        )

    out: dict[str, object] = {
        "sf_dir": SF_DIR,
        "split": SPLIT,
        "corpus_docs": corpus.count(),
    }
    for mult in (1, 10, 100):
        delta = replicate(mult)
        n = delta.count()
        reps = [timed(lambda: mat(screen(delta))) for _ in range(3)]
        out[f"delta_{mult}x"] = {
            "delta_docs": n,
            "reps": reps,
            "median": sorted(reps)[1],
        }

    with open("/tmp/stress_r9b.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
