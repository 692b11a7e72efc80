"""Round-9 stress: skew-join adjudication (r8 VERDICT item 5).

The r8 verdict noted join_skew_salted exists but no SCALE row measures
salted-vs-unsalted under an ACTUAL skewed key — the stress suite scaled
volume, not skew. This tool builds a Zipf-like fact table (one hot key
owning HOT_SHARE of all rows — the "one customer is 60% of traffic"
shape) against a dim side too large to broadcast sensibly, and times
the same shuffle join four ways in one session:

  baseline_uniform : same volume, uniform keys (what the planner thinks
                     it is getting) — the no-skew reference point
  skew_plain       : AQE skew mitigation OFF — the straggler: one
                     sort-merge task owns HOT_SHARE of the probe side
  skew_salted      : the join_skew_salted shape (fact salt = row-hash
                     % S, dim exploded S×) — the hot key spreads over
                     S reducers at the cost of an S× dim replica
  skew_aqe         : AQE skewJoin ON (runtime split of oversized
                     partitions) — Spark's own fix, measured beside
                     the explicit salt

Broadcast is disabled throughout (the contrast under test is shuffle
placement; a broadcast join has no reducer to skew). Output rows are
identical across channels (asserted), noop-materialized so nothing is
pruned. Writes /tmp/stress_r9.json; numbers land in SCALE.md.

Usage: python tools/stress_r9.py [n_fact_millions]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_cnpjs_spark.session import get_spark  # noqa: E402

HOT_SHARE = 0.6  # fraction of fact rows on the single hot key
N_KEYS = 200_000  # dim cardinality (too wide to pin one reducer wholly)
SALT = 32  # matches plans/layout.py join_skew_salted


def timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def mat(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    n_fact = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(app_name="stress-r9-skew")
    spark.sparkContext.setLogLevel("ERROR")
    # shuffle-join placement is the subject: no broadcast anywhere
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # fact: HOT_SHARE of rows on key 0, the rest uniform over N_KEYS
    skewed = (
        spark.range(n_fact)
        .select(
            F.when(
                F.pmod(F.col("id"), F.lit(100)) < F.lit(int(HOT_SHARE * 100)),
                F.lit(0),
            )
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
            .alias("key"),
            F.col("id").alias("v"),
        )
        .localCheckpoint()  # freeze the input so channels time the JOIN
    )
    uniform = (
        spark.range(n_fact)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(N_KEYS)).alias("key"),
            F.col("id").alias("v"),
        )
        .localCheckpoint()
    )
    dim = (
        spark.range(N_KEYS)
        .select(F.col("id").alias("key"), (F.col("id") * 7).alias("payload"))
        .localCheckpoint()
    )

    def plain(fact):
        return fact.join(dim, "key").select("key", "v", "payload")

    def salted(fact):
        f = fact.withColumn("__salt", F.pmod(F.xxhash64("v"), F.lit(SALT)).cast("int"))
        d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))))
        return f.join(d, ["key", "__salt"]).select("key", "v", "payload")

    out: dict[str, object] = {
        "n_fact": n_fact,
        "n_keys": N_KEYS,
        "hot_share": HOT_SHARE,
        "salt": SALT,
        "note": f"hot key carries {int(HOT_SHARE*100)}% of {n_fact} fact rows",
    }

    # row-identity across channels (cheap: counts; the oracle identity of
    # the salted form is already hash-proven by the registered key)
    n_plain = plain(skewed).count()
    n_salt = salted(skewed).count()
    assert n_plain == n_salt == n_fact, (n_plain, n_salt, n_fact)

    def set_skew_aqe(on: bool):
        v = "true" if on else "false"
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", v)
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", v)

    for name, fact, fn, skew_aqe in (
        ("baseline_uniform", uniform, plain, False),
        ("skew_plain", skewed, plain, False),
        ("skew_salted", skewed, salted, False),
        ("skew_aqe", skewed, plain, True),
    ):
        set_skew_aqe(skew_aqe)
        reps = [timed(lambda: mat(fn(fact))) for _ in range(3)]
        out[name] = {"reps": reps, "median": sorted(reps)[1]}
    set_skew_aqe(False)

    with open("/tmp/stress_r9.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
