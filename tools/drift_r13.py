"""DRIFT_r13 grid: adjudicate the r12 dedup-family driver-bench
regression (VERDICT r12 item #1).

The driver's BENCH_r12 battery measured dedup_minhash at 4.92 s median
(reps 7.00/4.92/2.81) vs 0.98 s in r11 and 1.01 s in the builder's
same-tree battery (LOCAL_BENCH_r12), with corpus_curate / dedup_simhash
/ dedup_cluster / dedup_embedding_lsh at 1.7-1.9x raw in the same
family. Both box canaries ran FASTER that round, so the normalized read
is 6.8x — the one weak mark of r12.

This grid is the prescribed adjudication shape (the q1/q18 precedent,
a6d85e4): canary-interleaved, N fresh processes x R reps, per key —
the same query at session age ~0 on today's box. Appends one JSON line
per probe to DRIFT_r13.jsonl with grid="dedup-family-adjudication".

Usage: python tools/drift_r13.py [procs] [reps] [keys...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "DRIFT_r13.jsonl")
GRID = "dedup-family-adjudication"


def append(obj: dict) -> None:
    obj["grid"] = GRID
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(json.dumps(obj), flush=True)


def canary() -> None:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "box_canary.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    append(
        {
            "key": "box_canary",
            "probe": json.loads(out.stdout.strip().splitlines()[-1]),
        }
    )


def isolated(key: str, reps: int, sf_dir: str) -> None:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "bench_isolated.py"),
            key,
            str(reps),
            sf_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    try:
        append(json.loads(out.stdout.strip().splitlines()[-1]))
    except Exception:
        append({"key": key, "error": out.stderr[-500:]})


def main() -> int:
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    keys = sys.argv[3:] or ["dedup_minhash", "corpus_curate"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for _ in range(procs):
        canary()
        for key in keys:
            isolated(key, reps, sf_dir)
    canary()
    return 0


if __name__ == "__main__":
    sys.exit(main())
