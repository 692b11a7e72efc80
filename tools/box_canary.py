"""Box-speed canary: a FIXED Spark-free workload — numpy matmul +
DuckDB aggregate — whose cross-round movement measures the box, not the
engine (r9 drift adjudication; NOTES reading rule).

r10 (ADVICE r9 low #3): runs in its OWN process. Inside the long-lived
bench process the canary timing also reflected process state (resident
JVM heap, allocator fragmentation); a fresh subprocess measures only
box state, which is what tools/bench_compare.py normalizes by. The
WORKLOAD is byte-identical to the r9 in-process canary (same sizes,
same seed, same median-of-3) so the number stays comparable; the r9->
r10 process-context offset is measured once and recorded in NOTES.

Usage: python tools/box_canary.py
Prints one JSON line {"numpy_matmul_3072": sec, "duckdb_agg_30m": sec}.
"""

from __future__ import annotations

import json
import time


def box_canary() -> dict[str, float]:
    import duckdb
    import numpy as np

    def med3(fn) -> float:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(sorted(ts)[1], 4)

    rng = np.random.default_rng(42)
    a = rng.standard_normal((3072, 3072))
    matmul = med3(lambda: (a @ a).sum())
    con = duckdb.connect()
    duck = med3(
        lambda: con.execute(
            "SELECT count(DISTINCT i % 1000003), sum(i * 7 % 97) "
            "FROM range(30000000) t(i)"
        ).fetchall()
    )
    con.close()
    return {"numpy_matmul_3072": matmul, "duckdb_agg_30m": duck}


if __name__ == "__main__":
    print(json.dumps(box_canary()))
