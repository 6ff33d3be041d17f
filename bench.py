"""Bench harness: runs the nine headline queries (B1–B9, BASELINE.md)
from the declared-query registry at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], twice each, and prints ONE JSON
line with warm (2nd-run) wall-clock seconds per query.

Gate (BASELINE.md): each warm time <= 2x the pyspark-stock warm column.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Keep Spark logs off stdout so the JSON line is the only output line.
os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")

BENCH_QUERIES = {
    "q1": "qa1_pricing_summary",
    "q2": "qj1_segment_revenue_topk",
    "q3": "qf2_selective_filter_sum",
    "q4": "qw1_topk_per_group",
    "q5": "qs1_tumbling_window",
    "q6": "ql3_cosine_topk",
    "q7": "ql5_wordcount_topk",
    "q8": "ql1_exact_dedup",
    "q9": "qj9_two_hop_count",
    # B10: the SORA iterative reduction loop (transitive-edge removal +
    # tip trim to fixpoint) on the FULL co-occurrence graph — the
    # engine's hardest path; per-round edge counts ride in the result row.
    "q10": "qg12_reduce_pipeline",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    from sora_spark.queries import REGISTRY
    from sora_spark.session import build_session

    spark = build_session(app_name="sora-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    warm: dict[str, float] = {}
    for key, name in BENCH_QUERIES.items():
        fn = REGISTRY[name].spark_fn
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        # warm = best post-cold run (run 1 pays codegen/JIT)
        warm[key] = round(min(times[1:]), 4)
        print(
            f"[bench] {key} {name}: cold={times[0]:.3f}s warm={warm[key]:.3f}s",
            file=sys.stderr,
        )

    total = round(sum(warm.values()), 4)
    print(json.dumps({
        "metric": "bench_warm_total",
        "value": total,
        "unit": "sec",
        "queries": warm,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
