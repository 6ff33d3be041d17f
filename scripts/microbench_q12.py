"""One-off A/B microbench for qd5_neardup_clusters variants (r14 q12
investigation). Usage: python scripts/microbench_q12.py [label]
Runs 1 cold + 3 warm of the registry qd5 and prints the warm median.
Variant selection is by editing sora_spark/llm/dedup.py between runs —
this script only times whatever the current tree does.
"""
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "head"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sora_spark.queries import REGISTRY
    from sora_spark.session import build_session

    spark = build_session(app_name=f"q12-micro-{label}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = REGISTRY["qd5_neardup_clusters"].spark_fn
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
    print(
        f"{label}: cold={times[0]:.3f} warm_median="
        f"{statistics.median(times[1:]):.4f} runs={[round(t,3) for t in times]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
