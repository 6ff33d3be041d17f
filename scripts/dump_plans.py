"""Dump .explain('formatted') for the bench-row queries (plus any
extra registry names passed on argv) to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [extra_query ...]
e.g.   python scripts/dump_plans.py r14 before qvq3_matryoshka_prefilter

Plan capture only analyzes/optimizes — no job runs — so it is safe to
run next to other work. B15/B16 need on-disk setup state; their plan
evidence is captured separately where they are optimized.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    extra = sys.argv[3:]

    from bench import BENCH_QUERIES
    from sora_spark.queries import REGISTRY
    from sora_spark.queries.graph_q import allow_uncalibrated_sf
    from sora_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = build_session(app_name="sora-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(BENCH_QUERIES.values()) + extra
    with allow_uncalibrated_sf():
        for name in names:
            fn = REGISTRY[name].spark_fn
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
            except Exception as e:  # fixpoint queries EXECUTE to build
                plan = f"(plan capture failed: {e})"
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
