"""Session-4 plan capture for the operators this session touches:
e_co's pair expansion, degrees()/vertex_ids() one-scan forms and the
qg1/qg3 consumers. Analysis-only (no job runs). Bench-row snapshots in
plans/r14/ are NOT overwritten — this dumps only the named shapes.

Usage: python scripts/_dump_s4_plans.py <suffix>   # before | after
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r14")

    from sora_spark.catalog import tables
    from sora_spark.graph import Graph, e_co
    from sora_spark.queries import REGISTRY
    from sora_spark.session import build_session

    spark = build_session(app_name="sora-plan-dump-s4")
    spark.sparkContext.setLogLevel("ERROR")
    li = tables(spark, sf_dir).lineitem

    shapes = {
        "e_co_operator": lambda: e_co(li),
        "vertex_ids_operator": lambda: Graph(e_co(li)).vertex_ids(),
        "qg1_degree_histogram": lambda: REGISTRY[
            "qg1_degree_histogram"
        ].spark_fn(spark, sf_dir),
        "qg3_triangle_count": lambda: REGISTRY[
            "qg3_triangle_count"
        ].spark_fn(spark, sf_dir),
        "qj9_two_hop_count_s4": lambda: REGISTRY[
            "qj9_two_hop_count"
        ].spark_fn(spark, sf_dir),
    }
    for name, build in shapes.items():
        df = build()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
