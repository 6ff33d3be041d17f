"""One-off: operator-level plan evidence for Graph.chain_edges() (r14).

The qg45/qg20 top-level plan files start at the checkpointed edge RDD,
so the chain_edges subplan is captured here standalone on a small
fixture — before (two separate degree groupBys) vs after (one-pass
exploded degree aggregation). Mirrors the tips_operator capture.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")

from pyspark.sql import functions as F

from sora_spark.graph.graph import Graph
from sora_spark.session import build_session

HEADER = """Operator-level plan evidence for Graph.chain_edges() (r14): the
final qg45/qg20 plan files start at the checkpointed edge RDD, so the
chain_edges subplan is captured here standalone on a 4-edge fixture.
Edge source is a localCheckpoint RDD, as in the unitig/assembly paths.

"""


def explain_str(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def main() -> None:
    spark = build_session(app_name="sora-chain-edges-plan")
    spark.sparkContext.setLogLevel("ERROR")
    edges = (
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (2, 5)], "s long, d long"
        ).localCheckpoint()
    )

    # -- before: two separate degree groupBys (pre-r14 formulation) --
    out1 = (
        edges.groupBy("s")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") == 1)
        .select("s")
    )
    in1 = (
        edges.groupBy("d")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") == 1)
        .select("d")
    )
    before = (
        edges.join(out1, "s", "left_semi")
        .join(in1, "d", "left_semi")
        .select("s", "d")
    )

    after = Graph(edges).chain_edges()

    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name, df, label in (
        ("chain_edges_operator_before.txt", before,
         "== pre-r14 formulation (two degree groupBys) =="),
        ("chain_edges_operator_after.txt", after,
         "== r14 formulation (one-pass exploded degrees, lazy cut) =="),
    ):
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write(HEADER + label + "\n" + explain_str(df))
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
