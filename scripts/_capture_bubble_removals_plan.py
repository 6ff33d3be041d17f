"""One-off: operator-level plan evidence for Graph._bubble_removals (r14).

The qg16/qg20 top-level plan files start at the checkpointed edge RDD,
so the bubble-removal subplan is captured here standalone on a small
fixture — before (tp aggregated to (u, w, keep), tp re-derived and
probed against it) vs after (one tp derivation aggregated straight to
the doomed set via collect_set). Mirrors the chain_edges capture.
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

HEADER = """Operator-level plan evidence for Graph._bubble_removals (r14): the
final qg16/qg20 plan files start at the checkpointed edge RDD, so the
bubble-removal subplan is captured here standalone on a 4-edge bubble
fixture. Edge source is a localCheckpoint RDD, as in the assembly path.

"""


def explain_str(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def main() -> None:
    spark = build_session(app_name="sora-bubble-removals-plan")
    spark.sparkContext.setLogLevel("ERROR")
    edges = (
        spark.createDataFrame(
            [(1, 2), (1, 3), (2, 4), (3, 4)], "s long, d long"
        ).localCheckpoint()
    )
    g = Graph(edges)

    # -- before: tp aggregated to keep-table, tp re-derived and probed --
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    tp = e1.join(e2, F.col("e1.d") == F.col("e2.s")).select(
        F.col("e1.s").alias("u"),
        F.col("e1.d").alias("x"),
        F.col("e2.d").alias("w"),
    )
    bub = (
        tp.groupBy("u", "w")
        .agg(
            F.countDistinct("x").alias("n_mids"),
            F.min("x").alias("keep"),
        )
        .filter(F.col("n_mids") >= 2)
        .select("u", "w", "keep")
    )
    doomed = (
        tp.join(F.broadcast(bub), ["u", "w"])
        .filter(F.col("x") != F.col("keep"))
        .select("u", "x", "w")
    )
    before = (
        doomed.select(F.col("u").alias("s"), F.col("x").alias("d"))
        .union(doomed.select(F.col("x").alias("s"), F.col("w").alias("d")))
        .distinct()
    )

    after = g._bubble_removals(2)

    # The lazy cut hides the doomed derivation behind a checkpoint RDD
    # in `after`; capture the same code path with the cut neutralized
    # so the single tp derivation + collect_set aggregation is visible.
    g_nocut = Graph(edges)
    try:
        orig = Graph._cp_lazy
        Graph._cp_lazy = lambda self, df: df
        after_inline = g_nocut._bubble_removals(2)
    finally:
        Graph._cp_lazy = orig

    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name, df, label in (
        ("bubble_removals_operator_before.txt", before,
         "== pre-r14 formulation (keep-table + tp re-derived and probed) =="),
        ("bubble_removals_operator_after.txt", after,
         "== r14 formulation (one tp derivation, collect_set -> doomed, "
         "lazy cut) ==\n(the doomed subplan sits behind the checkpoint "
         "RDD here; see the _inline twin\nfor the same code path with "
         "the cut neutralized)"),
        ("bubble_removals_operator_after_inline.txt", after_inline,
         "== r14 formulation, lazy cut neutralized: the ONE tp "
         "derivation feeding\ncollect_set -> explode(doomed mids) — "
         "compare the before file's THREE\ntp join subtrees =="),
    ):
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write(HEADER + label + "\n" + explain_str(df))
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
