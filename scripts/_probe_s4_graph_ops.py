"""Session-4 A/B probe: times the declared queries affected by the
e_co explode-first expansion and the one-derivation graph rewrites
(vertex_ids/degrees/_sym_edges/CC-labels/one-shot cuts), with the
bench's deterministic status-store metrics next to the wall clock.

Full-size rows (sf0.1 e_co): qj9, qg1. Bounded rows (e_co_small):
qg5, qg4, qg4b, qg25, qg14, qg9, qg13, qg34. Protocol mirrors
bench.py: 1 cold + 3 warm, median warm, metrics deltas for warm runs.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/_probe_s4_graph_ops.py
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")

NAMES = [
    "qj9_two_hop_count",
    "qg1_degree_histogram",
    "qg5_transitive_reduction",
    "qg4_connected_components",
    "qg4b_connected_components_twophase",
    "qg25_label_propagation",
    "qg14_pagerank",
    "qg9_bfs_hops",
    "qg13_kcore",
    "qg34_ktruss",
]


def main() -> None:
    from bench import _median_metrics, _metrics_delta, _stage_totals
    from sora_spark.queries import REGISTRY
    from sora_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="s4-graph-probe",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in NAMES:
        fn = REGISTRY[name].spark_fn
        times, deltas = [], []
        for i in range(4):
            gc.collect()
            before = _stage_totals(spark) if i > 0 else None
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
            if i > 0:
                deltas.append(_metrics_delta(before, _stage_totals(spark)))
        m = _median_metrics(deltas)
        out[name] = {
            "warm_s": round(statistics.median(times[1:]), 3),
            "cold_s": round(times[0], 3),
            **m,
        }
        print(f"[probe] {name}: warm={out[name]['warm_s']}s "
              f"cpu={m['cpu_s']}s input={m['input_mb']}MB "
              f"shuf_w={m['shuffle_write_mb']}MB", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
