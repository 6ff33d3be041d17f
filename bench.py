"""Bench harness: runs the sixteen headline rows (B1–B16, BASELINE.md
— B1–B14 from the declared-query registry, B15/B16 as setup-bearing
hooks) at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], 1 cold + 3 warm runs each, and
prints ONE JSON line with the MEDIAN warm wall-clock seconds per query
(median, not min: the gate compares against a budget, and a median is
robust to one noisy run in either direction — round-2 finding on q1).

The JSON line carries provenance (git SHA, session conf, versions) so
cross-round comparisons can separate code changes from host drift.

Round-10 addition (r09 verdict task 1): per-query DETERMINISTIC
execution metrics next to wall-clock — shuffle read/write bytes,
input bytes and total task CPU seconds, read from the public
AppStatusStore (the same store that backs the monitoring REST API).
Shuffle/input bytes are load-independent for a fixed plan, so a
code-path regression shows up as a bytes/CPU delta even when the host
is noisy; two consecutive rounds of wall-clock drift arguments
(q2/q4/q11 in r08, q10/q12 in r09) end here.

Round-11 fix (r10 verdict task 1): exec_metrics do NOT ride in the
stdout JSON line. Putting them there in r10 grew the line past the
driver's tail capture, the line's FRONT was truncated off, and
BENCH_r10.json landed `parsed: null` — a whole round's official perf
signal lost to an oversized line. The stdout contract is again the
compact r09 shape (metric/value/queries/gates/sf/provenance, well
under 1 KB of payload); the deterministic metrics are written to a
SIDECAR file `$SPARK_GRAFT_METRICS_OUT` (default
`BENCH_METRICS.json` next to this script, git-tracked so each round's
snapshot preserves them) and echoed to stderr.
`"exec_metrics": {q: {shuffle_read_mb, shuffle_write_mb, input_mb,
cpu_s, run_s}}` (median of the 3 warm runs, bytes rounded to 0.01 MB).

Gate (BASELINE.md): each warm time <= 2x the pyspark-stock warm column.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import subprocess
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
    # B11: the full read-assembly pipeline (reads → overlap join →
    # reduce/tips/bubbles fixpoints → unitig compaction) — the engine's
    # signature operator on its native input shape. Budget derived the
    # B10 way from a stock-PySpark twin (benchmarks/stock_twin_b11.py,
    # output-identical, measured 2026-08-14: warm 15.97 s ⇒ budget
    # 31.9 s; engine ~8.2 s same-day).
    "q11": "qg20_read_assembly",
    # B12: end-to-end fuzzy-dedup clustering (MinHash → LSH bands →
    # candidate pairs → components → canonical) — the LLM curation
    # workhorse. Budget derived the B10/B11 way from a stock twin
    # (benchmarks/stock_twin_b12.py, output-identical at three SFs,
    # measured 2026-08-14: warm 4.15 s ⇒ budget 8.3 s). Adding the
    # row exposed a 4.8× engine regression (interpreted HOF minhash +
    # un-checkpointed pairs recomputed by the CC loop) — fixed to
    # ~2.9 s (0.69× stock) the same day; the row now guards it.
    "q12": "qd5_neardup_clusters",
    # B13: the de Bruijn assembly path (12-mer edges → chain subgraph →
    # pointer-doubling unitig compaction) — the second assembly
    # paradigm next to B11's overlap-layout-consensus. Budget derived
    # the B10..B12 way from a stock twin (benchmarks/stock_twin_b13.py,
    # output-identical at sf0.001/0.01 and row-identical at sf0.1,
    # naive one-step walk; measured 2026-08-14: warm 9.88 s ⇒ budget
    # 19.8 s; engine 8.17 s same-day, 0.83× stock — the doubling win is
    # bounded here because corpus chains are short, ≤ 20 edges).
    "q13": "qg45_debruijn_unitigs",
    # B14: corpus BPE tokenization (train 6 merges + encode + top-20
    # token totals) — the tokenizer-throughput path every training-data
    # pipeline pays. Budget derived the B10..B13 way from a stock twin
    # (benchmarks/stock_twin_b14.py, output-identical at sf0.001/0.01,
    # full-word-occurrence row-at-a-time Python UDF encode; measured
    # 2026-08-15: warm 4.89 s ⇒ budget 9.8 s; engine 3.82 s same-day,
    # 0.78× stock — both sides are train-bound at sf0.1; the engine's
    # vocab-sized-encode advantage widens as corpus/vocab grows).
    "q14": "qta20_bpe_encode",
}

# B15: indexed ANN probe (write_ivf_index -> ivf_topk_indexed, k=10)
# — the probe-side throughput of the on-disk IVF index, timed WITHOUT
# the index build (an index is written once, probed forever). Runs
# outside the registry loop because it needs setup (the index write +
# the exact answer for the recall gate). Budget derived the B10..B14
# way from a stock twin (benchmarks/stock_twin_b15.py, the exact
# brute-force scan a user runs when no index exists; measured
# 2026-08-15: warm 5.52 s => budget 11.0 s). B15 is deliberately NOT
# output-identical: the engine side is approximate by design, so the
# quality delta is gated IN the row — recall@10 vs the exact scan.
#
# CONFIG (r14, closing the r13 `weak`; r15 small-corpus clamp): the
# index is built at the scaled codebook default (√N capped so every
# list holds >= IVF_SCAN_ROWS rows) and probed at scaled_n_probe's
# ~1024-candidate budget — per-probe cost then stays flat as the
# corpus grows (total probe work linear, not quadratic; SCALEPROBE
# q15 is the measured curve). At sf0.1 (N=2000 -> 1 full list,
# n_probe 1) the probe is exhaustive/exact — r14's unclamped √N gave
# 45 lists of ~44 rows whose per-file/per-task overhead tripled the
# probe wall and ANTI-scaled with cores (the r14 verdict's one real
# bench regression); the 0.70 recall floor is trivially met at this N
# and starts binding once the clamp releases. HONESTY: this fixture's
# vectors are measured-isotropic (intra- and inter-label mean cosine
# both ~1e-5) — no partitioning beats the scan fraction on such data,
# and at larger corpora the shrinking scan FRACTION would shrink
# isotropic recall with it. Real embedding corpora have the cluster
# structure that sustains recall at small fractions; that claim is
# pinned where it is meaningful, on a clustered corpus, at these same
# scaled defaults: tests/test_llm.py::test_ivf_clustered_recall.
B15_RECALL_FLOOR = 0.70


def _stage_totals(spark) -> dict[str, float]:
    """Cumulative task metrics over every stage the status store retains.

    Reads the in-process AppStatusStore (public monitoring data — the
    identical numbers the /api/v1/.../stages REST endpoint serves) via
    py4j; the bench session raises spark.ui.retainedStages above the
    whole run's stage count so no stage is evicted between snapshots.
    The listener bus is drained first so the just-finished job's task
    metrics are fully posted before we read.
    """
    sc = spark.sparkContext
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty()
    except Exception:
        # best-effort drain: a backlogged bus that blows the no-arg
        # waitUntilEmpty timeout gets a full second, not 200ms — a
        # partial drain here silently shifts a run's metrics into the
        # NEXT run's delta (review finding)
        time.sleep(1.0)
    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    no_quantiles = sc._gateway.new_array(sc._gateway.jvm.double, 0)
    stages = store.stageList(empty, False, False, no_quantiles, empty)
    tot = {"shuffle_read": 0, "shuffle_write": 0, "input": 0,
           "cpu_ns": 0, "run_ms": 0, "n_stages": 0}
    it = stages.iterator()
    terminal = {"COMPLETE", "FAILED", "SKIPPED"}
    while it.hasNext():
        s = it.next()
        # terminal stages never change — cache their metrics so each
        # stage pays its 6 py4j getter round-trips ONCE per bench run
        # instead of once per snapshot (the naive loop is
        # O(total_stages^2) JVM traffic by the end of the run)
        key = (s.stageId(), s.attemptId())
        vals = _STAGE_CACHE.get(key)
        if vals is None:
            vals = (
                s.shuffleReadBytes(), s.shuffleWriteBytes(),
                s.inputBytes(), s.executorCpuTime(), s.executorRunTime(),
            )
            if str(s.status()) in terminal:
                _STAGE_CACHE[key] = vals
        tot["shuffle_read"] += vals[0]
        tot["shuffle_write"] += vals[1]
        tot["input"] += vals[2]
        tot["cpu_ns"] += vals[3]
        tot["run_ms"] += vals[4]
        tot["n_stages"] += 1
    return tot


_STAGE_CACHE: dict = {}


def _metrics_delta(before: dict, after: dict) -> dict[str, float]:
    mb = 1024.0 * 1024.0
    d = {
        "shuffle_read_mb": round((after["shuffle_read"] - before["shuffle_read"]) / mb, 2),
        "shuffle_write_mb": round((after["shuffle_write"] - before["shuffle_write"]) / mb, 2),
        "input_mb": round((after["input"] - before["input"]) / mb, 2),
        "cpu_s": round((after["cpu_ns"] - before["cpu_ns"]) / 1e9, 3),
        "run_s": round((after["run_ms"] - before["run_ms"]) / 1e3, 3),
    }
    if min(d.values()) < 0:
        # a negative delta means the status store EVICTED stages
        # between snapshots (retainedStages too low for this run) —
        # make it loud instead of poisoning the cross-round
        # comparisons these metrics exist for (review finding)
        print(
            f"[bench] WARNING: negative metric delta {d} — stage "
            f"eviction suspected (stages {before['n_stages']} -> "
            f"{after['n_stages']}); raise spark.ui.retainedStages",
            file=sys.stderr,
        )
        d["eviction_suspect"] = 1.0
    return d


def _median_metrics(deltas: list[dict]) -> dict[str, float]:
    keys = {k for d in deltas for k in d}  # eviction_suspect is sparse
    return {
        # the eviction flag must survive if ANY run tripped it — a
        # median would erase a single poisoned run (review finding)
        k: (max if k == "eviction_suspect" else
            lambda vs: round(statistics.median(vs), 3))(
            [d.get(k, 0.0) for d in deltas])
        for k in keys
    }


def _bench_q15(spark, sf_dir: str, warm: dict, gates: dict,
               exec_metrics: dict, n_runs: int = 4) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sora_spark.llm import ann
    from sora_spark.queries.bench_core import tables

    emb = tables(spark, sf_dir).embeddings
    probes = emb.filter(F.col("vec_id") % 10 == 0)
    path = tempfile.mkdtemp(prefix="sora_b15_ivf_") + "/index"
    try:
        # setup, untimed: one-time index write (√N codebook — the r13
        # verdict's scale fix; at sf0.1's 2000 vectors that is 45
        # lists) + the scan-budget n_probe derived ONCE here (config
        # derivation is not per-query cost) + the exact top-10 set
        # (same shape as the stock twin) for the recall gate
        n_vec = emb.count()
        cb = ann.write_ivf_index(emb, path, iters=2)
        n_probe = ann.scaled_n_probe(len(cb), n_vec)
        exact = {
            (r["probe_id"], r["neighbor_id"])
            for r in ann.brute_force_topk(emb, probes, k=10).collect()
        }
        times = []
        deltas = []
        rows = None
        for i in range(n_runs):
            gc.collect()
            before = _stage_totals(spark) if i > 0 else None
            t0 = time.perf_counter()
            rows = ann.ivf_topk_indexed(
                spark, path, probes, k=10, n_probe=n_probe
            ).collect()
            times.append(time.perf_counter() - t0)
            if i > 0:
                deltas.append(_metrics_delta(before, _stage_totals(spark)))
        warm["q15"] = round(statistics.median(times[1:]), 4)
        exec_metrics["q15"] = _median_metrics(deltas)
        got = {(r["probe_id"], r["neighbor_id"]) for r in rows}
        recall = round(len(exact & got) / len(exact), 4)
        gates["q15_recall_at_10"] = recall
        gates["q15_n_lists"] = len(cb)
        gates["q15_n_probe"] = n_probe
        gates["q15_scan_frac"] = round(n_probe / len(cb), 4)
        print(
            f"[bench] q15 ivf_topk_indexed: cold={times[0]:.3f}s "
            f"warm={warm['q15']:.3f}s recall@10={recall:.3f} "
            f"n_lists={len(cb)} n_probe={n_probe} "
            f"runs={[round(t, 3) for t in times[1:]]}",
            file=sys.stderr,
        )
        if recall < B15_RECALL_FLOOR:
            raise AssertionError(
                f"B15 recall {recall} below floor {B15_RECALL_FLOOR}"
            )
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def _bench_q16(spark, sf_dir: str, warm: dict, gates: dict,
               exec_metrics: dict, n_runs: int = 4) -> None:
    """B16: batch upsert into the table format (r12 verdict item 4 —
    the table format had probes but no round-over-round bench gate).
    Times merge_upsert(merge_on_read=True) of a ~table/100 batch into
    a fixed 16-directory commit-log table (the 4x-replicated lineitem
    fixture shared with the stock twin — 2.4M rows at sf0.1): stats
    pruning bounds the position scan to the key-overlapping
    directories and the deletion-vector path rewrites ZERO existing
    directories (gated in the row: q16_dirs_rewritten). The stock
    twin (benchmarks/stock_twin_b16.py) is the full-table overwrite
    merge a plain-parquet user runs for the same logical upsert;
    output identity is verified by benchmarks/verify_b16_identity.py.
    Table build is untimed (a table is written once, merged into
    forever); each timed run is merge + commit, then an untimed
    restore_table(base) resets the state so every run merges into
    the identical 16-dir snapshot."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from benchmarks.stock_twin_b16 import b16_batch, b16_snapshot
    from sora_spark.sources import commit_log as cl

    snap = b16_snapshot(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sora_b16_")
    path = f"{base}/table"
    try:
        # setup, untimed: 16 key-range directories with k-stats
        tiled = snap.withColumn(
            "_t", F.ntile(16).over(Window.orderBy("k"))
        ).localCheckpoint(eager=True)
        cl.create_table(spark, path, tiled.filter("_t = 1").drop("_t"),
                        stats_cols=["k"])
        for t in range(2, 17):
            cl.append(spark, path,
                      tiled.filter(f"_t = {t}").drop("_t"),
                      stats_cols=["k"])
        batch = b16_batch(spark, snap)
        base_v = cl.table_versions(path)[-1]

        times, deltas, entry = [], [], None
        for i in range(n_runs):
            gc.collect()
            before = _stage_totals(spark) if i > 0 else None
            t0 = time.perf_counter()
            v = cl.merge_upsert(spark, path, batch, ["k"], "ts",
                                merge_on_read=True)
            times.append(time.perf_counter() - t0)
            if i > 0:
                deltas.append(_metrics_delta(before, _stage_totals(spark)))
            entry = cl._read_commits(path, v)[-1]
            # untimed reset: O(metadata) rollback to the base snapshot
            cl.restore_table(spark, path, base_v)
        warm["q16"] = round(statistics.median(times[1:]), 4)
        exec_metrics["q16"] = _median_metrics(deltas)
        gates["q16_dirs_rewritten"] = len(entry["removed"])
        gates["q16_dirs_pruned"] = entry["pruned_dirs"]
        print(
            f"[bench] q16 mor_merge_16dir: cold={times[0]:.3f}s "
            f"warm={warm['q16']:.3f}s "
            f"rewritten={len(entry['removed'])} "
            f"pruned={entry['pruned_dirs']}/16 "
            f"runs={[round(t, 3) for t in times[1:]]}",
            file=sys.stderr,
        )
        if entry["removed"]:
            raise AssertionError(
                f"B16 merge rewrote {len(entry['removed'])} data "
                "directories; the merge-on-read contract is zero"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # total runs per query (1 cold + N-1 warm). The default 4 is the
    # gate protocol; the organic-sf1.0 scale run uses 2 (cold+warm) —
    # at 10x data the median-of-3 protocol would add ~20 min for a
    # table whose purpose is scale-shape, not gate precision.
    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4")), 2)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    from sora_spark.queries import REGISTRY
    from sora_spark.session import build_session

    spark = build_session(
        app_name="sora-bench",
        master=f"local[{cpus}]",
        # keep every stage of the whole bench run in the status store so
        # the per-query metric snapshots never lose stages to eviction
        # (r09 ended near stage 1600; 20k is ~12x headroom)
        extra_conf={
            "spark.ui.retainedStages": "20000",
            # JVM unified logging writes to STDOUT — under memory
            # pressure gc+alloc GCLocker warnings land in front of the
            # one-JSON-line contract (seen at organic sf1.0, r10);
            # route the JVM's log stream to stderr where the rest of
            # the bench chatter already lives
            "spark.driver.extraJavaOptions": "-Xlog:all=warning:stderr",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # SORA_ANALYZE=1: exercise the CBO feed path (external metastore
    # tables + ANALYZE ... FOR ALL COLUMNS) before benching. Off by
    # default: the declared queries read parquet paths directly, where
    # AQE owns the runtime re-planning; column stats matter for the
    # metastore/SQL entry at cluster scale (SCALE.md §CBO,
    # tests/test_plans.py::test_cbo_stats_change_join_plan).
    if os.environ.get("SORA_ANALYZE") == "1":
        from sora_spark.catalog import register_analyzed_tables

        register_analyzed_tables(spark, sf_dir)

    # bench never consults the truncation-sensitive unrolled oracles,
    # so the calibration guard may be scoped off HERE (and only here /
    # scale_probe): at organic-sf1.0 dirs the guarded queries
    # (qg20 etc.) would otherwise refuse to run. This replaces the
    # r10 SORA_UNCALIBRATED_SF_OK env escape, which was process-wide
    # and could leak into hash-gated runs (r10 ADVICE).
    from sora_spark.queries.graph_q import allow_uncalibrated_sf

    warm: dict[str, float] = {}
    exec_metrics: dict[str, dict] = {}
    gates: dict[str, float] = {}
    with allow_uncalibrated_sf():
        for key, name in BENCH_QUERIES.items():
            fn = REGISTRY[name].spark_fn
            times = []
            deltas = []
            for i in range(n_runs):
                # drop refs to the previous run's localCheckpoint RDDs
                # so ContextCleaner frees their blocks — otherwise
                # iterative queries (q10) accumulate block-manager
                # pressure across runs and warm runs come out SLOWER
                # than cold
                gc.collect()
                # metrics for the warm runs only, like the clock — the
                # cold run's before-snapshot would never be read
                before = _stage_totals(spark) if i > 0 else None
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                times.append(time.perf_counter() - t0)
                if i > 0:
                    deltas.append(
                        _metrics_delta(before, _stage_totals(spark)))
            # warm = median of the 3 post-cold runs (run 1 pays
            # codegen/JIT)
            warm[key] = round(statistics.median(times[1:]), 4)
            exec_metrics[key] = _median_metrics(deltas)
            print(
                f"[bench] {key} {name}: cold={times[0]:.3f}s "
                f"warm={warm[key]:.3f}s "
                f"runs={[round(t, 3) for t in times[1:]]} "
                f"cpu={exec_metrics[key]['cpu_s']}s "
                f"shuf_w={exec_metrics[key]['shuffle_write_mb']}MB",
                file=sys.stderr,
            )

        _bench_q15(spark, sf_dir, warm, gates, exec_metrics, n_runs)
        _bench_q16(spark, sf_dir, warm, gates, exec_metrics, n_runs)

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.abspath(__file__)),
        ).stdout.strip() or None
    except OSError:
        sha = None

    total = round(sum(warm.values()), 4)

    # Deterministic exec metrics go to a SIDECAR file + stderr, never
    # the stdout line (r10 lesson: the driver tail-captures stdout and
    # an oversized line loses its FRONT — the parseable part).
    metrics_out = os.environ.get(
        "SPARK_GRAFT_METRICS_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_METRICS.json"),
    )
    metrics_doc = {"sf": sf, "git_sha": None, "exec_metrics": exec_metrics}
    try:
        metrics_doc["git_sha"] = sha
        with open(metrics_out, "w") as f:
            json.dump(metrics_doc, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as e:
        print(f"[bench] WARNING: could not write {metrics_out}: {e}",
              file=sys.stderr)
    print(f"[bench] exec_metrics: {json.dumps(exec_metrics)}",
          file=sys.stderr)

    line = json.dumps({
        "metric": "bench_warm_total",
        "value": total,
        "unit": "sec",
        "queries": warm,
        "gates": gates,
        "sf": sf,
        "provenance": {
            "git_sha": sha,
            "warm_stat": f"median_of_{n_runs - 1}",
            "master": f"local[{cpus}]",
            "spark_version": spark.version,
            "python": sys.version.split()[0],
            "conf": {
                k: spark.conf.get(k, None)
                for k in (
                    "spark.sql.shuffle.partitions",
                    "spark.sql.adaptive.enabled",
                    "spark.sql.adaptive.coalescePartitions.enabled",
                    "spark.sql.files.maxPartitionBytes",
                    "spark.sql.execution.arrow.pyspark.enabled",
                    "spark.driver.memory",
                )
            },
        },
    })
    # Hard guard on the one-line stdout contract: the driver keeps a
    # bounded tail of stdout, so an oversized line loses its FRONT
    # (metric/value/queries) — exactly how BENCH_r10.json became
    # `parsed: null`. 4 KB is ~3x the current payload; anything new
    # that pushes past it belongs in the metrics sidecar, not here.
    if len(line) > 4096:
        raise AssertionError(
            f"bench stdout line is {len(line)} bytes (> 4096): move the "
            f"new payload to the BENCH_METRICS sidecar, not the "
            f"driver-parsed line"
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
