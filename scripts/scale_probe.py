"""Scale-factor step-up probe (VERDICT r08 item 4).

Everything in the repo is calibrated at sf0.001/0.01/0.1; this script
empirically tests the asymptotic claims in SCALE.md by replicating
sf0.1 by an integer FACTOR into disjoint key spaces and re-running the
headline bench queries at both sizes on the same session.

Replication is real growth, not duplication: every key column is
shifted by `replica * stride` (stride = max key + 1, computed from the
data), so joins keep their selectivity shape — an R-times corpus has
R-times join output, not R^2. Dimension tables (nation/region) stay
single-copy, exactly as a 100 TB deployment would hold them.
`documents.text` gets a replica-unique one-token prefix for r > 0:
exact-dedup counts grow linearly while the replicas stay NEAR-dups of
each other, so the MinHash-LSH clustering path (q12) does real
cross-replica work — clusters grow R-wide and candidate pairs ~R^2 per
duplicate group, the stress the driver union-find bound exists for.

Output: one JSON line with, per query, median warm seconds at 1x and
at Rx, and the time ratio. The interesting read is ratio vs FACTOR:
scan-shaped queries should come in at or under FACTOR (fixed overheads
amortize), fixpoint queries should show FLAT round counts (rounds ride
in q10's result row and are printed to stderr).

Usage:
    python scripts/scale_probe.py                 # factor 10, all 13
    python scripts/scale_probe.py --factor 20 --queries q1,q5,q10

Generation uses DuckDB (no Spark needed to build the data) into
/tmp/sora_scale_probe/x{factor}; ~170 MB at factor 10. Regenerates
only if the directory is missing or --force is given.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dlog4j2.level=error")

BASE = "/root/testdata/sf0.1"

# key column -> stride domain; every replica r adds r*stride.
_SHIFTS = {
    "orders": [("o_orderkey", "ok"), ("o_custkey", "ck")],
    "lineitem": [
        ("l_orderkey", "ok"),
        ("l_partkey", "pk"),
        ("l_suppkey", "sk"),
    ],
    "customer": [("c_custkey", "ck")],
    "part": [("p_partkey", "pk")],
    "supplier": [("s_suppkey", "sk")],
    "events": [("event_id", "ek"), ("user_id", "uk")],
    "documents": [("doc_id", "dk")],
    "embeddings": [("vec_id", "vk")],
}
_DOMAIN_SRC = {
    "ok": ("orders", "o_orderkey"),
    "ck": ("customer", "c_custkey"),
    "pk": ("part", "p_partkey"),
    "sk": ("supplier", "s_suppkey"),
    "ek": ("events", "event_id"),
    "uk": ("events", "user_id"),
    "dk": ("documents", "doc_id"),
    "vk": ("embeddings", "vec_id"),
}
_DIMS = ("nation", "region")


def build(factor: int, out_dir: str, force: bool) -> None:
    import duckdb

    marker = os.path.join(out_dir, "_PROBE_OK")
    if os.path.exists(marker) and not force:
        print(f"[probe] reusing {out_dir}", file=sys.stderr)
        return
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    stride = {
        d: con.execute(
            f"SELECT max({c}) + 1 FROM read_parquet('{BASE}/{t}.parquet')"
        ).fetchone()[0]
        for d, (t, c) in _DOMAIN_SRC.items()
    }
    for t in _DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, shifts in _SHIFTS.items():
        shifted = {c: f"{c} + r.r * {stride[d]} AS {c}" for c, d in shifts}
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{BASE}/{t}.parquet')"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in shifted:
                sel.append(shifted[c])
            elif t == "documents" and c == "text":
                # replica-unique one-token prefix: replicas are exact-
                # distinct but near-duplicates of each other (see module
                # docstring); r=0 keeps the original text byte-exact.
                sel.append(
                    "CASE WHEN r.r = 0 THEN text "
                    "ELSE 'zrep' || r.r || ' ' || text END AS text"
                )
            elif t == "documents" and c == "n_chars":
                # keep n_chars == length(text) on replicas too: the
                # zrep prefix lengthens the text, so de Bruijn windows
                # and any n_chars-consistency metric would otherwise
                # drift on r > 0 rows (r09 ADVICE)
                sel.append(
                    "CASE WHEN r.r = 0 THEN n_chars "
                    "ELSE n_chars + length('zrep' || r.r || ' ') "
                    "END AS n_chars"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{BASE}/{t}.parquet') "
            f"CROSS JOIN range({factor}) r(r)) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"[probe] {t}: {n} rows", file=sys.stderr)
    with open(marker, "w") as f:
        f.write(str(factor))


def run_query(spark, fn, sf_dir: str, warm_runs: int) -> tuple[float, int]:
    import gc

    # drop the PREVIOUS query's localCheckpoint RDD refs before the
    # cold run too — the r10 full sweep OOMed in q10's cold run while
    # the block manager still held q1-q9's checkpoint blocks (the
    # warm-loop gc below only protects warm runs)
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    fn(spark, sf_dir).collect()  # cold
    times = []
    rows = 0
    for _ in range(warm_runs):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        rows = len(fn(spark, sf_dir).collect())
        times.append(time.monotonic() - t0)
    return statistics.median(times), rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--queries", default=None, help="comma list, e.g. q1,q10")
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    out_dir = f"/tmp/sora_scale_probe/x{args.factor}"
    build(args.factor, out_dir, args.force)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import BENCH_QUERIES
    from sora_spark.queries import REGISTRY
    from sora_spark.session import build_session

    # q15 (indexed ANN probe) lives outside BENCH_QUERIES — bench.py
    # special-cases it for setup — so include it explicitly in the
    # default sweep or a full probe run would silently skip it
    wanted = (
        {q.strip() for q in args.queries.split(",")}
        if args.queries
        else set(BENCH_QUERIES) | {"q15"}
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # the probe alternates TWO fixture scales in one session (base +
    # factor-N blocks, both sides' checkpoint blocks live at the
    # handover points), so it gets more heap than the 8g bench
    # default unless the caller pins SORA_DRIVER_MEMORY
    spark = build_session(
        app_name="sora-scale-probe",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SORA_DRIVER_MEMORY", "16g"
            ),
            # same one-JSON-line stdout contract as bench.py, higher
            # memory pressure: keep JVM unified logging (GCLocker
            # warnings) off stdout (r10 review finding)
            "spark.driver.extraJavaOptions": "-Xlog:all=warning:stderr",
        },
    )

    # scale runs never consult the unrolled oracles — scope off the
    # sf-calibration guard here (the r11 replacement for the
    # process-wide SORA_UNCALIBRATED_SF_OK env escape). The replicated
    # dirs (/tmp/sora_scale_probe/x{N}) don't match the sf-name regex
    # anyway; this covers probes pointed at sf-named fixtures too.
    # A real `with` block so the guard releases even when a probe run
    # raises mid-sweep (r11 review finding — the first version
    # documented a finally that did not exist).
    from sora_spark.queries.graph_q import allow_uncalibrated_sf

    results = {}
    with allow_uncalibrated_sf():
        for q, name in BENCH_QUERIES.items():
            if q not in wanted:
                continue
            fn = REGISTRY[name].spark_fn
            base_s, base_rows = run_query(spark, fn, BASE, args.warm)
            big_s, big_rows = run_query(spark, fn, out_dir, args.warm)
            ratio = big_s / base_s if base_s > 0 else float("inf")
            results[q] = {
                "name": name,
                "base_s": round(base_s, 3),
                "big_s": round(big_s, 3),
                "ratio": round(ratio, 2),
                "base_rows": base_rows,
                "big_rows": big_rows,
            }
            print(
                f"[probe] {q} {name}: {base_s:.2f}s -> {big_s:.2f}s "
                f"(x{ratio:.1f} at factor {args.factor}); "
                f"rows {base_rows} -> {big_rows}",
                file=sys.stderr,
            )
        # B15 (indexed ANN probe) runs outside BENCH_QUERIES because
        # it needs per-dir setup: write the IVF index for each corpus
        # size, then time the probe phase only (bench.py's q15
        # contract). The replicated corpus holds `factor` identical
        # copies of every vector, so probe results include the clones
        # at cosine 1.0 — throughput is the thing under test here,
        # recall is gated in bench.py and tests/test_llm.py.
        if "q15" in wanted:
            import shutil
            import tempfile

            from pyspark.sql import functions as F

            from sora_spark.llm import ann
            from sora_spark.queries.bench_core import tables

            timing = {}
            for tag, d in (("base", BASE), ("big", out_dir)):
                emb = tables(spark, d).embeddings
                probes = emb.filter(F.col("vec_id") % 10 == 0)
                ipath = tempfile.mkdtemp(prefix="sora_probe_ivf_") + "/index"
                try:
                    # bench.py's r14 scaled config: √N codebook at
                    # build, scan-budget n_probe derived once in setup
                    # — per-probe work then stays flat as the corpus
                    # grows, which is exactly the curve this probe
                    # measures (r13 verdict item 1)
                    n_vec = emb.count()
                    cb = ann.write_ivf_index(emb, ipath, iters=2)
                    np_ = ann.scaled_n_probe(len(cb), n_vec)
                    print(
                        f"[probe] q15 {tag}: N={n_vec} "
                        f"n_lists={len(cb)} n_probe={np_}",
                        file=sys.stderr,
                    )

                    def fn(s, _d, _p=ipath, _probes=probes, _np=np_):
                        return ann.ivf_topk_indexed(
                            s, _p, _probes, k=10, n_probe=_np
                        )

                    timing[tag] = run_query(spark, fn, d, args.warm)
                finally:
                    shutil.rmtree(os.path.dirname(ipath), ignore_errors=True)
            (base_s, base_rows) = timing["base"]
            (big_s, big_rows) = timing["big"]
            ratio = big_s / base_s if base_s > 0 else float("inf")
            results["q15"] = {
                "name": "ivf_topk_indexed",
                "base_s": round(base_s, 3),
                "big_s": round(big_s, 3),
                "ratio": round(ratio, 2),
                "base_rows": base_rows,
                "big_rows": big_rows,
            }
            print(
                f"[probe] q15 ivf_topk_indexed: {base_s:.2f}s -> "
                f"{big_s:.2f}s (x{ratio:.1f} at factor {args.factor}); "
                f"rows {base_rows} -> {big_rows}",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "scale_probe_warm_sec",
                "factor": args.factor,
                "base": BASE,
                "cpus": cpus,
                "queries": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
