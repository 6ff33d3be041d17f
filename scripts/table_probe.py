"""Commit-log table-format scale probe: measures the data-skipping
levers on a replicated sf0.1 orders fixture (the SCALE.md round-11
tables). Prints ONE JSON line:

  {"pruned_merge": {...}, "clustered_retrofit": {...}, ...}

Protocol (matches SCALE.md):
- 4.8M rows / ~650 MB: sf0.1 orders x32 into disjoint key spaces
  with a sha512 payload column.
- pruned_merge: 16 KEY-DISJOINT directories (ntile), key-narrow
  20k-row batch, merge with prune=True vs prune=False; results
  asserted row-identical.
- clustered_retrofit: 16 INTERLEAVED directories (k%16 — nothing
  prunable), the same narrow merge before clustering, one clustered
  OPTIMIZE, the merge again after; results asserted row-identical.

Run: PYTHONPATH=. python scripts/table_probe.py  (local[32], ~2 min)
"""
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sora_spark.sources import commit_log as cl  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    snap = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderdate").alias("ts"),
        F.sha2(F.concat(F.lit("pad"), F.col("o_orderkey")), 512)
        .alias("payload"),
    )
    REP, NB = 32, 16
    big = (
        snap.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))))
        .withColumn("k", F.col("k") + F.col("_r") * F.lit(10_000_000))
        .drop("_r")
        .withColumn(
            "payload", F.sha2(F.concat(F.col("payload"), F.col("k")), 512)
        )
        .persist()
    )
    n_rows = big.count()
    maxk = big.agg(F.max("k")).collect()[0][0]

    def batch():
        return big.filter(F.col("k") >= maxk - 20000).select(
            "k", "st", F.round(F.col("price") + 1, 2).alias("price"),
            "ts", "payload",
        )

    def entry(path, v):
        with open(os.path.join(path, "_commits", f"{v:08d}.json")) as f:
            return json.load(f)

    def frames_identical(a, b):
        # two empty exceptAll results already imply equal multisets
        return bool(a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty())

    def identical(path, v1, v2):
        return frames_identical(
            cl.read_table(spark, path, v1), cl.read_table(spark, path, v2)
        )

    out = {"n_rows": n_rows, "n_dirs": NB, "batch_rows": batch().count()}
    d = tempfile.mkdtemp()
    try:
        # --- pruned merge: key-disjoint layout
        p1 = os.path.join(d, "disjoint")
        tiled = big.withColumn("_t", F.ntile(NB).over(Window.orderBy("k")))
        cl.create_table(spark, p1, tiled.filter("_t = 1").drop("_t"),
                        stats_cols=["k"])
        for i in range(2, NB + 1):
            cl.append(spark, p1, tiled.filter(f"_t = {i}").drop("_t"),
                      stats_cols=["k"])
        # pristine 16-dir snapshot for the replace_where/rename probes
        # below (the merges about to run collapse p1 to one directory)
        p1_pristine = os.path.join(d, "disjoint_pristine")
        shutil.copytree(p1, p1_pristine)
        t0 = time.time()
        v = cl.merge_upsert(spark, p1, batch(), ["k"], "ts", prune=True)
        t_pruned = time.time() - t0
        t0 = time.time()
        v2 = cl.merge_upsert(spark, p1, batch(), ["k"], "ts", prune=False)
        t_full = time.time() - t0
        out["pruned_merge"] = {
            "pruned_s": round(t_pruned, 2), "full_s": round(t_full, 2),
            "speedup": round(t_full / t_pruned, 1),
            "dirs_rewritten": len(entry(p1, v)["removed"]),
            "dirs_pruned": entry(p1, v)["pruned_dirs"],
            "identical": identical(p1, v, v2),
        }

        # --- clustered retrofit: interleaved layout
        p2 = os.path.join(d, "interleaved")
        cl.create_table(spark, p2, big.filter(F.col("k") % NB == 0),
                        stats_cols=["k"])
        for i in range(1, NB):
            cl.append(spark, p2, big.filter(F.col("k") % NB == i),
                      stats_cols=["k"])
        # pristine interleaved snapshot: the merge-on-read lever below
        # needs the layout where stats pruning CANNOT help the rewrite
        p2_pristine = os.path.join(d, "interleaved_pristine")
        shutil.copytree(p2, p2_pristine)
        t0 = time.time()
        vb = cl.merge_upsert(spark, p2, batch(), ["k"], "ts")
        t_before = time.time() - t0
        t0 = time.time()
        vc = cl.compact(spark, p2, target_partitions=NB, cluster_by=["k"])
        t_cluster = time.time() - t0
        t0 = time.time()
        va = cl.merge_upsert(spark, p2, batch(), ["k"], "ts")
        t_after = time.time() - t0
        out["clustered_retrofit"] = {
            "merge_before_s": round(t_before, 2),
            "cluster_s": round(t_cluster, 2),
            "merge_after_s": round(t_after, 2),
            "speedup": round(t_before / t_after, 1),
            "buckets": len(entry(p2, vc)["added"]),
            "dirs_pruned_after": entry(p2, va)["pruned_dirs"],
            "identical": identical(p2, vb, va),
        }

        # --- deletion vectors vs rewrite (r12): the same selective
        # DELETE (k % 1000 = 0 — ~0.1% of rows, spread across EVERY
        # directory, the rewrite path's worst case) as a DV commit on
        # one copy of the table and a rewrite commit on another;
        # results asserted row-identical, then the DV read tax and the
        # compact that retires it
        p3 = os.path.join(d, "dv_copy")
        shutil.copytree(p2, p3)
        cond = "k % 1000 = 0"
        t0 = time.time()
        vdv = cl.delete_where(spark, p2, cond, deletion_vectors=True)
        t_dv = time.time() - t0
        t0 = time.time()
        vrw = cl.delete_where(spark, p3, cond)
        t_rw = time.time() - t0
        same = frames_identical(
            cl.read_table(spark, p2), cl.read_table(spark, p3))
        t0 = time.time()
        n_dv_read = cl.read_table(spark, p2).count()
        t_read_dv = time.time() - t0
        t0 = time.time()
        cl.compact(spark, p2, target_partitions=NB)
        t_compact = time.time() - t0
        t0 = time.time()
        n_clean_read = cl.read_table(spark, p2).count()
        t_read_clean = time.time() - t0
        edv, erw = entry(p2, vdv), entry(p3, vrw)
        out["dv_delete"] = {
            "dv_s": round(t_dv, 2), "rewrite_s": round(t_rw, 2),
            "speedup": round(t_rw / t_dv, 1),
            "dv_dirs_rewritten": len(edv["removed"]),
            "dv_rows": edv["dv_rows"],
            "rewrite_dirs_rewritten": len(erw["removed"]),
            "identical": same and n_dv_read == n_clean_read,
            "read_with_dv_s": round(t_read_dv, 2),
            "read_after_compact_s": round(t_read_clean, 2),
            "compact_s": round(t_compact, 2),
        }

        # --- shallow clone (r12): zero-copy of the ~650 MB table —
        # wall must be metadata-bound (links), reads identical
        p5 = os.path.join(d, "clone_dst")
        t0 = time.time()
        cl.clone_table(spark, p3, p5)
        t_clone = time.time() - t0
        na, nb_ = (cl.read_table(spark, p3).count(),
                   cl.read_table(spark, p5).count())
        out["shallow_clone"] = {
            "clone_s": round(t_clone, 2),
            "identical_counts": na == nb_,
            "rows": na,
        }

        # --- log checkpoint (r12): fold cost over a LONG history —
        # 400 data-less commits (the driver-side cost is log-bound,
        # not data-bound), state resolve with full fold vs
        # checkpoint + tail
        p6 = os.path.join(d, "longlog")
        cl.create_table(spark, p6, spark.range(1).selectExpr("id AS k"))
        for i in range(2, 402):
            cl._publish(p6, {"version": i, "operation": "append",
                             "added": [], "removed": []})
        t0 = time.time()
        for _ in range(5):
            cl._read_state_commits(p6)
        t_full_fold = (time.time() - t0) / 5
        cl.checkpoint_log(p6)
        t0 = time.time()
        for _ in range(5):
            st = cl._read_state_commits(p6)
        t_ckpt_fold = (time.time() - t0) / 5
        out["log_checkpoint"] = {
            "commits": 401,
            "full_fold_ms": round(t_full_fold * 1000, 1),
            "ckpt_fold_ms": round(t_ckpt_fold * 1000, 1),
            "speedup": round(t_full_fold / max(t_ckpt_fold, 1e-9), 1),
            "state_len_after_ckpt": len(st),
        }
        # --- replace_where (r12): predicate-scoped overwrite of the
        # top-20k key range on FRESH copies of the 16-dir key-disjoint
        # layout (p1 itself has been collapsed by the full merge above)
        # — one commit, only the containing directory rewritten + the
        # batch added; asserted identical to the two-commit
        # delete+append spelling
        p7 = os.path.join(d, "rw_one")
        p8 = os.path.join(d, "rw_two")
        shutil.copytree(p1_pristine, p7)
        shutil.copytree(p1_pristine, p8)
        rcond = f"k >= {maxk - 20000}"
        repl = batch().withColumn(
            "price", F.round(F.col("price") + 2, 2))
        t0 = time.time()
        vr = cl.replace_where(spark, p7, rcond, repl)
        t_replace = time.time() - t0
        t0 = time.time()
        cl.delete_where(spark, p8, rcond)
        cl.append(spark, p8, repl, stats_cols=["k"])
        t_two_step = time.time() - t0
        er = entry(p7, vr)
        out["replace_where"] = {
            "replace_s": round(t_replace, 2),
            "delete_plus_append_s": round(t_two_step, 2),
            "dirs_rewritten": len(er["removed"]),
            "dirs_pruned": er["pruned_dirs"],
            "identical": frames_identical(
                cl.read_table(spark, p7), cl.read_table(spark, p8)),
            "commits": 1,
        }

        # --- merge-on-read (r12): the same narrow upsert against the
        # INTERLEAVED layout — key stats span every directory, so the
        # rewrite merge must rewrite ALL of them; merge-on-read
        # touches zero. (On the key-disjoint layout the pruned
        # rewrite is already narrow and MOR has nothing to beat —
        # MOR is the lever for tables the layout cannot save.)
        p9 = os.path.join(d, "mor_copy")
        shutil.copytree(p2_pristine, p9)
        t0 = time.time()
        vmor = cl.merge_upsert(spark, p9, batch(), ["k"], "ts",
                               merge_on_read=True)
        t_mor = time.time() - t0
        emor = entry(p9, vmor)
        p10 = os.path.join(d, "mor_rw_copy")
        shutil.copytree(p2_pristine, p10)
        t0 = time.time()
        vrw2 = cl.merge_upsert(spark, p10, batch(), ["k"], "ts")
        t_rw2 = time.time() - t0
        out["merge_on_read"] = {
            "mor_s": round(t_mor, 2),
            "rewrite_merge_s": round(t_rw2, 2),
            "speedup": round(t_rw2 / t_mor, 1),
            "dirs_rewritten": len(emor["removed"]),
            "dv_rows": int(emor.get("dv_rows") or 0),
            "dirs_pruned": emor["pruned_dirs"],
            "identical": frames_identical(
                cl.read_table(spark, p9), cl.read_table(spark, p10)),
        }

        # --- DV-mode UPDATE (r13): the same selective UPDATE
        # (k % 1000 = 0 — spread across EVERY directory, the rewrite
        # path's worst case) as a deletion-vector commit vs the
        # rewrite on the interleaved layout; identical both DV-served
        # and post-compact, dirs_rewritten 0 vs N
        p11 = os.path.join(d, "upd_dv_copy")
        p12 = os.path.join(d, "upd_rw_copy")
        shutil.copytree(p2_pristine, p11)
        shutil.copytree(p2_pristine, p12)
        usets = {"price": "round(price + 1, 2)", "st": "'U'"}
        t0 = time.time()
        vud = cl.update_where(spark, p11, "k % 1000 = 0", usets,
                              merge_on_read=True)
        t_udv = time.time() - t0
        t0 = time.time()
        cl.update_where(spark, p12, "k % 1000 = 0", usets)
        t_urw = time.time() - t0
        eud = entry(p11, vud)
        same_dv = frames_identical(
            cl.read_table(spark, p11), cl.read_table(spark, p12))
        cl.compact(spark, p11, target_partitions=NB)
        same_compacted = frames_identical(
            cl.read_table(spark, p11), cl.read_table(spark, p12))
        out["dv_update"] = {
            "dv_s": round(t_udv, 2), "rewrite_s": round(t_urw, 2),
            "speedup": round(t_urw / t_udv, 1),
            "dv_dirs_rewritten": len(eud["removed"]),
            "dv_rows": int(eud.get("dv_rows") or 0),
            "rewrite_dirs_rewritten": len(
                entry(p12, cl.table_versions(p12)[-1])["removed"]),
            "identical": same_dv,
            "identical_after_compact": same_compacted,
        }

        # --- column mapping (r12): RENAME on the ~650 MB 16-dir
        # table is metadata-bound (one JSON), and the next key-pruned
        # merge still prunes through the map
        t0 = time.time()
        cl.rename_column(spark, p7, "price", "amount")
        t_rename = time.time() - t0
        t0 = time.time()
        vm = cl.merge_upsert(
            spark, p7,
            batch().withColumnRenamed("price", "amount"), ["k"], "ts")
        t_merge_renamed = time.time() - t0
        out["column_mapping"] = {
            "rename_s": round(t_rename, 3),
            "merge_after_rename_s": round(t_merge_renamed, 2),
            "dirs_pruned_after_rename": entry(p7, vm)["pruned_dirs"],
            "renamed_col_readable": bool(
                "amount" in cl.read_table(spark, p7).columns
            ),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
