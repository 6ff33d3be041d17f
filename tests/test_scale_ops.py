"""Scale-path operators: salted joins agree with plain joins; bucketed
tables co-locate their join (no shuffle exchange between scan and
join) — the 100 TB join strategies from SCALE.md, checked small.
"""

from __future__ import annotations

import contextlib
import io
import uuid

from pyspark.sql import functions as F

from sora_spark.catalog import tables
from sora_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark, sf_dir):
    t = tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey")
    part = t.part.select("p_partkey", "p_brand")
    plain = li.join(part, F.col("l_partkey") == F.col("p_partkey")).count()
    salted = salted_join(li, part, "l_partkey", "p_partkey", n_salts=4).count()
    assert salted == plain


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    t = tables(spark, sf_dir)
    suffix = uuid.uuid4().hex[:6]
    li_tbl, o_tbl = f"li_b_{suffix}", f"o_b_{suffix}"
    (
        t.lineitem.select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(li_tbl)
    )
    (
        t.orders.select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(o_tbl)
    )
    # no-default get: conf.get(key, None) returns None for a key that
    # was never EXPLICITLY set, so the finally-restore silently skipped
    # and the -1 leaked into later tests (latent until a non-alphabetical
    # test order exposed it, round 6)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(li_tbl).join(
            spark.table(o_tbl), F.col("l_orderkey") == F.col("o_orderkey")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("simple")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not re-shuffle:\n" + plan
        )
        # and it is still correct
        want = t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert j.count() == want
    finally:
        if old is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {li_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {o_tbl}")


def test_salted_join_rejects_replication_unsafe_how(spark):
    import pytest as _pt

    from sora_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "sk")
    for how in ("right", "full", "full_outer", "rightouter"):
        with _pt.raises(ValueError, match="unsupported"):
            salted_join(big, small, "k", "sk", how=how)


def test_replicated_graph_stress_round_bound(spark, sf_dir):
    """Scale-stress correctness on a deterministically blown-up graph
    (graph.derive.replicate_edges — disjoint shifted replicas of e_co):

    - two-phase CC round count must stay within the O(log n) bound and
      NOT grow with the replication factor (measured flat at 3 rounds
      from 1.2M to 12M edges at sf0.1, SCALE.md §scale-stress)
    - component count and reduction fixpoint of the replicated graph
      are exactly `factor` x the base graph's — a correctness oracle at
      sizes far beyond what a DuckDB recursive CTE can check.

    Runs at the suite's sf_dir (sf0.001 default, sf0.1 in the t2 tier);
    the 10x-sf0.1 stress numbers in SCALE.md come from this same path.
    """
    import math

    from sora_spark.catalog import tables as _tables
    from sora_spark.graph.derive import e_co, replicate_edges
    from sora_spark.graph.graph import Graph

    factor = 12
    base = e_co(_tables(spark, sf_dir).lineitem).localCheckpoint(eager=True)
    big = replicate_edges(base, factor).localCheckpoint(eager=True)
    assert big.count() == factor * base.count()

    stats_b, stats = {}, {}
    n_comp_base = (
        Graph(base)
        .connected_components_twophase(stats=stats_b)
        .select("component")
        .distinct()
        .count()
    )
    cc = Graph(big).connected_components_twophase(stats=stats)
    n_v = cc.count()
    assert cc.select("component").distinct().count() == factor * n_comp_base
    bound = math.ceil(math.log2(max(n_v, 2))) + 2
    assert stats["rounds"] <= bound, (
        f"two-phase rounds {stats['rounds']} exceed O(log n) bound {bound}"
    )
    # rounds must not grow with replication (disjoint copies contract
    # in parallel): allow +1 slack for degenerate tiny fixtures
    assert stats["rounds"] <= stats_b["rounds"] + 1

    r_stats_b, r_stats = {}, {}
    n_red_base = Graph(base).reduce_pipeline(stats=r_stats_b).count()
    n_red = Graph(big).reduce_pipeline(stats=r_stats).count()
    assert n_red == factor * n_red_base
    assert r_stats["rounds"] == r_stats_b["rounds"]


def test_replicated_assembly_pipeline_stress(spark, sf_dir):
    """qg16's composed assembly fixpoint (reduce → tips → bubbles) under
    replicate_edges stress: on `factor` disjoint shifted replicas the
    surviving edge count and unitig count must be exactly `factor` x
    the base graph's, and BOTH stage round counts must stay flat —
    replicas converge in parallel, so rounds are a property of the
    component structure, not the total edge count. This is the
    round-count-flat-at-scale evidence for the full §0.3 pipeline."""
    from sora_spark.catalog import tables as _tables
    from sora_spark.graph.derive import e_co_small, replicate_edges
    from sora_spark.graph.graph import Graph

    factor = 12
    base = e_co_small(
        _tables(spark, sf_dir).lineitem
    ).localCheckpoint(eager=True)
    big = replicate_edges(base, factor).localCheckpoint(eager=True)

    stats_b, stats = {}, {}
    fin_base = Graph(base).assembly_pipeline(max_iter=10, stats=stats_b)
    fin_big = Graph(big).assembly_pipeline(max_iter=10, stats=stats)
    assert fin_big.count() == factor * fin_base.count()
    assert stats["reduce_rounds"] == stats_b["reduce_rounds"]
    assert stats["bubble_rounds"] == stats_b["bubble_rounds"]

    uni_base = Graph(Graph(fin_base).chain_edges()).compact_chains()
    uni_big = Graph(Graph(fin_big).chain_edges()).compact_chains()
    assert uni_big.count() == factor * uni_base.count()
    # per-replica structure is identical → the length histogram scales
    # exactly: every (length, n) bucket multiplies by `factor`
    hist_b = {
        r["length"]: r["n"]
        for r in uni_base.groupBy("length")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    hist = {
        r["length"]: r["n"]
        for r in uni_big.groupBy("length")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert hist == {k: factor * v for k, v in hist_b.items()}


def test_replicated_topo_and_lpa_invariance(spark, sf_dir):
    """Round-6 additions under replication stress: on `factor` disjoint
    shifted replicas of the read-overlap DAG,

    - topological depth must be IDENTICAL to the base graph's (depth is
      structural, not data-sized — the qg27 scale claim), with exactly
      factor x vertices per level histogram;
    - label propagation must produce factor x the base community-size
      histogram (labels are min-vertex-relative, so replicas mirror the
      base up to the deterministic id shift).
    """
    from sora_spark.catalog import tables as _tables
    from sora_spark.graph.derive import replicate_edges
    from sora_spark.graph.graph import Graph
    from sora_spark.graph.overlap import derive_reads, overlap_edges

    factor = 5
    docs = _tables(spark, sf_dir).documents
    base = overlap_edges(derive_reads(docs)).localCheckpoint(eager=True)
    big = replicate_edges(base, factor).localCheckpoint(eager=True)

    sb, s = {}, {}
    hist_b = {
        r["level"]: r["n"]
        for r in Graph(base)
        .topological_levels(stats=sb)
        .groupBy("level")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    hist = {
        r["level"]: r["n"]
        for r in Graph(big)
        .topological_levels(stats=s)
        .groupBy("level")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert s["depth"] == sb["depth"], "depth must not grow with volume"
    assert hist == {lv: factor * n for lv, n in hist_b.items()}

    sizes_b = sorted(
        r["n"]
        for r in Graph(base)
        .label_propagation(n_rounds=2)
        .groupBy("lab")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    sizes = sorted(
        r["n"]
        for r in Graph(big)
        .label_propagation(n_rounds=2)
        .groupBy("lab")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sizes == sorted(sizes_b * factor)


def test_replicated_weighted_msf_and_sssp_stress(spark, sf_dir):
    """Weight-aware replicate_edges stress (VERDICT r06 item 7): the
    weight column rides through replication UNCHANGED, so weighted
    invariants replicate exactly instead of each replica getting a
    different id-derived weight distribution.

    - MSF: the (w, s, d)-order forest of `factor` disjoint replicas is
      `factor` shifted copies of the base forest (a constant id shift
      preserves the within-replica tie-break order): edge count and
      total weight scale exactly, Borůvka round count stays FLAT
      (replicas contract in parallel).
    - SSSP: with one source per replica (base source + shift), every
      replica's distance map equals the base graph's after un-shifting
      — real weights, not unit hops, exercised at 12x volume.
    """
    from sora_spark.graph.derive import e_co_small, replicate_edges
    from sora_spark.graph.graph import Graph

    factor = 12
    base = (
        e_co_small(tables(spark, sf_dir).lineitem)
        .withColumn("w", (1 + (F.col("s") + F.col("d")) % 3).cast("double"))
        .localCheckpoint(eager=True)
    )
    stride = base.select(
        (F.greatest(F.max("s"), F.max("d")) + 1).alias("m")
    ).first()["m"]
    big = replicate_edges(base, factor).localCheckpoint(eager=True)

    # weights preserved: per-replica weight multiset == base multiset
    wb = sorted(r["w"] for r in base.select("w").collect())
    w0 = sorted(
        r["w"] for r in big.filter(F.col("s") < stride).select("w").collect()
    )
    assert w0 == wb, "replica 0 must carry the base weight distribution"

    sb, s = {}, {}
    msf_b = Graph(base).minimum_spanning_forest(stats=sb)
    msf = Graph(big).minimum_spanning_forest(stats=s)
    n_b, w_sum_b = msf_b.agg(
        F.count("*").alias("n"), F.sum("w").alias("tw")
    ).first()
    n, w_sum = msf.agg(
        F.count("*").alias("n"), F.sum("w").alias("tw")
    ).first()
    assert n == factor * n_b
    assert abs(w_sum - factor * w_sum_b) < 1e-6
    assert s["rounds"] == sb["rounds"], "Borůvka rounds must stay flat"
    # the big forest IS factor shifted copies of the base forest
    fb = sorted(map(tuple, msf_b.select("s", "d", "w").collect()))
    f0 = sorted(
        map(
            tuple,
            msf.filter(F.col("s") < stride).select("s", "d", "w").collect(),
        )
    )
    assert f0 == fb

    # SSSP with one source per replica: distances replicate exactly
    src_b = base.agg(F.min("s").alias("v"))
    min_s = src_b.first()["v"]
    srcs = spark.range(factor).select(
        (F.lit(min_s) + F.col("id") * stride).alias("v")
    )
    dist_b = {
        r["v"]: r["dist"]
        for r in Graph(base)
        .shortest_paths(src_b, weight_col="w", max_iter=15)
        .collect()
    }
    got = Graph(big).shortest_paths(srcs, weight_col="w", max_iter=15)
    rows = got.collect()
    assert len(rows) == factor * len(dist_b)
    for r in rows:
        rep = r["v"] // stride
        assert dist_b[r["v"] - rep * stride] == r["dist"]


def test_replicated_scc_and_ktruss_stress(spark, sf_dir):
    """Round-7 graph fixpoints under replicate_edges stress: on
    `factor` disjoint shifted replicas,

    - SCC must produce exactly factor x the base SCC-size histogram
      with the OUTER round count flat (replicas peel in parallel —
      condensation depth is structural, not data-sized);
    - k-truss must produce factor x the base support histogram with
      flat peel rounds (support is intra-replica: a constant id shift
      cannot create or destroy triangles).
    """
    from sora_spark.graph.derive import (
        e_co_small,
        e_dir_small,
        replicate_edges,
    )
    from sora_spark.graph.graph import Graph

    factor = 6
    li = tables(spark, sf_dir).lineitem

    base_d = e_dir_small(li).localCheckpoint(eager=True)
    big_d = replicate_edges(base_d, factor).localCheckpoint(eager=True)
    sb, s = {}, {}

    def scc_hist(edges, st):
        scc = Graph(edges).strongly_connected_components(stats=st)
        return {
            r["sz"]: r["n"]
            for r in scc.groupBy("component")
            .agg(F.count("*").alias("sz"))
            .groupBy("sz")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    hb = scc_hist(base_d, sb)
    h = scc_hist(big_d, s)
    assert h == {k: factor * v for k, v in hb.items()}
    assert s["rounds"] == sb["rounds"], "SCC rounds must stay flat"

    base_u = e_co_small(li).localCheckpoint(eager=True)
    big_u = replicate_edges(base_u, factor).localCheckpoint(eager=True)
    tb, t = {}, {}

    def truss_hist(edges, st):
        tr = Graph(edges).k_truss(k=5, stats=st)
        return {
            r["support"]: r["n"]
            for r in tr.groupBy("support")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    thb = truss_hist(base_u, tb)
    th = truss_hist(big_u, t)
    assert th == {k: factor * v for k, v in thb.items()}
    assert t["rounds"] == tb["rounds"], "truss peel rounds must stay flat"


def test_replicated_bpe_and_kmeans_invariance(spark, sf_dir):
    """Exact-replication invariance for the round-7 iterative ML ops:

    - BPE: duplicating every document k times multiplies every pair
      count by exactly k and changes NO argmax, so the learned merge
      sequence is identical and each weighted count is exactly k×.
      (Real dedup motivation inverted: duplicated data doesn't change
      WHAT the tokenizer learns, only how confident the counts look.)
    - k-means: replicas of the same 4 lowest-id vectors seed identical
      centroids (ids shift, vectors repeat), every Lloyd mean is a
      k-fold repeat of the base mean, so final assignment counts are
      exactly k× per cluster.
    Both pin that the iteration logic depends on the data DISTRIBUTION,
    not the row multiset size — the property that makes the operators
    meaningful at 100 TB."""
    from sora_spark.llm import ann, bpe

    k = 4
    docs = tables(spark, sf_dir).documents.select("doc_id", "text")
    big_docs = docs
    for i in range(1, k):
        big_docs = big_docs.union(
            docs.select(
                (F.col("doc_id") + F.lit(10**7 * i)).alias("doc_id"), "text"
            )
        )

    base_m, _ = bpe.train(bpe.word_counts(docs), 3)
    big_m, _ = bpe.train(bpe.word_counts(big_docs), 3)
    assert [(a, b) for a, b, _ in big_m] == [(a, b) for a, b, _ in base_m]
    assert [c for _, _, c in big_m] == [c * k for _, _, c in base_m]

    emb = tables(spark, sf_dir).embeddings.select("vec_id", "embedding")
    big_emb = emb
    for i in range(1, k):
        big_emb = big_emb.union(
            emb.select(
                (F.col("vec_id") + F.lit(10**7 * i)).alias("vec_id"),
                "embedding",
            )
        )
    def counts(corpus):
        cents = ann.kmeans_centroids(corpus, n_centroids=4, iters=1)
        dists = ann.centroid_distances(F.col("embedding"), cents)
        return {
            r.cid: r.n
            for r in corpus.select(
                F.array_position(dists, F.array_min(dists)).alias("cid")
            )
            .groupBy("cid")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    base_c, big_c = counts(emb), counts(big_emb)
    assert big_c == {cid: n * k for cid, n in base_c.items()}


def test_replicated_debruijn_stress(spark, sf_dir):
    """De Bruijn family (qg44/qg45) under corpus replication stress:
    the text is first NORMALIZED onto a closed 26-letter alphabet,
    then each replica maps that alphabet into its own disjoint
    26-character Unicode block (F.translate) — so the replicas'
    12-mer spaces are pairwise disjoint BY CONSTRUCTION (disjoint
    character sets, not the earlier rotation scheme, whose replicas
    could in principle share k-mers since rotation permutes the same
    alphabet — review finding) while every replica's graph stays
    isomorphic to the normalized base. This gives a correctness
    oracle at sizes past what the recursive-CTE oracle checks, plus
    the scale invariant that matters: pointer-doubling round count
    must NOT grow with corpus size (disjoint chains compact in
    parallel; rounds are O(log longest-chain), a per-replica
    property)."""
    from sora_spark.graph.graph import Graph
    from sora_spark.graph.overlap import de_bruijn_edges

    factor = 6
    alpha = "abcdefghijklmnopqrstuvwxyz"
    raw = tables(spark, sf_dir).documents.select("text", "n_chars")
    # closed alphabet: every character lands in a-z, so per-replica
    # translate covers the entire k-mer character domain
    docs = raw.select(
        F.regexp_replace(F.lower("text"), "[^a-z]", "x").alias("text"),
        "n_chars",
    )
    reps = []
    for r in range(factor):
        block = "".join(chr(0x100 + r * 26 + i) for i in range(26))
        reps.append(
            docs.select(F.translate("text", alpha, block).alias("text"), "n_chars")
        )
    big_docs = reps[0]
    for d in reps[1:]:
        big_docs = big_docs.unionByName(d)

    base_e = de_bruijn_edges(docs).localCheckpoint(eager=True)
    big_e = de_bruijn_edges(big_docs).localCheckpoint(eager=True)
    assert big_e.count() == factor * base_e.count()

    base_ce = Graph(base_e).chain_edges().localCheckpoint(eager=True)
    big_ce = Graph(big_e).chain_edges().localCheckpoint(eager=True)
    assert big_ce.count() == factor * base_ce.count()

    st_b, st = {}, {}
    base_u = Graph(base_ce).compact_chains(max_iter=12, stats=st_b)
    big_u = Graph(big_ce).compact_chains(max_iter=12, stats=st)
    base_hist = {
        r["length"]: r["n"]
        for r in base_u.groupBy("length")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    big_hist = {
        r["length"]: r["n"]
        for r in big_u.groupBy("length")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert big_hist == {k: factor * v for k, v in base_hist.items()}
    # disjoint replicas must not add doubling rounds
    assert st["rounds"] <= st_b["rounds"] + 1, (st, st_b)
