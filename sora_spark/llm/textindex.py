"""On-disk POSTINGS-LIST text index — the text-search twin of the IVF
vector index (llm/ann.py write_ivf_index): build once, then serve
BM25 queries reading only the term buckets the query touches.

Layout: `<path>` holds the postings relation (term, doc_id, tf, dl)
Hive-partitioned by `_tb = pmod(xxhash64(term), n_buckets)`; document
length rides denormalized IN the posting (the Lucene norms-in-postings
trick), so scoring never joins a doc-length table. Sidecars:
`<path>_terms` (term, df — the corpus document frequencies) and
`<path>_consts` (n_docs, avgdl, n_buckets), both tiny coalesced
tables.

Query cost at 100 TB: a Q-term query reads <= Q of the n_buckets
partition directories (file-level partition pruning on `_tb`, exactly
the qix-IVF mechanism, plan-pinned in tests/test_plans.py) and pushes
`term IN (...)` into the parquet scan of those buckets; everything
after the scan is |matching postings| sized. The BM25 arithmetic is
bit-compatible with the from-scratch scorer (textstats.bm25_topk):
Lucene idf, same k1/b, per-term contributions rounded to 6dp before
the per-doc sum so float drift cannot reorder the top-k boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_text_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    positions: bool = False,
) -> None:
    """Materialize the postings index: one tokenize pass feeds both
    the (doc, term) tf aggregation and the per-doc lengths; postings
    land bucketed by term hash so queries prune whole directories.
    `positions=True` stores each posting's sorted in-doc position
    array (the positional index), enabling phrase/proximity queries
    straight from the index (`phrase_docs_indexed`) at the cost of
    one int per token of index size — the Lucene positions trade."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )
    if positions:
        tf = tok.groupBy("doc_id", "term").agg(
            F.sort_array(F.collect_list("pos")).alias("positions")
        ).withColumn("tf", F.size("positions").cast("bigint"))
    else:
        tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    postings = tf.join(dl, "doc_id").withColumn(
        "_tb", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
    )
    postings.write.partitionBy("_tb").mode("overwrite").parquet(path)
    # df = docs containing the term (tf is per-doc distinct already)
    tf.groupBy("term").agg(F.count("*").alias("df")).coalesce(
        1
    ).write.mode("overwrite").parquet(path + "_terms")
    # store the MERGEABLE moments (n_docs, sum_dl), not avgdl itself:
    # incremental appends then update the constants with exact integer
    # adds, and avgdl = sum_dl / n_docs is the same double the
    # from-scratch avg computes (sum-then-divide in both engines)
    dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.lit(n_buckets).alias("n_buckets"),
    ).coalesce(1).write.mode("overwrite").parquet(path + "_consts")


def bm25_topk_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Serve a BM25 query from the on-disk index → (doc_id, score),
    top_k best (score desc, id tiebreak) — same output contract and
    rounding discipline as textstats.bm25_topk, but reading only the
    query terms' hash buckets instead of the corpus."""
    terms = list(query_terms)
    consts = spark.read.parquet(path + "_consts").collect()[0]
    n_docs = int(consts["n_docs"])
    avgdl = float(consts["sum_dl"]) / n_docs
    nb = int(consts["n_buckets"])
    buckets = [
        r[0]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(nb)))
        .distinct()
        .collect()
    ]
    p = spark.read.parquet(path).filter(
        F.col("_tb").isin(buckets) & F.col("term").isin(terms)
    )
    dfreq = spark.read.parquet(path + "_terms").filter(
        F.col("term").isin(terms)
    )
    j = p.join(F.broadcast(dfreq), "term")
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    contrib = F.round(idf * norm, 6)
    return (
        j.groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(top_k)
    )


def append_to_text_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Incrementally ingest NEW documents into an existing postings
    index: their postings land as extra part-files inside the
    existing term-bucket partitions (same hash, same layout — the
    append_to_ivf_index shape), and the df/consts sidecars are
    updated with exact integer merges (df adds per term; the
    constants' mergeable moments add), so served scores are
    IDENTICAL to a full rebuild over the union.

    CONTRACT: appended doc_ids must be NEW — a doc split across
    build and append would carry two partial (doc, term) postings
    and BM25 is nonlinear in tf. One tokenize pass over the new
    docs only; sidecar rewrites are term-count / 1-row sized."""
    spark = new_docs.sparkSession
    consts = spark.read.parquet(path + "_consts").collect()[0]
    nb = int(consts["n_buckets"])
    positional = "positions" in spark.read.parquet(path).columns
    tok = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )
    if positional:
        tf = tok.groupBy("doc_id", "term").agg(
            F.sort_array(F.collect_list("pos")).alias("positions")
        ).withColumn("tf", F.size("positions").cast("bigint"))
    else:
        tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tf.join(dl, "doc_id").withColumn(
        "_tb", F.pmod(F.xxhash64("term"), F.lit(nb))
    ).write.partitionBy("_tb").mode("append").parquet(path)

    new_df = tf.groupBy("term").agg(F.count("*").alias("df"))
    old_terms = spark.read.parquet(path + "_terms")
    merged = (
        old_terms.unionByName(new_df)
        .groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"))
        .coalesce(1)
        .localCheckpoint(eager=True)  # sever lineage from the file
    )
    merged.write.mode("overwrite").parquet(path + "_terms")
    add = dl.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    spark.createDataFrame(
        [(
            int(consts["n_docs"]) + int(add["n"]),
            int(consts["sum_dl"]) + int(add["s"]),
            nb,
        )],
        "n_docs BIGINT, sum_dl BIGINT, n_buckets INT",
    ).coalesce(1).write.mode("overwrite").parquet(path + "_consts")


def phrase_docs_indexed(
    spark,
    path: str,
    phrase_terms: list[str],
) -> DataFrame:
    """Exact-phrase matching served from a POSITIONAL index (built
    with positions=True) → the doc_ids containing the consecutive
    phrase. Reads only the phrase terms' hash buckets (same pruning
    as bm25_topk_indexed); the phrase check is the classic positional
    intersection — fold over terms keeping the candidate END
    positions: cand_{i+1} = (cand_i + 1) ∩ positions(term_{i+1}) —
    all JVM array functions, candidate-doc sized after the first
    join, no text rescard."""
    terms = list(phrase_terms)
    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 terms")
    consts = spark.read.parquet(path + "_consts").collect()[0]
    nb = int(consts["n_buckets"])
    buckets = [
        r[0]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(nb)))
        .distinct()
        .collect()
    ]
    p = spark.read.parquet(path).filter(
        F.col("_tb").isin(buckets) & F.col("term").isin(terms)
    )
    if "positions" not in p.columns:
        raise ValueError(
            "phrase_docs_indexed needs a POSITIONAL index — rebuild "
            "with write_text_index(..., positions=True)"
        )
    cur = p.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("positions").alias("_cand")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = p.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"_p{i}")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .withColumn(
                "_cand",
                F.array_intersect(
                    F.transform("_cand", lambda x: x + 1),
                    F.col(f"_p{i}"),
                ),
            )
            .filter(F.size("_cand") > 0)
            .select("doc_id", "_cand")
        )
    return cur.select("doc_id").orderBy("doc_id")
