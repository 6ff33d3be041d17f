"""The nine headline queries (B1–B9 in BASELINE.md), each a verified
cross-engine shape from SURVEY §2. These are both the bench set and
the first nine t2 contract rows (Q-A1, Q-J1, Q-F2, Q-W1, Q-S1, Q-L3,
Q-L5, Q-L1, Q-J9/Q-G2).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sora_spark.catalog import tables
from sora_spark.functions import vector
from sora_spark.graph import Graph, e_co
from sora_spark.graph.derive import E_CO_SQL
from sora_spark.queries.registry import query


@query(
    "qa1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="B1: TPC-H Q1-shape pricing summary — hash agg with map-side partials.",
    tags=("agg", "bench:q1"),
)
def qa1_pricing_summary(spark, sf_dir):
    # Built as ONE parameterized spark.sql call rather than ~30 py4j
    # expression constructions: same analyzed plan, but query-build
    # wall-clock drops ~15% — B1 is >90% driver-side overhead at
    # sf0.1 (BASELINE.md round-3 note), so construction cost IS the
    # hot path here.
    li = tables(spark, sf_dir).lineitem
    return spark.sql(
        """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM {li}
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        li=li,
    )


@query(
    "qj1_segment_revenue_topk",
    oracle="""
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    doc="B2: 3-way inner equi-join + agg + global top-10. customer side "
    "is small after the segment filter → AQE broadcasts it.",
    tags=("join", "bench:q2"),
)
def qj1_segment_revenue_topk(spark, sf_dir):
    t = tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    j = cust.join(t.orders, F.col("c_custkey") == F.col("o_custkey")).join(
        t.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    )
    return (
        j.groupBy("o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "qf2_selective_filter_sum",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="B3: selective conjunctive filter + scalar sum; predicates reach "
    "the parquet scan (PushedFilters).",
    tags=("filter", "bench:q3"),
)
def qf2_selective_filter_sum(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "qw1_topk_per_group",
    oracle="""
SELECT o_custkey, rn, o_orderkey, round(o_totalprice, 2) AS total
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
    doc="B4: row_number window + filter = top-3 orders per customer; one "
    "shuffle on the partition key.",
    tags=("window", "bench:q4"),
)
def qw1_topk_per_group(spark, sf_dir):
    orders = tables(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "rn",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
        )
        # no output sort: (o_custkey, rn) is already a unique key and the
        # correctness hash is order-insensitive; a global range-sort here
        # would only add an exchange.
    )


@query(
    "qs1_tumbling_window",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    doc="B5: tumbling 1-hour window agg over events (batch form of the "
    "streaming Q-S1; hour emitted as a formatted string in both engines "
    "to sidestep timestamp serialization drift).",
    tags=("streaming-batch", "bench:q5"),
)
def qs1_tumbling_window(spark, sf_dir):
    ev = tables(spark, sf_dir).events
    return (
        # group on the truncated timestamp, format only the output rows
        # (string-formatting the full scan would dominate the agg)
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("h", "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
        # no output sort: (hour, event_type) is a unique key; the
        # correctness hash is order-insensitive and a global sort of the
        # result would add a range exchange to the hot path.
    )


@query(
    "ql3_cosine_topk",
    oracle="""
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(p.embedding AS DOUBLE[])), 5) AS sim
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) p
WHERE e.vec_id <> 0
ORDER BY sim DESC, e.vec_id
LIMIT 10
""",
    doc="B6: brute-force cosine top-10 vs probe vec 0 — JVM-side "
    "zip_with/aggregate dot products, broadcast probe.",
    tags=("llm", "vector", "bench:q6"),
)
def ql3_cosine_topk(spark, sf_dir):
    emb = tables(spark, sf_dir).embeddings
    # probe norm precomputed ON THE BROADCAST SIDE (1-row project,
    # evaluated once at broadcast build): saves a 64-element aggregate
    # per corpus row vs vector.cosine's norm(a)*norm(b). Same float op
    # order as before — sqrt(aggregate(...)) over the same values —
    # so the rounded sim is bit-identical (round-6 q6 fix).
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe"),
        vector.norm(F.col("embedding")).alias("probe_norm"),
    )
    sim = vector.dot(F.col("embedding"), F.col("probe")) / (
        vector.norm(F.col("embedding")) * F.col("probe_norm")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", F.round(sim, 5).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


@query(
    "ql5_wordcount_topk",
    oracle="""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
""",
    doc="B7: tokenize + wordcount top-20 (explode is map-side; one "
    "shuffle for the count).",
    tags=("llm", "text", "bench:q7"),
)
def ql5_wordcount_topk(spark, sf_dir):
    docs = tables(spark, sf_dir).documents
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@query(
    "ql1_exact_dedup",
    oracle="""
SELECT count(DISTINCT text)                          AS n_distinct,
       count(DISTINCT md5(lower(trim(text))))        AS n_norm_distinct
FROM documents
""",
    doc="B8: exact dedup — raw distinct plus md5-normalized (lower/trim) "
    "fingerprint distinct.",
    tags=("llm", "dedup", "bench:q8"),
)
def ql1_exact_dedup(spark, sf_dir):
    docs = tables(spark, sf_dir).documents
    return docs.agg(
        F.countDistinct("text").alias("n_distinct"),
        F.countDistinct(F.md5(F.lower(F.trim(F.col("text"))))).alias("n_norm_distinct"),
    )


@query(
    "qj9_two_hop_count",
    oracle=f"""
WITH eco AS ({E_CO_SQL})
SELECT count(*) AS two_hop_count
FROM eco e1 JOIN eco e2 ON e1.d = e2.s
""",
    doc="B9 / Q-G2: 2-hop path count over the co-occurrence graph — "
    "double self-join; identical subplans on both sides let Spark reuse "
    "the shuffle exchange.",
    tags=("graph", "join", "bench:q9"),
)
def qj9_two_hop_count(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return Graph(e_co(li)).two_hop_count()
