"""Declared queries: model-evaluation metrics family (qml*) — the
measurement half of the training-data pipeline. Every curation /
retrieval / feature operator in §2.11 produces something a team
evaluates with exactly these three reports:

- qml1 classification report (per-class precision/recall/F1 +
  accuracy + macro-F1) over the qta1 language-ID predictions vs the
  labeled `lang` column;
- qml2 ranking metrics (MRR, precision@k, NDCG@k with binary
  relevance) over the ql3-style cosine ranking vs embedding labels;
- qml3 regression metrics (MAE, RMSE, R²) of the qdz3 target-encoded
  predictor against actual order totals.

All three are aggregations over joins of existing declared-operator
outputs — mergeable, one or two shuffles, driver-tiny results — so
evaluation at 100 TB costs what the underlying prediction pass costs.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sora_spark.catalog import tables
from sora_spark.llm import textstats
from sora_spark.queries.registry import query

_LEX_VALUES = ", ".join(
    f"('{tok}', '{lang}')" for tok, lang in textstats.STOPWORDS
)


@query(
    "qml1_classification_report",
    oracle=f"""
WITH lex(tok, lang_cand) AS (VALUES {_LEX_VALUES}),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
hits AS (SELECT doc_id, lang_cand, count(*) AS n_hits
         FROM tok JOIN lex USING (tok) GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n_hits DESC, lang_cand) AS rn
      FROM hits),
pred AS (SELECT d.doc_id, d.lang AS y, r.lang_cand AS yhat
         FROM documents d JOIN r ON r.doc_id = d.doc_id AND r.rn = 1),
cls AS (SELECT y AS label,
               count(*)::DOUBLE AS support,
               sum(CASE WHEN yhat = y THEN 1 ELSE 0 END)::DOUBLE AS tp
        FROM pred GROUP BY y),
pcol AS (SELECT yhat AS label, count(*)::DOUBLE AS n_pred FROM pred
         GROUP BY yhat),
j AS (SELECT cls.label, cls.support, cls.tp,
             coalesce(pcol.n_pred, 0) AS n_pred
      FROM cls LEFT JOIN pcol ON cls.label = pcol.label),
met AS (SELECT label, support,
               CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0 END AS prec,
               tp / support AS rec
        FROM j)
SELECT label, CAST(support AS BIGINT) AS support,
       round(prec, 6) AS precision,
       round(rec, 6) AS recall,
       round(CASE WHEN prec + rec > 0
                  THEN 2 * prec * rec / (prec + rec) ELSE 0 END, 6) AS f1
FROM met ORDER BY label
""",
    doc="qml1: per-class classification report — precision / recall / "
    "F1 / support of the qta1 language-ID heuristic against the "
    "labeled `lang` column (label spaces match by construction: the "
    "lexicon covers exactly the fixture's five languages). Built "
    "from ONE (true, pred) join: per-class tp from the truth "
    "grouping, predicted-count marginal from the prediction "
    "grouping, metrics as arithmetic over the |classes|-row "
    "contingency — the eval pass costs one prediction join at any "
    "scale. EVERY true class appears (left join from the truth "
    "marginal) with sklearn zero_division=0 semantics for classes "
    "the model never predicts — the first cut inner-joined the "
    "marginals and silently reported only predicted classes (1 of "
    "5 rows), which is exactly the degenerate-report bug this gate "
    "now pins.",
    tags=("eval", "classification", "metrics"),
)
def qml1_classification_report(spark, sf_dir):
    docs = tables(spark, sf_dir).documents
    preds = textstats.language_id(docs, spark).select(
        "doc_id", F.col("pred_lang").alias("yhat")
    )
    pairs = docs.select("doc_id", F.col("lang").alias("y")).join(
        preds, "doc_id"
    )
    cls = pairs.groupBy(F.col("y").alias("label")).agg(
        F.count("*").cast("double").alias("support"),
        F.sum(F.when(F.col("yhat") == F.col("y"), 1).otherwise(0))
        .cast("double")
        .alias("tp"),
    )
    pcol = pairs.groupBy(F.col("yhat").alias("label")).agg(
        F.count("*").cast("double").alias("n_pred")
    )
    j = cls.join(pcol, "label", "left").withColumn(
        "n_pred", F.coalesce("n_pred", F.lit(0.0))
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rec = F.col("tp") / F.col("support")
    f1 = F.when(
        prec + rec > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return (
        j.select(
            "label",
            F.col("support").cast("bigint").alias("support"),
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(f1, 6).alias("f1"),
        )
        .orderBy("label")
    )


@query(
    "qml2_ranking_metrics",
    oracle="""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
probes AS (SELECT vec_id AS pid, label AS plabel, v AS pv FROM e
           WHERE vec_id < 20),
scored AS (
  SELECT p.pid, p.plabel, e.vec_id, e.label,
         round(list_inner_product(e.v, p.pv)
               / (sqrt(list_inner_product(e.v, e.v))
                  * sqrt(list_inner_product(p.pv, p.pv))), 6) AS sim
  FROM e CROSS JOIN probes p WHERE e.vec_id != p.pid),
ranked AS (
  SELECT pid, plabel, label, sim,
         row_number() OVER (PARTITION BY pid
                            ORDER BY sim DESC, vec_id) AS rk
  FROM scored),
per AS (
  SELECT pid,
         min(CASE WHEN label = plabel THEN rk END) AS first_rel,
         sum(CASE WHEN rk <= 10 AND label = plabel THEN 1 ELSE 0 END)
           AS rel10,
         sum(CASE WHEN rk <= 10 AND label = plabel
                  THEN 1.0 / log2(rk + 1) ELSE 0 END) AS dcg10,
         sum(CASE WHEN rk <= 10 THEN 1.0 / log2(rk + 1) ELSE 0 END)
           AS idcg_cap
  FROM ranked GROUP BY pid)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       round(avg(CASE WHEN first_rel IS NOT NULL
                      THEN 1.0 / first_rel ELSE 0 END), 6) AS mrr,
       round(avg(rel10 / 10.0), 6) AS p_at_10,
       round(avg(dcg10 / idcg_cap), 6) AS ndcg_at_10
FROM per
""",
    doc="qml2: retrieval ranking metrics — MRR, precision@10, and "
    "NDCG@10 (binary relevance = same label as the probe) over "
    "cosine rankings for 20 probe vectors: the IR eval triple the "
    "ANN family (ql3/ql4/IVF) is ultimately judged by. Similarities "
    "are ROUNDED BEFORE ranking (the cross-engine boundary rule) "
    "with vec_id tiebreak; the ideal-DCG normalizer here is the "
    "fixed 10-slot cap (every probe's label has ≥10 corpus "
    "members, so cap = true IDCG — checked at authoring). Per-probe "
    "work is a broadcast-probe scored pass + a top-k window; the "
    "metric aggregate is |probes|-sized.",
    tags=("eval", "ranking", "metrics", "vector"),
)
def qml2_ranking_metrics(spark, sf_dir):
    from sora_spark.functions import vector

    emb = tables(spark, sf_dir).embeddings
    e = emb.select(
        "vec_id", "label", vector.to_double(F.col("embedding")).alias("v")
    )
    probes = (
        e.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("pid"),
            F.col("label").alias("plabel"),
            F.col("v").alias("pv"),
        )
    )
    scored = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            "plabel",
            "vec_id",
            "label",
            F.round(
                vector.dot(F.col("v"), F.col("pv"))
                / (vector.norm(F.col("v")) * vector.norm(F.col("pv"))),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("pid").orderBy(F.desc("sim"), "vec_id")
    ranked = scored.withColumn("rk", F.row_number().over(w))
    rel = F.col("label") == F.col("plabel")
    per = ranked.groupBy("pid").agg(
        F.min(F.when(rel, F.col("rk"))).alias("first_rel"),
        F.sum(F.when((F.col("rk") <= 10) & rel, 1).otherwise(0)).alias(
            "rel10"
        ),
        F.sum(
            F.when((F.col("rk") <= 10) & rel, 1.0 / F.log2(F.col("rk") + 1))
            .otherwise(0.0)
        ).alias("dcg10"),
        F.sum(
            F.when(F.col("rk") <= 10, 1.0 / F.log2(F.col("rk") + 1))
            .otherwise(0.0)
        ).alias("idcg_cap"),
    )
    return per.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.round(
            F.avg(
                F.when(
                    F.col("first_rel").isNotNull(), 1.0 / F.col("first_rel")
                ).otherwise(0.0)
            ),
            6,
        ).alias("mrr"),
        F.round(F.avg(F.col("rel10") / 10.0), 6).alias("p_at_10"),
        F.round(F.avg(F.col("dcg10") / F.col("idcg_cap")), 6).alias(
            "ndcg_at_10"
        ),
    )


@query(
    "qml3_regression_metrics",
    oracle="""
WITH g AS (SELECT avg(o_totalprice) AS gm FROM orders),
enc AS (SELECT o_orderpriority,
               (sum(o_totalprice) + 20.0 * max(g.gm))
                 / (count(*) + 20.0) AS yhat
        FROM orders CROSS JOIN g GROUP BY o_orderpriority, g.gm),
p AS (SELECT o.o_totalprice AS y, enc.yhat
      FROM orders o JOIN enc ON o.o_orderpriority = enc.o_orderpriority),
m AS (SELECT avg(y) AS ybar FROM p)
SELECT CAST(count(*) AS BIGINT) AS n,
       round(avg(abs(y - yhat)), 4) AS mae,
       round(sqrt(avg((y - yhat) * (y - yhat))), 4) AS rmse,
       round(1 - sum((y - yhat) * (y - yhat))
               / sum((y - m.ybar) * (y - m.ybar)), 6) AS r2
FROM p CROSS JOIN m
""",
    doc="qml3: regression metrics — MAE, RMSE, R² of the qdz3 "
    "smoothed target encoder used as a predictor of order totals "
    "(the leakage-prone in-sample form, which is exactly what teams "
    "compute first and exactly why qcur10's split exists — stated "
    "in both docstrings). One encode aggregate broadcast back over "
    "the data, one residual aggregate: the eval is two shuffles "
    "total, every term mergeable. The near-zero R² the gate pins is "
    "itself the correct answer — priority class explains almost "
    "none of the price variance, and an encoder bug inflating R² "
    "would hash-fail.",
    tags=("eval", "regression", "metrics"),
)
def qml3_regression_metrics(spark, sf_dir):
    o = tables(spark, sf_dir).orders
    g = o.agg(F.avg("o_totalprice").alias("gm"))
    enc = (
        o.crossJoin(F.broadcast(g))
        .groupBy("o_orderpriority")
        .agg(
            (
                (F.sum("o_totalprice") + 20.0 * F.max("gm"))
                / (F.count("*") + 20.0)
            ).alias("yhat")
        )
    )
    p = o.select(
        "o_orderpriority", F.col("o_totalprice").alias("y")
    ).join(F.broadcast(enc), "o_orderpriority")
    m = p.agg(F.avg("y").alias("ybar"))
    resid = F.col("y") - F.col("yhat")
    dev = F.col("y") - F.col("ybar")
    return (
        p.crossJoin(F.broadcast(m))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg(F.abs(resid)), 4).alias("mae"),
            F.round(F.sqrt(F.avg(resid * resid)), 4).alias("rmse"),
            F.round(
                1 - F.sum(resid * resid) / F.sum(dev * dev), 6
            ).alias("r2"),
        )
    )


@query(
    "qml4_calibration_report",
    oracle="""
WITH lab AS (SELECT o_orderkey,
                    o_orderpriority AS prio, o_orderstatus AS stat,
                    month(o_orderdate) AS mon,
                    CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0.0 END AS y
             FROM orders),
train AS (SELECT prio, stat, mon,
                 sum(y) / count(*) AS score
          FROM lab WHERE o_orderkey % 2 = 0 GROUP BY prio, stat, mon),
test AS (SELECT l.y, t.score,
                least(CAST(floor(t.score * 10) AS INTEGER), 9) AS bin
         FROM lab l JOIN train t USING (prio, stat, mon)
         WHERE l.o_orderkey % 2 = 1),
b AS (SELECT bin, count(*)::BIGINT AS n,
             avg(score) AS conf, avg(y) AS acc
      FROM test GROUP BY bin)
SELECT bin, n, round(conf, 6) AS conf, round(acc, 6) AS acc,
       round(abs(conf - acc), 6) AS gap,
       round(sum(n * abs(conf - acc)) OVER () / sum(n) OVER (), 6) AS ece
FROM b ORDER BY bin
""",
    doc="qml4: probability-calibration report — reliability bins + "
    "expected calibration error (ECE) for a frequency predictor "
    "(per (priority, status, order-month) positive rate learned on "
    "the even-key "
    "half, evaluated on the odd-key half; positive = totalprice > "
    "150k). The fourth leg of the qml eval family: qml1 judges "
    "labels, qml2 rankings, qml3 point estimates — this row judges "
    "PROBABILITIES, the thing an LLM data pipeline's quality/"
    "filter scores actually are before a threshold is chosen. "
    "Scale shape: train pass and test pass are each one "
    "aggregation; the reliability table is <= 10 rows, ECE a "
    "window-sum over it — eval cost is two scans at any corpus "
    "size. Scores are exact integer ratios (sum/count of 0/1 in "
    "double), bins by floor(score*10) capped at 9, so both engines "
    "bin identically; only the display values round.",
    tags=("eval", "calibration", "metrics"),
)
def qml4_calibration_report(spark, sf_dir):
    orders = tables(spark, sf_dir).orders
    lab = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("stat"),
        F.month("o_orderdate").alias("mon"),
        F.when(F.col("o_totalprice") > 150000, 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    train = (
        lab.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy("prio", "stat", "mon")
        .agg((F.sum("y") / F.count("*")).alias("score"))
    )
    test = (
        lab.filter(F.col("o_orderkey") % 2 == 1)
        .join(F.broadcast(train), ["prio", "stat", "mon"])
        .select(
            "y",
            "score",
            F.least(
                F.floor(F.col("score") * 10).cast("int"), F.lit(9)
            ).alias("bin"),
        )
    )
    b = test.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("score").alias("conf"),
        F.avg("y").alias("acc"),
    )
    w = Window.partitionBy()
    gap = F.abs(F.col("conf") - F.col("acc"))
    return b.select(
        "bin",
        "n",
        F.round("conf", 6).alias("conf"),
        F.round("acc", 6).alias("acc"),
        F.round(gap, 6).alias("gap"),
        F.round(
            F.sum(F.col("n") * gap).over(w) / F.sum("n").over(w), 6
        ).alias("ece"),
    ).orderBy("bin")
