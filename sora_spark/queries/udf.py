"""Declared queries: UDF/UDAF/UDTF surface (SURVEY §2.12).

The slow-path rules (SURVEY §4.2): Arrow-batched pandas UDFs over
row-at-a-time Python UDFs everywhere it matters; Q-U1 deliberately
runs BOTH against the same oracle to pin down identical semantics.
applyInPandas / grouped-agg / mapInPandas each get a declared query
whose oracle is the equivalent window/aggregate SQL.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from sora_spark.catalog import tables
from sora_spark.queries.registry import query


@query(
    "qu1_scalar_udf",
    oracle="""
SELECT p_partkey, reverse(p_name) AS rev_row, reverse(p_name) AS rev_arrow
FROM part ORDER BY p_partkey LIMIT 200
""",
    doc="Q-U1: the same string reversal via a row-at-a-time Python UDF "
    "AND an Arrow-batched pandas UDF; both must hash-match the builtin.",
    tags=("udf",),
)
def qu1_scalar_udf(spark, sf_dir):
    part = tables(spark, sf_dir).part

    @udf("string")
    def rev_row(s: str) -> str:
        return s[::-1] if s is not None else None

    @pandas_udf("string")
    def rev_arrow(s: pd.Series) -> pd.Series:
        return s.str[::-1]

    return (
        part.select(
            "p_partkey",
            rev_row("p_name").alias("rev_row"),
            rev_arrow("p_name").alias("rev_arrow"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


@query(
    "qu2_apply_in_pandas_zscore",
    oracle="""
SELECT c_custkey, c_mktsegment,
       round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS z
FROM customer ORDER BY c_custkey
""",
    doc="Q-U2: grouped-map applyInPandas — per-segment z-score "
    "normalization; oracle is the window-function formulation.",
    tags=("udf", "applyInPandas"),
)
def qu2_apply_in_pandas_zscore(spark, sf_dir):
    customer = tables(spark, sf_dir).customer

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        m, s = pdf["c_acctbal"].mean(), pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z": ((pdf["c_acctbal"] - m) / s).round(4),
            }
        )

    return (
        customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(zscore, "c_custkey bigint, c_mktsegment string, z double")
        .orderBy("c_custkey")
    )


@query(
    "qu3_grouped_agg_trimmed_mean",
    oracle="""
WITH r AS (
  SELECT c_mktsegment, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS ra,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey DESC) AS rd,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer)
SELECT c_mktsegment, round(avg(c_acctbal), 4) AS trimmed_mean
FROM r WHERE ra > n // 10 AND rd > n // 10
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    doc="Q-U3: grouped-agg pandas UDAF — 10%-trimmed mean of acctbal "
    "per segment; oracle trims by rank (tie order is irrelevant to the "
    "mean because equal values are interchangeable).",
    tags=("udf", "grouped-agg"),
)
def qu3_grouped_agg_trimmed_mean(spark, sf_dir):
    customer = tables(spark, sf_dir).customer

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values().reset_index(drop=True)
        k = len(s) // 10
        return round(float(s.iloc[k : len(s) - k].mean()), 4)

    return (
        customer.groupBy("c_mktsegment")
        .agg(trimmed_mean("c_acctbal").alias("trimmed_mean"))
        .orderBy("c_mktsegment")
    )


@query(
    "qu4_map_in_pandas_splitter",
    oracle="""
SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
FROM documents ORDER BY doc_id
""",
    doc="Q-U4: mapInPandas record-splitting table function — fan out "
    "documents to tokens in Arrow batches, then count per doc.",
    tags=("udf", "mapInPandas"),
)
def qu4_map_in_pandas_splitter(spark, sf_dir):
    docs = tables(spark, sf_dir).documents

    def split_records(batches):
        # vectorized: one str.split + explode per Arrow batch — no
        # per-row Python loop (round-2 review finding). NULL text
        # yields zero token rows (dropna: pandas str.split maps a
        # missing value to NaN, which explode would otherwise keep as
        # a phantom (doc_id, NULL) token — round-4 review finding;
        # pinned by tests/test_capabilities.py NULL-text test).
        for pdf in batches:
            toks = (
                pdf.set_index("doc_id")["text"]
                .str.split(" ")
                .explode()
                .dropna()
            )
            yield pd.DataFrame(
                {"doc_id": toks.index, "token": toks.to_numpy()}
            )

    tokens = docs.select("doc_id", "text").mapInPandas(
        split_records, "doc_id bigint, token string"
    )
    return (
        tokens.groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_tokens"))
        .orderBy("doc_id")
    )


@query(
    "qu5_sql_udtf",
    oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
       max(tok) AS max_tok
FROM tok GROUP BY doc_id ORDER BY doc_id
""",
    doc="Spark 4 Python UDTF through the SQL surface: an @udtf class "
    "(generator eval, one row per token) registered via "
    "spark.udtf.register and invoked as `t, LATERAL split_words("
    "text)` — the real user-defined TABLE function API, distinct "
    "from qu4's mapInPandas UDTF-shape. Python split(' ') and DuckDB "
    "string_split keep empty strings identically, so the per-doc "
    "token/distinct/max aggregates hash-match. UDTF rows stream "
    "per-partition (no shuffle until the groupBy).",
    tags=("udf", "udtf", "sql"),
)
def qu5_sql_udtf(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class SplitWords:
        def eval(self, text: str):
            if text is not None:
                for i, t in enumerate(text.split(" ")):
                    yield (t, i)

    spark.udtf.register("split_words", SplitWords)
    tables(spark, sf_dir).register_views()
    return spark.sql(
        """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       CAST(count(DISTINCT s.tok) AS BIGINT) AS n_distinct,
       max(s.tok) AS max_tok
FROM documents, LATERAL split_words(text) s
GROUP BY doc_id ORDER BY doc_id
"""
    )


@query(
    "qu6_arrow_array_udf",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, list_transform(v, x ->
        x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS u FROM e)
SELECT vec_id,
       round(list_sum(u), 5) AS comp_sum,
       round(u[1], 6) AS first_comp,
       CAST(len(u) AS INT) AS dim
FROM n ORDER BY vec_id
""",
    doc="qu6: Arrow-batched pandas UDF with an ARRAY return type — L2 "
    "normalization computed IN PYTHON (numpy over Arrow batches, "
    "vectorized per batch) and hash-matched against the pure-SQL "
    "form. Certifies the array<double> Arrow serialization path both "
    "directions, the surface qu1-qu4 (scalar/grouped shapes) leave "
    "untested. Float parity holds because numpy and the JVM do the "
    "same IEEE ops; round(,5/6) absorbs summation-order slack.",
    tags=("udf", "arrow", "vector"),
)
def qu6_arrow_array_udf(spark, sf_dir):
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def l2_normalize(col: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for v in col:  # per-batch loop over rows of ndarray values
            a = np.asarray(v, dtype=np.float64)
            out.append(a / np.sqrt((a * a).sum()))
        return pd.Series(out)

    emb = tables(spark, sf_dir).embeddings
    u = l2_normalize(F.col("embedding").cast("array<double>"))
    return (
        emb.select("vec_id", u.alias("u"))
        .select(
            "vec_id",
            F.round(
                F.aggregate(F.col("u"), F.lit(0.0), lambda a, x: a + x), 5
            ).alias("comp_sum"),
            F.round(F.element_at("u", 1), 6).alias("first_comp"),
            F.size("u").cast("int").alias("dim"),
        )
        .orderBy("vec_id")
    )


@query(
    "qu7_map_in_arrow",
    oracle="""
SELECT doc_id, upper(substr(text, 1, 12)) AS head_upper,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id
""",
    doc="qu7: mapInArrow — the zero-copy RecordBatch path (one tier "
    "below mapInPandas: no pandas conversion at all; pyarrow.compute "
    "kernels run directly on the Arrow buffers Spark ships). The "
    "transform is deliberately oracle-expressible (upper/substr/"
    "length) so the gate certifies the BATCH PLUMBING — schema "
    "mapping, multi-batch iteration, column order — not exotic "
    "logic. This is the decode-stage shape for the multimodal "
    "family: qm4 gates Arrow decode via pandas; this pins the rawer "
    "API a 100 TB image pipeline would prefer (no per-batch "
    "DataFrame materialization).",
    tags=("udf", "arrow"),
)
def qu7_map_in_arrow(spark, sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = tables(spark, sf_dir).documents.select("doc_id", "text")

    def transform(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.utf8_upper(pc.utf8_slice_codeunits(text, 0, 12)),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                ["doc_id", "head_upper", "n_chars"],
            )

    return docs.mapInArrow(
        transform, "doc_id bigint, head_upper string, n_chars bigint"
    ).orderBy("doc_id")
