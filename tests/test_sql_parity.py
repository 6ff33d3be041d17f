"""SQL-string entry parity (VERDICT r08 item 6).

`Engine.sql` is the §3.2 entry point: users type Spark SQL over the
attached views instead of chaining DataFrames. The registry certifies
the DataFrame path against DuckDB; this file certifies that the SQL
STRING path produces value-identical results to the DataFrame twin for
a representative query per SURVEY §2 family — one test, parametrized
over 16 families (filter, agg, join, window, sort, setop, scalar,
streaming-batch, graph, llm-text, llm-dedup, and since r10: eval
metrics, timeseries, CDC diff, event analytics, feature encoding —
VERDICT r09 item 7).

Both sides run on the same SparkSession, so equality is exact tuple
equality after an order-insensitive sort (several twins deliberately
omit output sorts — the registry hash is order-insensitive and so is
this compare).
"""

from __future__ import annotations

import pytest

from sora_spark.engine import Engine
from sora_spark.queries import REGISTRY

# family -> (registry row, Spark-SQL text over the attached views)
PARITY = {
    "filter": (
        "qf2_selective_filter_sum",
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
    ),
    "agg": (
        "qa1_pricing_summary",
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                    AS sum_qty,
               round(sum(l_extendedprice), 2)               AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4)                    AS avg_qty,
               round(avg(l_extendedprice), 4)               AS avg_price,
               round(avg(l_discount), 4)                    AS avg_disc,
               count(*)                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
    ),
    "join": (
        "qj1_segment_revenue_topk",
        """
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """,
    ),
    "window": (
        "qw1_topk_per_group",
        """
        SELECT o_custkey, rn, o_orderkey, round(o_totalprice, 2) AS total
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) t
        WHERE rn <= 3
        """,
    ),
    "sort": (
        "qt1_sort_nulls_last",
        """
        SELECT l_orderkey, l_linenumber,
               round(nullif(l_discount, 0), 2) AS disc
        FROM lineitem
        ORDER BY disc DESC NULLS LAST, l_orderkey, l_linenumber
        LIMIT 100
        """,
    ),
    "setop": (
        "qso1_union_counts",
        """
        SELECT count(*) AS n_all, count(DISTINCT k) AS n_distinct
        FROM (SELECT c_nationkey AS k FROM customer
              UNION ALL SELECT s_nationkey FROM supplier)
        """,
    ),
    "scalar": (
        "qx1_string_functions",
        """
        SELECT p_partkey,
               concat(p_brand, '-', p_type)                  AS brand_type,
               substring(p_name, 1, 10)                      AS name10,
               upper(p_name)                                 AS uname,
               lower(p_type)                                 AS ltype,
               length(p_name)                                AS name_len,
               lpad(p_brand, 12, '*')                        AS padded,
               replace(p_type, 'O', '0')                     AS replaced,
               reverse(p_brand)                              AS rbrand,
               levenshtein(p_brand, 'Brand#10')              AS lev,
               regexp_extract(p_name, '([a-z]+)', 1)         AS first_word,
               regexp_replace(p_type, '[AEIOU]', '_')        AS devoweled,
               trim(concat(' ', p_name, ' '))                AS trimmed,
               split(p_name, ' ')[0]                         AS head_token
        FROM part ORDER BY p_partkey LIMIT 200
        """,
    ),
    "streaming-batch": (
        "qs1_tumbling_window",
        """
        SELECT date_format(h, 'yyyy-MM-dd HH:00:00') AS hour,
               event_type, n, sum_value
        FROM (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        )
        """,
    ),
    "graph": (
        "qj9_two_hop_count",
        """
        SELECT count(*) AS two_hop_count
        FROM e_co e1 JOIN e_co e2 ON e1.d = e2.s
        """,
    ),
    "llm-text": (
        "ql5_wordcount_topk",
        """
        SELECT word, count(*) AS n
        FROM (SELECT explode(split(text, ' ')) AS word FROM documents)
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 20
        """,
    ),
    "llm-dedup": (
        "ql1_exact_dedup",
        """
        SELECT count(DISTINCT text)                   AS n_distinct,
               count(DISTINCT md5(lower(trim(text)))) AS n_norm_distinct
        FROM documents
        """,
    ),
    # r10 extension (VERDICT r09 item 7): one family per remaining
    # SQL-expressible SURVEY group — eval metrics, timeseries, CDC
    # diff, event analytics, feature encoding. The lexicon VALUES for
    # the eval family is injected below from textstats.STOPWORDS so
    # both paths share one source of truth.
    "eval-metrics": (
        "qml1_classification_report",
        """
        WITH lex AS (SELECT * FROM VALUES {lex} AS t(tok, lang_cand)),
        tok AS (SELECT doc_id, explode(split(text, ' ')) AS tok
                FROM documents),
        hits AS (SELECT doc_id, lang_cand, count(*) AS n_hits
                 FROM tok JOIN lex USING (tok) GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY n_hits DESC, lang_cand) AS rn FROM hits),
        pred AS (SELECT d.doc_id, d.lang AS y, r.lang_cand AS yhat
                 FROM documents d
                 JOIN r ON r.doc_id = d.doc_id AND r.rn = 1),
        cls AS (SELECT y AS label, CAST(count(*) AS DOUBLE) AS support,
                       CAST(sum(CASE WHEN yhat = y THEN 1 ELSE 0 END)
                            AS DOUBLE) AS tp
                FROM pred GROUP BY y),
        pcol AS (SELECT yhat AS label, CAST(count(*) AS DOUBLE) AS n_pred
                 FROM pred GROUP BY yhat),
        j AS (SELECT cls.label, support, tp,
                     coalesce(n_pred, CAST(0 AS DOUBLE)) AS n_pred
              FROM cls LEFT JOIN pcol USING (label)),
        met AS (SELECT label, support,
                       CASE WHEN n_pred > 0 THEN tp / n_pred
                            ELSE 0.0 END AS prec,
                       tp / support AS rec
                FROM j)
        SELECT label, CAST(support AS BIGINT) AS support,
               round(prec, 6) AS precision, round(rec, 6) AS recall,
               round(CASE WHEN prec + rec > 0
                          THEN 2 * prec * rec / (prec + rec)
                          ELSE 0.0 END, 6) AS f1
        FROM met ORDER BY label
        """,
    ),
    "timeseries": (
        "qts4_dow_profile",
        """
        SELECT CAST(dow AS INT) AS dow,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT day) AS BIGINT) AS n_days,
               round(count(*) / count(DISTINCT day), 4) AS events_per_day,
               round(avg(value), 4) AS avg_value
        FROM (SELECT weekday(ts) + 1 AS dow,
                     date_trunc('day', ts) AS day, value
              FROM events)
        GROUP BY dow ORDER BY dow
        """,
    ),
    "cdc-diff": (
        "qdiff3_table_fingerprint",
        """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(conv(substring(hx, 1, 10), 16, 10)
                             AS BIGINT)) AS BIGINT) AS fp_lane1,
               CAST(sum(CAST(conv(substring(hx, 11, 10), 16, 10)
                             AS BIGINT)) AS BIGINT) AS fp_lane2,
               CAST(count(DISTINCT hx) AS BIGINT) AS n_distinct
        FROM (SELECT md5(concat_ws('|',
                         CAST(o_orderkey AS STRING),
                         CAST(o_custkey AS STRING),
                         o_orderstatus, o_orderpriority,
                         date_format(o_orderdate, 'yyyy-MM-dd'))) AS hx
              FROM orders)
        """,
    ),
    "event-analytics": (
        "qev8_stickiness",
        """
        WITH ud AS (SELECT DISTINCT user_id,
                           date_trunc('day', ts) AS day FROM events),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                FROM ud GROUP BY day),
        target AS (SELECT user_id,
                          explode(sequence(to_date(day),
                                           date_add(to_date(day), 6)))
                            AS tday
                   FROM ud),
        wau AS (SELECT tday, CAST(count(DISTINCT user_id) AS BIGINT)
                        AS wau
                FROM target GROUP BY tday)
        SELECT date_format(day, 'yyyy-MM-dd') AS day, dau, wau,
               round(dau / wau, 6) AS stickiness
        FROM dau JOIN wau ON to_date(day) = tday ORDER BY day
        """,
    ),
    "feature-encoding": (
        "qdz3_target_encoding",
        """
        WITH g AS (SELECT avg(o_totalprice) AS gm FROM orders),
        c AS (SELECT o_orderpriority AS priority,
                     CAST(count(*) AS DOUBLE) AS n,
                     sum(o_totalprice) AS s
              FROM orders GROUP BY o_orderpriority)
        SELECT priority, CAST(n AS BIGINT) AS n,
               round((s + 20.0 * gm) / (n + 20.0), 4) AS encoded,
               round(s / n - gm, 4) AS raw_lift
        FROM c CROSS JOIN g ORDER BY priority
        """,
    ),
}

# inject the shared lexicon into the eval-metrics SQL so both paths
# read textstats.STOPWORDS
from sora_spark.llm.textstats import STOPWORDS as _STOPWORDS  # noqa: E402

# escape single quotes SQL-style: a future stopword like "don't"
# would otherwise break the spliced VALUES list with a confusing
# parse error (r10 ADVICE)
_LEX = ", ".join(
    f"""('{t.replace("'", "''")}', '{lang.replace("'", "''")}')"""
    for t, lang in _STOPWORDS
)
PARITY["eval-metrics"] = (
    PARITY["eval-metrics"][0],
    PARITY["eval-metrics"][1].replace("{lex}", _LEX),
)


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark).attach(sf_dir)


@pytest.mark.parametrize("family", sorted(PARITY))
def test_sql_entry_parity(engine, spark, sf_dir, family):
    name, sql_text = PARITY[family]
    df_rows = sorted(
        map(tuple, REGISTRY[name].spark_fn(spark, sf_dir).collect())
    )
    sql_df = engine.sql(sql_text)
    sql_rows = sorted(map(tuple, sql_df.collect()))
    assert sql_df.columns == list(
        REGISTRY[name].spark_fn(spark, sf_dir).columns
    ), f"{family}/{name}: column mismatch"
    assert sql_rows == df_rows, f"{family}/{name}: value mismatch"


def test_sql_entry_parameterized_args(engine, spark, sf_dir):
    """Engine.sql(query, args=...) — named-parameter binding through
    the engine surface must equal both the literal-inlined SQL text
    and the qsub6 registry row (which certifies the same binding
    against DuckDB)."""
    from sora_spark.queries.sql_surface import _PARAM_SQL

    args = {
        "min_total": 150000.0,
        "seg_a": "BUILDING",
        "seg_b": "MACHINERY",
    }
    bound = sorted(map(tuple, engine.sql(_PARAM_SQL, args=args).collect()))
    literal = sorted(
        map(
            tuple,
            engine.sql(
                _PARAM_SQL.replace(":min_total", "150000.0")
                .replace(":seg_a", "'BUILDING'")
                .replace(":seg_b", "'MACHINERY'")
            ).collect(),
        )
    )
    reg = sorted(
        map(
            tuple,
            REGISTRY["qsub6_parameterized_sql"]
            .spark_fn(spark, sf_dir)
            .collect(),
        )
    )
    assert bound == literal == reg
