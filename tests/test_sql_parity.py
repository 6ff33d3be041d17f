"""SQL-string entry parity (VERDICT r08 item 6).

`Engine.sql` is the §3.2 entry point: users type Spark SQL over the
attached views instead of chaining DataFrames. The registry certifies
the DataFrame path against DuckDB; this file certifies that the SQL
STRING path produces value-identical results to the DataFrame twin for
a representative query per SURVEY §2 family — one test, parametrized
over 11 families (filter, agg, join, window, sort, setop, scalar,
streaming-batch, graph, llm-text, llm-dedup).

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
}


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
