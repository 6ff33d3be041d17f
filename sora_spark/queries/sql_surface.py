"""SQL-entry-point queries (SURVEY §3.2): the engine's `spark.sql`
surface over registered fixture views, exercising planner features the
DataFrame API queries don't — correlated EXISTS and correlated scalar
subqueries. Both desugar to joins in Catalyst (EXISTS → left-semi,
scalar subquery → aggregate + join), so they scale exactly like the
declared join family; the point here is the SQL surface contract.
"""

from __future__ import annotations

from sora_spark.catalog import tables
from sora_spark.queries.registry import query

_EXISTS_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 300000)
ORDER BY c_custkey
LIMIT 100
"""

_SCALAR_SUB_SQL = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_above_avg
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c_nationkey ORDER BY c_nationkey
"""


@query(
    "qsub1_correlated_exists",
    oracle=_EXISTS_SQL,
    doc="Correlated EXISTS subquery through the SQL entry point — the "
    "identical text runs on both engines; Catalyst plans it as a "
    "left-semi join (same shape as Q-J4).",
    tags=("sql", "subquery"),
)
def qsub1_correlated_exists(spark, sf_dir):
    tables(spark, sf_dir).register_views()
    return spark.sql(_EXISTS_SQL)


@query(
    "qsub2_correlated_scalar_subquery",
    oracle=_SCALAR_SUB_SQL,
    doc="Correlated scalar subquery (per-nation average) through the "
    "SQL entry point; Catalyst rewrites it to an aggregate + join, so "
    "the customer table is scanned twice but shuffled only on the "
    "(tiny) nation key.",
    tags=("sql", "subquery"),
)
def qsub2_correlated_scalar_subquery(spark, sf_dir):
    tables(spark, sf_dir).register_views()
    return spark.sql(_SCALAR_SUB_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, l.n_orders, l.total_spend, l.max_order
FROM customer c,
     LATERAL (SELECT CAST(count(*) AS BIGINT) AS n_orders,
                     round(CAST(sum(o.o_totalprice) AS DOUBLE), 2) AS total_spend,
                     round(CAST(max(o.o_totalprice) AS DOUBLE), 2) AS max_order
              FROM orders o WHERE o.o_custkey = c.c_custkey) l
WHERE c.c_custkey < 300 AND l.n_orders > 0
ORDER BY c.c_custkey
"""


@query(
    "qsub3_lateral_join",
    oracle=_LATERAL_SQL,
    doc="LATERAL correlated derived table through the SQL entry point "
    "— unlike a scalar subquery (one column), the lateral relation "
    "returns THREE aggregate columns per outer row in a single "
    "correlated pass; the identical text runs on both engines "
    "(Catalyst decorrelates it into an aggregate + equi-join, so the "
    "scale shape is the declared join/agg family, not a per-row "
    "re-execution).",
    tags=("sql", "subquery", "lateral"),
)
def qsub3_lateral_join(spark, sf_dir):
    tables(spark, sf_dir).register_views()
    return spark.sql(_LATERAL_SQL)


_RECURSIVE_SPINE_SPARK = """
WITH RECURSIVE bounds AS (
  SELECT date_trunc('DAY', min(ts)) AS lo, date_trunc('DAY', max(ts)) AS hi FROM events),
spine AS (
  SELECT lo AS d, hi FROM bounds
  UNION ALL
  SELECT d + INTERVAL 1 DAY, hi FROM spine WHERE d < hi),
daily AS (SELECT date_trunc('DAY', ts) AS day, count(*) AS n FROM events GROUP BY 1)
SELECT date_format(s.d, 'yyyy-MM-dd') AS day,
       CAST(coalesce(dl.n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN daily dl ON s.d = dl.day
ORDER BY day
"""

_RECURSIVE_SPINE_DUCK = """
WITH RECURSIVE bounds AS (
  SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi FROM events),
spine AS (
  SELECT lo AS d, hi FROM bounds
  UNION ALL
  SELECT d + INTERVAL 1 DAY, hi FROM spine WHERE d < hi),
daily AS (SELECT date_trunc('day', ts) AS day, count(*) AS n FROM events GROUP BY 1)
SELECT strftime(s.d, '%Y-%m-%d') AS day,
       CAST(coalesce(dl.n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN daily dl ON s.d = dl.day
ORDER BY day
"""


@query(
    "qsub4_recursive_cte",
    oracle=_RECURSIVE_SPINE_DUCK,
    doc="Recursive CTE through the SQL entry point (SPARK-24497, new "
    "in Spark 4): a date spine unrolled recursively from min(ts) to "
    "max(ts) — the anchor carries the recursion bound as a column so "
    "the recursive member needs no subquery — then LEFT JOINed to "
    "daily counts with gap days coalesced to 0. Identical logical "
    "text on both engines modulo date_format/strftime. Depth = day "
    "span (bounded, driver-planned iterations); each unrolled step "
    "is a one-row frame, so the real work is the single daily "
    "rollup — the recursion surface, not the data, is what this row "
    "certifies (the capability tier already covers recursive "
    "reachability vs BFS; this is the declared-contract twin).",
    tags=("sql", "recursive-cte", "timeseries"),
)
def qsub4_recursive_cte(spark, sf_dir):
    tables(spark, sf_dir).register_views()
    return spark.sql(_RECURSIVE_SPINE_SPARK)


_PIVOT_SQL = """
SELECT prio,
       coalesce(f_n, 0)     AS f_n,
       coalesce(f_amt, 0.0) AS f_amt,
       coalesce(o_n, 0)     AS o_n,
       coalesce(o_amt, 0.0) AS o_amt,
       coalesce(p_n, 0)     AS p_n,
       coalesce(p_amt, 0.0) AS p_amt
FROM (
  SELECT o_orderpriority AS prio, o_orderstatus AS st, o_totalprice
  FROM orders
) PIVOT (
  count(*) AS n, round(sum(o_totalprice), 2) AS amt
  FOR st IN ('F' AS f, 'O' AS o, 'P' AS p)
)
ORDER BY prio
"""


@query(
    "qsub5_sql_pivot",
    oracle="""
SELECT o_orderpriority AS prio,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'F'
                               THEN o_totalprice END), 2), 0.0) AS f_amt,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'O'
                               THEN o_totalprice END), 2), 0.0) AS o_amt,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'P'
                               THEN o_totalprice END), 2), 0.0) AS p_amt
FROM orders
GROUP BY o_orderpriority
ORDER BY prio
""",
    doc="qsub5: SQL PIVOT clause through the SQL entry point — "
    "multi-aggregate (count + sum) pivot of order status against "
    "priority with explicit value aliases, certifying Spark's "
    "'valueAlias_aggAlias' output naming and the NULL-for-absent-"
    "cell semantics (coalesced identically on both sides; the "
    "oracle is the conditional-aggregation desugaring, which is "
    "also exactly the physical plan — one hash aggregate, no "
    "per-status rescans). Complements the DataFrame-API pivot/"
    "unpivot rows (qu1/qu2 family) on the SQL surface.",
    tags=("sql", "pivot"),
)
def qsub5_sql_pivot(spark, sf_dir):
    tables(spark, sf_dir).register_views()
    return spark.sql(_PIVOT_SQL)


_PARAM_SQL = """
SELECT c.c_mktsegment AS seg,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice >= :min_total
  AND c.c_mktsegment IN (:seg_a, :seg_b)
GROUP BY seg
ORDER BY seg
"""


@query(
    "qsub6_parameterized_sql",
    oracle="""
SELECT c.c_mktsegment AS seg,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice >= 150000.0
  AND c.c_mktsegment IN ('BUILDING', 'MACHINERY')
GROUP BY seg
ORDER BY seg
""",
    doc="qsub6: parameterized SQL (Spark 4 named parameter markers) — "
    "the SQL text carries :min_total/:seg_a/:seg_b placeholders and "
    "values arrive via spark.sql(query, args={...}), the "
    "injection-safe API a multi-tenant SQL entry point must use "
    "instead of string interpolation. Parameters bind as typed "
    "literals BEFORE analysis, so Catalyst constant-folds and "
    "pushes the bound predicate into the scan exactly as a literal "
    "query would. The oracle is the literal-substituted text; "
    "matching hashes certify that binding is value-identical to "
    "inlining. Engine.sql(query, args=...) exposes the same call "
    "shape (parity pinned in tests/test_sql_parity.py).",
    tags=("sql", "parameterized"),
)
def qsub6_parameterized_sql(spark, sf_dir):
    tables(spark, sf_dir).register_views()
    return spark.sql(
        _PARAM_SQL,
        args={
            "min_total": 150000.0,
            "seg_a": "BUILDING",
            "seg_b": "MACHINERY",
        },
    )


_LATERAL_TOPK_SQL = """
SELECT c.c_custkey,
       o.k,
       o.price
FROM customer c,
     LATERAL (SELECT o_orderkey AS k,
                     round(o_totalprice, 2) AS price
              FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 2) o
WHERE c.c_custkey % 50 = 0
ORDER BY c.c_custkey, price DESC, k
"""


@query(
    "qsub7_lateral_topk",
    oracle=_LATERAL_TOPK_SQL,
    doc="qsub7: LATERAL correlated subquery — per-customer top-2 "
    "orders by price through the SQL entry point, the standard "
    "'top-N per entity' idiom ANSI LATERAL expresses without a "
    "window function. Catalyst decorrelates the LATERAL into a "
    "ranked join (never one subquery execution per outer row — the "
    "nested-loop trap the decorrelation rules exist to avoid); "
    "DuckDB runs the IDENTICAL SQL string, so the oracle certifies "
    "both the decorrelation's semantics (per-key LIMIT, "
    "deterministic tiebreak) and the dialect compatibility of the "
    "statement itself. Customers without orders contribute no rows "
    "(inner-lateral semantics).",
    tags=("sql", "subquery", "lateral"),
)
def qsub7_lateral_topk(spark, sf_dir):
    tables(spark, sf_dir).register_views()
    return spark.sql(_LATERAL_TOPK_SQL)


_RECURSIVE_TREE_SQL = """
WITH RECURSIVE tree AS (
  SELECT s_suppkey AS k, 0 AS depth, round(s_acctbal, 2) AS bal
  FROM supplier WHERE s_suppkey = 1
  UNION ALL
  SELECT s.s_suppkey, t.depth + 1, round(s.s_acctbal, 2)
  FROM supplier s
  JOIN tree t
    ON s.s_suppkey = 2 * t.k OR s.s_suppkey = 2 * t.k + 1
)
SELECT depth, CAST(count(*) AS BIGINT) AS n_suppliers,
       round(sum(bal), 2) AS sum_bal
FROM tree GROUP BY depth ORDER BY depth
"""


@query(
    "qsub8_recursive_cte",
    oracle=_RECURSIVE_TREE_SQL,
    doc="qsub8: RECURSIVE CTE (Spark 4's WITH RECURSIVE — the "
    "iterative-SQL surface) — a binary-tree traversal over the "
    "supplier table (children of k are 2k and 2k+1), aggregating "
    "count and balance per depth. DuckDB runs the IDENTICAL SQL "
    "string, so the oracle certifies the recursion semantics "
    "(anchor + step, termination when the step yields no rows) and "
    "the dialect compatibility at once. Depth is log2(|supplier|) "
    "(~14 at sf1), far under the engine's recursion-level limit; "
    "each step is one equi-ish join of the frontier against the "
    "supplier relation — the same per-iteration shape the Graph "
    "module's fixpoint loops hand-roll, now expressible in pure "
    "SQL.",
    tags=("sql", "subquery", "recursive"),
)
def qsub8_recursive_cte(spark, sf_dir):
    tables(spark, sf_dir).register_views()
    return spark.sql(_RECURSIVE_TREE_SQL)
