"""Declared queries: join family Q-J2..Q-J8 (SURVEY §2.3).

Q-J1 (3-way inner + top-k) and Q-J9 (graph self-join) live in
bench_core. Scale notes per query in docstrings; AQE picks broadcast
vs sort-merge at runtime, and the as-of join deliberately avoids the
pair-exploding range-join formulation (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sora_spark.catalog import tables
from sora_spark.queries.registry import query


@query(
    "qj2_left_outer",
    oracle="""
SELECT count(*) AS n_rows,
       count(o_orderkey) AS n_matched,
       count(*) - count(o_orderkey) AS n_customers_without_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
""",
    doc="Q-J2: left outer join + null-side accounting.",
    tags=("join",),
)
def qj2_left_outer(spark, sf_dir):
    t = tables(spark, sf_dir)
    j = t.customer.join(
        t.orders, F.col("c_custkey") == F.col("o_custkey"), "left"
    )
    return j.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("n_matched"),
        (F.count("*") - F.count("o_orderkey")).alias(
            "n_customers_without_orders"
        ),
    )


@query(
    "qj3_full_outer",
    oracle="""
SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
       count(*) AS n_pairs,
       count(s_suppkey) AS n_supplier_side,
       count(c_custkey) AS n_customer_side
FROM supplier FULL JOIN customer ON s_nationkey = c_nationkey
GROUP BY 1 ORDER BY 1
""",
    doc="Q-J3: full outer join on nation key; per-nation side counts "
    "(coalesced key avoids nullable sort keys — SURVEY trap 7).",
    tags=("join",),
)
def qj3_full_outer(spark, sf_dir):
    t = tables(spark, sf_dir)
    j = t.supplier.join(
        t.customer, F.col("s_nationkey") == F.col("c_nationkey"), "full"
    )
    return (
        j.groupBy(
            F.coalesce("s_nationkey", "c_nationkey").alias("nationkey")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.count("s_suppkey").alias("n_supplier_side"),
            F.count("c_custkey").alias("n_customer_side"),
        )
        .orderBy("nationkey")
    )


@query(
    "qj4_left_semi",
    oracle="SELECT count(*) AS n FROM part p "
    "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)",
    doc="Q-J4: left semi join — parts that appear in lineitem.",
    tags=("join",),
)
def qj4_left_semi(spark, sf_dir):
    t = tables(spark, sf_dir)
    return t.part.join(
        t.lineitem, F.col("p_partkey") == F.col("l_partkey"), "left_semi"
    ).agg(F.count("*").alias("n"))


@query(
    "qj5_left_anti",
    oracle="""
SELECT p_partkey FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
ORDER BY p_partkey
""",
    doc="Q-J5: left anti join — parts never ordered.",
    tags=("join",),
)
def qj5_left_anti(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t.part.join(
            t.lineitem, F.col("p_partkey") == F.col("l_partkey"), "left_anti"
        )
        .select("p_partkey")
        .orderBy("p_partkey")
    )


@query(
    "qj6_cross_join",
    oracle="SELECT count(*) AS n FROM region CROSS JOIN nation",
    doc="Q-J6: bounded cross join (5 x 25 = 125).",
    tags=("join",),
)
def qj6_cross_join(spark, sf_dir):
    t = tables(spark, sf_dir)
    return t.region.crossJoin(t.nation).agg(F.count("*").alias("n"))


@query(
    "qj7_range_join",
    oracle="""
SELECT count(*) AS n
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
""",
    doc="Q-J7: non-equi range (theta) join — equi part shuffles, range "
    "part filters post-join (Catalyst splits the conjunction).",
    tags=("join",),
)
def qj7_range_join(spark, sf_dir):
    t = tables(spark, sf_dir)
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return t.lineitem.join(t.orders, cond).agg(F.count("*").alias("n"))


@query(
    "qj8_asof_join",
    oracle="""
WITH ev AS (SELECT * FROM events WHERE event_type IN ('view', 'purchase')),
m AS (
  SELECT event_type, ts,
         max(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
  FROM ev)
SELECT count(last_view) AS n_matched,
       round(avg(date_diff('microsecond', last_view, ts) / 1000000.0), 2)
         AS avg_gap_s
FROM m WHERE event_type = 'purchase'
""",
    doc="Q-J8: as-of join — for each purchase, the same user's most "
    "recent strictly-earlier view. Window formulation (one shuffle on "
    "user_id, no candidate-pair blowup); operators/asof.py generalizes it.",
    tags=("join", "asof"),
)
def qj8_asof_join(spark, sf_dir):
    ev = tables(spark, sf_dir).events.filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    purchases = ev.withColumn("last_view", last_view).filter(
        F.col("event_type") == "purchase"
    )
    gap_s = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_view"))
    ) / 1000000.0
    return purchases.agg(
        F.count("last_view").alias("n_matched"),
        F.round(F.avg(gap_s), 2).alias("avg_gap_s"),
    )


@query(
    "qj8b_asof_value_join",
    oracle="""
WITH ev AS (SELECT * FROM events WHERE event_type IN ('view', 'purchase')),
m AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts,
                          CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END,
                          event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_value
  FROM ev)
SELECT count(asof_value) AS n_matched,
       round(avg(asof_value), 2) AS avg_view_value
FROM m WHERE event_type = 'purchase'
""",
    doc="Q-J8 via the generic operators/asof.py asof_join: for each "
    "purchase, the VALUE of the same user's latest strictly-earlier "
    "view. `value` is non-monotone in time, so this catches a max-vs-"
    "last regression the timestamp variant (qj8) cannot.",
    tags=("join", "asof"),
)
def qj8b_asof_value_join(spark, sf_dir):
    from sora_spark.operators.asof import asof_join

    ev = tables(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        time_col="ts",
        tiebreak_col="event_id",
        right_value_col="value",
    )
    return joined.agg(
        F.count("asof_value").alias("n_matched"),
        F.round(F.avg("asof_value"), 2).alias("avg_view_value"),
    )


@query(
    "qj8c_asof_forward_join",
    oracle="""
WITH ev AS (SELECT * FROM events WHERE event_type IN ('view', 'purchase')),
m AS (
  SELECT event_type, value,
         first_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts,
                          CASE WHEN event_type = 'view' THEN 0 ELSE 1 END,
                          event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS asof_value
  FROM ev)
SELECT count(asof_value) AS n_matched,
       round(avg(asof_value), 2) AS avg_view_value
FROM m WHERE event_type = 'purchase'
""",
    doc="Q-J8 forward direction (asof_join direction='forward'): for "
    "each purchase, the value of the same user's EARLIEST strictly-"
    "later view — the attribution-window lookup (pandas merge_asof "
    "direction flag). Same one-shuffle union+window shape as qj8b "
    "with the time order reversed; equal-time views excluded on both "
    "sides (strict inequality).",
    tags=("join", "asof"),
)
def qj8c_asof_forward_join(spark, sf_dir):
    from sora_spark.operators.asof import asof_join

    ev = tables(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        time_col="ts",
        tiebreak_col="event_id",
        right_value_col="value",
        direction="forward",
    )
    return joined.agg(
        F.count("asof_value").alias("n_matched"),
        F.round(F.avg("asof_value"), 2).alias("avg_view_value"),
    )


@query(
    "qj10_rank_pair_count",
    oracle="""
WITH s AS (SELECT l_returnflag AS f, l_extendedprice AS p
           FROM lineitem WHERE l_orderkey < 2000)
SELECT a.f, CAST(count(*) AS BIGINT) AS n_pairs
FROM s a JOIN s b ON a.f = b.f AND a.p < b.p
GROUP BY a.f ORDER BY a.f
""",
    doc="qj10: inequality-pair counting WITHOUT the theta-join — "
    "count of (a, b) pairs with price_a < price_b per group computed "
    "as C(n,2) − Σ_ties C(t,2) from two aggregations (group sizes + "
    "per-value tie counts), while the ORACLE runs the literal "
    "quadratic theta-join on a bounded slice. At 100 TB the naive "
    "form materializes ~n²/2 pairs per group; the order-statistics "
    "rewrite shuffles group- and value-counts only. The gate proves "
    "the rewrite EQUIVALENT, ties included.",
    tags=("join", "rewrite", "order-statistics"),
)
def qj10_rank_pair_count(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem.filter(F.col("l_orderkey") < 2000)
    s = li.select(
        F.col("l_returnflag").alias("f"), F.col("l_extendedprice").alias("p")
    )
    # pair counts computed in decimal — t*(t-1) is always even so the
    # integral DIV is exact, and decimal(38,0) keeps exactness past the
    # ~2^53 point where a double intermediate silently rounds (ADVICE
    # r06).  No float appears anywhere in the arithmetic.
    sizes = s.groupBy("f").agg(F.count("*").alias("n"))
    ties = (
        s.groupBy("f", "p")
        .agg(F.count("*").alias("t"))
        .groupBy("f")
        .agg(
            F.sum(
                F.expr("CAST(t AS DECIMAL(38,0)) * (t - 1) DIV 2")
            ).alias("tie_pairs")
        )
    )
    return (
        sizes.join(ties, "f")
        .select(
            "f",
            (
                F.expr("CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2")
                - F.col("tie_pairs")
            )
            .cast("bigint")
            .alias("n_pairs"),
        )
        .orderBy("f")
    )


@query(
    "qj8d_asof_nearest_join",
    oracle="""
WITH ev AS (SELECT * FROM events WHERE event_type IN ('view', 'purchase')),
m AS (
  SELECT event_type, ts,
         last_value(CASE WHEN event_type = 'view' AND value IS NOT NULL
                         THEN {'t': ts, 'v': value} END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts,
                          CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END,
                          event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS back,
         last_value(CASE WHEN event_type = 'view' AND value IS NOT NULL
                         THEN {'t': ts, 'v': value} END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts DESC,
                          CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END,
                          event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fwd
  FROM ev),
p AS (
  SELECT ts,
         CASE WHEN back IS NULL THEN fwd
              WHEN fwd IS NULL THEN back
              WHEN date_diff('microsecond', back.t, ts)
                   <= date_diff('microsecond', ts, fwd.t) THEN back
              ELSE fwd END AS pick
  FROM m WHERE event_type = 'purchase')
SELECT CAST(count(pick.v) AS BIGINT) AS n_matched,
       round(avg(pick.v), 2) AS avg_value,
       round(avg(abs(date_diff('microsecond', pick.t, ts)) / 1000000.0), 2)
         AS avg_abs_gap_s
FROM p
""",
    doc="Q-J8 completed: direction='nearest' as-of join — each "
    "purchase takes whichever same-user view is CLOSER in time, "
    "earlier or later, ties to the earlier one (pandas merge_asof's "
    "third direction; operators/asof.py). Still the union+window "
    "form: one shuffle on user_id, two sort orders over the SAME "
    "exchange, zero candidate pairs — where a naive implementation "
    "joins both directions and re-aggregates. The oracle runs the "
    "two IGNORE NULLS struct windows and the same tie rule; "
    "avg_abs_gap_s certifies the picked MATCH TIMES, not just "
    "values, so a direction-flip bug cannot hash-collide past it.",
    tags=("join", "asof"),
)
def qj8d_asof_nearest_join(spark, sf_dir):
    from sora_spark.operators.asof import asof_join

    ev = tables(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        time_col="ts",
        tiebreak_col="event_id",
        right_value_col="value",
        direction="nearest",
    )
    gap_s = (
        F.abs(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_value_t"))
        )
        / 1000000.0
    )
    return joined.agg(
        F.count("asof_value").cast("bigint").alias("n_matched"),
        F.round(F.avg("asof_value"), 2).alias("avg_value"),
        F.round(F.avg(gap_s), 2).alias("avg_abs_gap_s"),
    )
