"""Declared queries: aggregation family Q-A2..Q-A9 (SURVEY §2.4).

Q-A1 (the B1 pricing summary) lives in bench_core. Grouping-set /
rollup / cube outputs COALESCE their nullable keys to 'ALL' in both
engines — fixture values can never collide with it, and it removes the
NULL-ordering dialect trap (SURVEY §5.5 trap 7) entirely.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sora_spark.catalog import tables
from sora_spark.queries.registry import query


@query(
    "qa2_count_distinct_multi",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="Q-A2: multi-column count(DISTINCT) per group (planned via "
    "EXPAND + two-level aggregate).",
    tags=("agg",),
)
def qa2_count_distinct_multi(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "qa3_grouping_sets",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY returnflag, linestatus
""",
    doc="Q-A3: GROUPING SETS over two keys plus grand total.",
    tags=("agg", "groupingsets"),
)
def qa3_grouping_sets(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "qa4_rollup",
    oracle="""
SELECT coalesce(r_name, 'ALL') AS region_name,
       coalesce(n_name, 'ALL') AS nation_name,
       count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region_name, nation_name
""",
    doc="Q-A4: ROLLUP over the region→nation hierarchy of customer "
    "counts (dimension joins broadcast).",
    tags=("agg", "rollup"),
)
def qa4_rollup(spark, sf_dir):
    t = tables(spark, sf_dir)
    j = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "qa5_cube",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
    doc="Q-A5: CUBE over status x priority.",
    tags=("agg", "cube"),
)
def qa5_cube(spark, sf_dir):
    orders = tables(spark, sf_dir).orders
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "sum_price",
        )
        .orderBy("status", "priority")
    )


@query(
    "qa6_max_by",
    oracle="""
SELECT n_name, arg_max(c_name, c_acctbal) AS top_customer,
       round(max(c_acctbal), 2) AS top_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
    doc="Q-A6: argmax — customer with max acctbal per nation "
    "(fixtures verified tie-free; DuckDB arg_max ↔ Spark max_by).",
    tags=("agg", "argmax"),
)
def qa6_max_by(spark, sf_dir):
    t = tables(spark, sf_dir)
    j = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.expr("max_by(c_name, c_acctbal)").alias("top_customer"),
            F.round(F.max("c_acctbal"), 2).alias("top_acctbal"),
        )
        .orderBy("n_name")
    )


@query(
    "qa7_percentile",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 4) AS p25,
       round(quantile_cont(l_quantity, 0.5), 4)  AS median,
       round(quantile_cont(l_quantity, 0.75), 4) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="Q-A7: exact percentiles (both engines use linear interpolation).",
    tags=("agg", "percentile"),
)
def qa7_percentile(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", 0.25), 4).alias("p25"),
            F.round(F.percentile("l_quantity", 0.5), 4).alias("median"),
            F.round(F.percentile("l_quantity", 0.75), 4).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "qa8_stats",
    oracle="""
SELECT l_linestatus,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_discount), 6) AS var_disc,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
""",
    doc="Q-A8: statistical aggregates (sample stddev/variance, "
    "correlation, covariance).",
    tags=("agg", "stats"),
)
def qa8_stats(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
        )
        .orderBy("l_linestatus")
    )


@query(
    "qa9_collect_list",
    oracle="""
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""",
    doc="Q-A9: collect_list order-normalized via array_sort (collect "
    "order is nondeterministic by design; sorting makes it declarable).",
    tags=("agg", "collect"),
)
def qa9_collect_list(spark, sf_dir):
    t = tables(spark, sf_dir)
    j = t.nation.join(
        F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return (
        j.groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
        .orderBy("r_name")
    )


@query(
    "qa10_median",
    oracle="""
SELECT l_returnflag,
       round(median(l_quantity), 4) AS med_qty,
       round(median(l_extendedprice), 4) AS med_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="Exact median (interpolated 50th percentile) per group — "
    "Spark's median() matches DuckDB's median() on doubles; complements "
    "the approx-percentile tolerance tier (Q-A7).",
    tags=("agg",),
)
def qa10_median(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
            F.round(F.median("l_extendedprice"), 4).alias("med_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "qx8_string_agg",
    oracle="""
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
""",
    doc="Deterministic string aggregation: nations per region, "
    "sorted-within-group so both engines produce the identical string "
    "(Spark: array_join(array_sort(collect_list())); DuckDB: "
    "string_agg ORDER BY).",
    tags=("agg", "string"),
)
def qx8_string_agg(spark, sf_dir):
    t = tables(spark, sf_dir)
    return (
        t.nation.join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
        .orderBy("r_name")
    )


@query(
    "qa11_boolean_agg_family",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT)
         AS n_big,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k,
       CAST(min_by(o_orderkey, o_totalprice) AS BIGINT) AS cheapest_order
FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    doc="qa11: conditional/boolean aggregate family — count_if (as "
    "FILTER in the oracle), bool_and, bool_or, min_by (qa6 covered "
    "max_by). min_by determinism rests on unique o_totalprice minima "
    "per priority group at the calibrated SFs (same argument family "
    "as qa6; a tie would pick an arbitrary orderkey in both engines "
    "independently). All partial-aggregable — one shuffle on the "
    "5-value priority key.",
    tags=("agg", "boolean"),
)
def qa11_boolean_agg_family(spark, sf_dir):
    o = tables(spark, sf_dir).orders
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 150000)
            .cast("bigint")
            .alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias(
                "any_over_400k"
            ),
            F.min_by("o_orderkey", "o_totalprice")
            .cast("bigint")
            .alias("cheapest_order"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "qa12_winsorized_mean",
    oracle="""
WITH p AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY l_returnflag)
SELECT l.l_returnflag,
       round(avg(least(greatest(l_extendedprice, lo), hi)), 4) AS winsor_mean,
       round(avg(l_extendedprice), 4) AS raw_mean,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem l JOIN p USING (l_returnflag)
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
""",
    doc="qa12: per-group winsorized mean (outlier-robust statistics): "
    "exact p05/p95 per group, values clipped into the band, then "
    "averaged. Two passes — the percentile table is GROUP-COUNT sized "
    "and broadcast back onto the fact scan (map-side clip, no second "
    "shuffle of the data), the degenerate-safe way to de-outlier a "
    "100 TB measure column before aggregation.",
    tags=("agg", "robust"),
)
def qa12_winsorized_mean(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    pct = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.05).alias("lo"),
        F.percentile("l_extendedprice", 0.95).alias("hi"),
    )
    clipped = li.join(F.broadcast(pct), "l_returnflag").withColumn(
        "_w",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")),
    )
    return (
        clipped.groupBy("l_returnflag")
        .agg(
            F.round(F.avg("_w"), 4).alias("winsor_mean"),
            F.round(F.avg("l_extendedprice"), 4).alias("raw_mean"),
            F.count("*").cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "qa13_mad",
    oracle="""
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY l_returnflag)
SELECT l.l_returnflag,
       round(any_value(m.med), 4) AS median,
       round(quantile_cont(abs(l_extendedprice - m.med), 0.5), 4) AS mad
FROM lineitem l JOIN med m USING (l_returnflag)
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
""",
    doc="qa13: median absolute deviation per group — the robust SCALE "
    "estimate completing qa12's robust location (winsorized mean). "
    "Two passes, both the broadcast-threshold shape: group medians "
    "(group-count sized) broadcast back over the scan, then one exact "
    "percentile of the absolute deviations. Outlier-resistant spread "
    "for data-quality monitoring where stddev is blown by one bad "
    "feed value.",
    tags=("agg", "robust"),
)
def qa13_mad(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("med")
    )
    j = li.join(F.broadcast(med), "l_returnflag")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.round(F.any_value("med"), 4).alias("median"),
            F.round(
                F.percentile(F.abs(F.col("l_extendedprice") - F.col("med")), 0.5),
                4,
            ).alias("mad"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "qa14_pythagorean_means",
    oracle="""
SELECT l_returnflag,
       round(avg(l_quantity), 6) AS arith,
       round(exp(avg(ln(l_quantity))), 6) AS geom,
       round(count(*) / sum(1.0 / l_quantity), 6) AS harm
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="qa14: the three Pythagorean means per group — arithmetic, "
    "geometric (exp∘avg∘ln — the rate/ratio mean), harmonic (the "
    "per-unit-cost mean) — as single partial-aggregable expressions "
    "(quantity is strictly positive in TPC-H, so ln and 1/x are "
    "total). Completes the mean family qa1/qa12/qa13 started; "
    "AM >= GM >= HM holds per group by construction.",
    tags=("agg", "means"),
)
def qa14_pythagorean_means(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    q = F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.avg(q), 6).alias("arith"),
            F.round(F.exp(F.avg(F.log(q))), 6).alias("geom"),
            F.round(F.count("*") / F.sum(F.lit(1.0) / q), 6).alias("harm"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "qa15_mode",
    oracle="""
WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
           FROM lineitem GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY n DESC, l_quantity) AS rn
      FROM c)
SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS mode_quantity,
       CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1 ORDER BY l_returnflag
""",
    doc="qa15: deterministic MODE per group — the most frequent "
    "l_quantity per l_returnflag, ties broken by value order. "
    "Deliberately NOT Spark's mode() aggregate: its tie choice is "
    "partition-order-dependent (non-deterministic under shuffle), so "
    "the engine computes mode as a (count, value)-ordered arg-max "
    "over the group-count relation — two groupBys sharing the group "
    "key prefix (one shuffle + an AQE-coalesced window), identical "
    "answer on any cluster layout. The determinism trap mirrors "
    "SURVEY trap 3 (first/any_value).",
    tags=("agg", "mode"),
)
def qa15_mode(spark, sf_dir):
    from pyspark.sql.window import Window

    li = tables(spark, sf_dir).lineitem
    c = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    rn = F.row_number().over(
        Window.partitionBy("l_returnflag").orderBy(
            F.desc("n"), "l_quantity"
        )
    )
    return (
        c.withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("bigint").alias("mode_quantity"),
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "qa16_bitmap_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="qa16: EXACT distinct counting via the bitmap aggregate "
    "family (Spark 3.5 bitmap_bucket_number / bitmap_bit_position / "
    "bitmap_construct_agg / bitmap_count) — two-level aggregation: "
    "group by (key, bucket) building one 4KB bitmap per 32768-id "
    "bucket, then sum of per-bucket popcounts. The scale story vs "
    "count(DISTINCT): the shuffle carries fixed-width bitmaps with "
    "map-side OR-combine instead of every distinct value, and the "
    "bitmaps are MERGEABLE (bitmap_or_agg), so incremental/rollup "
    "distinct counts compose exactly — the exact-tier sibling of "
    "HLL. Gate: equality with the oracle's plain count(DISTINCT).",
    tags=("agg", "distinct", "bitmap"),
)
def qa16_bitmap_distinct(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupBy(
            "l_returnflag",
            F.bitmap_bucket_number("l_partkey").alias("_b"),
        )
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position("l_partkey")
            ).alias("_bm")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.bitmap_count("_bm"))
            .cast("bigint")
            .alias("n_distinct_parts")
        )
        .orderBy("l_returnflag")
    )


@query(
    "qa17_grouping_id",
    oracle="""
SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
""",
    doc="qa17: grouping_id() bitmask over a CUBE — the disambiguator "
    "qa3/qa5's coalesce('ALL') trick can't provide when a real group "
    "value collides with the filler (a literal 'ALL' returnflag would "
    "be indistinguishable from the subtotal row). Certifies that both "
    "engines assign the SAME bit order (first cube column = most "
    "significant bit: gid 0=detail, 1=flag-only, 2=status-only, "
    "3=grand total) and that per-column grouping() agrees with the "
    "composite mask. Same single-shuffle expansion as qa5 — the "
    "bitmask is metadata on the expanded grouping rows, not an extra "
    "pass.",
    tags=("agg", "cube", "grouping_id"),
)
def qa17_grouping_id(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            "gid",
            "g_flag",
            "g_status",
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


@query(
    "qa18_regression_family",
    oracle="""
SELECT l_returnflag AS returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       round(corr(l_extendedprice, l_quantity), 6) AS r
FROM lineitem GROUP BY l_returnflag ORDER BY returnflag
""",
    doc="qa18: the SQL-standard linear-regression aggregate family — "
    "regr_slope/intercept/r2/count of extendedprice on quantity per "
    "returnflag, plus corr as the cross-check (r² must equal corr² "
    "for simple regression; the hash certifies both independently). "
    "Both engines define these via population covariance/variance, so "
    "the same closed forms meet at round(4)/round(6). One partial-"
    "aggregated shuffle on the group key — each regr_* is a fixed "
    "tuple of power sums, mergeable map-side, so the 100 TB cost "
    "equals a count(*) groupBy. The per-group fit is qta9's Zipf "
    "regression generalized to a declared surface.",
    tags=("agg", "regression", "stats"),
)
def qa18_regression_family(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.regr_count(y, x).cast("bigint").alias("n"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.corr(y, x), 6).alias("r"),
        )
        .orderBy("returnflag")
    )


@query(
    "qa19_higher_moments",
    oracle="""
WITH s AS (
  SELECT l_linestatus,
         count(*)::DOUBLE AS n,
         sum(l_quantity) AS s1,
         sum(l_quantity * l_quantity) AS s2,
         sum(l_quantity * l_quantity * l_quantity) AS s3,
         sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
  FROM lineitem GROUP BY l_linestatus),
m AS (
  SELECT l_linestatus, n, s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) ^ 3 AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) ^ 2 * (s2 / n) - 3 * (s1 / n) ^ 4 AS m4
  FROM s)
SELECT l_linestatus AS linestatus,
       CAST(n AS BIGINT) AS n,
       round(m3 / m2 ^ 1.5, 6) AS skew,
       round(m4 / (m2 * m2) - 3, 6) AS kurt
FROM m ORDER BY linestatus
""",
    doc="qa19: higher central moments — skewness and excess kurtosis "
    "per linestatus. Spark's builtins are the POPULATION definitions "
    "(g1 = m3/m2^1.5, g2 = m4/m2² − 3); DuckDB's builtins are the "
    "SAMPLE-adjusted versions, so the oracle re-derives Spark's "
    "definition from raw power sums (s1..s4) — the gate certifies "
    "Spark's one-pass central-moment recurrences against the "
    "closed-form expansion. Safe here because l_quantity∈[1,50] "
    "keeps the power-sum cancellation ~1e-15 relative; round(6) "
    "absorbs it. Same mergeable-sums scaling story as qa18.",
    tags=("agg", "moments", "stats"),
)
def qa19_higher_moments(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.skewness("l_quantity"), 6).alias("skew"),
            F.round(F.kurtosis("l_quantity"), 6).alias("kurt"),
        )
        .orderBy("linestatus")
    )


@query(
    "qa20_weighted_percentile",
    oracle="""
WITH r AS (
  SELECT l_returnflag, l_quantity,
         unnest(range(l_linenumber)) AS _i
  FROM lineitem)
SELECT l_returnflag AS returnflag,
       CAST(count(*) AS BIGINT) AS n_weighted,
       round(quantile_cont(l_quantity, 0.5), 6) AS wp50,
       round(quantile_cont(l_quantity, 0.9), 6) AS wp90
FROM r GROUP BY returnflag ORDER BY returnflag
""",
    doc="qa20: EXACT weighted percentile — Spark's 3-arg "
    "percentile(col, q, frequency) with l_linenumber as the integer "
    "weight, certified against DuckDB quantile_cont over the "
    "EXPLICITLY REPLICATED multiset (each row repeated weight "
    "times): the frequency argument must be exactly equivalent to "
    "replication under linear interpolation. This is the "
    "sampled-data idiom — aggregate a 1% sample with weight=100 and "
    "get the percentile the full scan would give — and the "
    "replication oracle is precisely what a user would otherwise "
    "pay for at 100 TB: Spark carries the weight as a column, never "
    "materializing the multiset.",
    tags=("agg", "percentile", "weighted"),
)
def qa20_weighted_percentile(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum("l_linenumber").cast("bigint").alias("n_weighted"),
            F.round(
                F.expr("percentile(l_quantity, 0.5D, l_linenumber)"), 6
            ).alias("wp50"),
            F.round(
                F.expr("percentile(l_quantity, 0.9D, l_linenumber)"), 6
            ).alias("wp90"),
        )
        .orderBy("returnflag")
    )


@query(
    "qa21_gini_concentration",
    oracle="""
WITH r AS (
  SELECT o_orderpriority, o_totalprice AS x,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS i,
         count(*) OVER (PARTITION BY o_orderpriority) AS n,
         sum(o_totalprice) OVER (PARTITION BY o_orderpriority) AS s
  FROM orders)
SELECT o_orderpriority AS priority,
       CAST(max(n) AS BIGINT) AS n,
       round(2.0 * sum(i * x) / (max(n) * max(s))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM r GROUP BY priority ORDER BY priority
""",
    doc="qa21: Gini concentration of order revenue per priority class "
    "— the inequality/skew profile (how concentrated is spend across "
    "orders?), the profiler stat that decides whether a key needs "
    "salting before it needs a meeting. Exact rank formulation "
    "G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over values sorted (value, "
    "key) — the unique tiebreak makes the rank, and therefore the "
    "statistic, identical on both engines even with duplicate "
    "prices. One shuffle for the per-class window, aggregates "
    "map-combinable.",
    tags=("agg", "gini", "profile"),
)
def qa21_gini_concentration(spark, sf_dir):
    o = tables(spark, sf_dir).orders
    wp = Window.partitionBy("o_orderpriority")
    w = wp.orderBy("o_totalprice", "o_orderkey")
    r = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("x"),
        F.row_number().over(w).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("o_totalprice").over(wp).alias("s"),
    )
    return (
        r.groupBy("priority")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("x"))
                / (F.max("n") * F.max("s"))
                - (F.max("n") + 1.0) / F.max("n"),
                6,
            ).alias("gini"),
        )
        .orderBy("priority")
    )


@query(
    "qa22_frequency_moments",
    oracle="""
WITH c AS (SELECT l_partkey, count(*)::DOUBLE AS cnt
           FROM lineitem GROUP BY l_partkey)
SELECT CAST(count(*) AS BIGINT) AS f0,
       CAST(sum(cnt) AS BIGINT) AS f1,
       CAST(sum(cnt * cnt) AS BIGINT) AS f2,
       round(sum(cnt * cnt) / (count(*) * avg(cnt) * avg(cnt)), 6)
         AS skew_factor
FROM c
""",
    doc="qa22: frequency moments of the l_partkey distribution — "
    "F0 (distinct keys), F1 (rows), F2 (sum of squared "
    "frequencies = the EXACT self-join size, what AMS sketches "
    "estimate and what join planners need to predict a key's "
    "fan-out), plus F2 normalized by the uniform-distribution "
    "baseline (skew_factor = 1 means perfectly even, >> 1 means a "
    "salting candidate — the quantitative trigger for qsk1's "
    "salted join). One exact groupBy then a 1-row moment "
    "aggregate; at 100 TB the same two-level shape runs with the "
    "first level approximated by CMS/HLL (capability-tier "
    "sketches).",
    tags=("agg", "moments", "profile", "skew"),
)
def qa22_frequency_moments(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    c = li.groupBy("l_partkey").agg(
        F.count("*").cast("double").alias("cnt")
    )
    return c.agg(
        F.count("*").cast("bigint").alias("f0"),
        F.sum("cnt").cast("bigint").alias("f1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("f2"),
        F.round(
            F.sum(F.col("cnt") * F.col("cnt"))
            / (F.count("*") * F.avg("cnt") * F.avg("cnt")),
            6,
        ).alias("skew_factor"),
    )


@query(
    "qa23_categorical_entropy",
    oracle="""
WITH c AS (
  SELECT 'o_orderpriority' AS col, o_orderpriority AS val FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders),
f AS (SELECT col, val, count(*)::DOUBLE AS n FROM c GROUP BY col, val),
t AS (SELECT col, sum(n) AS tot, count(*) AS k FROM f GROUP BY col)
SELECT f.col, CAST(max(t.k) AS BIGINT) AS n_categories,
       round(-sum((f.n / t.tot) * ln(f.n / t.tot)), 6) AS entropy,
       round(-sum((f.n / t.tot) * ln(f.n / t.tot)) / ln(max(t.k)), 6)
         AS normalized
FROM f JOIN t ON f.col = t.col
GROUP BY f.col ORDER BY f.col
""",
    doc="qa23: Shannon entropy of categorical columns (priority and "
    "status, unpivoted into one pass) with the ln(k)-normalized "
    "form — the single-column information profile completing "
    "qprof2's pairwise MI (H(X) and H(Y) are its marginal terms): "
    "near-0 normalized entropy flags a constant-ish column, near-1 "
    "a uniform one — the profiler's partition-key and "
    "encoding-choice signal. One groupBy per (col, value), "
    "broadcast totals, all mergeable.",
    tags=("agg", "entropy", "profile"),
)
def qa23_categorical_entropy(spark, sf_dir):
    o = tables(spark, sf_dir).orders
    c = o.select(
        F.lit("o_orderpriority").alias("col"),
        F.col("o_orderpriority").alias("val"),
    ).union(
        o.select(
            F.lit("o_orderstatus").alias("col"),
            F.col("o_orderstatus").alias("val"),
        )
    )
    f = c.groupBy("col", "val").agg(F.count("*").cast("double").alias("n"))
    t = f.groupBy("col").agg(
        F.sum("n").alias("tot"), F.count("*").alias("k")
    )
    j = f.join(F.broadcast(t), "col")
    p = F.col("n") / F.col("tot")
    return (
        j.groupBy("col")
        .agg(
            F.max("k").cast("bigint").alias("n_categories"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.round(
                -F.sum(p * F.log(p)) / F.log(F.max("k")), 6
            ).alias("normalized"),
        )
        .orderBy("col")
    )


@query(
    "qa24_skyline",
    oracle="""
WITH pts AS (
  SELECT o_orderkey, o_totalprice AS price,
         date_diff('day', DATE '1992-01-01', o_orderdate) AS age_days
  FROM orders),
g AS (SELECT price, min(age_days) AS gmin FROM pts GROUP BY price),
gb AS (SELECT price, gmin,
              min(gmin) OVER (ORDER BY price DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS best_higher
       FROM g)
SELECT p.o_orderkey, round(p.price, 2) AS price,
       CAST(p.age_days AS BIGINT) AS age_days
FROM pts p JOIN gb ON p.price = gb.price
WHERE p.age_days = gb.gmin
  AND (gb.best_higher IS NULL OR p.age_days < gb.best_higher)
ORDER BY price DESC, p.o_orderkey
""",
    doc="qa24: 2-D skyline (Pareto frontier) — orders not DOMINATED by "
    "any other (dominate = higher-or-equal price AND lower-or-equal "
    "age, strictly better somewhere): the classic multi-criteria "
    "shortlist operator. TWO-PHASE at scale: a map-side prune first "
    "drops every point whose age is beaten by the best age of any "
    "strictly-higher fixed-width price bucket (bucket minima are a "
    "driver-tiny table, suffix-min computed there and broadcast "
    "back), then the exact sort-filter skyline (sort by price DESC, "
    "age ASC; survive iff age < running min over the preceding "
    "frame) runs on the pruned remnant — the single-partition "
    "window the naive form would run over ALL rows touches only "
    "the distinct-PRICE group table plus survivors (294 points of "
    "15k at sf0.01, measured). Dominance over equal prices is done "
    "via per-price group minima: a point survives iff it holds its "
    "price group's min age AND beats every strictly-higher price's "
    "best — so equal-(price, age) twins BOTH survive (neither is "
    "strictly better; a first cut's strict running-min filter "
    "dropped the later twin, caught in review against a literal "
    "twin pair). The oracle runs the unpruned group-min form — the "
    "prune must be lossless.",
    tags=("agg", "skyline", "pareto"),
)
def qa24_skyline(spark, sf_dir):
    o = tables(spark, sf_dir).orders
    pts = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .alias("age_days"),
        F.floor(F.col("o_totalprice") / 10000.0).alias("_b"),
    )
    # phase 1: bucket suffix-minima on the driver (bounded: price range
    # / width buckets), broadcast as a prune threshold — a point beaten
    # by a strictly-higher bucket's best age is dominated for sure
    bmins = {
        r._b: r.m
        for r in pts.groupBy("_b").agg(F.min("age_days").alias("m")).collect()
    }
    suffix, best = {}, None
    for b in sorted(bmins, reverse=True):
        suffix[b] = best  # best age among STRICTLY higher buckets
        best = bmins[b] if best is None else min(best, bmins[b])
    thr = F.create_map(
        *[
            x
            for b, v in suffix.items()
            if v is not None
            for x in (F.lit(b), F.lit(v))
        ]
    ) if any(v is not None for v in suffix.values()) else None
    pruned = (
        pts.withColumn("_thr", thr[F.col("_b")]).filter(
            F.col("_thr").isNull() | (F.col("age_days") <= F.col("_thr"))
        )
        if thr is not None
        else pts
    )
    # phase 2: exact skyline on the pruned remnant via per-price
    # group minima — survive iff you hold your price's min age AND
    # beat every strictly-higher price's best (equal twins both live)
    g = pruned.groupBy("price").agg(F.min("age_days").alias("gmin"))
    wg = Window.orderBy(F.col("price").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    gb = g.withColumn("best_higher", F.min("gmin").over(wg))
    return (
        pruned.join(gb, "price")
        .filter(
            (F.col("age_days") == F.col("gmin"))
            & (
                F.col("best_higher").isNull()
                | (F.col("age_days") < F.col("best_higher"))
            )
        )
        .select(
            "o_orderkey",
            F.round("price", 2).alias("price"),
            F.col("age_days").cast("bigint").alias("age_days"),
        )
        .orderBy(F.col("price").desc(), "o_orderkey")
    )


@query(
    "qa25_lorenz_curve",
    oracle="""
WITH x AS (SELECT l_returnflag AS rf,
                  CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
                  l_orderkey AS ok, l_linenumber AS ln
           FROM lineitem),
r AS (SELECT rf, v, ntile(10) OVER (PARTITION BY rf ORDER BY v, ok, ln)
               AS decile
      FROM x),
d AS (SELECT rf, decile, count(*) AS n, sum(v) AS sv
      FROM r GROUP BY rf, decile),
c AS (SELECT rf, decile, n, sv,
             sum(sv) OVER (PARTITION BY rf ORDER BY decile) AS cum,
             sum(sv) OVER (PARTITION BY rf) AS total
      FROM d)
SELECT rf AS l_returnflag, CAST(decile AS INT) AS decile,
       CAST(n AS BIGINT) AS n,
       round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
         AS cum_share
FROM c ORDER BY rf, decile
""",
    doc="qa25: Lorenz curve per return flag - cumulative revenue "
    "share by value decile, the distribution CURVE behind qa21's "
    "scalar Gini (the profiler pair: qa21 says HOW concentrated, "
    "this says WHERE the mass sits - e.g. top decile share drives "
    "the salting decision directly). Deciles via ntile(10) on a "
    "deterministic (value, orderkey, linenumber) sort; all "
    "accumulation in DECIMAL(18,2) - exact integer-scaled "
    "arithmetic, immune to float summation order - doubles enter "
    "only at the final share ratio (round 6). Shape: one per-group "
    "window sort + one groupBy + one 10-row-per-group cumulative "
    "window; the per-group sort parallelizes across groups exactly "
    "like qa21.",
    tags=("agg", "stats", "inequality", "profile"),
)
def qa25_lorenz_curve(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    x = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("rf").orderBy("v", "l_orderkey", "l_linenumber")
    r = x.select("rf", "v", F.ntile(10).over(w).alias("decile"))
    d = r.groupBy("rf", "decile").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    wc = Window.partitionBy("rf").orderBy("decile")
    wt = Window.partitionBy("rf")
    c = d.select(
        "rf", "decile", "n",
        F.sum("sv").over(wc).alias("cum"),
        F.sum("sv").over(wt).alias("total"),
    )
    return c.select(
        F.col("rf").alias("l_returnflag"),
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("cum").cast("double") / F.col("total").cast("double"), 6
        ).alias("cum_share"),
    ).orderBy("l_returnflag", "decile")


@query(
    "qreg1_grouped_ols",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc="qreg1: per-group ordinary least squares via the SQL-standard "
    "regr_* aggregate family (slope/intercept/R^2 of extended price "
    "on quantity per return flag) - the grouped-regression shape every "
    "metrics pipeline uses for trend fits, computed as ONE "
    "partial-aggregatable pass (the regr_* moments are sums, so "
    "map-side combine applies; no second scan, no collect). Rounding "
    "(4/2/6) absorbs float summation order exactly as qa8's "
    "stddev/corr row established. qml3 covers prediction-error "
    "metrics for a GIVEN model; this row certifies FITTING the model "
    "distributed.",
    tags=("agg", "stats", "regression"),
)
def qreg1_grouped_ols(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.regr_slope(F.col("l_extendedprice"), F.col("l_quantity")),
                4,
            ).alias("slope"),
            F.round(
                F.regr_intercept(
                    F.col("l_extendedprice"), F.col("l_quantity")
                ),
                2,
            ).alias("intercept"),
            F.round(
                F.regr_r2(F.col("l_extendedprice"), F.col("l_quantity")), 6
            ).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "qab1_welch_ttest",
    oracle="""
WITH g AS (SELECT event_type,
                  count(*) AS n,
                  avg(value) AS m,
                  var_samp(value) AS v
           FROM events WHERE event_type IN ('click', 'purchase')
           GROUP BY event_type),
a AS (SELECT n, m, v FROM g WHERE event_type = 'click'),
b AS (SELECT n, m, v FROM g WHERE event_type = 'purchase')
SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       round(a.m - b.m, 5) AS mean_diff,
       round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 5) AS t_stat,
       round(pow(a.v / a.n + b.v / b.n, 2)
             / (pow(a.v / a.n, 2) / (a.n - 1)
                + pow(b.v / b.n, 2) / (b.n - 1)), 3) AS welch_df
FROM a, b
""",
    doc="qab1: Welch's two-sample t-test - THE A/B-experiment "
    "statistic (unequal variances, no pooling): t and the "
    "Welch-Satterthwaite degrees of freedom between click and "
    "purchase event values, from nothing but per-group (n, mean, "
    "var_samp) - one partial-aggregatable pass over the events "
    "table, two 1-row sides crossed at the end. At 100 TB an "
    "experimentation platform computes exactly these moments per "
    "(experiment, arm) in one shuffle; the t/df arithmetic is "
    "driver-trivial. p-values need the t CDF (no closed SQL form, "
    "engine-dependent) so the gate certifies the statistic, which "
    "is the deterministic part. Rounding absorbs float summation "
    "order as established by qa8.",
    tags=("agg", "stats", "abtest"),
)
def qab1_welch_ttest(spark, sf_dir):
    ev = tables(spark, sf_dir).events
    g = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"),
        F.col("v").alias("v_a"),
    )
    b = g.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"),
        F.col("v").alias("v_b"),
    )
    se2a = F.col("v_a") / F.col("n_a")
    se2b = F.col("v_b") / F.col("n_b")
    return a.crossJoin(b).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(F.col("m_a") - F.col("m_b"), 5).alias("mean_diff"),
        F.round(
            (F.col("m_a") - F.col("m_b")) / F.sqrt(se2a + se2b), 5
        ).alias("t_stat"),
        F.round(
            F.pow(se2a + se2b, 2)
            / (
                F.pow(se2a, 2) / (F.col("n_a") - 1)
                + F.pow(se2b, 2) / (F.col("n_b") - 1)
            ),
            3,
        ).alias("welch_df"),
    )


@query(
    "qa26_higher_moments",
    oracle="""
WITH m AS (SELECT l_returnflag AS rf, count(*) AS n,
                  avg(l_quantity) AS m1,
                  avg(l_quantity * l_quantity) AS m2,
                  avg(l_quantity * l_quantity * l_quantity) AS m3,
                  avg(l_quantity * l_quantity * l_quantity * l_quantity)
                    AS m4
           FROM lineitem GROUP BY rf),
c AS (SELECT rf, n,
             m2 - m1 * m1 AS v,
             m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1 AS u3,
             m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2
                - 3 * m1 * m1 * m1 * m1 AS u4
      FROM m)
SELECT rf AS l_returnflag, CAST(n AS BIGINT) AS n,
       round(v, 4) AS variance_pop,
       round(u3 / pow(v, 1.5), 5) AS skewness,
       round(u4 / (v * v) - 3, 5) AS excess_kurtosis
FROM c ORDER BY rf
""",
    doc="qa26: population skewness and excess kurtosis per return "
    "flag, computed from RAW power sums (E[x^k], k<=4) with the "
    "central-moment identities applied explicitly - NOT the builtin "
    "skewness()/kurtosis() aggregates, because Spark and DuckDB "
    "disagree on the estimator (population vs sample-adjusted), a "
    "dialect trap this row documents by construction. One "
    "partial-aggregatable pass (power sums are plain sums - "
    "map-side combine applies at any scale); quantity's small "
    "magnitude (<= 50) keeps the k=4 power sums well inside double "
    "precision. Completes the moments ladder above qa8's "
    "stddev/corr.",
    tags=("agg", "stats", "moments"),
)
def qa26_higher_moments(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    q = F.col("l_quantity")
    m = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.count("*").alias("n"),
        F.avg(q).alias("m1"),
        F.avg(q * q).alias("m2"),
        F.avg(q * q * q).alias("m3"),
        F.avg(q * q * q * q).alias("m4"),
    )
    m1, m2, m3, m4 = (F.col(c) for c in ("m1", "m2", "m3", "m4"))
    v = m2 - m1 * m1
    u3 = m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1
    u4 = m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1
    return m.select(
        F.col("rf").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n"),
        F.round(v, 4).alias("variance_pop"),
        F.round(u3 / F.pow(v, 1.5), 5).alias("skewness"),
        F.round(u4 / (v * v) - 3, 5).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


@query(
    "qa27_grouping_sets",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS sum_price,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY status, priority
""",
    doc="qa27: explicit GROUPING SETS — the general form rollup and "
    "cube (qa4/qa5) are sugar for, with an ASYMMETRIC set list "
    "((status), (priority), ()) that is NEITHER a rollup prefix "
    "chain nor a full cube, so the row certifies the arbitrary-sets "
    "path (DataFrame.groupingSets, Spark 4). One pass with partial "
    "aggregation per set via Expand — no per-set rescans; the "
    "grand-total row disambiguates the 'ALL'/'ALL' coordinate. Keys "
    "COALESCE to 'ALL' per the module convention (no NULL-ordering "
    "dialect trap).",
    tags=("agg", "grouping_sets"),
)
def qa27_grouping_sets(spark, sf_dir):
    orders = tables(spark, sf_dir).orders
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "sum_price",
            "avg_price",
        )
        .orderBy("status", "priority")
    )


@query(
    "qab2_chi_square",
    oracle="""
WITH obs AS (SELECT event_type, user_id % 4 AS cohort,
                    count(*)::DOUBLE AS o
             FROM events GROUP BY 1, 2),
tot AS (SELECT sum(o) AS n FROM obs),
rowm AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY 1),
colm AS (SELECT cohort, sum(o) AS c FROM obs GROUP BY 1),
cells AS (SELECT o, r * c / n AS e
          FROM obs JOIN rowm USING (event_type)
                   JOIN colm USING (cohort) CROSS JOIN tot),
stat AS (SELECT sum((o - e) * (o - e) / e) AS chi2, sum(o) AS n
         FROM cells),
dims AS (SELECT (SELECT count(*) FROM rowm) AS nr,
                (SELECT count(*) FROM colm) AS nc)
SELECT round(chi2, 6) AS chi2,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       round(sqrt(chi2 / (n * least(nr - 1, nc - 1))), 6) AS cramers_v,
       CAST(n AS BIGINT) AS n
FROM stat CROSS JOIN dims
""",
    doc="qab2: chi-square test of independence — event_type vs a "
    "4-way user cohort (user_id % 4: deterministic, identical in "
    "both engines), with degrees of freedom and Cramer's V effect "
    "size. The categorical counterpart to qab1's Welch t-test: "
    "qab1 answers 'did the metric move', this answers 'is the "
    "categorical mix independent of the assignment' — the "
    "guardrail/SRM check every A/B platform runs before trusting "
    "the metric. Scale shape: one contingency aggregation (the "
    "only corpus-sized pass, map-side combinable), then marginals "
    "and the statistic over the |types| x |cohorts| cell table — "
    "driver-tiny regardless of event volume. Observed counts are "
    "exact integers; expected counts and the statistic are "
    "arithmetic over a 20-cell table, rounded at 6dp.",
    tags=("agg", "stats", "abtest"),
)
def qab2_chi_square(spark, sf_dir):
    ev = tables(spark, sf_dir).events
    # ONE corpus-sized pass; marginals and expecteds are window sums
    # over the |types| x |cohorts| cell table (a re-aggregation per
    # marginal would re-scan the corpus once per margin — 4 scans for
    # a 20-row contingency, the shape the first cut actually planned)
    obs = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count("*").cast("double").alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("cohort")
    wn = Window.partitionBy()
    e = (
        F.sum("o").over(wr) * F.sum("o").over(wc) / F.sum("o").over(wn)
    )
    cells = obs.select("event_type", "cohort", "o", e.alias("e"))
    stat = cells.agg(
        F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")).alias("chi2"),
        F.sum("o").alias("n"),
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("cohort").alias("nc"),
    )
    return stat.select(
        F.round("chi2", 6).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1))
        .cast("bigint")
        .alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
        F.col("n").cast("bigint").alias("n"),
    )


@query(
    "qa28_quantile_summary_certificate",
    oracle="""
WITH vc AS (SELECT l_quantity AS v, count(*) AS c FROM lineitem GROUP BY v),
cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum_le FROM vc),
n AS (SELECT count(*) AS n FROM lineitem),
probs(p) AS (VALUES (0.1), (0.25), (0.5), (0.75), (0.9), (0.99)),
t AS (SELECT p, CAST(ceil(p * n.n) AS BIGINT) AS target FROM probs, n)
SELECT CAST(t.p AS DOUBLE) AS p,
       round(min(cum.v), 1) AS exact_q,
       true AS within_bound
FROM t JOIN cum ON cum.cum_le >= t.target
GROUP BY t.p ORDER BY p
""",
    doc="Q-A28: the mergeable quantile summary (operators/sketch.py "
    "quantile_summary / summary_quantiles, Munro-Paterson per-"
    "partition block compression) promoted to the declared tier as a "
    "CERTIFICATE row: for six probabilities over lineitem.l_quantity "
    "it emits (p, exact type-1 quantile, within_bound), where "
    "exact_q is the smallest value whose cumulative count reaches "
    "ceil(p*N) — computed scale-consciously from the value-bucketed "
    "counts (l_quantity has a 50-value domain, so the cumsum window "
    "runs over <= 50 rows, never the data) and hash-matched against "
    "the identically-defined DuckDB cumsum — and within_bound checks "
    "the SUMMARY's estimate against the deterministic rank-error "
    "guarantee: the estimate's true-rank interval [cum_lt, cum_le] "
    "must land within N/m + P of the target rank (m=256, P = actual "
    "input partition count via a projected spark_partition_id). The "
    "oracle asserts within_bound = true literally: the bound is a "
    "theorem about the operator, so any partitioning that violated "
    "it would hash-mismatch — the same gate shape as the recall-"
    "gated ANN rows but exact rather than tolerant. The summary "
    "itself is partition-dependent (only the BOUND is certified "
    "cross-engine); the tight per-partition property is pinned in "
    "tests/test_capabilities.py. At 100 TB: one mapInPandas "
    "compression pass (<= m rows leave each partition), a <= 50-row "
    "window, and broadcast-sized prob/target tables.",
    tags=("agg", "sketch", "quantile"),
)
def qa28_quantile_summary_certificate(spark, sf_dir):
    from sora_spark.operators import sketch

    PROBS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    M = 256
    li = tables(spark, sf_dir).lineitem.select("l_quantity")
    stats = (
        li.withColumn("_pid", F.spark_partition_id())
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("_pid").alias("np"),
        )
        .collect()[0]
    )
    n, n_parts = int(stats["n"]), int(stats["np"])
    bound = n / M + n_parts

    summ = sketch.quantile_summary(li, "l_quantity", m=M)
    est = sketch.summary_quantiles(summ, PROBS).withColumnRenamed(
        "value", "est_v"
    )

    vc = li.groupBy("l_quantity").agg(F.count("*").alias("c"))
    w = Window.orderBy("l_quantity").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vc.select(
        F.col("l_quantity").alias("v"),
        F.col("c"),
        F.sum("c").over(w).alias("cum_le"),
    ).withColumn("cum_lt", F.col("cum_le") - F.col("c"))

    targets = spark.createDataFrame(
        [(p, -(-int(p * n * 10**6) // 10**6)) for p in PROBS],
        "p double, target bigint",
    )
    exact = (
        targets.join(cum, cum["cum_le"] >= targets["target"])
        .groupBy("p", "target")
        .agg(F.min("v").alias("exact_q"))
    )
    return (
        exact.join(est, "p")
        .join(cum, F.col("est_v") == F.col("v"))
        .select(
            "p",
            F.round("exact_q", 1).alias("exact_q"),
            (
                (F.col("cum_le") >= F.col("target") - F.lit(bound))
                & (F.col("cum_lt") <= F.col("target") - 1 + F.lit(bound))
            ).alias("within_bound"),
        )
        .orderBy("p")
    )


@query(
    "qa29_hll_register_sketch",
    oracle="""
WITH vals AS (
  SELECT md5(CAST(o_custkey AS VARCHAR)) AS h
  FROM orders WHERE o_custkey IS NOT NULL),
rr AS (
  SELECT (('0x' || substr(h, 1, 2))::BIGINT) % 64 AS j,
         CASE WHEN instr(lpad(bin(('0x' || substr(h, 3, 8))::BIGINT),
                              32, '0'), '1') = 0
              THEN 33
              ELSE instr(lpad(bin(('0x' || substr(h, 3, 8))::BIGINT),
                              32, '0'), '1') END AS rho
  FROM vals),
regs0 AS (SELECT j, max(rho) AS m_j FROM rr GROUP BY j),
allj AS (SELECT unnest(range(0, 64)) AS j),
regs AS (SELECT allj.j, CAST(coalesce(regs0.m_j, 0) AS INT) AS m_j
         FROM allj LEFT JOIN regs0 ON allj.j = regs0.j),
s AS (SELECT sum(power(2.0, -m_j)) AS z,
             sum(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS v0 FROM regs),
e AS (SELECT round(CASE WHEN 0.709 * 4096 / z <= 160.0 AND v0 > 0
                        THEN 64 * round(ln(64.0 / v0), 8)
                        ELSE 0.709 * 4096 / z END, 4) AS estimate
      FROM s),
x AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders WHERE o_custkey IS NOT NULL)
SELECT regs.j, regs.m_j, e.estimate, x.exact_distinct,
       (abs(e.estimate - x.exact_distinct) / x.exact_distinct < 0.39)
         AS within_bound
FROM regs, e, x ORDER BY j
""",
    doc="qa29: PORTABLE HyperLogLog certificate "
    "(operators/sketch.py hll_registers/hll_estimate) — the mergeable "
    "cardinality sketch built from arithmetic every engine shares "
    "(md5, hex->int, bin, instr), so the ENTIRE 64-register table is "
    "hash-tier deterministic cross-engine, unlike builtin "
    "approx_count_distinct whose HLL++ internals are engine-private. "
    "Output = all 64 registers + the standard-HLL estimate "
    "(small-range linear-counting correction; harmonic sum is EXACT "
    "in doubles — 64 dyadic terms, no order sensitivity; ln "
    "pre-rounded for cross-libm hygiene) + exact distinct + a "
    "3-sigma relative-error flag over o_custkey. Shapes: one "
    "map-side hash projection, an m-bounded groupBy (m=64 rows "
    "shuffle, never values), merge of two sketches = elementwise "
    "MAX (pinned in test_capabilities). The builtin stays the speed "
    "path; this is the cross-engine-verifiable twin.",
    tags=("agg", "sketch", "approx"),
)
def qa29_hll_register_sketch(spark, sf_dir):
    from sora_spark.operators import sketch

    orders = tables(spark, sf_dir).orders
    regs = sketch.hll_registers(orders, "o_custkey", m=64)
    est = sketch.hll_estimate(regs, m=64)
    exact = (
        orders.filter(F.col("o_custkey").isNotNull())
        .agg(F.countDistinct("o_custkey").cast("bigint")
             .alias("exact_distinct"))
    )
    return (
        regs.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .select(
            "j", "m_j", "estimate", "exact_distinct",
            (F.abs(F.col("estimate") - F.col("exact_distinct"))
             / F.col("exact_distinct") < 0.39).alias("within_bound"),
        )
        .orderBy("j")
    )


@query(
    "qa30_weighted_percentiles",
    oracle="""
WITH w AS (
  SELECT l_returnflag AS g, round(l_extendedprice, 2) AS v,
         l_quantity AS wt,
         sum(l_quantity) OVER (
           PARTITION BY l_returnflag
           ORDER BY round(l_extendedprice, 2), l_orderkey, l_linenumber
         ) AS cw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem)
SELECT g,
       round(min(CASE WHEN cw >= 0.25 * tw THEN v END), 2) AS w_p25,
       round(min(CASE WHEN cw >= 0.50 * tw THEN v END), 2) AS w_median,
       round(min(CASE WHEN cw >= 0.75 * tw THEN v END), 2) AS w_p75
FROM w GROUP BY g ORDER BY g
""",
    doc="qa30: WEIGHTED percentiles per group — the quantity-weighted "
    "p25/median/p75 of extended price per return flag (weighted "
    "type-1 quantile: the smallest value whose cumulative weight "
    "reaches p of the group total). The unweighted percentile "
    "family (qa7 etc.) treats every row equally; weighting by "
    "quantity answers 'the price level at which half the VOLUME "
    "trades' — the inventory/curriculum-sampling form. Shapes: one "
    "window cumsum under a TOTAL order (value + the (orderkey, "
    "linenumber) unique tiebreak, so equal prices accumulate in the "
    "same deterministic order in both engines) + one conditional-min "
    "aggregation; weights sum as integers (no float drift in the "
    "thresholds' left side; the p*total threshold is one exact "
    "int-to-double product per group).",
    tags=("agg", "percentile", "weighted"),
)
def qa30_weighted_percentiles(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    v = F.round("l_extendedprice", 2)
    w = (
        li.select(
            F.col("l_returnflag").alias("g"),
            v.alias("v"),
            F.col("l_quantity").alias("wt"),
            "l_orderkey",
            "l_linenumber",
        )
        .withColumn(
            "cw",
            F.sum("wt").over(
                Window.partitionBy("g").orderBy(
                    "v", "l_orderkey", "l_linenumber")
            ),
        )
        .withColumn("tw", F.sum("wt").over(Window.partitionBy("g")))
    )
    def pct(p, name):
        return F.round(
            F.min(F.when(F.col("cw") >= p * F.col("tw"), F.col("v"))), 2
        ).alias(name)
    return (
        w.groupBy("g")
        .agg(pct(0.25, "w_p25"), pct(0.50, "w_median"), pct(0.75, "w_p75"))
        .orderBy("g")
    )


@query(
    "qa32_portable_cms",
    oracle="""
WITH vals AS (
  SELECT md5(CAST(o_custkey AS VARCHAR)) AS h
  FROM orders WHERE o_custkey IS NOT NULL),
cells AS (
  SELECT i,
         ((('0x' || substr(h, 1, 8))::BIGINT
           + i * (('0x' || substr(h, 9, 8))::BIGINT)) % 64) AS j,
         count(*) AS c
  FROM vals, unnest(range(0, 4)) AS t(i)
  GROUP BY 1, 2),
probes AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey % 97 = 0),
pa AS (
  SELECT k, i,
         ((('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT
           + i * (('0x' || substr(md5(CAST(k AS VARCHAR)), 9, 8))::BIGINT))
          % 64) AS j
  FROM probes, unnest(range(0, 4)) AS t(i)),
est AS (
  SELECT k, min(coalesce(c, 0)) AS estimate
  FROM pa LEFT JOIN cells USING (i, j) GROUP BY k),
exact AS (
  SELECT o_custkey AS k, count(*) AS exact_n FROM orders GROUP BY 1)
SELECT est.k, CAST(exact_n AS BIGINT) AS exact_n,
       CAST(estimate AS BIGINT) AS estimate,
       estimate >= exact_n AS ge_exact
FROM est JOIN exact USING (k) ORDER BY est.k
""",
    doc="qa32: PORTABLE COUNT-MIN SKETCH (operators/sketch.py "
    "cms_table / cms_point_estimates) — the frequency member "
    "completing the mergeable-summaries trio with qa29's portable "
    "HLL (cardinality) and qcont4's portable Bloom (membership), all "
    "from the same engine-shared md5 + Kirsch–Mitzenmacher "
    "arithmetic: a 4x64 grid counts each customer's order "
    "occurrences into one bucket per row, and a point estimate is "
    "the min over rows — collisions only ADD, so estimate >= exact "
    "always (emitted per probe and hash-gated along with the exact "
    "INTEGER estimates themselves — no float anywhere). Shapes: one "
    "map-side x4 explode + a grid-bounded partial-aggregable groupBy "
    "builds the sketch; probes address it via a broadcast join. "
    "Elementwise-SUM mergeability (the distributed one-pass "
    "property) and the 2N/width error envelope are pinned in "
    "test_capabilities.py::test_cms_properties. At 100 TB the raw "
    "key stream never shuffles wider than depth x width cells.",
    tags=("agg", "sketch", "approx", "portable"),
)
def qa32_portable_cms(spark, sf_dir):
    from sora_spark.operators import sketch

    orders = tables(spark, sf_dir).orders
    grid = sketch.cms_table(orders, "o_custkey", width=64, depth=4)
    probes = (
        orders.filter(F.col("o_custkey") % 97 == 0)
        .select("o_custkey").distinct()
    )
    est = sketch.cms_point_estimates(
        probes, "o_custkey", grid, width=64, depth=4
    ).withColumnRenamed("key", "k")
    exact = (
        orders.groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    )
    return (
        est.join(exact, "k")
        .select(
            "k", "exact_n", "estimate",
            (F.col("estimate") >= F.col("exact_n")).alias("ge_exact"),
        )
        .orderBy("k")
    )


@query(
    "qa33_kmv_bottom_k",
    oracle="""
WITH h AS (SELECT DISTINCT md5(CAST(l_partkey AS VARCHAR)) AS hh
           FROM lineitem),
g AS (SELECT hh FROM h ORDER BY hh LIMIT 64),
h2 AS (SELECT DISTINCT l_orderkey % 2 AS part,
              md5(CAST(l_partkey AS VARCHAR)) AS hh
       FROM lineitem),
pb AS (SELECT hh FROM (
         SELECT hh, row_number() OVER (PARTITION BY part
                                       ORDER BY hh) AS rn
         FROM h2) t WHERE rn <= 64),
m AS (SELECT hh FROM (SELECT DISTINCT hh FROM pb) u
      ORDER BY hh LIMIT 64),
stg AS (SELECT 'a_global' AS stage, max(hh) AS kth_hash FROM g
        UNION ALL
        SELECT 'b_merged', max(hh) FROM m)
SELECT stage, kth_hash,
       round(63.0 / ((
           (strpos('0123456789abcdef', substr(kth_hash, 1, 1)) - 1)
               * 17592186044416.0
         + (strpos('0123456789abcdef', substr(kth_hash, 2, 1)) - 1)
               * 1099511627776.0
         + (strpos('0123456789abcdef', substr(kth_hash, 3, 1)) - 1)
               * 68719476736.0
         + (strpos('0123456789abcdef', substr(kth_hash, 4, 1)) - 1)
               * 4294967296.0
         + (strpos('0123456789abcdef', substr(kth_hash, 5, 1)) - 1)
               * 268435456.0
         + (strpos('0123456789abcdef', substr(kth_hash, 6, 1)) - 1)
               * 16777216.0
         + (strpos('0123456789abcdef', substr(kth_hash, 7, 1)) - 1)
               * 1048576.0
         + (strpos('0123456789abcdef', substr(kth_hash, 8, 1)) - 1)
               * 65536.0
         + (strpos('0123456789abcdef', substr(kth_hash, 9, 1)) - 1)
               * 4096.0
         + (strpos('0123456789abcdef', substr(kth_hash, 10, 1)) - 1)
               * 256.0
         + (strpos('0123456789abcdef', substr(kth_hash, 11, 1)) - 1)
               * 16.0
         + (strpos('0123456789abcdef', substr(kth_hash, 12, 1)) - 1)
       ) / 281474976710656.0), 4) AS est
FROM stg ORDER BY stage
""",
    doc="qa33: KMV / bottom-k sketch (operators/sketch.py "
    "kmv_bottom_k + kmv_estimate) — the fourth member of the "
    "portable mergeable-summaries family (HLL qa29 / Bloom qcont4 / "
    "CMS qa32): the k smallest md5 hashes of the distinct l_partkey "
    "values are simultaneously a distinct-count estimator "
    "(D-hat = (k-1)/h_(k), Bar-Yossef et al.) and a DETERMINISTIC "
    "uniform sample of the distinct domain — and because md5 is "
    "portable, the sketch is hash-gated EXACTLY, estimator included "
    "(the estimate divides exact 48-bit integers after a "
    "power-of-two scaling, one IEEE division in both engines — no "
    "tolerance band needed, unlike every RNG-seeded sampler). The "
    "'b_merged' stage re-sketches the union of two per-partition "
    "sketches (l_orderkey%2 halves) and must reproduce the global "
    "rows bit-for-bit: bottom-k(A∪B) = bottom-k(bottom-k(A) ∪ "
    "bottom-k(B)) — the mergeability a 1000-executor rollup relies "
    "on. Scale: map-side partial distinct on hashes, then "
    "TakeOrderedAndProject (per-partition k-heaps, k-row exchange) — "
    "the raw value stream never global-sorts; the sketch answers "
    "'how many distincts and which sample' over 100 TB with k rows "
    "per summary.",
    tags=("agg", "sketch", "approx", "dedup"),
)
def qa33_kmv_bottom_k(spark, sf_dir):
    from sora_spark.operators import sketch

    li = tables(spark, sf_dir).lineitem
    g = sketch.kmv_bottom_k(li, "l_partkey", 64)
    halves = li.select(
        (F.col("l_orderkey") % 2).alias("part"),
        F.md5(F.col("l_partkey").cast("string")).alias("kmv_hash"),
    ).distinct()
    w = Window.partitionBy("part").orderBy("kmv_hash")
    merged = (
        halves.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .select("kmv_hash")
        .distinct()
        .orderBy("kmv_hash")
        .limit(64)
    )
    return (
        sketch.kmv_estimate(g, 64)
        .select(F.lit("a_global").alias("stage"), "kth_hash", "est")
        .unionByName(
            sketch.kmv_estimate(merged, 64)
            .select(F.lit("b_merged").alias("stage"), "kth_hash", "est")
        )
        .orderBy("stage")
    )


@query(
    "qa34_grouped_kmv",
    oracle="""
WITH h AS (SELECT DISTINCT l_returnflag AS g,
                  md5(CAST(l_suppkey AS VARCHAR)) AS hh
           FROM lineitem),
r AS (SELECT g, hh, row_number() OVER (PARTITION BY g
                                       ORDER BY hh) AS rn
      FROM h),
b AS (SELECT g, hh, rn FROM r WHERE rn <= 32),
kth AS (SELECT g, max(hh) AS kth_hash, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY g)
SELECT g, kth_hash,
       CASE WHEN n < 32 THEN round(CAST(n AS DOUBLE), 4)
            ELSE round(31.0 / ((
           (strpos('0123456789abcdef', substr(kth_hash, 1, 1)) - 1)
               * 17592186044416.0
         + (strpos('0123456789abcdef', substr(kth_hash, 2, 1)) - 1)
               * 1099511627776.0
         + (strpos('0123456789abcdef', substr(kth_hash, 3, 1)) - 1)
               * 68719476736.0
         + (strpos('0123456789abcdef', substr(kth_hash, 4, 1)) - 1)
               * 4294967296.0
         + (strpos('0123456789abcdef', substr(kth_hash, 5, 1)) - 1)
               * 268435456.0
         + (strpos('0123456789abcdef', substr(kth_hash, 6, 1)) - 1)
               * 16777216.0
         + (strpos('0123456789abcdef', substr(kth_hash, 7, 1)) - 1)
               * 1048576.0
         + (strpos('0123456789abcdef', substr(kth_hash, 8, 1)) - 1)
               * 65536.0
         + (strpos('0123456789abcdef', substr(kth_hash, 9, 1)) - 1)
               * 4096.0
         + (strpos('0123456789abcdef', substr(kth_hash, 10, 1)) - 1)
               * 256.0
         + (strpos('0123456789abcdef', substr(kth_hash, 11, 1)) - 1)
               * 16.0
         + (strpos('0123456789abcdef', substr(kth_hash, 12, 1)) - 1)
       ) / 281474976710656.0), 4) END AS est
FROM kth ORDER BY g
""",
    doc="qa34: GROUPED KMV sketches — qa33's bottom-k per GROUP BY "
    "key (distinct l_suppkey per returnflag, k=32): the shape a "
    "1000-executor per-segment cardinality rollup actually runs — "
    "one hash pass, one per-group window keeping k rows, estimator "
    "arithmetic identical to qa33's (exact 48-bit integer, one IEEE "
    "division; groups smaller than k report their exact size, the "
    "small-domain branch). Everything remains hash-gated exactly, "
    "estimator included — per-group sketch state is k rows "
    "regardless of group size.",
    tags=("agg", "sketch", "approx", "dedup"),
)
def qa34_grouped_kmv(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    h = li.select(
        F.col("l_returnflag").alias("g"),
        F.md5(F.col("l_suppkey").cast("string")).alias("hh"),
    ).distinct()
    w = Window.partitionBy("g").orderBy("hh")
    b = h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 32)
    kth = b.groupBy("g").agg(
        F.max("hh").alias("kth_hash"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    v = F.conv(F.substring("kth_hash", 1, 12), 16, 10).cast("double")
    est = F.when(
        F.col("n") < 32, F.round(F.col("n").cast("double"), 4)
    ).otherwise(
        F.round(F.lit(31.0) / (v / F.lit(float(16 ** 12))), 4)
    )
    return kth.select("g", "kth_hash", est.alias("est")).orderBy("g")


@query(
    "qa35_kmv_set_operations",
    oracle="""
WITH a AS (SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS hh
           FROM orders WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS hh
      FROM orders WHERE o_orderpriority = '2-HIGH'),
sa AS (SELECT hh FROM a ORDER BY hh LIMIT 64),
sb AS (SELECT hh FROM b ORDER BY hh LIMIT 64),
su AS (SELECT hh FROM (SELECT hh FROM sa UNION SELECT hh FROM sb) u
       ORDER BY hh LIMIT 64),
jn AS (SELECT CAST(count(*) AS BIGINT) AS j_num FROM su
       WHERE hh IN (SELECT hh FROM sa)
         AND hh IN (SELECT hh FROM sb)),
kth AS (SELECT max(hh) AS union_kth FROM su),
uest AS (
  SELECT union_kth,
         round(63.0 / ((
           (strpos('0123456789abcdef', substr(union_kth, 1, 1)) - 1)
               * 17592186044416.0
         + (strpos('0123456789abcdef', substr(union_kth, 2, 1)) - 1)
               * 1099511627776.0
         + (strpos('0123456789abcdef', substr(union_kth, 3, 1)) - 1)
               * 68719476736.0
         + (strpos('0123456789abcdef', substr(union_kth, 4, 1)) - 1)
               * 4294967296.0
         + (strpos('0123456789abcdef', substr(union_kth, 5, 1)) - 1)
               * 268435456.0
         + (strpos('0123456789abcdef', substr(union_kth, 6, 1)) - 1)
               * 16777216.0
         + (strpos('0123456789abcdef', substr(union_kth, 7, 1)) - 1)
               * 1048576.0
         + (strpos('0123456789abcdef', substr(union_kth, 8, 1)) - 1)
               * 65536.0
         + (strpos('0123456789abcdef', substr(union_kth, 9, 1)) - 1)
               * 4096.0
         + (strpos('0123456789abcdef', substr(union_kth, 10, 1)) - 1)
               * 256.0
         + (strpos('0123456789abcdef', substr(union_kth, 11, 1)) - 1)
               * 16.0
         + (strpos('0123456789abcdef', substr(union_kth, 12, 1)) - 1)
       ) / 281474976710656.0), 4) AS union_est
  FROM kth),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderpriority = '2-HIGH') t)
SELECT jn.j_num, uest.union_kth,
       round(CAST(jn.j_num AS DOUBLE) / 64.0, 6) AS jaccard,
       uest.union_est,
       round((CAST(jn.j_num AS DOUBLE) / 64.0) * uest.union_est, 4)
         AS inter_est,
       ex.exact_inter
FROM jn CROSS JOIN uest CROSS JOIN ex
""",
    doc="qa35: KMV SET ALGEBRA (the theta-sketch trade, Dasgupta et "
    "al.): from two per-segment bottom-64 sketches alone — never the "
    "raw key sets — estimate the segments' overlap: the union sketch "
    "is bottom-k of the two sketches' union (qa33's exact "
    "mergeability), Jaccard = |union-sketch hashes present in BOTH "
    "inputs| / k (the union sketch is a uniform sample of A∪B, so "
    "membership in both is a Bernoulli draw of the true Jaccard), "
    "and |A∩B| ≈ Jaccard × D-hat(A∪B). Every quantity is hash-gated "
    "EXACTLY — set membership over md5 hashes, integer counts, and "
    "two fixed-order IEEE ops for the estimate — with the true "
    "intersection alongside as the honesty column. At 100 TB this "
    "answers audience-overlap / segment-intersection questions from "
    "k-row sketches that every segment pipeline already maintains, "
    "without ever co-shuffling the raw key sets.",
    tags=("agg", "sketch", "approx", "setops"),
)
def qa35_kmv_set_operations(spark, sf_dir):
    from sora_spark.operators import sketch

    orders = tables(spark, sf_dir).orders

    def seg(p):
        return orders.filter(F.col("o_orderpriority") == p).select(
            F.col("o_custkey").alias("k"))

    sa = sketch.kmv_bottom_k(seg("1-URGENT"), "k", 64)
    sb = sketch.kmv_bottom_k(seg("2-HIGH"), "k", 64)
    su = (
        sa.unionByName(sb).distinct()
        .orderBy("kmv_hash").limit(64)
    )
    jn = (
        su.join(sa.withColumnRenamed("kmv_hash", "ha"),
                su["kmv_hash"] == F.col("ha"), "left_semi")
        .join(sb.withColumnRenamed("kmv_hash", "hb"),
              su["kmv_hash"] == F.col("hb"), "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("j_num"))
    )
    uest = sketch.kmv_estimate(su, 64).select(
        F.col("kth_hash").alias("union_kth"),
        F.col("est").alias("union_est"),
    )
    ex = (
        seg("1-URGENT").distinct()
        .intersect(seg("2-HIGH").distinct())
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    return (
        jn.crossJoin(F.broadcast(uest))
        .crossJoin(F.broadcast(ex))
        .select(
            "j_num", "union_kth",
            F.round(F.col("j_num").cast("double") / 64.0, 6)
            .alias("jaccard"),
            "union_est",
            F.round(
                (F.col("j_num").cast("double") / 64.0)
                * F.col("union_est"), 4,
            ).alias("inter_est"),
            "exact_inter",
        )
    )
