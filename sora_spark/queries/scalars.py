"""Declared queries: scalar function families Q-X1..Q-X7 (SURVEY §2.8).

One wide single-scan query certifies each family. Dialect rules
(SURVEY §5.5): POSIX-safe regex subset only; literal single-space
split; md5/sha256 as the only cross-engine hashes; sign() cast to INT
(DuckDB returns TINYINT, Spark DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sora_spark.catalog import tables
from sora_spark.queries.registry import query


@query(
    "qx1_string_functions",
    oracle="""
SELECT p_partkey,
       concat(p_brand, '-', p_type)                    AS brand_type,
       substr(p_name, 1, 10)                           AS name10,
       upper(p_name)                                   AS uname,
       lower(p_type)                                   AS ltype,
       CAST(length(p_name) AS INT)                     AS name_len,
       lpad(p_brand, 12, '*')                          AS padded,
       replace(p_type, 'O', '0')                       AS replaced,
       reverse(p_brand)                                AS rbrand,
       CAST(levenshtein(p_brand, 'Brand#10') AS INT)   AS lev,
       regexp_extract(p_name, '([a-z]+)', 1)           AS first_word,
       regexp_replace(p_type, '[AEIOU]', '_', 'g')     AS devoweled,
       trim(concat(' ', p_name, ' '))                  AS trimmed,
       string_split(p_name, ' ')[1]                    AS head_token
FROM part ORDER BY p_partkey LIMIT 200
""",
    doc="Q-X1: string family — concat/substr/case/length/lpad/replace/"
    "reverse/levenshtein/regexp_extract/regexp_replace/trim/split.",
    tags=("scalar", "string"),
)
def qx1_string_functions(spark, sf_dir):
    part = tables(spark, sf_dir).part
    return (
        part.select(
            "p_partkey",
            F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
            F.substring("p_name", 1, 10).alias("name10"),
            F.upper("p_name").alias("uname"),
            F.lower("p_type").alias("ltype"),
            F.length("p_name").alias("name_len"),
            F.lpad("p_brand", 12, "*").alias("padded"),
            F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("replaced"),
            F.reverse("p_brand").alias("rbrand"),
            F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("lev"),
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
            F.regexp_replace("p_type", "[AEIOU]", "_").alias("devoweled"),
            F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
            F.element_at(F.split("p_name", " "), 1).alias("head_token"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


@query(
    "qx2_datetime_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)                           AS y,
       CAST(month(o_orderdate) AS INT)                          AS m,
       CAST(day(o_orderdate) AS INT)                            AS d,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')   AS month_start,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')     AS plus30,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(quarter(o_orderdate) AS INT)                        AS q
FROM orders ORDER BY o_orderkey LIMIT 200
""",
    doc="Q-X2: date/time family over o_orderdate — year/month/day/"
    "date_trunc/date_add/datediff/last_day/quarter (date outputs "
    "formatted to strings in both engines).",
    tags=("scalar", "datetime"),
)
def qx2_datetime_functions(spark, sf_dir):
    orders = tables(spark, sf_dir).orders
    od = F.col("o_orderdate")
    return (
        orders.select(
            "o_orderkey",
            F.year(od).alias("y"),
            F.month(od).alias("m"),
            F.dayofmonth(od).alias("d"),
            F.date_format(F.date_trunc("month", od), "yyyy-MM-dd").alias("month_start"),
            F.date_format(F.date_add(od.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
            F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).alias(
                "days_since"
            ),
            F.date_format(F.last_day(od.cast("date")), "yyyy-MM-dd").alias("month_end"),
            F.quarter(od).alias("q"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


@query(
    "qx2b_time_events",
    oracle="""
SELECT event_id,
       epoch_us(ts)                                   AS us,
       CAST(hour(ts) AS INT)                          AS h,
       CAST(minute(ts) AS INT)                        AS mi,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f')           AS ts_str
FROM events ORDER BY event_id LIMIT 200
""",
    doc="Q-X2b: epoch-micros / hour / minute / full µs formatting over "
    "the nanos-normalized events.ts.",
    tags=("scalar", "datetime"),
)
def qx2b_time_events(spark, sf_dir):
    ev = tables(spark, sf_dir).events
    return (
        ev.select(
            "event_id",
            F.unix_micros(F.col("ts")).alias("us"),
            F.hour("ts").alias("h"),
            F.minute("ts").alias("mi"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        )
        .orderBy("event_id")
        .limit(200)
    )


@query(
    "qx3_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 6)          AS a,
       CAST(ceil(l_quantity / 7) AS BIGINT)      AS c,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS f,
       round(sqrt(l_extendedprice), 6)           AS sq,
       round(ln(l_extendedprice), 6)             AS lg,
       round(exp(l_discount), 6)                 AS ex,
       round(pow(l_quantity, 1.5), 6)            AS pw,
       CAST(l_linenumber % 3 AS INT)             AS md,
       CAST(sign(l_discount - 0.05) AS INT)      AS sg,
       round(greatest(l_quantity, l_discount * 100), 2) AS gr,
       round(least(l_quantity, l_tax * 100), 2)  AS le
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200
""",
    doc="Q-X3: math family — abs/ceil/floor/sqrt/ln/exp/power/mod/sign/"
    "greatest/least (sign cast to INT: DuckDB TINYINT vs Spark DOUBLE).",
    tags=("scalar", "math"),
)
def qx3_math_functions(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("a"),
            F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("c"),
            F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("f"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("lg"),
            F.round(F.exp("l_discount"), 6).alias("ex"),
            F.round(F.pow("l_quantity", F.lit(1.5)), 6).alias("pw"),
            (F.col("l_linenumber") % 3).cast("int").alias("md"),
            F.signum(F.col("l_discount") - 0.05).cast("int").alias("sg"),
            F.round(F.greatest(F.col("l_quantity"), F.col("l_discount") * 100), 2).alias("gr"),
            F.round(F.least(F.col("l_quantity"), F.col("l_tax") * 100), 2).alias("le"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


@query(
    "qx4_conditional_functions",
    oracle="""
SELECT count(*) AS n,
       round(sum(coalesce(nullif(l_discount, 0), -1)), 2) AS s,
       count(CASE WHEN l_discount IS NULL THEN 1 END) AS n_null,
       count(CASE WHEN nullif(l_discount, 0) IS NULL THEN 1 END) AS n_zero_as_null,
       round(sum(CASE WHEN l_quantity > 25 THEN l_quantity ELSE 0 END), 2) AS s_big
FROM lineitem
""",
    doc="Q-X4: conditional family — coalesce/nullif/CASE/IS NULL "
    "(NULLs manufactured via nullif; fixtures are NULL-free).",
    tags=("scalar", "conditional"),
)
def qx4_conditional_functions(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    nz = F.nullif(F.col("l_discount"), F.lit(0))
    return li.agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.coalesce(nz, F.lit(-1.0))), 2).alias("s"),
        F.count(F.when(F.col("l_discount").isNull(), 1)).alias("n_null"),
        F.count(F.when(nz.isNull(), 1)).alias("n_zero_as_null"),
        F.round(
            F.sum(F.when(F.col("l_quantity") > 25, F.col("l_quantity")).otherwise(0.0)),
            2,
        ).alias("s_big"),
    )


@query(
    "qx5_array_functions",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT)                                       AS n,
       round(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 5)              AS s8,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT)             AS n_pos,
       round(list_sum(list_transform(CAST(embedding[1:8] AS DOUBLE[]),
                                     x -> x * 2)), 5)                    AS s2x,
       round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 5)      AS mx,
       round(list_sum(CAST(flatten([embedding[1:2], embedding[3:4]])
                           AS DOUBLE[])), 5)                             AS sflat
FROM embeddings ORDER BY vec_id LIMIT 200
""",
    doc="Q-X5: array family — size/slice/aggregate/filter/transform/"
    "array_max/flatten over the 64-dim embedding column.",
    tags=("scalar", "array"),
)
def qx5_array_functions(spark, sf_dir):
    emb = tables(spark, sf_dir).embeddings
    e = F.col("embedding")
    ed = F.transform(e, lambda x: x.cast("double"))
    def asum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    return (
        emb.select(
            "vec_id",
            F.size(e).alias("n"),
            F.round(asum(F.slice(ed, 1, 8)), 5).alias("s8"),
            F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
            F.round(asum(F.transform(F.slice(ed, 1, 8), lambda x: x * 2)), 5).alias("s2x"),
            F.round(F.array_max(ed), 5).alias("mx"),
            F.round(
                asum(F.flatten(F.array(F.slice(ed, 1, 2), F.slice(ed, 3, 2)))), 5
            ).alias("sflat"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


@query(
    "qx6_json_functions",
    oracle="""
SELECT CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS total_k,
       count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 500
                  THEN 1 END) AS n_big
FROM events
""",
    doc="Q-X6: JSON scalar extraction (get_json_object ↔ "
    "json_extract_string) + from_json struct access.",
    tags=("scalar", "json"),
)
def qx6_json_functions(spark, sf_dir):
    ev = tables(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("int")
    k2 = F.from_json("props", "k INT").getField("k")
    return ev.agg(
        F.sum(k).alias("total_k"),
        F.count(F.when(k2 > 500, 1)).alias("n_big"),
    )


@query(
    "qx7_hash_functions",
    oracle="""
SELECT doc_id, md5(text) AS m, sha256(text) AS s
FROM documents ORDER BY doc_id LIMIT 100
""",
    doc="Q-X7: cross-engine hashes md5/sha256 (the only portable ones — "
    "SURVEY trap 5; xxhash64 stays engine-internal).",
    tags=("scalar", "hash"),
)
def qx7_hash_functions(spark, sf_dir):
    docs = tables(spark, sf_dir).documents
    return (
        docs.select(
            "doc_id",
            F.md5("text").alias("m"),
            F.sha2(F.col("text"), 256).alias("s"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


@query(
    "qx9_decimal_agg",
    oracle="""
SELECT o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price,
       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS min_price,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS max_price,
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Q-X9: exact DECIMAL(18,2) aggregation — cast-then-sum/min/max "
    "runs in decimal on both engines (no float accumulation error); "
    "only the FINAL value is cast to DOUBLE for the cross-engine wire "
    "compare, exact here because cents-scaled sums stay far below "
    "2^53 (pandas maps Spark decimals to object but DuckDB decimals "
    "to float64, so decimal-typed wire output cannot hash-match). "
    "Upgrades decimal support from the unit tier to a hash-matched "
    "CORRECTNESS entry.",
    tags=("scalar", "decimal"),
)
def qx9_decimal_agg(spark, sf_dir):
    orders = tables(spark, sf_dir).orders
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(price).cast("double").alias("sum_price"),
            F.min(price).cast("double").alias("min_price"),
            F.max(price).cast("double").alias("max_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "qx10_map_functions",
    oracle="""
SELECT event_id,
       array_to_string(json_keys(props), ',') || ',uid'    AS keys,
       json_extract_string(props, '$.k') || ','
         || CAST(user_id AS VARCHAR)                       AS vals,
       CAST(json_extract(props, '$.k') AS BIGINT)          AS k_val,
       user_id                                             AS uid_val,
       CAST(len(json_keys(props)) + 1 AS INT)              AS n_entries,
       list_contains(json_keys(props), 'k')                AS has_k,
       list_contains(json_keys(props), 'zz')               AS has_zz
FROM events ORDER BY event_id LIMIT 200
""",
    doc="Q-X10: map family at the hash tier — from_json(props) → "
    "map<string,bigint>, extended with map_concat(create_map(uid)), "
    "then map_keys / map_values / element_at / size / "
    "map_contains_key, mirrored by DuckDB JSON-object functions "
    "(json_keys / json_extract). Promotes the map functions from "
    "unit-only (no map fixture exists) to a driver CORRECTNESS row. "
    "FIXTURE-SHAPE DEPENDENCY (ADVICE r05): the oracle's `vals`/"
    "`n_entries` expressions hard-code the events.props shape "
    "{\"k\": <int>} (single key) — if the fixture ever grows more "
    "keys, re-derive `vals` generically from json_keys (list_transform "
    "over json_extract_string) and drop the +1 constant.",
    tags=("scalar", "map"),
)
def qx10_map_functions(spark, sf_dir):
    ev = tables(spark, sf_dir).events
    m = F.map_concat(
        F.from_json("props", "map<string,bigint>"),
        F.create_map(F.lit("uid"), F.col("user_id")),
    )
    return (
        ev.select(
            "event_id",
            F.array_join(F.map_keys(m), ",").alias("keys"),
            F.array_join(F.map_values(m).cast("array<string>"), ",").alias("vals"),
            F.element_at(m, "k").alias("k_val"),
            F.element_at(m, "uid").alias("uid_val"),
            F.size(m).alias("n_entries"),
            F.map_contains_key(m, "k").alias("has_k"),
            F.map_contains_key(m, "zz").alias("has_zz"),
        )
        .orderBy("event_id")
        .limit(200)
    )


@query(
    "qx11_regexp_extract_all",
    oracle="""
WITH m AS (
  SELECT p_partkey, unnest(regexp_extract_all(p_name, '[a-z]{4,}')) AS w
  FROM part)
SELECT w, count(*) AS n, count(DISTINCT p_partkey) AS n_parts
FROM m GROUP BY w
ORDER BY n DESC, w LIMIT 50
""",
    doc="Q-X11: regexp_extract_all + explode — every >=4-letter "
    "lowercase run in part names, counted globally and per part "
    "(the extract-all-matches text shape; POSIX-safe pattern per "
    "SURVEY §5.5).",
    tags=("scalar", "string", "regex"),
)
def qx11_regexp_extract_all(spark, sf_dir):
    part = tables(spark, sf_dir).part
    m = part.select(
        "p_partkey",
        F.explode(
            F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]{4,}"), 0)
        ).alias("w"),
    )
    return (
        m.groupBy("w")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
        .orderBy(F.desc("n"), "w")
        .limit(50)
    )


@query(
    "qx12_higher_order_arrays",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
h AS (
  SELECT doc_id,
         CAST(len(list_filter(w, x -> length(x) >= 5)) AS INT) AS n_long,
         CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
           AS total_chars,
         array_to_string(list_transform(w[1:3], x -> upper(x)), '-')
           AS head3
  FROM t)
SELECT doc_id, n_long, total_chars, head3
FROM h ORDER BY doc_id LIMIT 200
""",
    doc="Q-X12: higher-order array functions — filter (length "
    "predicate), transform (per-element length / upper), aggregate "
    "(sum via transform+aggregate), slice — mirrored by DuckDB "
    "list_filter/list_transform/list_sum lambdas. All JVM-side "
    "Column expressions (no UDF).",
    tags=("scalar", "array", "higher-order"),
)
def qx12_higher_order_arrays(spark, sf_dir):
    docs = tables(spark, sf_dir).documents
    w = F.split(F.col("text"), " ")
    return (
        docs.select(
            "doc_id",
            F.size(F.filter(w, lambda x: F.length(x) >= 5)).alias("n_long"),
            F.aggregate(
                F.transform(w, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total_chars"),
            F.array_join(
                F.transform(F.slice(w, 1, 3), lambda x: F.upper(x)), "-"
            ).alias("head3"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "qx13_bitwise_family",
    oracle="""
SELECT event_type,
       CAST(bit_and(event_id) AS BIGINT) AS b_and,
       CAST(bit_or(event_id) AS BIGINT) AS b_or,
       CAST(bit_xor(event_id) AS BIGINT) AS b_xor,
       CAST(sum(event_id & 255) AS BIGINT) AS low_byte_sum,
       CAST(sum(event_id >> 4) AS BIGINT) AS shifted_sum
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="qx13: bitwise aggregate family (bit_and/bit_or/bit_xor) plus "
    "scalar masks and shifts — all partial-aggregable (commutative/"
    "associative), one shuffle on the 5-value type key; exact-integer "
    "outputs, no rounding needed.",
    tags=("scalar", "agg", "bitwise"),
)
def qx13_bitwise_family(spark, sf_dir):
    ev = tables(spark, sf_dir).events
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and("event_id").cast("bigint").alias("b_and"),
            F.bit_or("event_id").cast("bigint").alias("b_or"),
            F.bit_xor("event_id").cast("bigint").alias("b_xor"),
            F.sum(F.col("event_id").bitwiseAND(F.lit(255)))
            .cast("bigint")
            .alias("low_byte_sum"),
            F.sum(F.expr("event_id >> 4")).cast("bigint").alias("shifted_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "qx14_try_functions",
    oracle="""
SELECT l_linenumber,
       round(sum(l_extendedprice / NULLIF(l_quantity - 25, 0)) FILTER (
         WHERE l_quantity <> 25), 2) AS safe_ratio_sum,
       CAST(count(*) FILTER (WHERE l_quantity = 25) AS BIGINT)
         AS division_hazards,
       CAST(sum(TRY_CAST(CASE WHEN l_quantity < 30
                              THEN CAST(CAST(l_quantity AS INT) AS VARCHAR)
                              ELSE 'not-a-number' END AS INT)) AS BIGINT)
         AS parsed_sum
FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber
""",
    doc="qx14: error-safe expression family — try_divide (NULL instead "
    "of error/Inf on zero denominators) and try_cast (NULL on "
    "malformed input), the functions that keep a 100 TB batch job "
    "from dying on one bad row. Oracle mirrors try_divide as "
    "x / NULLIF(y, 0) with an explicit hazard count so the NULL "
    "semantics are certified, not skipped.",
    tags=("scalar", "error-handling"),
)
def qx14_try_functions(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    ratio = F.try_divide(
        F.col("l_extendedprice"), F.col("l_quantity") - F.lit(25)
    )
    parsed = F.try_to_number(
        F.when(
            F.col("l_quantity") < 30,
            F.col("l_quantity").cast("int").cast("string"),
        ).otherwise(F.lit("not-a-number")),
        F.lit("999999"),
    )
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.round(F.sum(ratio), 2).alias("safe_ratio_sum"),
            F.count_if(F.col("l_quantity") == 25)
            .cast("bigint")
            .alias("division_hazards"),
            F.sum(parsed).cast("bigint").alias("parsed_sum"),
        )
        .orderBy("l_linenumber")
    )


@query(
    "qx15_string_family2",
    oracle="""
SELECT p_partkey,
       translate(p_type, 'AEIOU', 'aeiou')            AS translated,
       rpad(p_brand, 12, '.')                         AS rpadded,
       repeat(left(p_name, 2), 3)                     AS rep2x3,
       split_part(p_name, ' ', 2)                     AS second_tok,
       CAST(strpos(p_name, 'a') AS INT)               AS first_a,
       left(p_type, 5)                                AS l5,
       right(p_type, 4)                               AS r4,
       printf('%s/%d', p_brand, CAST(p_size AS INT))  AS fmt,
       contains(p_name, 'red')                        AS has_red,
       starts_with(p_type, 'STANDARD')                AS std
FROM part ORDER BY p_partkey LIMIT 200
""",
    doc="Q-X15: second string family — translate/rpad/repeat/"
    "split_part/strpos(instr)/left/right/printf(format_string)/"
    "contains/starts_with. Complements qx1; all JVM builtins, "
    "map-only.",
    tags=("scalar", "string"),
)
def qx15_string_family2(spark, sf_dir):
    part = tables(spark, sf_dir).part
    return (
        part.select(
            "p_partkey",
            F.translate("p_type", "AEIOU", "aeiou").alias("translated"),
            F.rpad("p_brand", 12, ".").alias("rpadded"),
            F.repeat(F.left(F.col("p_name"), F.lit(2)), 3).alias("rep2x3"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias(
                "second_tok"
            ),
            F.instr("p_name", "a").alias("first_a"),
            F.left(F.col("p_type"), F.lit(5)).alias("l5"),
            F.right(F.col("p_type"), F.lit(4)).alias("r4"),
            F.format_string(
                "%s/%d", F.col("p_brand"), F.col("p_size").cast("int")
            ).alias("fmt"),
            F.contains(F.col("p_name"), F.lit("red")).alias("has_red"),
            F.startswith(F.col("p_type"), F.lit("STANDARD")).alias("std"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


@query(
    "qx16_array_set_family",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ')[1:6] AS a,
                  ['the', 'and', 'data', 'of'] AS b
           FROM documents)
SELECT doc_id,
       array_to_string(list_sort(list_distinct(list_cat(a, b))), ',')
         AS u,
       COALESCE(array_to_string(list_sort(list_distinct(
         list_filter(a, x -> list_contains(b, x)))), ','), '')     AS i,
       COALESCE(array_to_string(list_sort(list_distinct(
         list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS x,
       CAST(COALESCE(list_position(a, 'the'), 0) AS INT)       AS pos_the,
       list_contains(a, 'data')                                AS has_data
FROM t ORDER BY doc_id LIMIT 200
""",
    doc="Q-X16: array SET family — union/intersect/except/distinct/"
    "position/contains over token prefixes vs a literal vocab array. "
    "Set results are SORTED before comparison (element order of "
    "distinct/intersect is engine-defined; sorting makes the set "
    "semantics declarable — the qa9 lesson for arrays; DuckDB "
    "renders an empty set as NULL where Spark joins to '' — oracle "
    "coalesced). Position "
    "missing = 0 on both sides (Spark convention; DuckDB NULL "
    "coalesced).",
    tags=("scalar", "array", "set"),
)
def qx16_array_set_family(spark, sf_dir):
    docs = tables(spark, sf_dir).documents
    a = F.slice(F.split("text", " "), 1, 6)
    b = F.array(*[F.lit(w) for w in ["the", "and", "data", "of"]])
    return (
        docs.select(
            "doc_id",
            F.array_join(
                F.array_sort(F.array_distinct(F.concat(a, b))), ","
            ).alias("u"),
            F.array_join(
                F.array_sort(F.array_distinct(F.array_intersect(a, b))), ","
            ).alias("i"),
            F.array_join(
                F.array_sort(F.array_distinct(F.array_except(a, b))), ","
            ).alias("x"),
            F.array_position(a, "the").cast("int").alias("pos_the"),
            F.array_contains(a, "data").alias("has_data"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "qx18_binary_codecs",
    oracle="""
WITH c AS (
  SELECT doc_id, text,
         to_base64(encode(text)) AS b64,
         upper(hex(encode(substr(text, 1, 20)))) AS hx,
         octet_length(encode(text)) AS n_bytes
  FROM documents),
r AS (
  SELECT doc_id, text, b64, hx, n_bytes,
         decode(from_base64(b64)) AS back
  FROM c)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN back = text THEN 1 ELSE 0 END) AS BIGINT)
         AS n_roundtrip,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(count(DISTINCT substr(b64, 1, 16)) AS BIGINT) AS n_b64_prefixes,
       CAST(count(DISTINCT hx) AS BIGINT) AS n_hex
FROM r
""",
    doc="qx18: binary codec family — base64 and hex encode/decode "
    "over utf-8 text bytes, with the ONE portability trap this gate "
    "exists to document: Spark's base64() is MIME (CRLF-wrapped at "
    "76 chars), DuckDB's to_base64 is basic, so the Spark side "
    "strips CRLF before comparing — the payload bytes are identical "
    "and unbase64 accepts both framings (certified by the roundtrip "
    "count). Hex is compared raw (both engines uppercase A-F). "
    "Map-only; the 16-char b64 prefix distinct-count keeps the hash "
    "sensitive to the actual encoded bytes, not just lengths.",
    tags=("scalar", "codec", "binary"),
)
def qx18_binary_codecs(spark, sf_dir):
    docs = tables(spark, sf_dir).documents
    c = docs.select(
        "doc_id",
        "text",
        F.regexp_replace(
            F.base64(F.encode("text", "utf-8")), "\r\n", ""
        ).alias("b64"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 20), "utf-8"))).alias(
            "hx"
        ),
        F.length(F.encode("text", "utf-8")).alias("n_bytes"),
    )
    r = c.withColumn(
        "back", F.decode(F.unbase64("b64"), "utf-8")
    )
    return r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("back") == F.col("text"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.countDistinct(F.substring("b64", 1, 16))
        .cast("bigint")
        .alias("n_b64_prefixes"),
        F.countDistinct("hx").cast("bigint").alias("n_hex"),
    )


@query(
    "qx19_map_lambda_family",
    oracle="""
WITH li AS (SELECT l_orderkey AS o, l_linenumber AS ln,
                   max(CAST(l_quantity AS BIGINT)) AS q,
                   max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS pc
            FROM lineitem GROUP BY o, ln)
SELECT o AS l_orderkey,
       string_agg(ln || '=' || q * 2, ',' ORDER BY ln) AS doubled,
       COALESCE(string_agg(CASE WHEN q >= 25
                                THEN ln || '=' || q END,
                           ',' ORDER BY ln), '') AS filtered,
       string_agg(ln || '=' || q * pc, ',' ORDER BY ln) AS zipped
FROM li GROUP BY o ORDER BY o LIMIT 200
""",
    doc="qx19: the MAP higher-order-lambda family executed for real - "
    "transform_values, map_filter and map_zip_with over per-order "
    "maps (linenumber -> quantity / price-cents) built with "
    "map_from_entries(collect_list(struct)). Results serialize as "
    "sorted 'k=v' entry strings (integer-only arithmetic: quantity "
    "as BIGINT, price in cents), because nested struct arrays "
    "compare engine-specifically while strings hash clean - the "
    "oracle derives the same entries straight from the rows, which "
    "also proves the maps were built losslessly. Completes the "
    "lambda surface next to qx12's ARRAY lambdas. Note the fixture "
    "duplicates (orderkey, linenumber) for a few orders: "
    "map_from_entries REJECTS duplicate keys, so entries "
    "deduplicate per (ln) by the max of each measure first - "
    "that pre-agg is part of the declared contract.",
    tags=("scalar", "map", "lambda"),
)
def qx19_map_lambda_family(spark, sf_dir):
    li = tables(spark, sf_dir).lineitem
    base = (
        li.select(
            F.col("l_orderkey").alias("o"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_quantity").cast("bigint").alias("q"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("pc"),
        )
        # (orderkey, linenumber) is NOT unique in the fixture and
        # map_from_entries rejects duplicate keys — dedupe per line
        # by the max of each measure (mirrored in the oracle CTE)
        .groupBy("o", "ln")
        .agg(F.max("q").alias("q"), F.max("pc").alias("pc"))
    )
    m = base.groupBy("o").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("ln", "q")))
        ).alias("mq"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("ln", "pc")))
        ).alias("mp"),
    )

    def entries_str(mcol):
        return F.array_join(
            F.transform(
                F.array_sort(F.map_entries(mcol)),
                lambda e: F.concat_ws("=", e["key"], e["value"]),
            ),
            ",",
        )

    doubled = F.transform_values(F.col("mq"), lambda k, v: v * 2)
    filtered = F.map_filter(F.col("mq"), lambda k, v: v >= 25)
    zipped = F.map_zip_with(
        F.col("mq"), F.col("mp"), lambda k, v1, v2: v1 * v2
    )
    return (
        m.select(
            F.col("o").alias("l_orderkey"),
            entries_str(doubled).alias("doubled"),
            entries_str(filtered).alias("filtered"),
            entries_str(zipped).alias("zipped"),
        )
        .orderBy("l_orderkey")
        .limit(200)
    )


@query(
    "qx20_variant_type",
    oracle="""
WITH j AS (
  SELECT event_type,
         '{"meta":{"uid":' || user_id || ',"et":"' || event_type ||
         '"},"cents":' || CAST(floor(value * 100) AS BIGINT) ||
         ',"tags":[' || event_id % 7 || ',' || event_id % 3 || ']}' AS js
  FROM events),
x AS (
  SELECT event_type,
         CAST(json_extract(js, '$.meta.uid') AS BIGINT) AS uid,
         CAST(json_extract(js, '$.cents') AS BIGINT) AS cents,
         CAST(json_extract(js, '$.tags[0]') AS BIGINT) AS t0,
         CAST(json_extract(js, '$.tags[1]') AS BIGINT) AS t1,
         json_extract(js, '$.missing') AS m
  FROM j)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(uid) AS BIGINT) AS sum_uid,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(t0 * 10 + t1) AS BIGINT) AS sum_tags,
       CAST(sum(CASE WHEN m IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing,
       'OBJECT<cents: BIGINT, meta: OBJECT<et: STRING, uid: BIGINT>, tags: ARRAY<BIGINT>>'
         AS schema_min
FROM x GROUP BY event_type ORDER BY event_type
""",
    doc="Q-X20: the Spark 4 VARIANT type end-to-end — parse_json into "
    "a VariantType column, typed path extraction with variant_get "
    "(nested object '$.meta.uid', top-level '$.cents', array "
    "subscripts '$.tags[0]'), try_variant_get returning NULL for a "
    "missing path (counted per group, so the null contract is "
    "hash-gated), and schema_of_variant's inferred schema string "
    "pinned as a literal in the oracle (the Spark 4.1 format — a "
    "format change surfaces as a visible hash break, which is the "
    "point of pinning it). Input JSON is constructed "
    "deterministically from events columns (ints and enum strings "
    "only — no doubles serialized into text, and cents via floor() "
    "which is representation-exact in both engines). The oracle is "
    "plain json_extract over the same strings: VARIANT's typed "
    "accessors must agree with classic JSON extraction wherever "
    "both are defined. At 100 TB VARIANT is the semi-structured "
    "scan format: parse once, binary-encoded fields after, no "
    "per-query string re-parsing — map-only here, one aggregation.",
    tags=("scalar", "json", "variant", "spark4"),
)
def qx20_variant_type(spark, sf_dir):
    ev = tables(spark, sf_dir).events
    j = F.concat(
        F.lit('{"meta":{"uid":'), F.col("user_id"),
        F.lit(',"et":"'), F.col("event_type"),
        F.lit('"},"cents":'), F.floor(F.col("value") * 100).cast("long"),
        F.lit(',"tags":['), F.pmod("event_id", F.lit(7)),
        F.lit(","), F.pmod("event_id", F.lit(3)), F.lit("]}"),
    )
    v = F.parse_json(j)
    return (
        ev.select(
            F.col("event_type"),
            F.variant_get(v, "$.meta.uid", "long").alias("uid"),
            F.variant_get(v, "$.cents", "long").alias("cents"),
            F.variant_get(v, "$.tags[0]", "long").alias("t0"),
            F.variant_get(v, "$.tags[1]", "long").alias("t1"),
            F.try_variant_get(v, "$.missing", "long").alias("m"),
            F.schema_of_variant(v).alias("sch"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("uid").cast("bigint").alias("sum_uid"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.sum(F.col("t0") * 10 + F.col("t1"))
            .cast("bigint")
            .alias("sum_tags"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing"),
            F.min("sch").alias("schema_min"),
        )
        .orderBy("event_type")
    )


@query(
    "qx21_collated_strings",
    oracle="""
WITH v AS (
  SELECT lang, unnest([source, upper(source)]) AS src FROM documents)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT src) AS BIGINT) AS n_binary_distinct,
       CAST(count(DISTINCT lower(src)) AS BIGINT) AS n_ci_distinct,
       CAST(sum(CASE WHEN lower(src) = lower('SRC0') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_eq_src0,
       'SYSTEM.BUILTIN.UTF8_LCASE' AS coll_name
FROM v GROUP BY lang ORDER BY lang
""",
    doc="Q-X21: Spark 4 string collations — F.collate(col, "
    "'UTF8_LCASE') makes case-insensitivity a property of the TYPE, "
    "so equality, aggregation keys and countDistinct all follow it "
    "without rewriting expressions: the row certifies collated "
    "countDistinct (case-folded distinct = exactly half the binary "
    "distinct on the clean/SHOUTED variant pairs), collated equality "
    "against a literal, and F.collation() reporting the qualified "
    "collation name (pinned literally — a provider/name change is a "
    "visible hash break). Oracle = lower()-based folding, which for "
    "the fixture's ASCII source tags is definitionally identical to "
    "UTF8_LCASE. Grouping stays on the BINARY lang column, so "
    "cross-engine sort order never depends on collator internals. "
    "At 100 TB collation-aware shuffles hash the collation key "
    "(Spark derives it), so a ci-groupBy partitions correctly "
    "without a manual lower() normalization column.",
    tags=("scalar", "collation", "spark4"),
)
def qx21_collated_strings(spark, sf_dir):
    docs = tables(spark, sf_dir).documents
    v = docs.select(
        "lang",
        F.explode(F.array(F.col("source"), F.upper("source"))).alias("src"),
    )
    ci = F.collate(F.col("src"), "UTF8_LCASE")
    return (
        v.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("src").cast("bigint").alias("n_binary_distinct"),
            F.countDistinct(ci).cast("bigint").alias("n_ci_distinct"),
            F.sum((ci == F.lit("SRC0")).cast("int"))
            .cast("bigint")
            .alias("n_eq_src0"),
            F.min(F.collation(ci)).alias("coll_name"),
        )
        .orderBy("lang")
    )
