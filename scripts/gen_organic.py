"""Organic scale-fixture generator (VERDICT r09 item 3).

scripts/scale_probe.py replicates sf0.1 into disjoint key spaces —
that preserves per-key cardinalities by construction, so AQE skew
handling and LSH pair distributions are never exercised under the
conditions that actually stress them at 100 TB. This script generates
a NEW star schema at an arbitrary scale factor with:

- **new keys** (nothing is copied from the driver fixtures except the
  documents vocabulary, read as data);
- **organic Zipf skew on join/grouping keys**: o_custkey, l_partkey,
  l_suppkey and events.user_id draw from a 25% log-uniform (Zipf-1
  tail) / 75% uniform mixture, giving the hottest key ~1.5% of all
  rows at any N — hot enough that AQE's skew-join splitting engages,
  not so degenerate that one task is the whole job;
- **natural near-duplicate structure in documents**: within each
  decade of doc_ids, residues 8 and 9 re-emit the decade base's word
  stream with ~5% of words independently resampled — organically
  perturbed near-dups (high-but-not-1.0 Jaccard), not prefix-tagged
  replicas; plus organic random shingle collisions from a shared
  31-word vocabulary;
- matching schemas and value domains (same columns, same physical
  timestamp[us] parquet encoding, same categorical domains) so every
  bench/declared query runs unmodified with SPARK_GRAFT_SF_DIR
  pointed here.

Everything is hash-seeded DuckDB SQL (vectorized, fully deterministic,
no random()); sf1.0 (~6M lineitem) generates in well under a minute.

Usage:
    python scripts/gen_organic.py --sf 1.0 --out /tmp/sora_organic/sf1.0
"""

from __future__ import annotations

import argparse
import os

import duckdb

BASE = "/root/testdata/sf0.1"

# rows at sf=1.0 (10x the sf0.1 driver fixture)
ROWS = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

# deterministic uniform in [0, 1): independent streams per salt
U = "((hash({x} * 2654435761 + {salt}) % 1000000007) / 1000000007.0)"


def u(x: str, salt: int) -> str:
    return U.format(x=x, salt=salt)


def zipf_mix(x: str, n: int, salt: int) -> str:
    """25% log-uniform (Zipf-1 mass over magnitudes) / 75% uniform key
    draw over [0, n). The hottest key receives ~0.25 * ln(2)/ln(n) of
    all draws (~1.5% at n = 150k) — organic head-heavy skew."""
    pick = u(x, salt)
    uz = u(x, salt + 1)
    uu = u(x, salt + 2)
    return (
        f"CASE WHEN {pick} < 0.25 "
        f"THEN CAST(floor(pow({n}.0, {uz})) AS BIGINT) % {n} "
        f"ELSE CAST(floor({uu} * {n}) AS BIGINT) END"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/sora_organic/sf1.0")
    ap.add_argument(
        "--lang-signal", action="store_true",
        help="make documents.lang statistically recoverable from the "
        "text (lang-skewed word draws; near-dups inherit the decade "
        "base's lang)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    n = {t: max(int(c * args.sf), 10) for t, c in ROWS.items()}
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def copy(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{name}.parquet' (FORMAT PARQUET)"
        )
        cnt = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{name}.parquet')"
        ).fetchone()[0]
        print(f"[gen_organic] {name}: {cnt} rows")

    # dimension roots: same tiny region/nation domain as the fixtures
    copy("region", """
        SELECT CAST(i AS INT) AS r_regionkey,
               ['AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST'][i + 1]
                 AS r_name
        FROM range(5) t(i)""")
    copy("nation", """
        SELECT CAST(i AS INT) AS n_nationkey,
               'NATION_' || i AS n_name,
               CAST(i % 5 AS INT) AS n_regionkey
        FROM range(25) t(i)""")

    nc, ns, np_, no, ne = (
        n["customer"], n["supplier"], n["part"], n["orders"], n["events"],
    )
    copy("customer", f"""
        SELECT i AS c_custkey,
               'Customer#' || lpad(CAST(i AS VARCHAR), 9, '0') AS c_name,
               CAST(hash(i * 31 + 11) % 25 AS INT) AS c_nationkey,
               round({u('i', 12)} * 10999.65 - 999.85, 2) AS c_acctbal,
               ['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD',
                'MACHINERY'][1 + CAST(hash(i * 37 + 13) % 5 AS INT)]
                 AS c_mktsegment
        FROM range({nc}) t(i)""")
    copy("supplier", f"""
        SELECT i AS s_suppkey,
               'Supplier#' || lpad(CAST(i AS VARCHAR), 9, '0') AS s_name,
               CAST(hash(i * 41 + 17) % 25 AS INT) AS s_nationkey,
               round({u('i', 18)} * 10999.65 - 999.85, 2) AS s_acctbal
        FROM range({ns}) t(i)""")
    copy("part", f"""
        SELECT i AS p_partkey,
               ['large','hot','small','cold','round','flat']
                 [1 + CAST(hash(i * 3 + 19) % 6 AS INT)] || ' ' ||
               ['ring','bolt','washer','nut','gear','pin','cam','rod']
                 [1 + CAST(hash(i * 5 + 23) % 8 AS INT)] AS p_name,
               'Brand#' || (1 + CAST(hash(i * 7 + 29) % 25 AS INT))
                 AS p_brand,
               ['STANDARD','SMALL','MEDIUM','LARGE','ECONOMY','PROMO']
                 [1 + CAST(hash(i * 11 + 31) % 6 AS INT)] AS p_type,
               CAST(1 + hash(i * 13 + 37) % 50 AS INT) AS p_size,
               round(900.0 + {u('i', 38)} * 99.9, 2) AS p_retailprice
        FROM range({np_}) t(i)""")

    # orders: Zipf-mixture customer key, 1995-2001 date span
    copy("orders", f"""
        SELECT i AS o_orderkey,
               {zipf_mix('i', nc, 100)} AS o_custkey,
               ['O','F','P'][1 + CAST(CASE WHEN hash(i * 43 + 41) % 100 < 48
                                           THEN 0
                                           WHEN hash(i * 43 + 41) % 100 < 96
                                           THEN 1 ELSE 2 END AS INT)]
                 AS o_orderstatus,
               round(1000.0 + {u('i', 42)} * 499000.0, 2) AS o_totalprice,
               TIMESTAMP '1995-01-01'
                 + CAST(hash(i * 47 + 43) % 2400 AS INT)
                   * INTERVAL 1 DAY AS o_orderdate,
               ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
                 [1 + CAST(hash(i * 53 + 47) % 5 AS INT)] AS o_orderpriority
        FROM range({no}) t(i)""")

    # lineitem: explode orders into 1..7 lines (avg 4 -> ~4x orders);
    # Zipf-mixture part/supplier keys; TPC-H-ish returnflag semantics
    # derived from shipdate
    copy("lineitem", f"""
        WITH o AS (SELECT i AS okey,
                          TIMESTAMP '1995-01-01'
                            + CAST(hash(i * 47 + 43) % 2400 AS INT)
                              * INTERVAL 1 DAY AS odate,
                          1 + CAST(hash(i * 59 + 53) % 7 AS INT) AS nl
                   FROM range({no}) t(i)),
        l0 AS (SELECT okey, odate, unnest(range(nl)) AS ln FROM o),
        l AS (SELECT okey, odate, CAST(ln + 1 AS INT) AS lineno,
                     okey * 7 + ln AS li
              FROM l0)
        SELECT okey AS l_orderkey,
               {zipf_mix('li', np_, 200)} AS l_partkey,
               {zipf_mix('li', ns, 300)} AS l_suppkey,
               lineno AS l_linenumber,
               CAST(1 + hash(li * 61 + 59) % 50 AS DOUBLE) AS l_quantity,
               round(900.0 + {u('li', 60)} * 104099.0, 2) AS l_extendedprice,
               CAST(hash(li * 67 + 61) % 11 AS DOUBLE) / 100.0 AS l_discount,
               CAST(hash(li * 71 + 67) % 9 AS DOUBLE) / 100.0 AS l_tax,
               CASE WHEN odate + CAST(1 + hash(li * 73 + 71) % 90 AS INT)
                             * INTERVAL 1 DAY < TIMESTAMP '1998-06-01'
                    THEN (CASE WHEN hash(li * 79 + 73) % 2 = 0
                               THEN 'A' ELSE 'R' END)
                    ELSE 'N' END AS l_returnflag,
               CASE WHEN odate + CAST(1 + hash(li * 73 + 71) % 90 AS INT)
                             * INTERVAL 1 DAY < TIMESTAMP '1998-06-01'
                    THEN 'F' ELSE 'O' END AS l_linestatus,
               odate + CAST(1 + hash(li * 73 + 71) % 90 AS INT)
                 * INTERVAL 1 DAY AS l_shipdate
        FROM l""")

    # events: Zipf-mixture user key over nc/10 users (the driver
    # fixture's customers:event-users ratio — 15000:1500 at sf0.1),
    # 30-day span with microsecond jitter
    nu = max(nc // 10, 10)
    copy("events", f"""
        SELECT i AS event_id,
               TIMESTAMP '2024-01-01'
                 + CAST(hash(i * 83 + 79) % 2592000 AS BIGINT)
                   * INTERVAL 1 SECOND
                 + CAST(hash(i * 89 + 83) % 1000000 AS BIGINT)
                   * INTERVAL 1 MICROSECOND AS ts,
               {zipf_mix('i', nu, 400)} AS user_id,
               CASE WHEN hash(i * 97 + 89) % 100 < 40 THEN 'view'
                    WHEN hash(i * 97 + 89) % 100 < 70 THEN 'click'
                    WHEN hash(i * 97 + 89) % 100 < 85 THEN 'purchase'
                    WHEN hash(i * 97 + 89) % 100 < 95 THEN 'signup'
                    ELSE 'error' END AS event_type,
               round({u('i', 90)} * 560.21, 2) AS value,
               '{{"k": ' || (hash(i * 101 + 97) % 100) || '}}' AS props
        FROM range({ne}) t(i)""")

    # documents: shared vocabulary read from the driver fixture (as
    # DATA, not copied rows); decade residues 8/9 are ~5%-perturbed
    # re-emissions of the decade base -> organic near-dups.
    #
    # --lang-signal: lang becomes a function of the decade base (so
    # near-dups share their parent's lang) and 30% of word draws come
    # from a lang-specific 6-word slice of the vocabulary — a REAL
    # learnable signal, unlike the driver fixture where lang is
    # independent of text. Off by default so the drift/dedup/scale
    # numbers measured on the plain organic fixture stay reproducible.
    nd = n["documents"]
    lang_expr = (
        """CASE WHEN hash(seed_doc * 107 + 103) % 100 < 44 THEN 0
                WHEN hash(seed_doc * 107 + 103) % 100 < 58 THEN 1
                WHEN hash(seed_doc * 107 + 103) % 100 < 72 THEN 2
                WHEN hash(seed_doc * 107 + 103) % 100 < 86 THEN 3
                ELSE 4 END"""
        if args.lang_signal
        else
        """CASE WHEN hash(i * 107 + 103) % 100 < 44 THEN 0
                WHEN hash(i * 107 + 103) % 100 < 58 THEN 1
                WHEN hash(i * 107 + 103) % 100 < 72 THEN 2
                WHEN hash(i * 107 + 103) % 100 < 86 THEN 3
                ELSE 4 END"""
    )
    word_idx = "CAST(hash(seed * 100003 + p.j * 17 + 5) % v.nv AS INT)"
    if args.lang_signal:
        # 30% of draws come from words [lang_id*6 .. lang_id*6+5]
        word_idx = (
            "CAST(CASE WHEN hash(seed * 139 + p.j * 11 + 7) % 10 < 3 "
            "THEN p.lang_id * 6 + hash(seed * 100003 + p.j * 17 + 5) % 6 "
            "ELSE hash(seed * 100003 + p.j * 17 + 5) % v.nv END AS INT)"
        )
    copy("documents", f"""
        WITH vocab AS (
            SELECT list(w ORDER BY w) AS v, count(*) AS nv FROM (
                SELECT DISTINCT unnest(string_split(text, ' ')) AS w
                FROM read_parquet('{BASE}/documents.parquet')
                WHERE length(text) > 0)),
        d AS (SELECT i,
                     CASE WHEN i % 10 >= 8 THEN i - (i % 10) ELSE i END
                       AS seed_doc,
                     (i % 10 >= 8) AS is_dup
              FROM range({nd}) t(i)),
        d2 AS (SELECT *, {lang_expr} AS lang_id FROM d),
        pos AS (SELECT i, seed_doc, is_dup, lang_id,
                       unnest(range(CAST(10 + hash(seed_doc * 103 + 101)
                                         % 91 AS BIGINT))) AS j
                FROM d2),
        words AS (
            SELECT p.i, p.j, p.lang_id, v.v[1 + {word_idx}] AS w
            FROM (SELECT *,
                         CASE WHEN is_dup
                                   AND hash(i * 131 + j * 7 + 3) % 100 < 5
                              THEN i ELSE seed_doc END AS seed
                  FROM pos) p CROSS JOIN vocab v),
        txt AS (SELECT i, any_value(lang_id) AS lang_id,
                       string_agg(w, ' ' ORDER BY j) AS text
                FROM words GROUP BY i)
        SELECT i AS doc_id, text,
               ['en','de','es','fr','zh'][1 + lang_id] AS lang,
               'src' || (hash(i * 109 + 107) % 20) AS source,
               length(text) AS n_chars
        FROM txt""")

    # embeddings: 10 organic clusters (centroid + noise), not isotropic
    # — the structure IVF partitioning exploits at scale
    nv = n["embeddings"]
    copy("embeddings", f"""
        WITH e AS (SELECT i, CAST(hash(i * 113 + 109) % 10 AS INT) AS label
                   FROM range({nv}) t(i)),
        dims AS (SELECT e.i, e.label, d,
                        ((hash(e.label * 64 + d + 1) % 1000) / 1000.0 - 0.5)
                        + 0.35 * ((hash(e.i * 64 + d + 127) % 1000)
                                  / 1000.0 - 0.5) AS val
                 FROM e, range(64) r(d))
        SELECT i AS vec_id,
               CAST(list(CAST(val AS FLOAT) ORDER BY d) AS FLOAT[])
                 AS embedding,
               any_value(label) AS label
        FROM dims GROUP BY i""")

    print(f"[gen_organic] done -> {args.out} (sf={args.sf})")


if __name__ == "__main__":
    main()
