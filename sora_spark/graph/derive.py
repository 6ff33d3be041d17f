"""Deterministic graph fixtures derived from the star schema
(FIXTURES.md "Derived graph fixtures" — no graph table exists).

- `e_co`: undirected-as-canonical co-occurrence graph — DISTINCT part
  pairs sharing an order, s < d. The analog of read-overlap edges.
- `e_seq`: directed per-user event-succession chains — each event to
  the same user's next event by (ts, event_id). The analog of
  read-succession paths used for compaction/tip analysis.

Scale note: e_co is a self-join on l_orderkey — one shuffle on the
order key, then DISTINCT (second shuffle on the pair). At 100 TB the
pair explosion within an order is bounded by items-per-order (~4-7),
so output is O(input × items/order); AQE handles the skewed big-order
case via skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def e_co(lineitem: DataFrame) -> DataFrame:
    """DISTINCT co-occurring part pairs (s < d) per order → (s, d).

    Derivation is one groupBy(order) → sorted part set → in-row pair
    expansion (i < j) → DISTINCT, instead of the order-key self-join:
    the self-join shuffles the lineitem twice conceptually
    (exchange-reused to once) and generates k^2 pairs per order before
    the s < d filter, while this shape shuffles each lineitem ONCE
    (with map-side partial collect_set), emits only the k(k-1)/2
    ascending pairs, and feeds the same final distinct. Measured ~30%
    faster at sf0.1 (round 6); per-row expansion stays bounded by
    items-per-order (~4-7), the same bound that protects the join form
    at 100 TB. Output is set-identical to the join form (the E_CO_SQL
    oracle keeps the join formulation).

    Expansion is explode-FIRST over 1-based index sequences with
    scalar element_at lookups (r14, the de_bruijn_edges finding):
    the old nested transform/slice lambdas evaluated on the
    interpreted expression path outside whole-stage codegen AND
    allocated the full nested pair-struct array per order before
    exploding it; two chained index Generates + element_at stay
    inside codegen with zero intermediate array allocation. Pair set
    identical: (ps[i], ps[j]) for 1 <= i < j <= k either way, and the
    singleton/empty guard reproduces the old form's no-pairs rows
    (sequence(1, 0) would step DOWNWARD, not empty — the
    exploded_shingles guard pattern)."""
    sets = (
        lineitem.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    idx = F.when(
        F.size("ps") >= 2, F.sequence(F.lit(1), F.size("ps") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        sets.select("ps", F.explode(idx).alias("i"))
        .select(
            "ps",
            "i",
            F.explode(
                F.sequence(F.col("i") + 1, F.size("ps"))
            ).alias("j"),
        )
        .select(
            F.element_at("ps", F.col("i")).alias("s"),
            F.element_at("ps", F.col("j")).alias("d"),
        )
        .distinct()
    )


# Oracle-side mirror of e_co, used as a CTE prefix by graph oracles.
E_CO_SQL = (
    "SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d "
    "FROM lineitem a JOIN lineitem b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
)


# Bounded subgraph (both endpoints < 500) used by the fixpoint/reduction
# oracles so the DuckDB recursive-CTE side stays tractable (SURVEY Q-G4).
E_CO_SMALL_SQL = (
    "SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d "
    "FROM lineitem a JOIN lineitem b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
    "WHERE a.l_partkey < 500 AND b.l_partkey < 500"
)


def e_co_small(lineitem: DataFrame, bound: int = 500) -> DataFrame:
    return e_co(lineitem).filter((F.col("s") < bound) & (F.col("d") < bound))


def e_seq(events: DataFrame) -> DataFrame:
    """Per-user succession edges (src_event → next event by ts, event_id).

    Window lead() per user — one shuffle on user_id; chains are local
    to their partition afterwards.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )


E_SEQ_SQL = (
    "SELECT user_id, event_id AS src, "
    "lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst "
    "FROM events QUALIFY dst IS NOT NULL"
)


def replicate_edges(edges: DataFrame, factor: int) -> DataFrame:
    """Deterministic scale-stress generator: `factor` disjoint copies of
    an edge set, vertex ids shifted by replica × stride (stride = one
    action computing max id + 1, so replicas can never collide). Output
    is factor·|E| edges / factor·|V| vertices with IDENTICAL per-replica
    structure — component counts, reduction fixpoints, and round counts
    of the original are exactly known multiples, which is what makes the
    blown-up graph usable as a correctness oracle at sizes no DuckDB
    recursive CTE could check.

    Weight-aware (r07, VERDICT r06 item 7): every column other than
    s/d (weights, labels, ...) is carried through UNCHANGED, so each
    replica keeps the base graph's real weight distribution. Weighted
    invariants then replicate exactly — the (w, s, d)-order MSF of the
    blown-up graph is `factor` disjoint shifted copies of the base
    forest (a constant id shift preserves the within-replica tie-break
    order), total weight factor·W, SSSP distances per replica
    identical. Before this, weights re-derived from shifted ids were
    a DIFFERENT distribution per replica and weighted stress evidence
    was round-count only."""
    stride = (
        edges.select(
            (F.greatest(F.max("s"), F.max("d")) + 1).alias("m")
        ).first()["m"]
    )
    if stride is None:
        # max() of an empty frame is NULL — replicating zero edges
        # would otherwise produce null-shifted rows downstream
        raise ValueError(
            "replicate_edges: empty edge set (no ids to derive a "
            "replica stride from)"
        )
    reps = edges.sparkSession.range(factor).select(
        (F.col("id") * stride).alias("_shift")
    )
    extra = [c for c in edges.columns if c not in ("s", "d")]
    return edges.crossJoin(reps).select(
        (F.col("s") + F.col("_shift")).alias("s"),
        (F.col("d") + F.col("_shift")).alias("d"),
        *extra,
    )


E_DIR_SMALL_SQL = (
    "SELECT DISTINCT l_partkey % 400 AS s, l_suppkey % 400 AS d "
    "FROM lineitem WHERE l_quantity <= 2 "
    "AND l_partkey % 400 <> l_suppkey % 400"
)


def e_dir_small(lineitem: DataFrame, modulus: int = 400) -> DataFrame:
    """Bounded DIRECTED derived graph: part→supplier edges folded into
    a `modulus`-sized id space, thinned by the l_quantity <= 2
    predicate so the digraph keeps a non-trivial SCC mixture
    (measured: sizes {1,2} at sf0.001, {1,100} at sf0.01, one giant
    400-SCC at sf0.1). The directed sibling of e_co_small — bounded,
    so recursive-CTE closure oracles stay tractable at any SF."""
    return (
        lineitem.filter(F.col("l_quantity") <= 2)
        .select(
            (F.col("l_partkey") % modulus).alias("s"),
            (F.col("l_suppkey") % modulus).alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
