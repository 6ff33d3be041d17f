"""End-to-end training-data curation pipeline: the composed form of
the individual operators (dedup → repetition filter → PII scrub →
token accounting), returning both the surviving corpus and a
per-source yield report.

Stage order matters at scale: exact dedup FIRST (cheapest shuffle —
md5 fingerprints), then the map-only repetition/scrub/token stages on
the deduped survivors. Every stage is a column expression or a
wordcount-shaped groupBy; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sora_spark.functions.text import tokens
from sora_spark.llm import dedup, textstats


def curate(
    docs: DataFrame,
    max_dup_word_frac: float = 0.5,
    max_top_word_frac: float = 0.3,
    min_words: int = 5,
) -> DataFrame:
    """Surviving corpus: exact-deduped (md5 of normalized text,
    keep-lowest-doc_id), repetition-filtered, PII-scrubbed, with
    `n_tokens` accounting. Columns: doc_id, source, text_scrubbed,
    n_tokens + the repetition features that justified survival."""
    deduped = dedup.dedup_exact(docs)
    rep = textstats.repetition_stats(deduped).select(
        "doc_id", "n_words", "dup_word_frac", "top_word_frac"
    )
    kept = (
        deduped.join(rep, "doc_id")
        .filter(
            (F.col("n_words") >= min_words)
            & (F.col("dup_word_frac") <= max_dup_word_frac)
            & (F.col("top_word_frac") <= max_top_word_frac)
        )
    )
    scrubbed = textstats.scrub_pii(kept)
    return scrubbed.select(
        "doc_id",
        "source",
        "text_scrubbed",
        F.size(tokens(F.col("text_scrubbed"))).alias("n_tokens"),
        "n_words",
        F.round("dup_word_frac", 4).alias("dup_word_frac"),
        F.round("top_word_frac", 4).alias("top_word_frac"),
        "n_scrubbed",
    )


def yield_report(docs: DataFrame, curated: DataFrame) -> DataFrame:
    """Per-source curation yield: docs in/out, token totals — the
    accounting table a data-curation run ships with."""
    inn = docs.groupBy("source").agg(F.count("*").alias("docs_in"))
    out = curated.groupBy("source").agg(
        F.count("*").alias("docs_out"),
        F.sum("n_tokens").alias("tokens_out"),
    )
    return (
        inn.join(out, "source", "left")
        .select(
            "source",
            "docs_in",
            F.coalesce("docs_out", F.lit(0)).alias("docs_out"),
            F.coalesce("tokens_out", F.lit(0)).alias("tokens_out"),
            F.round(
                F.coalesce("docs_out", F.lit(0)) / F.col("docs_in"), 4
            ).alias("doc_yield"),
        )
        .orderBy("source")
    )


def pack_documents(
    docs: DataFrame,
    token_budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Sequence packing: assign each doc a `bin_id` such that every
    bin's token total is ≤ `token_budget`; docs larger than the budget
    get a bin of their own (capped contribution).

    Distributed shape: greedy contiguous fill WITHIN each partition
    (an Arrow `mapInPandas` pass — exact, sequential only inside a
    partition), with bin ids made globally unique by a partition-id
    prefix. This is how real training pipelines pack: shuffle docs,
    pack per worker; a global greedy order would serialize the whole
    corpus for no quality gain. At most one under-filled bin per
    partition. Output: (id_col, n_tokens, bin_id)."""
    from collections.abc import Iterator

    import pandas as pd

    order_col = order_col or id_col
    # sortWithinPartitions makes the greedy order hold across Arrow
    # batch boundaries (fill/local_bin carry over, but a per-batch
    # sort alone would be batch-local — review finding)
    prepped = (
        docs.select(
            F.col(id_col),
            F.col(token_col).cast("long").alias("n_tokens"),
            F.spark_partition_id().alias("_pid"),
            F.col(order_col).alias("_ord"),
        )
        .sortWithinPartitions("_ord")
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fill = 0
        local_bin = 0
        pid = None
        started = False
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["_pid"].iloc[0])
            bins = []
            for tok in pdf["n_tokens"]:
                t = min(int(tok), token_budget)
                if started and fill + t > token_budget:
                    local_bin += 1
                    fill = 0
                started = True
                fill += t
                bins.append((pid << 32) | local_bin)
            res = pdf.copy()
            res["bin_id"] = bins
            yield res[[id_col, "n_tokens", "bin_id"]]

    id_type = docs.schema[id_col].dataType.simpleString()
    return prepped.mapInPandas(
        pack, f"{id_col} {id_type}, n_tokens long, bin_id long"
    )


def split_by_hash(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 13,
) -> DataFrame:
    """Deterministic dataset split (train/val/test): bucket =
    xxhash64(id, seed) mod 10_000 mapped onto cumulative fraction
    ranges. Unlike `randomSplit`, membership is a pure function of the
    id — stable across runs, partitionings, and engines, and new rows
    join their split without reshuffling old ones (the property that
    matters when a 100 TB corpus grows incrementally). Fractions must
    sum to 1. Output: input columns + `split`."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cond = bucket < int(round(acc * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def split_threshold_hex(fraction: float, digits: int = 8) -> str:
    """Hex string h such that P(first `digits` md5 hex chars < h) =
    `fraction` for a uniform hash — the cumulative-fraction boundary
    used by `split_by_hash_portable`. Floor (not round): the boundary
    must be writable as a plain hex literal in an oracle SQL.

    Exact rational arithmetic (Fraction of the decimal literal, not
    float multiply): an external consumer recomputing the threshold
    from the documented formula gets the identical hex literal without
    reproducing any float rounding — Fraction(str(0.1)) is exactly
    1/10 where 0.1 * 16**8 carries the binary representation error
    (round-4 review)."""
    from fractions import Fraction

    return format(int(Fraction(str(fraction)) * 16**digits), f"0{digits}x")


def split_by_hash_portable(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "-split13",
) -> DataFrame:
    """`split_by_hash` with a cross-engine hash: bucket = first 8 hex
    chars of md5(id || salt), compared lexicographically against
    cumulative-fraction hex thresholds (hex chars '0'-'9' < 'a'-'f'
    sort correctly in ASCII, so string compare IS numeric compare).
    Same membership on any engine with md5 — the variant to use when
    the split must be reproduced outside Spark (DuckDB oracle, a
    downstream data loader, an audit notebook)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
    )
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        # the final cumulative threshold is 16^8 — a 9-digit hex
        # string that would compare LESS than any 8-char hash; the
        # last split must catch everything instead
        cond = (
            F.lit(True)
            if acc >= 1.0 - 1e-12
            else h < split_threshold_hex(acc)
        )
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def mix_sources(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "-mix5",
) -> DataFrame:
    """Weighted corpus mixing: keep each source at its configured
    sampling rate — the standard pre-training recipe step ("2 epochs of
    wiki, 10% of crawl"). Membership is a pure function of
    md5(id || salt) against the source's hex threshold (same
    cross-engine scheme as split_by_hash_portable), so the mix is
    reproducible on any engine, stable under corpus growth, and a
    map-only filter — no shuffle, no sampling RNG state."""
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
    )

    def thr(rate: float):
        if rate >= 1.0 - 1e-12:
            return F.lit(True)
        if rate <= 0.0:
            return F.lit(False)
        return h < split_threshold_hex(rate)

    keep = thr(default_rate)
    for name, rate in rates.items():
        keep = F.when(F.col(source_col) == name, thr(rate)).otherwise(keep)
    return docs.filter(keep)


def deterministic_shuffle_key(
    id_col: str = "doc_id", seed: str = "7"
) -> F.Column:
    """Order key for a deterministic global shuffle of training order:
    md5(seed || id). Sorting by it is a seeded permutation any engine
    reproduces; at scale, ORDER BY runs as a range-partitioned sort
    (or TakeOrderedAndProject when only a prefix is taken) — no
    single-partition window, no RNG state."""
    return F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))


def chunk_documents(
    docs: DataFrame,
    size: int = 100,
    overlap: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap —
    the context-window prep step (training sample windows, RAG
    passages) → (doc_id, chunk_id, chunk_text).

    Chunk i covers [i*(size-overlap) + 1, ... + size] (1-based);
    chunks start while any text remains, so the last chunk may be
    short but no character is dropped. Pure column expressions
    (sequence + transform + substring + posexplode) — generated
    DISTRIBUTED, no UDF, no driver-side loop; output rows ∝ input
    chars / stride."""
    if size <= overlap:
        raise ValueError(f"size ({size}) must exceed overlap ({overlap})")
    stride = size - overlap
    n = F.length(F.col(text_col))
    # number of chunks: ceil(max(n - overlap, 1) / stride), min 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)),
        F.lit(1).cast("bigint"),
    )
    starts = F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.substring(
            F.col(text_col), (i * stride + 1).cast("int"), size
        ),
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap each group's contribution to at most `n` rows, selected by
    DETERMINISTIC hash order (md5(text), id tiebreak) — the per-domain
    cap every web-corpus recipe applies so no single source dominates
    the mixture. Hash order (not "first n" or RAND) makes the survivor
    set reproducible across runs, engines and partitionings, and
    unbiased w.r.t. crawl order. One window shuffle on the group key;
    heavy-domain skew is bounded because the window only RANKS — rows
    past n are dropped in the same stage, nothing accumulates."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(text_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )
