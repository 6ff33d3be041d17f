"""Custom stateful streaming operators (SURVEY §2.9 'stateful custom
op' and 'stream-stream join' rows — no-oracle tier, checked by batch
equivalence in tests/test_streaming.py).

`running_user_counts` keeps one counter per user in the state store
via applyInPandasWithState (Arrow-batched; state size = #users, bounded
by the key domain, not the stream length). `purchases_after_views` is
a watermarked stream-stream inner join — both sides' state is evicted
once the watermark passes the 1-hour join range.
"""

from __future__ import annotations

from contextlib import contextmanager

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_counts(events: DataFrame) -> DataFrame:
    """Running per-user event counters; emits the updated total for
    each user touched in a micro-batch."""

    def update_counts(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def gap_session_counts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """CUSTOM gap-based sessionization (the hand-rolled counterpart to
    the built-in F.session_window): per-user state = (last event epoch,
    session count); an event starts a new session when it arrives more
    than `gap_minutes` after the previous one. Emits the RUNNING total
    per touched user each micro-batch — monotone, so the final value
    per user is the max emission (the qst1 consumer contract).

    Correct only under time-ordered arrival per user (sequential
    range-partitioned replay): state carries no out-of-order buffer by
    design — the point is the minimal custom-state shape, state size =
    #users x 2 scalars regardless of stream length."""
    gap_s = gap_minutes * 60.0

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            last, n = state.get
        else:
            last, n = None, 0
        pdfs = [pdf for pdf in pdf_iter]
        rows = pd.concat(pdfs).sort_values(["ts", "event_id"])
        for t in rows["ts"]:
            e = t.timestamp()
            if last is None or e - last > gap_s:
                n += 1
            last = e
        state.update((last, n))
        yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_sessions bigint",
        stateStructType="last double, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def has_tws_support() -> bool:
    """True when the Spark-4 transformWithState Python worker can run
    here: its state-message protocol imports google.protobuf, which
    some containers lack. Probed at call time, not import time, so an
    env change (protobuf installed later) is picked up."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@contextmanager
def rocksdb_provider(spark):
    """Scoped RocksDB state-store provider: streaming queries snapshot
    SQL confs at `.start()`, so setting the provider for the duration
    of the block and restoring it on exit gives queries started inside
    the block RocksDB state without leaking the conf to the rest of
    the session."""
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)


def running_user_counts_auto(events: DataFrame) -> DataFrame:
    """Running per-user counters via the best stateful backend the
    environment supports: transformWithStateInPandas (ValueState) when
    the protobuf runtime is present, else the portable
    applyInPandasWithState path. Same schema, same semantics, same
    output mode — callers never branch on the env.

    SIDE EFFECT when TWS is chosen: sets the RocksDB state-store
    provider on the SESSION and leaves it set — TWS requires RocksDB
    and streaming confs are only read at query `.start()`, which
    happens after this function returns, so the conf cannot be
    restored here. Callers who don't want the provider to leak into
    later queries should wrap build+start in `rocksdb_provider(spark)`
    (scoped set/restore) — the round-3/4 review trade-off: a silent
    session-global default change vs a query that fails at start.
    Driver-side probing is a local[*] heuristic: on a real cluster,
    executor Python envs must match the driver's for TWS."""
    if has_tws_support():
        events.sparkSession.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
        return running_user_counts_tws(events)
    return running_user_counts(events)


def make_user_counter():
    """The running_user_counts_tws StatefulProcessor, built at module
    level so the TWS contract test can construct it, pickle-roundtrip
    it (the worker ships it via cloudpickle), and drive
    init/handleInputRows against a fake handle — everything short of
    the protobuf wire protocol, which this container cannot run
    (has_tws_support). Imports of the StatefulProcessor ABC live
    inside the factory: pyspark.sql.streaming.stateful_processor is
    importable without protobuf (verified by the contract test), but
    keeping it lazy preserves module import on exotic builds."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            total = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                total += len(pdf)
            self._count.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

        def close(self) -> None:
            pass

    return UserCounter()


def running_user_counts_tws(events: DataFrame) -> DataFrame:
    """Spark 4 transformWithState variant of running_user_counts —
    ValueState per user via the StatefulProcessor API. Requires the
    RocksDB state store provider (CLUSTER_CONF) AND the `protobuf`
    package — the state-message protocol imports google.protobuf in
    the driver worker. Call through `running_user_counts_auto`, which
    probes the env and falls back to applyInPandasWithState."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_user_counter(),
        outputStructType="user_id bigint, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )


def _purchase_view_join(
    events: DataFrame,
    watermark: str,
    how: str,
    events_p: DataFrame | None = None,
) -> DataFrame:
    """Build the interval join. `events_p` (default: same frame) lets
    callers feed the purchase side from an INDEPENDENT source — e.g.
    two separately-replayed streams with misaligned micro-batch
    boundaries (qs5b); the global watermark is the min across sources,
    so neither side's state is evicted before the laggard catches up."""
    if events_p is None:
        events_p = events
    semi = how == "left_semi"
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events_p.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        how,
    )
    if semi:
        # semi join keeps only the left schema: each qualifying
        # purchase exactly once, no view columns to project
        return joined.select(
            F.col("p_user").alias("user_id"), "purchase_id"
        )
    return joined.select(
        # coalesce: identical to p_user for inner/left (purchase side is
        # the preserved side) and NULL-safe for full_outer's unmatched
        # views
        F.coalesce("p_user", "v_user").alias("user_id"),
        "purchase_id",
        "view_id",
    )


def purchases_after_views(
    events: DataFrame, watermark: str = "40 days"
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's views in the preceding hour → (user_id, purchase_id,
    view_id). Watermarks on both sides + the time-range condition
    bound the join state."""
    return _purchase_view_join(events, watermark, "inner")


def purchases_after_views_two_sources(
    views_src: DataFrame, purchases_src: DataFrame, watermark: str = "40 days"
) -> DataFrame:
    """`purchases_after_views` with the two join sides fed from
    INDEPENDENT streaming sources (different replay dirs / rates)."""
    return _purchase_view_join(
        views_src, watermark, "inner", events_p=purchases_src
    )


def purchases_after_views_full(
    events: DataFrame, watermark: str = "40 days"
) -> DataFrame:
    """FULL OUTER variant: matched pairs emit as they join; unmatched
    purchases AND unmatched views each emit once the watermark passes
    their join range (purchases after p_ts, views after v_ts + 1h —
    the view side's state must outlive its own event time by the join
    interval). Same sentinel-advance protocol as left_outer."""
    return _purchase_view_join(events, watermark, "full_outer")


def purchases_after_views_semi(
    events: DataFrame, watermark: str = "40 days"
) -> DataFrame:
    """LEFT SEMI variant: each purchase with >= 1 view in the
    preceding hour emits EXACTLY ONCE (no view columns, no match
    multiplicity) — the streaming EXISTS. The view side keeps the
    same interval-bounded state as inner; the left row's dedup-on-
    first-match is the semantics inner + distinct can't reproduce
    without unbounded output state."""
    return _purchase_view_join(events, watermark, "left_semi")


def purchases_after_views_outer(
    events: DataFrame, watermark: str = "40 days"
) -> DataFrame:
    """LEFT OUTER variant of `purchases_after_views` (one shared
    builder): every purchase emits, matched view_ids or NULL. Outer
    results only emit once the watermark passes the join range — tests
    advance it with far-future sentinel events that survive the
    event_type filters on BOTH sides."""
    return _purchase_view_join(events, watermark, "left_outer")


def rolling_last_k_tws(events: DataFrame, k: int = 3) -> DataFrame:
    """transformWithStateInPandas with LIST state: per user keep the
    last `k` event values (ListState) alongside a ValueState counter —
    the bounded-buffer shape (rolling features, last-N dedup keys)
    that ValueState alone can't express. Emits (user_id, n_seen,
    sum_lastk) per touched user per micro-batch; n_seen is monotone,
    so the emission with the max n_seen is the final state (the qst1
    consumer contract). Correct under time-ordered sequential replay;
    within a batch rows are explicitly re-sorted by (ts, event_id)
    (shuffle order is not arrival order)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_last_k(k),
        outputStructType="user_id bigint, n_seen bigint, sum_lastk double",
        outputMode="Update",
        timeMode="None",
    )


def make_last_k(k: int = 3):
    """The rolling_last_k_tws StatefulProcessor (ListState +
    ValueState), module-level for the same contract-test reasons as
    `make_user_counter`."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LastK(StatefulProcessor):
        def __init__(self, k: int) -> None:
            self._k = k

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._vals = handle.getListState("vals", "v double")
            self._n = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            vals = [t[0] for t in self._vals.get()]
            n = self._n.get()[0] if self._n.exists() else 0
            pdfs = [pdf for pdf in rows]
            batch = pd.concat(pdfs).sort_values(["ts", "event_id"])
            for v in batch["value"]:
                vals.append(float(v))
                n += 1
            vals = vals[-self._k:]
            self._vals.put([(v,) for v in vals])
            self._n.update((n,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_seen": [n],
                    "sum_lastk": [float(sum(vals))],
                }
            )

        def close(self) -> None:
            pass

    return LastK(k)


def rolling_last_k(events: DataFrame, k: int = 3) -> DataFrame:
    """Portable applyInPandasWithState twin of `rolling_last_k_tws`
    (state tuple carries the bounded list as array<double>) — the
    fallback when the TWS protobuf worker is unavailable; identical
    semantics, so qst3 hash-gates whichever path the env runs."""

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            n, vals = state.get
            vals = list(vals)
        else:
            n, vals = 0, []
        pdfs = [pdf for pdf in pdf_iter]
        batch = pd.concat(pdfs).sort_values(["ts", "event_id"])
        for v in batch["value"]:
            vals.append(float(v))
            n += 1
        vals = vals[-k:]
        state.update((n, vals))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n],
                "sum_lastk": [float(sum(vals))],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_seen bigint, sum_lastk double",
        stateStructType="n bigint, vals array<double>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
