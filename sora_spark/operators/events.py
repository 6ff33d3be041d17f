"""Event-sequence analytics: ordered funnels and retention cohorts.

The two queries every product/telemetry pipeline runs over an event
stream, expressed as join/agg dataflow (no per-user Python, no
collect):

- `funnel`: users advance a stage only by an event STRICTLY AFTER
  their previous stage's first event — computed as a chain of
  per-stage (user, first_ts) frames equi-joined on user. Each stage
  is one filtered aggregation + one equi-join; all shuffles are on
  user_id, so a cluster co-partitions the whole chain after the first
  exchange (no re-key anywhere).
- `retention`: cohort = first-seen day per user; activity matrix =
  (cohort_day, day_offset) distinct-user counts. One aggregation for
  cohorts, one equi-join back on user_id, one count-distinct — the
  classic triangle view.

Both produce bounded outputs (stages; cohort-days × offsets) from
unbounded inputs — safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (stage_idx, stage, n_users), users reaching each stage in
    strict temporal order (first qualifying event per stage)."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    rows = []
    prev = None  # DataFrame (user, _t): first qualifying ts at prev stage
    for idx, stage in enumerate(stages):
        ev = events.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if prev is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev.join(prev, "_u")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
            )
        rows.append(
            cur.agg(
                F.lit(idx).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count("*").cast("bigint").alias("n_users"),
            )
        )
        prev = cur
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    cohort_events: DataFrame | None = None,
) -> DataFrame:
    """→ (cohort_day, day_offset, n_users): distinct users from each
    cohort active again `day_offset` days later (pre-cohort activity,
    day_offset < 0, is dropped — classic triangle semantics).

    `cohort_events` (default: `events` itself) defines the cohort: a
    user's cohort day is their first appearance in THAT stream, while
    activity still counts every event — the acquisition-cohort shape
    ("first purchase" cohorts vs all-activity retention). Only users
    present in the cohort stream appear."""
    day = F.date_trunc("day", F.col(ts_col))
    src = events if cohort_events is None else cohort_events
    firsts = (
        src.select(F.col(user_col).alias("_u"), day.alias("_d"))
        .groupBy("_u")
        .agg(F.min("_d").alias("_cohort"))
    )
    activity = events.select(
        F.col(user_col).alias("_u"), day.alias("_day")
    ).distinct()
    return (
        activity.join(firsts, "_u")
        .filter(F.datediff(F.col("_day"), F.col("_cohort")) >= 0)
        .groupBy(
            F.col("_cohort").alias("cohort_day"),
            F.datediff(F.col("_day"), F.col("_cohort")).alias("day_offset"),
        )
        .agg(F.count_distinct("_u").cast("bigint").alias("n_users"))
    )


def entry_paths(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top entry journeys: each user's FIRST `k` events joined into a
    '>'-separated path string, counted across users → (path, n_users).
    Order inside the path comes from sorting (ts, tiebreak, type)
    structs inside the aggregate — deterministic without a second
    window pass; the prefix filter is one row_number window. Output is
    bounded by |event_types|^k regardless of user count."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    firstk = events.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    per_user = firstk.groupBy(user_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col), F.col(tiebreak_col),
                            F.col(type_col),
                        )
                    )
                ),
                lambda s: s[type_col],
            ),
            ">",
        ).alias("path")
    )
    return per_user.groupBy("path").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
