"""Custom operators Spark lacks as single primitives (SURVEY §4.2).
Each is a composition of DataFrame ops — never driver-side loops — so
Catalyst/AQE still plan the physical strategy.
"""

from sora_spark.operators.asof import asof_join
from sora_spark.operators.diff import snapshot_diff
from sora_spark.operators.discretize import quantile_discretize
from sora_spark.operators.fuzzy import fuzzy_join
from sora_spark.operators.events import entry_paths, funnel, retention
from sora_spark.operators.incremental import build_view, refresh
from sora_spark.operators.layout import write_zordered, zvalue
from sora_spark.operators.profile import profile_table
from sora_spark.operators.scd import scd2_history
from sora_spark.operators.interval import interval_join
from sora_spark.operators.skew import salted_join
from sora_spark.operators.timeseries import fill_gaps, resample

__all__ = [
    "asof_join",
    "snapshot_diff",
    "quantile_discretize",
    "fuzzy_join",
    "build_view",
    "refresh",
    "funnel",
    "retention",
    "entry_paths",
    "zvalue",
    "write_zordered",
    "profile_table",
    "scd2_history",
    "interval_join",
    "salted_join",
    "fill_gaps",
    "resample",
]
