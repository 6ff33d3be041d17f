"""Property-based cross-engine testing (SURVEY §5.4): hypothesis
generates random filter + group-by + aggregate specs over the star
schema; one spec renders BOTH the Spark DataFrame plan and the DuckDB
SQL, and results must match under the shared canonicalization. This is
the dialect-drift tripwire the fixed inventory can't provide.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from sora_spark.catalog import tables
from tests.oracle_utils import compare

# (column, kind, domain) — lineitem numeric/string surface
NUM_COLS = {
    "l_quantity": (1.0, 50.0),
    "l_discount": (0.0, 0.1),
    "l_extendedprice": (900.0, 100_000.0),
    "l_tax": (0.0, 0.08),
}
STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
GROUP_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">="]


@st.composite
def query_spec(draw):
    n_preds = draw(st.integers(0, 2))
    preds = []
    for _ in range(n_preds):
        if draw(st.booleans()):
            col = draw(st.sampled_from(sorted(NUM_COLS)))
            lo, hi = NUM_COLS[col]
            val = round(draw(st.floats(lo, hi, allow_nan=False)), 3)
            op = draw(st.sampled_from(OPS))
            preds.append(("num", col, op, val))
        else:
            col = draw(st.sampled_from(sorted(STR_COLS)))
            vals = draw(
                st.lists(
                    st.sampled_from(STR_COLS[col]), min_size=1, max_size=2,
                    unique=True,
                )
            )
            preds.append(("in", col, sorted(vals)))
    conj = draw(st.sampled_from(["AND", "OR"])) if len(preds) == 2 else "AND"
    group = draw(
        st.lists(st.sampled_from(GROUP_COLS), max_size=2, unique=True)
    )
    agg_col = draw(st.sampled_from(sorted(NUM_COLS)))
    aggs = draw(
        st.lists(
            st.sampled_from(["count", "sum", "avg", "min", "max"]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    return {"preds": preds, "conj": conj, "group": sorted(group),
            "agg_col": agg_col, "aggs": sorted(aggs)}


def _pred_sql(p) -> str:
    if p[0] == "num":
        _, col, op, val = p
        return f"{col} {op} {val!r}"
    _, col, vals = p
    quoted = ", ".join(f"'{v}'" for v in vals)
    return f"{col} IN ({quoted})"


def _pred_col(p):
    if p[0] == "num":
        _, col, op, val = p
        c = F.col(col)
        return {"<": c < val, "<=": c <= val, ">": c > val, ">=": c >= val}[op]
    _, col, vals = p
    return F.col(col).isin(*vals)


_AGG_SQL = {
    "count": "count(*) AS agg_count",
    "sum": "round(sum({c}), 2) AS agg_sum",
    "avg": "round(avg({c}), 4) AS agg_avg",
    "min": "min({c}) AS agg_min",
    "max": "max({c}) AS agg_max",
}


def _agg_cols(spec):
    c = spec["agg_col"]
    m = {
        "count": F.count("*").alias("agg_count"),
        "sum": F.round(F.sum(c), 2).alias("agg_sum"),
        "avg": F.round(F.avg(c), 4).alias("agg_avg"),
        "min": F.min(c).alias("agg_min"),
        "max": F.max(c).alias("agg_max"),
    }
    return [m[a] for a in spec["aggs"]]


def render_sql(spec) -> str:
    sel = list(spec["group"]) + [
        _AGG_SQL[a].format(c=spec["agg_col"]) for a in spec["aggs"]
    ]
    sql = f"SELECT {', '.join(sel)} FROM lineitem"
    if spec["preds"]:
        sql += " WHERE " + f" {spec['conj']} ".join(
            _pred_sql(p) for p in spec["preds"]
        )
    if spec["group"]:
        sql += " GROUP BY " + ", ".join(spec["group"])
    return sql


def render_spark(spark, sf_dir, spec):
    df = tables(spark, sf_dir).lineitem
    if spec["preds"]:
        cols = [_pred_col(p) for p in spec["preds"]]
        cond = cols[0]
        for c in cols[1:]:
            cond = cond & c if spec["conj"] == "AND" else cond | c
        df = df.filter(cond)
    if spec["group"]:
        return df.groupBy(*spec["group"]).agg(*_agg_cols(spec))
    return df.agg(*_agg_cols(spec))


# derandomize: examples are a deterministic function of the code, so a
# later test run can never surface a brand-new failing example (drift
# hunting happens in-session, not as a flake at gate time)
_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(spec=query_spec())
def test_random_filter_agg_matches_oracle(spec, spark, duck, sf_dir):
    compare(render_spark(spark, sf_dir, spec), duck, render_sql(spec),
            name=f"property:{spec}")


# ---- join-shape family --------------------------------------------------

DIMS = {
    "orders": ("o_orderkey", "l_orderkey", ["o_orderstatus", "o_orderpriority"]),
    "part": ("p_partkey", "l_partkey", ["p_brand", "p_type"]),
}


@st.composite
def join_spec(draw):
    dim = draw(st.sampled_from(sorted(DIMS)))
    dim_key, fact_key, group_cands = DIMS[dim]
    group = draw(st.sampled_from(group_cands))
    how = draw(st.sampled_from(["inner", "left"]))
    n_preds = draw(st.integers(0, 1))
    preds = []
    for _ in range(n_preds):
        col = draw(st.sampled_from(sorted(NUM_COLS)))
        lo, hi = NUM_COLS[col]
        val = round(draw(st.floats(lo, hi, allow_nan=False)), 3)
        preds.append(("num", col, draw(st.sampled_from(OPS)), val))
    return {"dim": dim, "dim_key": dim_key, "fact_key": fact_key,
            "group": group, "how": how, "preds": preds}


@settings(**_SETTINGS)
@given(spec=join_spec())
def test_random_join_agg_matches_oracle(spec, spark, duck, sf_dir):
    t = tables(spark, sf_dir)
    fact = t.lineitem
    for p in spec["preds"]:
        fact = fact.filter(_pred_col(p))
    joined = fact.join(
        t.table(spec["dim"]),
        F.col(spec["fact_key"]) == F.col(spec["dim_key"]),
        spec["how"],
    )
    got = (
        joined.groupBy(spec["group"])
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        )
    )
    where = (
        " WHERE " + " AND ".join(_pred_sql(p) for p in spec["preds"])
        if spec["preds"]
        else ""
    )
    join_kw = "JOIN" if spec["how"] == "inner" else "LEFT JOIN"
    sql = (
        f"SELECT {spec['group']}, count(*) AS n, "
        f"round(sum(l_extendedprice), 2) AS s "
        f"FROM (SELECT * FROM lineitem{where}) f "
        f"{join_kw} {spec['dim']} ON f.{spec['fact_key']} = {spec['dim_key']} "
        f"GROUP BY {spec['group']}"
    )
    compare(got, duck, sql, name=f"join-property:{spec}")
