"""Engine facade: SQL entry point over registered views must agree
with the DataFrame API, including the derived graph views."""

from __future__ import annotations

from pyspark.sql import functions as F

from sora_spark.engine import Engine


def test_sql_entrypoint_matches_dataframe(spark, sf_dir):
    eng = Engine(spark).attach(sf_dir)
    via_sql = eng.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ).collect()
    via_df = (
        eng.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert via_sql == via_df


def test_graph_views_registered(spark, sf_dir):
    eng = Engine(spark).attach(sf_dir)
    n_sql = eng.sql("SELECT count(*) AS n FROM e_co").collect()[0]["n"]
    n_api = eng.graph_co().edges.count()
    assert n_sql == n_api > 0
    assert eng.sql("SELECT count(*) AS n FROM e_seq").collect()[0]["n"] > 0


def test_stream_entrypoint(spark, sf_dir):
    eng = Engine(spark).attach(sf_dir)
    s = eng.read_stream("events", n_files=2)
    assert s.isStreaming
    assert "ts" in s.columns


def test_engine_assembly_and_curation_surface(spark, sf_dir):
    """Round-6 facade: assemble/unitigs/curate run end-to-end and agree
    with their declared-query twins."""
    from sora_spark.engine import Engine
    from sora_spark.queries import REGISTRY

    eng = Engine(spark).attach(sf_dir)
    stats: dict = {}
    edges = eng.assemble(stats=stats)
    want = REGISTRY["qg16_assembly_pipeline"].spark_fn(spark, sf_dir)
    assert sorted(map(tuple, edges.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert stats["bubble_rounds"] >= 1
    uni = eng.unitigs(with_paths=True)
    assert set(uni.columns) == {"start", "end", "length", "path"}
    rep = eng.curate().collect()
    assert {r["split"] for r in rep} <= {"train", "val"}


def test_facade_read_assembly_matches_registry(spark, sf_dir):
    """Engine.assemble_reads must equal the declared qg20 path."""
    from sora_spark.queries.registry import REGISTRY

    eng = Engine(spark).attach(sf_dir)
    via_facade = sorted(
        map(tuple, eng.assemble_reads().select("start", "end").collect())
    )
    via_registry = sorted(
        map(
            tuple,
            REGISTRY["qg20_read_assembly"]
            .spark_fn(spark, sf_dir)
            .select("start", "end")
            .collect(),
        )
    )
    assert via_facade == via_registry


def test_facade_analytics_matches_registry(spark, sf_dir):
    """New facade entry points must return exactly what their declared
    queries return (same code path, no drift)."""
    from sora_spark.engine import Engine
    from sora_spark.queries import REGISTRY

    eng = Engine(spark).attach(sf_dir)

    spec = {tuple(r) for r in eng.kmer_spectrum().collect()}
    want = {
        tuple(r)
        for r in REGISTRY["qg26_kmer_spectrum"].spark_fn(spark, sf_dir).collect()
    }
    assert spec == want

    fun = {tuple(r) for r in eng.funnel(["view", "click", "purchase"]).collect()}
    want = {
        tuple(r) for r in REGISTRY["qev1_funnel"].spark_fn(spark, sf_dir).collect()
    }
    assert fun == want

    com = {tuple(r) for r in eng.communities().collect()}
    want = {
        tuple(r)
        for r in REGISTRY["qg25_label_propagation"].spark_fn(spark, sf_dir).collect()
    }
    assert com == want


def test_no_duplicate_module_level_names():
    """No module in the package may define a module-level name twice:
    function bodies resolve module names at CALL time, so a later
    re-assignment silently rebinds every earlier user — exactly how
    an appended query constant (_LATERAL_SQL, r11) made qsub3 execute
    qsub7's SQL against its own oracle. AST-level, zero Spark."""
    import ast
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "sora_spark")
    offenders = []
    for f in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                              recursive=True)):
        with open(f) as fh:
            tree = ast.parse(fh.read())
        seen = {}
        for node in tree.body:
            names = []
            if isinstance(node, ast.Assign):
                names = [t.id for t in node.targets
                         if isinstance(t, ast.Name)]
            elif isinstance(node, (ast.FunctionDef, ast.ClassDef)):
                names = [node.name]
            for n in names:
                if n in seen:
                    offenders.append(f"{f}:{node.lineno} rebinds {n} "
                                     f"(first bound at {seen[n]})")
                seen[n] = node.lineno
    assert not offenders, "\n".join(offenders)
