"""Shared fixtures: one SparkSession and one DuckDB oracle connection
per test session. Tests default to sf0.001 (t1 smoke size) for speed;
set SORA_TEST_SF_DIR=/root/testdata/sf0.01 to run the t2 tier locally.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sora_spark.catalog import TABLE_NAMES
from sora_spark.session import build_session

SF_DIR = os.environ.get("SORA_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # drop scratch leftovers without racing CONCURRENT suites (a
    # blanket rmtree here deleted another pytest process's in-flight
    # roundtrip dirs — observed qsrc3 flake). Three namespaces:
    # - pid-owned dirs: '-pid<N>' anywhere; bare '-<N>' only under
    #   roundtrip/ (relational.py), where the suffix IS a pid — a bare
    #   all-digit suffix elsewhere may be a random hex tag that
    #   happens to be numeric, NOT a pid (round-9 review finding);
    # - everything else (hex/uuid-tagged dirs AND plain files, e.g.
    #   fasta-*.txt): not pid-attributable, so age out after 6 h —
    #   far beyond any suite's runtime, so never a live run's state.
    # .scratch/stream has its own dead-pid sweep (replay.py).
    import re
    import shutil
    import time

    scratch = "/root/repo/.scratch"
    now = time.time()
    stale_s = 6 * 3600
    for root, dirs, files in os.walk(scratch):
        if root == scratch and "stream" in dirs:
            dirs.remove("stream")
        for d in list(dirs):
            full = os.path.join(root, d)
            m = re.search(r"-pid(\d+)$", d)
            if m is None and os.path.basename(root) == "roundtrip":
                m = re.search(r"-(\d+)$", d)
            try:
                if m is not None:
                    pid = int(m.group(1))
                    if pid != os.getpid() and not os.path.exists(
                        f"/proc/{pid}"
                    ):
                        shutil.rmtree(full, ignore_errors=True)
                    # never descend into pid-owned dirs: either just
                    # removed, or owned by a LIVE run (ours included)
                    # whose early-created scratch files must not age
                    # out underneath a >6h suite (r09 ADVICE)
                    dirs.remove(d)
                elif now - os.path.getmtime(full) > stale_s:
                    shutil.rmtree(full, ignore_errors=True)
                    dirs.remove(d)
            except OSError:
                pass
        for f in files:
            full = os.path.join(root, f)
            try:
                if now - os.path.getmtime(full) > stale_s:
                    os.remove(full)
            except OSError:
                pass
    s = build_session(
        app_name="sora-tests",
        master=os.environ.get("SORA_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# ---- slow tier (r15, VERDICT item 2) ---------------------------------
# The measured-heaviest tests (>= 8 s each on a clean 32-core run,
# 2026-08-18; together ~30 of the suite's ~48 min). pytest.ini
# deselects the `slow` marker by default so the verify driver's pytest
# run finishes inside its window; `-m ""` runs everything. Membership
# is a measurement snapshot, not a judgment — a test that falls off
# this list simply runs in the default tier again.
SLOW_NODEIDS = {
    "tests/test_capabilities.py::test_bloom_dir_stats",
    "tests/test_capabilities.py::test_clustered_compact_single_dir_and_sidecar_recovery",
    "tests/test_capabilities.py::test_commit_log_change_data_feed",
    "tests/test_capabilities.py::test_commit_log_check_constraint",
    "tests/test_capabilities.py::test_commit_log_conflict_matrix",
    "tests/test_capabilities.py::test_commit_log_two_process_race",
    "tests/test_capabilities.py::test_commitlog_stream_stops_on_schema_evolution",
    "tests/test_declared_queries.py::test_declared_query[qg23_contig_sequences]",
    "tests/test_declared_queries.py::test_declared_query[qg27_topo_levels]",
    "tests/test_declared_queries.py::test_declared_query[qg31_scaffold_links]",
    "tests/test_declared_queries.py::test_declared_query[qg33_minimum_spanning_forest]",
    "tests/test_declared_queries.py::test_declared_query[qg37_personalized_pagerank]",
    "tests/test_declared_queries.py::test_declared_query[qg45_debruijn_unitigs]",
    "tests/test_declared_queries.py::test_declared_query[qix10_phrase_from_index]",
    "tests/test_declared_queries.py::test_declared_query[qix11_text_index_delete]",
    "tests/test_declared_queries.py::test_declared_query[qix12_ivf_index_delete]",
    "tests/test_declared_queries.py::test_declared_query[qix13_ivf_list_split]",
    "tests/test_declared_queries.py::test_declared_query[qix14_hybrid_rrf_fusion]",
    "tests/test_declared_queries.py::test_declared_query[qix15_filtered_knn]",
    "tests/test_declared_queries.py::test_declared_query[qix16_kwic_snippets]",
    "tests/test_declared_queries.py::test_declared_query[qix17_ivf_maintenance]",
    "tests/test_declared_queries.py::test_declared_query[qix18_ivf_rebuild]",
    "tests/test_declared_queries.py::test_declared_query[qix5_ivfpq_exhaustive_probe]",
    "tests/test_declared_queries.py::test_declared_query[qix6_ivf_incremental_append]",
    "tests/test_declared_queries.py::test_declared_query[qix7_ivfpq_incremental_append]",
    "tests/test_declared_queries.py::test_declared_query[qmv3_streaming_mv_maintenance]",
    "tests/test_declared_queries.py::test_declared_query[qmv4_rate_limited_cdf_mv]",
    "tests/test_declared_queries.py::test_declared_query[qpipe5_tokenize_and_pack]",
    "tests/test_declared_queries.py::test_declared_query[qs10_join_then_window_gate]",
    "tests/test_declared_queries.py::test_declared_query[qs11_parquet_file_sink]",
    "tests/test_declared_queries.py::test_declared_query[qs12_dedup_within_watermark_sink]",
    "tests/test_declared_queries.py::test_declared_query[qs13_dynamic_gap_sessions]",
    "tests/test_declared_queries.py::test_declared_query[qs4b_dedup_stream_sink]",
    "tests/test_declared_queries.py::test_declared_query[qs5b_stream_stream_join_sink]",
    "tests/test_declared_queries.py::test_declared_query[qs5c_stream_stream_outer_join_sink]",
    "tests/test_declared_queries.py::test_declared_query[qs5d_stream_stream_full_outer_sink]",
    "tests/test_declared_queries.py::test_declared_query[qs5e_stream_stream_semi_sink]",
    "tests/test_engine.py::test_engine_assembly_and_curation_surface",
    "tests/test_graph.py::test_reliable_checkpoint_mode_matches_local",
    "tests/test_llm.py::test_ann_recall_on_clustered_corpus",
    "tests/test_llm.py::test_ann_shuffle_probe_path_matches_broadcast",
    "tests/test_llm.py::test_bpe_train_deep",
    "tests/test_llm.py::test_embedding_neardup_multiband_recall",
    "tests/test_llm.py::test_ivf_clustered_recall",
    "tests/test_llm.py::test_ivf_incremental_append",
    "tests/test_llm.py::test_ivf_large_codebook_gate_opens",
    "tests/test_llm.py::test_ivfpq_hierarchical_composition",
    "tests/test_llm.py::test_ivfpq_incremental_append",
    "tests/test_llm.py::test_ivfpq_recall_and_code_layout",
    "tests/test_llm.py::test_maintain_ivf_index",
    "tests/test_llm.py::test_range_search_vectorized_matches_jvm_shuffle",
    "tests/test_llm.py::test_rebuild_ivf_index",
    "tests/test_llm.py::test_split_ivf_list",
    "tests/test_property.py::test_asof_join_property_family",
    "tests/test_property.py::test_bpe_ranked_equals_sequential_on_trained_lists",
    "tests/test_property.py::test_commit_log_lifecycle_property",
    "tests/test_property.py::test_graph_property_family",
    "tests/test_property.py::test_incremental_view_property_family",
    "tests/test_property.py::test_msf_property_family",
    "tests/test_property.py::test_overlap_edges_match_python_oracle",
    "tests/test_property.py::test_scc_property_family",
    "tests/test_scale_ops.py::test_replicated_assembly_pipeline_stress",
    "tests/test_scale_ops.py::test_replicated_graph_stress_round_bound",
    "tests/test_scale_ops.py::test_replicated_scc_and_ktruss_stress",
    "tests/test_scale_ops.py::test_replicated_topo_and_lpa_invariance",
    "tests/test_scale_ops.py::test_replicated_weighted_msf_and_sssp_stress",
    "tests/test_streaming.py::test_commitlog_source_admission_control",
    "tests/test_streaming.py::test_commitlog_stream_clone_gates",
    "tests/test_streaming.py::test_commitlog_stream_column_mapping",
    "tests/test_streaming.py::test_commitlog_stream_metadata_commits_and_feature_gate",
    "tests/test_streaming.py::test_commitlog_stream_of_clone",
    "tests/test_streaming.py::test_commitlog_streaming_source",
    "tests/test_streaming.py::test_qmv4_admits_one_version_per_batch",
    "tests/test_streaming.py::test_stream_stream_left_outer_join",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.nodeid in SLOW_NODEIDS:
            item.add_marker(_pytest.mark.slow)
