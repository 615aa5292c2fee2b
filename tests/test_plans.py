"""Physical-plan guards: the optimizations SURVEY.md section 4 claims must
actually show up in `.explain` -- pushed filters, pruned columns,
broadcast joins, whole-stage codegen, no Python row loops."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = entry_mod.queries()["filter_pushdown_project"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "IsNotNull" in plan
    # column pruning: scan must read only the needed columns
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" not in read_schema and "l_returnflag" not in read_schema


def test_lookup_join_broadcasts(spark):
    df = entry_mod.queries()["broadcast_lookup_join"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_join_is_semi_and_broadcast(spark):
    df = entry_mod.queries()["semi_join_parts"](spark, SF)
    plan = _plan(df)
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan


def test_blocklist_anti_join_is_broadcast_and_pruned(spark):
    """Blocklist filtering must be a broadcast LEFT ANTI (the fact table
    never shuffles for the filter) with the blocklist predicate pushed to
    the dim scan and the fact scan pruned to the two needed columns."""
    df = entry_mod.queries()["blocklist_anti_join"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "LessThan(c_acctbal,0.0)" in plan  # pushed blocklist predicate
    ev_read = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "user_id" in ln
    ]
    assert ev_read and "props" not in ev_read[0] and "value" not in ev_read[0]


def test_rollup_is_single_expand_single_exchange(spark):
    """ROLLUP must plan as ONE Expand feeding one aggregate pipeline --
    all grouping-set levels from a single pass over the fact table, not a
    scan per level."""
    df = entry_mod.queries()["rollup_grouping_sets"](spark, SF)
    plan = _plan(df)
    assert plan.count("Expand") >= 1
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_pivot_plans_one_aggregate_no_extra_job(spark):
    """Pivot with an explicit value list must not add a distinct-values
    pre-job: one scan, pivot_first aggregates, no join."""
    df = entry_mod.queries()["pivot_event_matrix"](spark, SF)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_dedup_has_partial_aggregation(spark):
    """The dedup reduction must show a two-phase aggregate (map-side
    partial -> final), the thing that collapses duplicate mass before the
    shuffle at 10^10 events."""
    df = entry_mod.queries()["cdc_dedup_latest"](spark, SF)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2 or plan.count("Aggregate") >= 2
    assert "Window" not in plan


def test_queries_have_no_python_udfs(spark):
    """north_rule: DataFrame ops + Arrow only in the query surface -- no
    row-at-a-time Python in any registered query plan."""
    for name, fn in entry_mod.queries().items():
        if name == "cdc_replay_snapshot":
            continue  # runs the engine, not a single plan
        plan = _plan(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"


def test_whole_stage_codegen_on_hot_path(spark):
    df = entry_mod.queries()["q1_pricing_summary"](spark, SF)
    df.collect()  # materialize the AQE final plan
    plan = _plan(df)
    # '*(n)' is the whole-stage-codegen marker in plan strings
    assert "*(1)" in plan and "partial_sum" in plan


def test_limit_is_not_full_sort(spark):
    """top-k must be TakeOrderedAndProject, not global sort + limit."""
    df = entry_mod.queries()["cosine_topk"](spark, SF)
    assert "TakeOrderedAndProject" in _plan(df)


def test_selection_predicate_pushes_down(spark, tmp_path):
    from fetchez_spark.changegen import ChangeLogSpec, write_change_log
    from fetchez_spark.selection import Selection
    from fetchez_spark.sources.parquet_log import ParquetLogSource

    write_change_log(ChangeLogSpec(num_events=1000, num_convs=50, seed=5), str(tmp_path / "log"), 2)
    src = ParquetLogSource(str(tmp_path / "log"), selection=Selection.parse("key:conv_00000000/conv_00000010"))
    plan = _plan(src.read(spark))
    assert "PushedFilters: [" in plan and "conv_id" in plan.split("PushedFilters:")[1][:200]


def test_capped_band_joins_stay_equi_joins(spark):
    """The round-3 bucket-size caps must not change the join SHAPE: the
    candidate join stays an equi-join on the band key (hash-partitionable
    at any scale), and the cap's bucket-count filter joins on the same
    key -- no CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    for name in ("minhash_lsh_capped", "embedding_neardup_capped"):
        df = entry_mod.queries()[name](spark, SF)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_simhash64_hamming_band_join_is_equi(spark):
    df = entry_mod.queries()["simhash_hamming_pairs"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the verify predicate (bit_count of XOR) must be post-join, not the
    # join condition itself -- the join key is the 16-bit band value
    assert "bit_count" in plan
