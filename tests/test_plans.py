"""Physical-plan shape assertions — the scale story, made regression-checkable.

At 100 TB the difference between a right and wrong plan is not style:
filters must reach the parquet scan, projections must prune columns,
dimension joins must broadcast, the pyramid join must stay a hash join
(never a nested loop), and pure-Catalyst operators must contain zero
Python eval nodes.
"""

import pytest

from maplibre_tile_spec_spark import queries as Q


def plan_of(df) -> str:
    return df._jdf.queryExecution().toString()


class TestPlanShapes:
    def test_tile_assign_prunes_columns(self, spark, sf_dir):
        plan = plan_of(Q.q_tile_assign(spark, sf_dir))
        # events has 6 columns; the scan must read only event_id
        assert "ReadSchema: struct<event_id:bigint>" in plan

    def test_tpch_q1_pushes_filter_down(self, spark, sf_dir):
        plan = plan_of(Q.q_tpch_q1(spark, sf_dir))
        assert "PushedFilters:" in plan
        assert "LessThanOrEqual(l_shipdate" in plan

    def test_revenue_by_nation_broadcasts_dims(self, spark, sf_dir):
        plan = plan_of(Q.q_revenue_by_nation(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan

    def test_quadkey_join_is_hash_join_not_nested_loop(self, spark, sf_dir):
        plan = plan_of(Q.q_quadkey_pyramid_join(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_pip_join_broadcasts_cover(self, spark, sf_dir):
        plan = plan_of(Q.q_pip_join(spark, sf_dir))
        assert "BroadcastHashJoin" in plan

    @pytest.mark.parametrize(
        "name",
        [
            "tile_assign",
            "tile_pyramid_rollup",
            "zigzag_delta_stream",
            "rle_runs",
            "tpch_q1",
            "top_orders_per_customer",
            "revenue_by_nation",
            "dedup_exact",
            "text_stats",
            "cosine_topk",
            "sessionize_events",
            "minhash_lsh_pairs",
            "ngram_jaccard",
            "lang_id",
            "quality_score",
            "token_counts",
            "fingerprints",
            "schema_inference",
        ],
    )
    def test_pure_catalyst_operators_have_no_python(self, spark, sf_dir, name):
        plan = plan_of(Q.QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-Python"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF unnecessarily"
        assert "MapInPandas" not in plan, f"{name} uses mapInPandas unnecessarily"

    def test_rle_runs_window_is_partitioned(self, spark, sf_dir):
        """The per-row RLE window must be partitioned by the event_id
        bucket — a global Window.orderBy would serialize every row through
        one task at scale. The only permissible single-partition window is
        the boundary stitch over the tiny per-bucket summary."""
        import re

        plan = plan_of(Q.q_rle_runs(spark, sf_dir))
        # the big window (the per-row lag/cumsum) is bucket-partitioned and
        # the row-level run computation shuffles on the bucket key
        assert "windowspecdefinition(_b" in plan
        assert re.search(r"Exchange hashpartitioning\(_b", plan)

    def test_partial_aggregation_before_shuffle(self, spark, sf_dir):
        # map-side combine: two HashAggregates around the Exchange
        plan = plan_of(Q.q_tile_assign(spark, sf_dir))
        assert plan.count("HashAggregate") >= 2
        assert "Exchange hashpartitioning" in plan


class TestBucketing:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir, tmp_path):
        """Bucketing both join sides on the key pre-co-locates them: the
        sort-merge join runs with ZERO Exchange operators — at 100 TB this
        is the difference between a full-cluster shuffle and none."""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bdb.li_b")
        )
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bdb.ord_b")
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bdb.li_b").join(
                spark.table("bdb.ord_b"),
                spark.table("bdb.li_b").l_orderkey == spark.table("bdb.ord_b").o_orderkey,
            )
            plan = j._jdf.queryExecution().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
            # correctness: row count equals the shuffled join
            assert j.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestNgramDfShape:
    def test_df_is_partial_aggregated_not_windowed(self, spark, sf_dir):
        """Document frequency must come from a groupBy (map-side partial
        aggregation) + join back — a Window.partitionBy(sh) funnels a hot
        shingle's full posting list through ONE task at 100 TB."""
        import re

        from maplibre_tile_spec_spark.operators import dedup
        from maplibre_tile_spec_spark.sources import tables

        docs = tables.load(spark, sf_dir, "documents")
        out, _sets, _prefixes, _cand = dedup._ngram_jaccard_build(docs, "text", "doc_id", 3, 0.2)
        plan = plan_of(out)
        assert "windowspecdefinition(sh" not in plan, "df computed via hot-key window"
        # the df aggregate: partial + final HashAggregate keyed on sh
        assert re.search(r"HashAggregate\(keys=\[sh", plan), "df groupBy missing"
        # the only windows left are per-document (id-partitioned prefix rank)
        for m in re.finditer(r"windowspecdefinition\((\w+)", plan):
            assert m.group(1).startswith("id"), f"unexpected window key {m.group(1)}"
