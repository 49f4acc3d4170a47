"""Round-3 operator tests: Bloom filter (no false negatives ever),
Count-Min (always an upper bound), fixed-point PageRank (mass conservation
bound, determinism), and plan-shape gates for the new TPC-H queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nimhdfstore_spark.operators import graph as G
from nimhdfstore_spark.operators import sketches as SK


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


class TestBloom:
    def test_no_false_negatives(self, spark):
        build = _ids(spark, range(0, 3000, 3))
        bitmap = SK.bloom_bitmap(build, "k")
        probe = _ids(spark, range(0, 3000))
        flags = SK.bloom_probe(probe, "k", bitmap)
        members = {r["k"] for r in build.collect()}
        for r in flags.collect():
            if r["k"] in members:
                assert r["bloom_hit"] == 1, f"false negative for {r['k']}"

    def test_bitmap_bounded(self, spark):
        # 63 bits per word -> at most ceil(m/63) rows no matter the build size
        build = _ids(spark, range(50_000))
        bitmap = SK.bloom_bitmap(build, "k")
        assert bitmap.count() <= SK.BLOOM_M_BITS // 63 + 1

    def test_negative_keys_probe(self, spark):
        build = _ids(spark, [-5, -4, -3, 7])
        bitmap = SK.bloom_bitmap(build, "k")
        flags = {r["k"]: r["bloom_hit"] for r in
                 SK.bloom_probe(_ids(spark, [-5, 7]), "k", bitmap).collect()}
        assert flags == {-5: 1, 7: 1}


class TestCountMin:
    def test_upper_bound(self, spark):
        vals = [i % 7 for i in range(1000)] + [42] * 500
        df = _ids(spark, vals)
        sketch = SK.countmin_sketch(df, "k")
        est = SK.countmin_estimate(df.distinct(), "k", sketch)
        exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        joined = {r["k"]: (r["cm_estimate"], r["c"])
                  for r in est.join(exact, "k").collect()}
        for k, (e, c) in joined.items():
            assert e >= c, f"underestimate for {k}: {e} < {c}"
        # few distinct keys, wide sketch: estimates should be exact here
        assert all(e == c for e, c in joined.values())

    def test_state_bounded(self, spark):
        df = _ids(spark, range(20_000))
        assert SK.countmin_sketch(df, "k").count() <= SK.CM_DEPTH * SK.CM_WIDTH


class TestPageRank:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src long, dst long, w long")

    def test_mass_bound_and_symmetry(self, spark):
        # symmetric 3-cycle: equal ranks, total mass == SCALE (up to int-div
        # truncation, < 1 unit per node per term)
        edges = self._edges(
            spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)]
        )
        nn = spark.createDataFrame([(3,)], "n_nodes long")
        ranks = {r["node"]: r["rank_fp"]
                 for r in G.pagerank_fixed_point(edges, nn, iterations=4).collect()}
        assert len(ranks) == 3
        assert len(set(ranks.values())) == 1  # symmetry => identical ranks
        total = sum(ranks.values())
        assert abs(total - G.SCALE) < 100  # truncation only

    def test_sink_attracts_mass(self, spark):
        # star into node 9: 9's rank must exceed every spoke's
        edges = self._edges(spark, [(i, 9, 1) for i in range(4)] + [(9, 0, 1)])
        nn = spark.createDataFrame([(5,)], "n_nodes long")
        ranks = {r["node"]: r["rank_fp"]
                 for r in G.pagerank_fixed_point(edges, nn, iterations=3).collect()}
        assert ranks[9] > max(v for k, v in ranks.items() if k != 9)

    def test_deterministic_across_runs(self, spark):
        edges = self._edges(
            spark,
            [(a, b, (a * 7 + b) % 5 + 1) for a in range(6) for b in range(6) if a != b],
        )
        nn = spark.createDataFrame([(6,)], "n_nodes long")
        r1 = sorted(G.pagerank_fixed_point(edges, nn, 3).collect())
        r2 = sorted(
            G.pagerank_fixed_point(edges.repartition(7), nn, 3).collect()
        )
        assert r1 == r2  # int64 arithmetic: partitioning cannot change sums


class TestTpchPlans:
    def test_q6_filters_pushed(self, spark):
        from nimhdfstore_spark.queries import tpch

        df = tpch.x103(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the scan must push at least the shipdate bound (the plan string
        # truncates long filter lists, so match the prefix)
        assert "PushedFilters: [IsNotNull" in plan
        assert "GreaterThanOrEqual(l_shipda" in plan

    def test_q8_no_cartesian_no_nested_loop(self, spark):
        from nimhdfstore_spark.queries import tpch

        df = tpch.x111(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_q21_no_quadratic_self_join(self, spark):
        from nimhdfstore_spark.queries import tpch

        df = tpch.x112(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPQ:
    def test_codes_shape_and_recall(self, spark):
        from nimhdfstore_spark.operators import similarity as S

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = S.pq_codebooks(emb)
        # codebook is corpus-size independent: m * ks rows exactly
        assert cb.count() == S.PQ_M * S.PQ_KS
        codes = S.pq_encode(emb, cb)
        n = emb.count()
        assert codes.count() == n * S.PQ_M  # one code per (vector, subspace)
        probes = emb.where(F.col("vec_id") < 5)
        approx = S.pq_adc_topk(codes, cb, probes, k=10)
        exact = S.brute_force_topk(emb, probes, k=10)
        a = {(r["probe_id"], r["neighbor_id"]) for r in approx.collect()}
        e = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
        recall = len(a & e) / len(e)
        # 16x compression: recall@10 must stay useful (pinned well below
        # observed to keep the test stable, far above chance ~10/500)
        assert recall >= 0.3, f"PQ recall collapsed: {recall}"

    def test_adc_never_touches_vectors(self, spark):
        from nimhdfstore_spark.operators import similarity as S

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = S.pq_codebooks(emb)
        codes = S.pq_encode(emb, cb).persist()
        codes.count()
        probes = emb.where(F.col("vec_id") < 3)
        plan = (
            S.pq_adc_topk(codes, cb, probes, k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # candidate scoring joins codes to the broadcast distance table —
        # no cartesian/nested-loop and no corpus-wide vector math
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        codes.unpersist()


class TestZoneMap:
    def _table(self, spark, tmp_path):
        from nimhdfstore_spark.rowid import ROWID
        from nimhdfstore_spark.store import Store

        store = Store(spark, str(tmp_path / "zstore"), rows_per_file=10)
        df = spark.createDataFrame(
            [(i, i, i * 3, f"v{i}") for i in range(50)],
            f"{ROWID} long, k long, val long, s string",
        )
        return store.put("t", df)

    def test_prunes_and_stays_exact(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        out, scanned, total = t.scan_between("val", 30, 60)  # rows 10..20
        assert total == 5
        assert scanned < total
        got = sorted(r["k"] for r in out.collect())
        assert got == list(range(10, 21))

    def test_boundary_rows_not_lost(self, spark, tmp_path):
        # range ending exactly on a file boundary value must keep that file
        t = self._table(spark, tmp_path)
        out, scanned, total = t.scan_between("val", 27, 57)  # k 9..19
        got = sorted(r["k"] for r in out.collect())
        assert got == list(range(9, 20))

    def test_empty_range(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        out, scanned, total = t.scan_between("val", 1000, 2000)
        assert scanned == 0
        assert out.count() == 0

    def test_unknown_column(self, spark, tmp_path):
        from nimhdfstore_spark.store import StoreError

        t = self._table(spark, tmp_path)
        with pytest.raises(StoreError):
            t.zone_map("nope")

    def test_string_zone_map(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        out, scanned, total = t.scan_between("s", "v10", "v13")
        got = sorted(r["s"] for r in out.collect())
        assert got == ["v10", "v11", "v12", "v13"]


class TestClusterAnalyze:
    def _store_table(self, spark, tmp_path):
        from nimhdfstore_spark.rowid import ROWID
        from nimhdfstore_spark.store import Store

        store = Store(spark, str(tmp_path / "cstore"), rows_per_file=25)
        df = spark.createDataFrame(
            [(i, i % 40, (i * 7) % 40, float(i)) for i in range(200)],
            f"{ROWID} long, a long, b long, v double",
        )
        return store, store.put("t", df)

    def test_cluster_by_preserves_logical_table(self, spark, tmp_path):
        from nimhdfstore_spark.operators.zorder import morton_code

        store, t = self._store_table(spark, tmp_path)
        before = sorted(tuple(r) for r in t.df().collect())
        t.cluster_by(morton_code("a", "b"))
        after = sorted(tuple(r) for r in t.df().collect())
        assert before == after  # same rows, same _rowid values
        # positional read still exact after physical reorder
        assert t[5].collect()[0]["a"] == 5 % 40

    def test_cluster_tightens_value_spans(self, spark, tmp_path):
        store, t = self._store_table(spark, tmp_path)
        spans_before = [
            (z["hi"] - z["lo"]) for z in t.zone_map("a") if z["ok"]
        ]
        t.cluster_by("a")
        spans_after = [
            (z["hi"] - z["lo"]) for z in t.zone_map("a") if z["ok"]
        ]
        assert sum(spans_after) < sum(spans_before)

    def test_analyze_values_and_persistence(self, spark, tmp_path):
        store, t = self._store_table(spark, tmp_path)
        stats = {r["col_name"]: r for r in t.analyze(["a", "v"]).collect()}
        assert stats["a"]["n"] == 200 and stats["a"]["ndv"] == 40
        assert stats["v"]["min_v"] == 0.0 and stats["v"]["max_v"] == 199.0
        # persisted through a fresh handle
        again = store.table("t").attrs["stats"]
        assert again["a"]["ndv"] == 40

    def test_analyze_unknown_column(self, spark, tmp_path):
        from nimhdfstore_spark.store import StoreError

        store, t = self._store_table(spark, tmp_path)
        with pytest.raises(StoreError):
            t.analyze(["nope"])


class TestCogroupAsof:
    def test_matches_window_form(self, spark):
        from nimhdfstore_spark.operators.asof import asof_join, asof_join_cogrouped

        left = spark.createDataFrame(
            [(i, i % 5, 100 + i * 3) for i in range(40)],
            "event_id long, user_id long, ts long",
        )
        right = spark.createDataFrame(
            [(u, 100 + k * 7, float(u * 100 + k)) for u in range(4) for k in range(10)],
            "user_id long, vts long, value double",
        )
        a = asof_join(
            left, right.withColumnRenamed("vts", "ts"), on="user_id",
            left_ts="ts", right_ts="ts", value_cols=["value"],
        ).select("event_id", "asof_value")
        b = asof_join_cogrouped(
            left, right, on="user_id", left_ts="ts", right_ts="vts",
            value_cols=["value"],
        ).select("event_id", "asof_value")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestNewPlanGates:
    def _plan(self, spark, name):
        from nimhdfstore_spark.queries import QUERIES, load_all

        load_all()
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        return df._jdf.queryExecution().executedPlan().toString()

    def test_bloom_bitmap_broadcast(self, spark):
        plan = self._plan(spark, "x113_bloom_filter_probe")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_countmin_sketch_broadcast(self, spark):
        plan = self._plan(spark, "x114_countmin_heavy_hitters")
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q15_no_global_window(self, spark):
        # max-of-agg must be a broadcast of the 1-row aggregate, not a
        # single-task empty-partition window
        plan = self._plan(spark, "x106_tpch_q15_top_supplier")
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_pagerank_no_cartesian(self, spark):
        plan = self._plan(spark, "x116_pagerank_trade")
        assert "CartesianProduct" not in plan

    def test_json_extract_stays_jvm_and_pruned(self, spark):
        # the AQE pre-final plan string has no WholeStageCodegen markers;
        # what matters: no Python eval nodes, and the scan reads only the
        # two referenced columns (pruning past the JSON expression)
        plan = self._plan(spark, "x120_json_extract_agg")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "get_json_object" in plan
        assert "struct<event_type:string,props:string>" in plan


class TestZoneMapDistributed:
    def test_distributed_equals_driver_path(self, spark, tmp_path):
        from nimhdfstore_spark.rowid import ROWID
        from nimhdfstore_spark.store import Store, Table

        store = Store(spark, str(tmp_path / "dzstore"), rows_per_file=10)
        df = spark.createDataFrame(
            [(i, i * 3, float(i) / 7, f"v{i:03d}") for i in range(80)],
            f"{ROWID} long, k long, x double, s string",
        )
        t = store.put("t", df)
        for col in ("k", "x", "s"):
            drv = t.zone_map(col, distributed=False)
            Table._ZONE_CACHE.clear()
            dist = t.zone_map(col, distributed=True)
            Table._ZONE_CACHE.clear()
            assert drv == dist, f"paths disagree for {col}"

    def test_distributed_prunes_identically(self, spark, tmp_path):
        from nimhdfstore_spark.rowid import ROWID
        from nimhdfstore_spark.store import Store, Table

        store = Store(spark, str(tmp_path / "dz2"), rows_per_file=10)
        df = spark.createDataFrame(
            [(i, i) for i in range(100)], f"{ROWID} long, k long"
        )
        t = store.put("t", df)
        Table._ZONE_CACHE.clear()
        t.zone_map("k", distributed=True)  # warm the cache from the job
        out, scanned, total = t.scan_between("k", 35, 44)
        assert scanned < total
        assert sorted(r["k"] for r in out.collect()) == list(range(35, 45))
