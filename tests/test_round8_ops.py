"""Round-8 operator tests: priority sampling (weighted WOR), Gopher
rule-based filtering, and the domain-profile aggregation."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


class TestPrioritySample:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id string, w long")

    def test_matches_numpy_twin(self, spark):
        from oups_spark.operators.pack import priority_sample

        rows = [(f"d{i}", (i % 7) + 1) for i in range(200)]
        got = priority_sample(
            self._df(spark, rows), id_col="id", weight_col="w", k=20,
            seed="s1",
        ).collect()
        # twin: same hash arithmetic in plain Python
        pri = {
            i: round(w * 4294967296.0 / (_md5_int(f"s1:{i}") + 1.0), 6)
            for i, w in rows
        }
        expect = sorted(pri, key=lambda i: (-pri[i], i))[:20]
        assert [r["id"] for r in got] == expect
        assert all(abs(r["priority"] - pri[r["id"]]) < 1e-9 for r in got)

    def test_without_replacement_and_deterministic(self, spark):
        from oups_spark.operators.pack import priority_sample

        df = self._df(spark, [(f"d{i}", 1 + i) for i in range(50)])
        a = priority_sample(df, id_col="id", weight_col="w", k=10, seed="x")
        b = priority_sample(df, id_col="id", weight_col="w", k=10, seed="x")
        ids_a = [r["id"] for r in a.collect()]
        ids_b = [r["id"] for r in b.collect()]
        assert ids_a == ids_b
        assert len(set(ids_a)) == 10

    def test_weight_bias(self, spark):
        from oups_spark.operators.pack import priority_sample

        # one row with overwhelming weight is effectively always drawn
        rows = [("heavy", 10_000_000)] + [(f"d{i}", 1) for i in range(100)]
        got = priority_sample(
            self._df(spark, rows), id_col="id", weight_col="w", k=5,
            seed="bias",
        ).collect()
        assert "heavy" in {r["id"] for r in got}

    def test_seed_changes_sample(self, spark):
        from oups_spark.operators.pack import priority_sample

        df = self._df(spark, [(f"d{i}", 1) for i in range(200)])
        a = {r["id"] for r in priority_sample(
            df, id_col="id", weight_col="w", k=20, seed="s-a").collect()}
        b = {r["id"] for r in priority_sample(
            df, id_col="id", weight_col="w", k=20, seed="s-b").collect()}
        assert a != b


class TestGopherRules:
    def _flags(self, spark, text):
        from oups_spark.operators.text import gopher_quality_flags_df

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return gopher_quality_flags_df(df, "doc_id").collect()[0]

    def test_passing_document(self, spark):
        text = " ".join(["the", "and"] + ["word"] * 60)
        r = self._flags(spark, text)
        assert r["keep"] and r["n_words"] == 62
        assert r["pass_words"] and r["pass_wordlen"] and r["pass_alpha"]
        assert r["pass_stopwords"] and r["pass_symbols"]

    def test_too_short(self, spark):
        r = self._flags(spark, "the and " + " ".join(["word"] * 10))
        assert not r["pass_words"] and not r["keep"]

    def test_stopword_rule(self, spark):
        # 60 words, zero distinct stopwords
        r = self._flags(spark, " ".join(["word"] * 60))
        assert not r["pass_stopwords"]
        # one distinct stopword is still below the >=2 threshold
        r1 = self._flags(spark, "the " + " ".join(["word"] * 60))
        assert not r1["pass_stopwords"]

    def test_mean_word_length_bounds(self, spark):
        # mean word length < 3 fails
        r = self._flags(spark, "the a " + " ".join(["ab"] * 60))
        assert not r["pass_wordlen"]
        long_word = "x" * 30
        r2 = self._flags(spark, "the and " + " ".join([long_word] * 60))
        assert not r2["pass_wordlen"]

    def test_symbol_ratio(self, spark):
        # 60 words + 20 '#' markers -> ratio > 0.1
        text = "the and " + " ".join(["word"] * 58) + " " + "# " * 20
        r = self._flags(spark, text)
        assert not r["pass_symbols"] and not r["keep"]

    def test_alpha_fraction(self, spark):
        # majority pure-number tokens fail the 80% alphabetic rule
        text = "the and " + " ".join(["123"] * 60) + " word"
        r = self._flags(spark, text)
        assert not r["pass_alpha"]

    def test_empty_document(self, spark):
        r = self._flags(spark, "   ")
        assert r["n_words"] == 0 and not r["keep"]
        assert r["mean_word_len"] == 0.0 and r["symbol_ratio"] == 0.0


class TestDomainStats:
    def test_dup_rate_counts_exact_duplicates(self, spark, tmp_path):
        rows = [
            (1, "same text", "a", 9),
            (2, "same text", "a", 9),
            (3, "other", "a", 5),
            (4, "unique", "b", 6),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long"
        )
        p = str(tmp_path / "documents.parquet")
        df.coalesce(1).write.parquet(p)
        from oups_spark.queries.quality_ops import domain_url_stats

        out = {
            r["source"]: r
            for r in domain_url_stats(spark, str(tmp_path)).collect()
        }
        assert out["a"]["n_docs"] == 3
        assert out["a"]["n_distinct_texts"] == 2
        assert abs(out["a"]["dup_rate"] - round(1 - 2 / 3, 6)) < 1e-9
        assert out["b"]["dup_rate"] == 0.0
        assert abs(out["a"]["corpus_share"] - 0.75) < 1e-9


class TestAsofNearest:
    def test_matches_pandas_merge_asof(self, spark):
        import pandas as pd

        from oups_spark.operators.asof import asof_join

        left = pd.DataFrame(
            {
                "k": ["a"] * 5 + ["b"] * 3,
                "t": [1.0, 3.0, 5.0, 9.0, 20.0, 2.0, 4.0, 100.0],
                "lid": list(range(8)),
            }
        )
        right = pd.DataFrame(
            {
                "k": ["a"] * 4 + ["b"] * 2,
                "t": [0.0, 4.0, 10.0, 11.0, 3.0, 50.0],
                "rv": [10.0, 40.0, 100.0, 110.0, 30.0, 500.0],
            }
        )
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                on="t",
                by="k",
                value_cols=["rv"],
                direction="nearest",
            )
            .orderBy("lid")
            .toPandas()
        )
        expect = pd.merge_asof(
            left.sort_values("t"),
            right.sort_values("t"),
            on="t",
            by="k",
            direction="nearest",
        ).sort_values("lid")
        assert list(got["rv"]) == list(expect["rv"])

    def test_nearest_tolerance_and_tie(self, spark):
        from oups_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [("a", 5.0, 0), ("a", 7.0, 1)], "k string, t double, lid long"
        )
        # right at 3 and 7: left t=5 is distance 2 from both -> tie,
        # backward (3) wins; tolerance 1 nulls it out
        right = spark.createDataFrame(
            [("a", 3.0, 30.0), ("a", 7.0, 70.0)], "k string, t double, rv double"
        )
        rows = {
            r["lid"]: r
            for r in asof_join(
                left, right, on="t", by="k", value_cols=["rv"],
                direction="nearest",
            ).collect()
        }
        assert rows[0]["rv"] == 30.0  # tie resolves backward
        assert rows[1]["rv"] == 70.0
        rows_tol = {
            r["lid"]: r
            for r in asof_join(
                left, right, on="t", by="k", value_cols=["rv"],
                direction="nearest", tolerance=1.0,
            ).collect()
        }
        assert rows_tol[0]["rv"] is None
        assert rows_tol[1]["rv"] == 70.0


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, tmp_path):
        from oups_spark.operators.bucketed import (
            colocated_join,
            write_bucketed_table,
        )

        left = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
        )
        right = spark.range(0, 500).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
        )
        write_bucketed_table(
            left, name="t_bleft", path=str(tmp_path / "l"),
            bucket_col="k", n_buckets=4,
        )
        write_bucketed_table(
            right, name="t_bright", path=str(tmp_path / "r"),
            bucket_col="k", n_buckets=4,
        )
        j = colocated_join(spark, "t_bleft", "t_bright", on="k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 500
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


class TestCdcUpsert:
    def test_merge_semantics_and_tombstones(self, spark, tmp_path):
        from oups_spark.streaming.cdc import cdc_merge_batch, read_current

        path = str(tmp_path / "state")
        schema = "k long, ord long, v string, is_delete boolean"
        b1 = spark.createDataFrame(
            [(1, 10, "a", False), (2, 10, "b", False), (3, 10, "c", False)],
            schema,
        )
        cdc_merge_batch(
            spark, b1, path, key="k", order_cols=["ord"], n_buckets=4
        )
        # batch 2: update k=1, delete k=2, and a LATE update for k=2
        # that is OLDER than the delete -> must not resurrect it
        b2 = spark.createDataFrame(
            [(1, 20, "a2", False), (2, 30, None, True), (2, 25, "late", False)],
            schema,
        )
        cdc_merge_batch(
            spark, b2, path, key="k", order_cols=["ord"], n_buckets=4
        )
        cur = {
            r["k"]: r
            for r in read_current(
                spark, path, delete_col="is_delete"
            ).collect()
        }
        assert set(cur) == {1, 3}
        assert cur[1]["v"] == "a2" and cur[1]["ord"] == 20
        assert cur[3]["v"] == "c"

    def test_untouched_buckets_not_rewritten(self, spark, tmp_path):
        import glob
        import os

        from oups_spark.streaming.cdc import cdc_merge_batch

        path = str(tmp_path / "state")
        schema = "k long, ord long, v string, is_delete boolean"
        b1 = spark.createDataFrame(
            [(i, 1, f"v{i}", False) for i in range(64)], schema
        )
        cdc_merge_batch(
            spark, b1, path, key="k", order_cols=["ord"], n_buckets=8
        )
        before = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(path, "__bucket=*/*.parquet"))
        }
        # single-key batch -> exactly one bucket partition rewritten
        b2 = spark.createDataFrame([(5, 2, "v5b", False)], schema)
        cdc_merge_batch(
            spark, b2, path, key="k", order_cols=["ord"], n_buckets=8
        )
        after = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(path, "__bucket=*/*.parquet"))
        }
        surviving = set(before) & set(after)
        unchanged = [f for f in surviving if before[f] == after[f]]
        # 7 of 8 bucket dirs keep their original files untouched
        changed_dirs = {
            os.path.dirname(f)
            for f in set(before) ^ set(after)
        } | {
            os.path.dirname(f)
            for f in surviving
            if before[f] != after[f]
        }
        assert len(changed_dirs) == 1
        assert len(unchanged) >= 7


class TestInterpolateResample:
    def test_linear_interpolation_values(self, spark):
        import datetime as dt

        from oups_spark.functions.fills import interpolate_resample

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def at(h, m=0):
            return t0 + dt.timedelta(hours=h, minutes=m)

        # observations at 00:30 (v=10) and 03:30 (v=40): grid hours
        # 01:00/02:00/03:00 interpolate linearly; 00:00 precedes the
        # first observation -> NULL
        df = spark.createDataFrame(
            [("a", at(0, 30), 10.0), ("a", at(3, 30), 40.0)],
            "k string, ts timestamp, v double",
        )
        out = {
            r["ts"]: r["v_interp"]
            for r in interpolate_resample(
                df, key="k", ts_col="ts", value_col="v", freq="1h"
            ).collect()
        }
        assert out[at(0)] is None
        assert abs(out[at(1)] - 15.0) < 1e-9
        assert abs(out[at(2)] - 25.0) < 1e-9
        assert abs(out[at(3)] - 35.0) < 1e-9

    def test_observation_on_grid_point_passes_through(self, spark):
        import datetime as dt

        from oups_spark.functions.fills import interpolate_resample

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                ("a", t0, 5.0),
                ("a", t0 + dt.timedelta(hours=2), 7.0),
            ],
            "k string, ts timestamp, v double",
        )
        out = {
            r["ts"]: r["v_interp"]
            for r in interpolate_resample(
                df, key="k", ts_col="ts", value_col="v", freq="1h"
            ).collect()
        }
        assert out[t0] == 5.0
        assert out[t0 + dt.timedelta(hours=2)] == 7.0
        assert abs(out[t0 + dt.timedelta(hours=1)] - 6.0) < 1e-9


class TestZorder:
    def test_box_predicate_prunes_more_files_than_single_sort(
        self, spark, tmp_path
    ):
        from oups_spark.store.zorder import (
            file_stats,
            files_matching_box,
            zorder_write,
        )

        # uniform 2-D grid: 200x200 points, both columns independent
        df = (
            spark.range(0, 40_000)
            .select(
                (F.col("id") % 200).alias("a"),
                (F.col("id") / 200).cast("long").alias("b"),
            )
        )
        zpath = str(tmp_path / "z")
        spath = str(tmp_path / "s")
        zorder_write(df, zpath, cols=["a", "b"], n_files=16)
        # baseline: same file count, single-column sort on a
        (
            df.repartitionByRange(16, "a")
            .sortWithinPartitions("a")
            .write.mode("overwrite")
            .parquet(spath)
        )
        box = {"a": (50, 70), "b": (50, 70)}  # ~1% of the plane
        zs = file_stats(zpath, ["a", "b"])
        ss = file_stats(spath, ["a", "b"])
        z_hit = files_matching_box(zs, box)
        s_hit = files_matching_box(ss, box)
        # single-column sort: b stats are useless -> the 'a' slice
        # hits ~2 files but ANY b-only predicate would hit all 16;
        # flip the box to b-leading to show the asymmetry
        box_b = {"b": (50, 70)}
        assert files_matching_box(ss, box_b) == len(ss)
        assert files_matching_box(zs, box_b) < len(zs)
        # and on the 2-D box the curve is no worse than the sort
        assert z_hit <= max(s_hit, 4)

    def test_zorder_preserves_rows(self, spark, tmp_path):
        from oups_spark.store.zorder import zorder_write

        df = spark.range(0, 5000).select(
            (F.col("id") % 97).alias("a"), (F.col("id") % 53).alias("b")
        )
        p = str(tmp_path / "z2")
        zorder_write(df, p, cols=["a", "b"], n_files=8)
        back = spark.read.parquet(p)
        assert back.count() == 5000
        assert back.groupBy().sum("a").first()[0] == df.groupBy().sum("a").first()[0]


class TestIncrementalViewMaintenance:
    def test_delta_rule_retracts_on_update_and_delete(self, spark, tmp_path):
        from oups_spark.streaming.ivm import (
            cdc_merge_batch_with_agg,
            read_agg,
        )

        state = str(tmp_path / "state")
        aggp = str(tmp_path / "agg")
        schema = "k long, ord long, grp string, v double, is_delete boolean"

        def merge(rows):
            cdc_merge_batch_with_agg(
                spark,
                spark.createDataFrame(rows, schema),
                state,
                aggp,
                key="k",
                order_cols=["ord"],
                group_col="grp",
                value_col="v",
                delete_col="is_delete",
                n_buckets=4,
            )

        merge([
            (1, 1, "a", 10.0, False),
            (2, 1, "a", 20.0, False),
            (3, 1, "b", 5.0, False),
        ])
        # k=1 moves group a -> b with a new value (retract 10 from a,
        # add 11 to b); k=3 is deleted (retract 5 from b)
        merge([
            (1, 2, "b", 11.0, False),
            (3, 2, None, None, True),
        ])
        out = {r["g"]: r for r in read_agg(spark, aggp).collect()}
        assert out["a"]["n"] == 1 and out["a"]["sum_val"] == 20.0
        assert out["b"]["n"] == 1 and out["b"]["sum_val"] == 11.0
        assert set(out) == {"a", "b"}

    def test_group_vanishes_when_count_hits_zero(self, spark, tmp_path):
        from oups_spark.streaming.ivm import (
            cdc_merge_batch_with_agg,
            read_agg,
        )

        state = str(tmp_path / "s2")
        aggp = str(tmp_path / "a2")
        schema = "k long, ord long, grp string, v double, is_delete boolean"
        cdc_merge_batch_with_agg(
            spark, spark.createDataFrame([(1, 1, "x", 2.0, False)], schema),
            state, aggp, key="k", order_cols=["ord"], group_col="grp",
            value_col="v", delete_col="is_delete", n_buckets=4,
        )
        cdc_merge_batch_with_agg(
            spark, spark.createDataFrame([(1, 2, None, None, True)], schema),
            state, aggp, key="k", order_cols=["ord"], group_col="grp",
            value_col="v", delete_col="is_delete", n_buckets=4,
        )
        assert read_agg(spark, aggp).count() == 0

    def test_all_null_value_group_contributes_zero_sum(self, spark, tmp_path):
        """A group whose live rows all carry NULL values must merge
        cleanly (advice finding: sum-over-all-nulls is NULL and
        poisoned the delta apply): rows count, sum stays 0."""
        from oups_spark.streaming.ivm import cdc_merge_batch_with_agg, read_agg

        state = str(tmp_path / "s3")
        aggp = str(tmp_path / "a3")
        schema = "k long, ord long, grp string, v double, is_delete boolean"
        cdc_merge_batch_with_agg(
            spark,
            spark.createDataFrame(
                [(1, 1, "nullgrp", None, False), (2, 1, "mixed", None, False),
                 (3, 1, "mixed", 7.0, False)],
                schema,
            ),
            state, aggp, key="k", order_cols=["ord"], group_col="grp",
            value_col="v", delete_col="is_delete", n_buckets=4,
        )
        # retracting an all-null group exercises the NULL sum on the
        # negative side too
        cdc_merge_batch_with_agg(
            spark,
            spark.createDataFrame([(1, 2, None, None, True)], schema),
            state, aggp, key="k", order_cols=["ord"], group_col="grp",
            value_col="v", delete_col="is_delete", n_buckets=4,
        )
        out = {r["g"]: r for r in read_agg(spark, aggp).collect()}
        assert set(out) == {"mixed"}
        assert out["mixed"]["n"] == 2 and out["mixed"]["sum_val"] == 7.0

    def test_null_group_key_merges_across_batches(self, spark, tmp_path):
        """A NULL group key is ONE group (groupBy semantics on both
        engines): the stored-vs-delta merge must match it null-safely
        — a plain equi-join would append a duplicate NULL-group row
        every batch (review finding)."""
        from oups_spark.streaming.ivm import cdc_merge_batch_with_agg, read_agg

        state = str(tmp_path / "s5")
        aggp = str(tmp_path / "a5")
        schema = "k long, ord long, grp string, v double, is_delete boolean"
        for batch in (
            [(1, 1, None, 2.0, False), (2, 1, "x", 1.0, False)],
            [(3, 1, None, 3.0, False)],
            [(1, 2, None, 4.0, False)],  # update k=1 within NULL group
        ):
            cdc_merge_batch_with_agg(
                spark, spark.createDataFrame(batch, schema), state, aggp,
                key="k", order_cols=["ord"], group_col="grp",
                value_col="v", delete_col="is_delete", n_buckets=4,
            )
        rows = read_agg(spark, aggp).collect()
        nulls = [r for r in rows if r["g"] is None]
        assert len(nulls) == 1
        assert nulls[0]["n"] == 2 and nulls[0]["sum_val"] == 7.0

    def test_high_cardinality_groups_stay_distributed(self, spark, tmp_path):
        """100k distinct groups across two batches: the maintained
        aggregate must bit-match a one-shot aggregation of the final
        state, and the merge must hold no driver-side copy of the
        aggregate table (the delta applies via a distributed
        full-outer join — pinned by a source check so a collect-based
        merge cannot silently return)."""
        import inspect

        import oups_spark.streaming.ivm as ivm_mod
        from oups_spark.streaming.cdc import read_current
        from oups_spark.streaming.ivm import cdc_merge_batch_with_agg, read_agg

        src = inspect.getsource(ivm_mod.cdc_merge_batch_with_agg)
        assert ".collect()" not in src

        state = str(tmp_path / "s4")
        aggp = str(tmp_path / "a4")
        n = 100_000

        def batch(offset, ordv):
            return (
                spark.range(n)
                .select(
                    F.col("id").alias("k"),
                    F.lit(ordv).alias("ord"),
                    F.concat(F.lit("g"), (F.col("id") + offset) % n)
                    .alias("grp"),
                    (F.col("id") % 97 / 10.0).alias("v"),
                    F.lit(False).alias("is_delete"),
                )
            )

        for i, b in enumerate([batch(0, 1), batch(7, 2)]):
            cdc_merge_batch_with_agg(
                spark, b, state, aggp, key="k", order_cols=["ord"],
                group_col="grp", value_col="v", delete_col="is_delete",
                n_buckets=8,
            )
        maintained = read_agg(spark, aggp)
        assert maintained.count() == n
        oneshot = (
            read_current(spark, state, delete_col="is_delete")
            .groupBy(F.col("grp").alias("g"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.round(F.col("v") * 1e6).cast("long")) / 1e6, 6
                ).alias("sum_val"),
            )
        )
        assert maintained.exceptAll(oneshot).isEmpty()
        assert oneshot.exceptAll(maintained).isEmpty()


class TestPagerank:
    def test_matches_sequential_twin(self, spark):
        from oups_spark.operators.components import pagerank

        # path graph 1-2-3 plus isolated edge 4-5
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
        )
        got = {
            r["node"]: r
            for r in pagerank(edges, iters=3, decimals=6).collect()
        }

        def rnd(v, d=6):
            import math
            return math.copysign(
                math.floor(abs(v) * 10**d + 0.5), v
            ) / 10**d

        import math

        sym = {(1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (5, 4)}
        deg = {1: 1, 2: 2, 3: 1, 4: 1, 5: 1}
        n = 5
        r = {v: rnd(1.0 / n) for v in deg}
        for _ in range(3):
            c = {v: 0 for v in deg}
            for s, d in sym:
                v = r[s] / deg[s] * 1e9
                c[d] += int(math.copysign(math.floor(abs(v) + 0.5), v))
            r = {
                v: rnd((1.0 - 0.85) / n + 0.85 * (c[v] / 1e9))
                for v in deg
            }
        for v in deg:
            assert got[v]["deg"] == deg[v]
            assert abs(got[v]["rank"] - r[v]) < 1e-12, (v, got[v]["rank"], r[v])
        # the middle of the path is the most central node
        assert got[2]["rank"] == max(x["rank"] for x in got.values())

    def test_empty_graph(self, spark):
        from oups_spark.operators.components import pagerank

        edges = spark.createDataFrame([], "id_a long, id_b long")
        assert pagerank(edges).count() == 0

    def test_driver_fast_path_equals_distributed(self, spark):
        """driver_edge_threshold=0 forces the distributed loop; the
        default takes the driver replay. Ranks must be bit-identical
        (same HALF_UP rounds, same integer-grid contributions)."""
        import random

        from oups_spark.operators.components import pagerank

        rng = random.Random(7)
        raw = {
            tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)
        }
        edges = spark.createDataFrame(
            [(a, b) for a, b in raw], "id_a long, id_b long"
        )
        fast = {
            r["node"]: (r["deg"], r["rank"])
            for r in pagerank(edges, iters=3).collect()
        }
        dist = {
            r["node"]: (r["deg"], r["rank"])
            for r in pagerank(
                edges, iters=3, driver_edge_threshold=0
            ).collect()
        }
        assert fast == dist


def test_interpolate_property_matches_python_twin(spark):
    """Random observation sets: the distributed lerp equals a
    sequential Python twin computed with the same IEEE sequence."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from oups_spark.functions.fills import interpolate_resample

    obs = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500_000),  # seconds
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, width=32,
            ),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(points=obs)
    def check(points):
        import datetime as dt
        import math

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("k", t0 + dt.timedelta(seconds=s), float(v))
            for s, v in points
        ]
        df = spark.createDataFrame(
            rows, "k string, ts timestamp, v double"
        )
        got = {
            r["ts"]: r["v_interp"]
            for r in interpolate_resample(
                df, key="k", ts_col="ts", value_col="v", freq="1h"
            ).collect()
        }
        # twin: dedupe per ts with max, then lerp on the hour grid
        by_ts: dict = {}
        for _, ts, v in rows:
            by_ts[ts] = max(by_ts.get(ts, float("-inf")), v)
        pts = sorted(by_ts.items())

        def rnd6(x):
            return math.copysign(
                math.floor(abs(x) * 1e6 + 0.5), x
            ) / 1e6

        lo = pts[0][0].replace(minute=0, second=0, microsecond=0)
        hi = pts[-1][0].replace(minute=0, second=0, microsecond=0)
        cur = lo
        expect = {}
        while cur <= hi:
            prev = max((p for p in pts if p[0] <= cur), default=None)
            nxt = min((p for p in pts if p[0] >= cur), default=None)
            if prev is None or nxt is None:
                expect[cur] = None
            elif prev[0] == nxt[0]:
                expect[cur] = rnd6(prev[1])
            else:
                tus = int(cur.timestamp() * 1e6)
                pt = int(prev[0].timestamp() * 1e6)
                nt = int(nxt[0].timestamp() * 1e6)
                frac = float(tus - pt) / float(nt - pt)
                expect[cur] = rnd6(prev[1] + (nxt[1] - prev[1]) * frac)
            cur += dt.timedelta(hours=1)
        assert set(got) == set(expect)
        for k in expect:
            if expect[k] is None:
                assert got[k] is None
            else:
                assert got[k] == expect[k], (k, got[k], expect[k])

    check()


class TestRound8Plans:
    def test_interpolate_carries_share_one_exchange(self, spark):
        import datetime as dt
        import re

        from oups_spark.functions.fills import interpolate_resample

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("a", t0 + dt.timedelta(hours=h), float(h)) for h in range(5)],
            "k string, ts timestamp, v double",
        )
        out = interpolate_resample(
            df, key="k", ts_col="ts", value_col="v", freq="1h"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # four carry windows (pv/pt forward, nv/nt backward) but the
        # forward pass reuses the backward pass's hash partitioning —
        # obs pre-agg + bounds agg + ONE union-window exchange
        assert len(re.findall(r"\bWindow\b", plan)) >= 2
        assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3

    def test_rerank_refetch_is_broadcast(self, spark, tmp_path):
        from oups_spark.operators.retrieval import rerank_topk

        df = spark.createDataFrame(
            [(i, f"vector merge window doc {i}") for i in range(200)],
            "doc_id long, text string",
        )
        out = rerank_topk(
            df, id_col="doc_id", terms=["vector", "merge"],
            candidates=20, k=5, phrase="vector merge",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_priority_sample_is_take_ordered(self, spark):
        from oups_spark.operators.pack import priority_sample

        df = spark.range(0, 1000).select(
            F.col("id").cast("string").alias("id"),
            (F.col("id") % 9 + 1).alias("w"),
        )
        out = priority_sample(
            df, id_col="id", weight_col="w", k=10, seed="p"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the cut must be TakeOrdered, never a global Sort + Limit
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan


def test_interpolate_ignores_null_observations(spark):
    """A null-valued observation must not desynchronize the value
    and timestamp carries (review finding): obs (0h, 1.0), (2h,
    NULL), (4h, 5.0) -> grid 3h interpolates 0h..4h = 4.0, and the
    grid point at 2h is a plain interior point, not a pass-through
    of the stale value."""
    import datetime as dt

    from oups_spark.functions.fills import interpolate_resample

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k", t0, 1.0),
        ("k", t0 + dt.timedelta(hours=2), None),
        ("k", t0 + dt.timedelta(hours=4), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        r["ts"]: r["v_interp"]
        for r in interpolate_resample(
            df, key="k", ts_col="ts", value_col="v", freq="1h"
        ).collect()
    }
    assert out[t0 + dt.timedelta(hours=3)] == 4.0
    assert out[t0 + dt.timedelta(hours=2)] == 3.0
    assert out[t0] == 1.0


def test_interpolate_null_boundary_shrinks_grid(spark):
    """Grid bounds derive from the null-FILTERED observations (advice
    finding): a NULL boundary row must not widen the grid, and a key
    whose values are all NULL gets no grid rows at all — matching the
    SQL twin, which builds bounds from the filtered set."""
    import datetime as dt

    from oups_spark.functions.fills import interpolate_resample

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # key a: NULL at 0h and 6h; real observations span 2h..4h
        ("a", t0, None),
        ("a", t0 + dt.timedelta(hours=2), 2.0),
        ("a", t0 + dt.timedelta(hours=4), 4.0),
        ("a", t0 + dt.timedelta(hours=6), None),
        # key b: only NULLs -> contributes nothing
        ("b", t0, None),
        ("b", t0 + dt.timedelta(hours=3), None),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = interpolate_resample(
        df, key="k", ts_col="ts", value_col="v", freq="1h"
    ).collect()
    assert {r["k"] for r in got} == {"a"}
    by_ts = {r["ts"]: r["v_interp"] for r in got}
    assert min(by_ts) == t0 + dt.timedelta(hours=2)
    assert max(by_ts) == t0 + dt.timedelta(hours=4)
    assert by_ts[t0 + dt.timedelta(hours=3)] == 3.0


class TestCdcVacuum:
    def test_drops_only_safe_tombstones(self, spark, tmp_path):
        from oups_spark.streaming.cdc import (
            cdc_merge_batch,
            cdc_vacuum,
            read_current,
        )

        path = str(tmp_path / "state")
        schema = "k long, ord long, v string, is_delete boolean"
        rows = [(1, 10, "a", False), (2, 10, None, True),
                (3, 50, None, True), (4, 10, "d", False)]
        cdc_merge_batch(
            spark, spark.createDataFrame(rows, schema), path,
            key="k", order_cols=["ord"], n_buckets=4,
        )
        # watermark at ord=30: only k=2's tombstone (ord 10) is safe
        n = cdc_vacuum(
            spark, path, delete_col="is_delete",
            safe_to_drop=F.col("ord") < 30,
        )
        assert n == 1
        full = spark.read.parquet(path)
        ks = {r["k"] for r in full.collect()}
        assert ks == {1, 3, 4}  # k=2 tombstone gone, k=3's kept
        live = {r["k"] for r in read_current(
            spark, path, delete_col="is_delete").collect()}
        assert live == {1, 4}

    def test_noop_when_nothing_droppable(self, spark, tmp_path):
        import glob
        import os

        from oups_spark.streaming.cdc import cdc_merge_batch, cdc_vacuum

        path = str(tmp_path / "s")
        schema = "k long, ord long, v string, is_delete boolean"
        cdc_merge_batch(
            spark,
            spark.createDataFrame([(1, 10, "a", False)], schema),
            path, key="k", order_cols=["ord"], n_buckets=4,
        )
        before = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(path, "**/*.parquet"))
        }
        assert cdc_vacuum(
            spark, path, delete_col="is_delete",
            safe_to_drop=F.lit(True),
        ) == 0
        after = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(path, "**/*.parquet"))
        }
        assert before == after


def test_cdc_sink_resumes_from_checkpoint(spark, tmp_path):
    """Kill-and-resume: the sink processes chunks 1-2, stops, a new
    chunk arrives, and a SECOND sink run with the same checkpoint dir
    must fold in only the new file — the final state equals the
    one-shot keep-last over all three chunks."""
    import os

    import pyspark.sql.functions as F

    from oups_spark.streaming.cdc import cdc_upsert_sink, read_current

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, ord long, v string, is_delete boolean"

    def write_chunk(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"chunk{i}"))

    write_chunk(0, [(1, 10, "a", False), (2, 10, "b", False)])
    write_chunk(1, [(1, 20, "a2", False), (3, 20, "c", False)])

    def run_sink():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        cdc_upsert_sink(
            stream, state, key="k", order_cols=["ord"],
            n_buckets=4, checkpoint_dir=ckpt,
        )

    run_sink()
    cur1 = {r["k"]: r["v"] for r in read_current(
        spark, state, delete_col="is_delete").collect()}
    assert cur1 == {1: "a2", 2: "b", 3: "c"}
    # new chunk after the "crash": update k=3, delete k=2
    write_chunk(2, [(3, 30, "c2", False), (2, 30, None, True)])
    run_sink()
    cur2 = {r["k"]: r["v"] for r in read_current(
        spark, state, delete_col="is_delete").collect()}
    assert cur2 == {1: "a2", 3: "c2"}


def test_driver_window_queries_all_have_oracles():
    """The first 50 registered queries are the driver's correctness
    window this round — every one must carry a DuckDB oracle (a
    rows-only entry in the window would silently weaken the gate),
    and every _WINDOW_PRIORITY name must actually be registered
    (a typo would quietly reshuffle the window)."""
    from oups_spark.queries import (
        _WINDOW_PRIORITY,
        REGISTRY,
        load_all_query_modules,
    )

    load_all_query_modules()
    names = list(REGISTRY)
    assert len(names) >= 50
    for n in names[:50]:
        assert REGISTRY[n].oracle is not None, n
    missing = [n for n in _WINDOW_PRIORITY if n not in REGISTRY]
    assert missing == [], missing


class TestIvmMinMax:
    def test_multiset_retracts_the_minimum_itself(self, spark, tmp_path):
        """The case the delta rule cannot handle: deleting the row
        that IS the current minimum must surface the runner-up — the
        counted value multiset makes that exact. Also pins duplicate
        values (count 2 -> 1 keeps the value alive), group moves, and
        NULL values staying out of the multiset."""
        from oups_spark.streaming.ivm import (
            cdc_merge_batch_with_minmax,
            read_minmax,
        )

        state = str(tmp_path / "mm_state")
        hist = str(tmp_path / "mm_hist")
        schema = "k long, ord long, grp string, v double, is_delete boolean"

        def merge(rows):
            cdc_merge_batch_with_minmax(
                spark,
                spark.createDataFrame(rows, schema),
                state,
                hist,
                key="k",
                order_cols=["ord"],
                group_col="grp",
                value_col="v",
                delete_col="is_delete",
                n_buckets=4,
            )

        merge([
            (1, 1, "a", 1.5, False),   # the minimum of a
            (2, 1, "a", 1.5, False),   # duplicate value
            (3, 1, "a", 9.0, False),   # the maximum of a
            (4, 1, "a", 4.0, False),
            (5, 1, "a", None, False),  # NULL: not in the multiset
        ])
        out = {r["g"]: r for r in read_minmax(spark, hist).collect()}
        assert out["a"]["min_val"] == 1.5 and out["a"]["max_val"] == 9.0
        assert out["a"]["n_valued"] == 4

        # delete ONE holder of the duplicate minimum: 1.5 survives
        merge([(1, 2, None, None, True)])
        out = {r["g"]: r for r in read_minmax(spark, hist).collect()}
        assert out["a"]["min_val"] == 1.5 and out["a"]["n_valued"] == 3

        # delete the other; the max moves to group b in the same batch
        merge([
            (2, 2, None, None, True),
            (3, 2, "b", 9.0, False),
        ])
        out = {r["g"]: r for r in read_minmax(spark, hist).collect()}
        assert out["a"]["min_val"] == 4.0 and out["a"]["max_val"] == 4.0
        assert out["a"]["n_valued"] == 1
        assert out["b"]["min_val"] == 9.0 and out["b"]["max_val"] == 9.0
