"""CDC through the store's MERGE INTO (round-13 unification).

The merge_into-backed sink must (1) compute the same keep-last +
tombstone state as the bucketed sink, (2) be idempotent under
checkpoint-recovery redelivery — re-merging ANY already-applied batch
(even out of order) leaves the state unchanged, because updates are
gated on the keep-last order and deletes persist as tombstone rows —
and (3) commit through the store's optimistic-concurrency path, so a
concurrent batch writer interleaved with the streaming merges cannot
lose either side's commits (the conflict hammer)."""

import os

import pyspark.sql.functions as F
import pytest

from oups_spark.store.dataset import OrderedDataset
from oups_spark.streaming.cdc import (
    cdc_merge_batch_into,
    cdc_merge_vacuum,
    read_current_ds,
)

SCHEMA = "k long, ord long, v string, is_delete boolean"


def _state(ds):
    return {
        r["k"]: (r["ord"], r["v"])
        for r in read_current_ds(ds, delete_col="is_delete").collect()
    }


def _apply(spark, ds, rows):
    cdc_merge_batch_into(
        spark.createDataFrame(rows, SCHEMA),
        ds,
        key="k",
        order_cols=["ord"],
        delete_col="is_delete",
        row_group_target_size=10,
    )


class TestCdcMergeInto:
    def test_semantics_tombstones_and_redelivery(self, spark, scratch):
        ds = OrderedDataset(spark, os.path.join(scratch, "state_ds"))
        b1 = [(1, 10, "a", False), (2, 10, "b", False), (3, 10, "c", False)]
        # update k=1, delete k=2, plus a LATE update for k=2 OLDER
        # than the delete -> must not resurrect it (keep-last within
        # the batch picks the delete)
        b2 = [(1, 20, "a2", False), (2, 30, None, True), (2, 25, "late", False)]
        _apply(spark, ds, b1)
        _apply(spark, ds, b2)
        expect = {1: (20, "a2"), 3: (10, "c")}
        assert _state(ds) == expect

        # redelivery of the LAST batch (the checkpoint-recovery case)
        _apply(spark, ds, b2)
        assert _state(ds) == expect
        # out-of-order redelivery of an OLD batch: the order-gated
        # update keeps the newer target values, and the k=2 row
        # matches the tombstone (still a row) instead of re-inserting
        _apply(spark, ds, b1)
        assert _state(ds) == expect
        # the tombstone is still physically present (guards late data)
        raw = ds.read().toPandas()
        assert bool(raw[raw["k"] == 2]["is_delete"].iloc[0])

    def test_vacuum_gcs_tombstones(self, spark, scratch):
        ds = OrderedDataset(spark, os.path.join(scratch, "state_ds"))
        _apply(spark, ds, [(1, 10, "a", False), (2, 10, "b", False)])
        _apply(spark, ds, [(2, 20, None, True)])
        assert cdc_merge_vacuum(ds, delete_col="is_delete") == 1
        assert _state(ds) == {1: (10, "a")}
        # the current view is unchanged by the GC; the raw table no
        # longer carries the dead key
        assert ds.read().filter(F.col("k") == 2).count() == 0
        # nothing droppable -> zero, no commit error
        assert cdc_merge_vacuum(ds, delete_col="is_delete") == 0

    def test_conflict_hammer_with_concurrent_batch_writer(
        self, spark, scratch
    ):
        """Interleave the streaming CDC merge with an independent
        batch writer appending through a SECOND handle, each left
        stale by the other's wins: every commit must land via the
        rebase-or-rerun path and the final state must equal the
        serial application of all ops."""
        path = os.path.join(scratch, "hammer_ds")
        ds_stream = OrderedDataset(spark, path, deletion_grace_s=0)
        _apply(spark, ds_stream, [(k, 1, f"v{k}", False) for k in range(8)])
        writer = OrderedDataset(spark, path, deletion_grace_s=0)
        gen0 = writer.manifest.generation

        for i in range(3):
            # the batch writer appends fresh keys WITHOUT the
            # streaming handle reloading its manifest...
            writer.write(
                df=spark.createDataFrame(
                    [(100 + i, 1, f"w{i}", False)], SCHEMA
                ),
                ordered_on="k",
                duplicates_on=["k"],
                conflict_retries=5,
            )
            # ...then the streaming merge commits from its stale view
            _apply(spark, ds_stream, [(i, 2 + i, f"u{i}", False)])

        final = OrderedDataset(spark, path, deletion_grace_s=0)
        got = _state(final)
        for i in range(3):
            assert got[i] == (2 + i, f"u{i}")
            assert got[100 + i] == (1, f"w{i}")
        for k in range(3, 8):
            assert got[k] == (1, f"v{k}")
        # 1 seed + 3 appends + 3 merges = 7 commits, none lost
        assert final.manifest.generation == gen0 + 6
        assert (
            ds_stream.conflict_rebases + ds_stream.conflict_reruns
        ) >= 1

    def test_streaming_sink_resumes_idempotently(self, spark, scratch):
        """Kill the stream after batch 1, restart from the checkpoint:
        the state after recovery equals the one-shot application (the
        recovered batch may be redelivered — the merge absorbs it)."""
        from oups_spark.streaming.cdc import cdc_merge_sink

        src = os.path.join(scratch, "src")
        ckpt = os.path.join(scratch, "ckpt")
        ds = OrderedDataset(spark, os.path.join(scratch, "state_ds"))
        b1 = [(1, 10, "a", False), (2, 10, "b", False)]
        b2 = [(1, 20, "a2", False), (2, 30, None, True), (3, 30, "c", False)]
        spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, "chunk0")
        )

        def run():
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true")
                .parquet(src)
            )
            cdc_merge_sink(
                stream, ds,
                key="k", order_cols=["ord"], delete_col="is_delete",
                row_group_target_size=10, checkpoint_dir=ckpt,
            )

        run()
        assert _state(ds) == {1: (10, "a"), 2: (10, "b")}
        spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, "chunk1")
        )
        run()  # restart from checkpoint picks up only chunk1
        assert _state(ds) == {1: (20, "a2"), 3: (30, "c")}


class TestCdcSchemaDrift:
    def test_evolving_changelog_extends_state_schema(self, spark, scratch):
        """Changelog schema drift: a later batch carries a NEW column
        — with evolve_schema the state table extends (old rows read
        NULL), updates assign it, keep-last gating still holds;
        without the flag the drifted batch is rejected loudly."""
        ds = OrderedDataset(spark, os.path.join(scratch, "drift_ds"))
        _apply(spark, ds, [(1, 10, "a", False), (2, 10, "b", False)])

        drifted = spark.createDataFrame(
            [(1, 20, "a2", False, "eu"), (3, 20, "c", False, "us")],
            SCHEMA + ", region string",
        )
        with pytest.raises(Exception):
            cdc_merge_batch_into(
                drifted, ds, key="k", order_cols=["ord"],
                delete_col="is_delete", row_group_target_size=10,
            )
        cdc_merge_batch_into(
            drifted, ds, key="k", order_cols=["ord"],
            delete_col="is_delete", row_group_target_size=10,
            evolve_schema=True,
        )
        cur = {
            r["k"]: (r["ord"], r["v"], r["region"])
            for r in read_current_ds(ds, delete_col="is_delete").collect()
        }
        assert cur == {
            1: (20, "a2", "eu"),
            2: (10, "b", None),  # pre-evolution row reads NULL
            3: (20, "c", "us"),
        }
        # an OLD-schema batch still merges after evolution (absent
        # column stays untouched on matched rows)
        _apply(spark, ds, [(2, 30, "b2", False)])
        cur = {
            r["k"]: (r["v"], r["region"])
            for r in read_current_ds(ds, delete_col="is_delete").collect()
        }
        assert cur[2] == ("b2", None) and cur[1] == ("a2", "eu")


def test_empty_batches_are_noops_without_isempty_probe(spark, tmp_path):
    """Round 15: the sink no longer pays an isEmpty job per batch —
    an empty FIRST batch must not leave a schema-less dataset behind,
    and an empty later batch must not change the committed state."""
    import pyspark.sql.functions as F

    from oups_spark.store.dataset import OrderedDataset
    from oups_spark.streaming.cdc import cdc_merge_batch_into

    path = str(tmp_path / "cdc_empty")
    ds = OrderedDataset(spark, path)
    schema = "k long, ts timestamp, v double, is_delete boolean"
    empty = spark.createDataFrame([], schema)
    cdc_merge_batch_into(
        empty, ds, key="k", order_cols=["ts"], delete_col="is_delete"
    )
    assert not ds.exists  # no schema-less manifest created

    rows = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0, False)],
        "k long, ts string, v double, is_delete boolean",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cdc_merge_batch_into(
        rows, ds, key="k", order_cols=["ts"], delete_col="is_delete"
    )
    assert ds.exists and ds.read().count() == 1
    gen = ds.manifest.generation
    cdc_merge_batch_into(
        empty, ds, key="k", order_cols=["ts"], delete_col="is_delete"
    )
    assert ds.manifest.generation == gen  # no commit for an empty batch
    assert ds.read().count() == 1
