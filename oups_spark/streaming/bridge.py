"""Structured Streaming bridge: run an AggStream pipeline from a
streaming source via ``foreachBatch``.

Each micro-batch becomes one AggStream chunk: trim/holdback/stitch
semantics are identical to the batch-incremental driver, and restart
state still lives in the target datasets' kv metadata — so a crashed
stream resumes correctly even without Spark's own checkpoint (the
checkpoint only avoids re-reading source files; re-delivered batches
are no-ops thanks to ``trim_start``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from oups_spark.streaming.aggstream import AggStream


def foreach_batch_handler(stream: AggStream, *, discard_last: bool = True):
    """Adapter: AggStream as a ``foreachBatch`` sink."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        stream.agg(batch_df, discard_last=discard_last, final_write=True)

    return handle


def run_parquet_file_stream(
    spark: SparkSession,
    stream: AggStream,
    source_dir: str,
    schema: StructType,
    *,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
    discard_last: bool = True,
):
    """Consume a directory of parquet files as an ordered seed with
    ``availableNow`` (process everything present, then stop) —
    files must arrive in ``ordered_on`` order, one AggStream chunk
    per micro-batch."""
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(
        foreach_batch_handler(stream, discard_last=discard_last)
    ).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    query.awaitTermination()
    return query
