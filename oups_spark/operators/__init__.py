"""Engine operators: segment aggregation (bins/snapshots), dedup
family, similarity search, text analysis, multimodal plumbing."""

from oups_spark.operators.segment import add_row_count_bins, segment_agg, snapshot_agg

__all__ = ["add_row_count_bins", "segment_agg", "snapshot_agg"]
