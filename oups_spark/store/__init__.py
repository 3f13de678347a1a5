"""Ordered parquet store: indexer keys, catalog, manifest-backed
ordered datasets with rewrite-minimal merge writes."""

from oups_spark.store.dataset import OrderedDataset
from oups_spark.store.indexer import sublevel, toplevel
from oups_spark.store.store import Store

__all__ = ["OrderedDataset", "Store", "sublevel", "toplevel"]
