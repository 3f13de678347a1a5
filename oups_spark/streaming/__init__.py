"""Incremental / streaming aggregation: the AggStream driver and the
Structured Streaming bridge."""

from oups_spark.streaming.aggstream import AggStream, KeyConfig

__all__ = ["AggStream", "KeyConfig"]
