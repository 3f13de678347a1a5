"""oups-spark — a PySpark-native ordered-parquet analytics engine.

A from-scratch re-expression of the capabilities of ``yohplala/oups``
(reference surveyed in SURVEY.md) on top of the Spark DataFrame/SQL
stack, plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) a 100 TB corpus
needs.

Subpackages
-----------
- ``oups_spark.store``      — ordered parquet datasets: indexer keys,
  catalog, manifest, rewrite-minimal ordered merge writes, range reads.
- ``oups_spark.operators``  — segment aggregation (bins / snapshots /
  empty bins), dedup family, similarity search, text analysis.
- ``oups_spark.streaming``  — incremental AggStream driver (restart,
  discard_last, filter fan-out) and the Structured Streaming bridge.
- ``oups_spark.functions``  — DNF filters, date utilities, fills.
"""

from oups_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
