"""Column-level helpers: DNF filters, date flooring, fills."""

from oups_spark.functions.dates import ceil_ts, floor_ts, period_duration
from oups_spark.functions.filters import dnf_filter

__all__ = ["ceil_ts", "dnf_filter", "floor_ts", "period_duration"]
