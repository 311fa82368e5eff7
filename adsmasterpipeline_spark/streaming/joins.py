"""Stream-stream joins with watermark-bounded state.

The batch analogues are ``operators/temporal.py`` (as-of / range
joins, oracle-checked as ``asof_attribution`` / ``range_join_bands``);
this module is the Structured Streaming form: both sides carry
watermarks and the join condition bounds event-time distance, so
Spark can evict state for rows whose match window has passed — without
the time bound the state store would grow forever.

Scale notes: stream-stream joins shuffle both sides on the key; state
per key is bounded by (watermark + horizon) of traffic. Skewed keys
skew state too — salt hot keys upstream if a key's per-horizon volume
exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_time: str, right_time: str,
                  horizon: str = "10 minutes",
                  how: str = "inner") -> DataFrame:
    """Join right-side events to left-side events with the same key
    occurring within ``horizon`` AFTER the left event (click-to-
    impression attribution shape).

    Works on two streaming DataFrames (stateful, watermark-bounded)
    or two batch DataFrames (plain range join — same semantics, lets
    the batch oracle validate the condition). ``how`` may be
    ``inner`` or ``left_outer`` (unmatched left rows emit once their
    watermark passes the horizon).
    """
    lw = left.withWatermark(left_time, horizon) if left.isStreaming else left
    rw = right.withWatermark(right_time, horizon) if right.isStreaming \
        else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_time] >= lw[left_time])
        & (rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {horizon}")))
    return lw.join(rw, cond, how)
