"""Threshold alerting over the lineage/metrics table.

The reference's realtime monitor raises alerts when a metric tick
crosses configured thresholds — slow-query count, connection-usage
ratio, QPS ceilings (``realtime_performance_monitor.go:421-444``), each
alert carrying severity, metric, value and threshold. Restated over the
lake: alerts are a *stateless filter + CASE ladder over the lineage
table* — first-class data (queryable, joinable, replayable) instead of
WebSocket pushes. Because lineage rows are epoch-fenced, alert
derivation is idempotent: replaying an epoch can never double-alert.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AlertThresholds:
    """Per-epoch thresholds (the monitor's AlertThresholds analogue)."""

    max_rows_in: int = 1_000_000  # backpressure cap breach
    max_deletes: int = 100_000  # runaway tombstone storm
    max_duration_ms: int = 600_000  # epoch slower than the trigger interval
    warn_fraction: float = 0.5  # warning at this fraction of each max


def alerts_from_lineage(lineage: DataFrame, t: AlertThresholds | None = None) -> DataFrame:
    """One alert row per (epoch, breached metric): severity
    'critical' above the max, 'warning' above warn_fraction·max."""
    t = t or AlertThresholds()

    def ladder(col: str, mx: int, metric: str) -> DataFrame:
        sev = (
            F.when(F.col(col) > mx, F.lit("critical"))
            .when(F.col(col) > int(mx * t.warn_fraction), F.lit("warning"))
        )
        return (
            lineage.withColumn("severity", sev)
            .filter(F.col("severity").isNotNull())
            .select(
                "query_id",
                "epoch_id",
                F.lit(metric).alias("metric"),
                F.col(col).cast("double").alias("value"),
                F.lit(float(mx)).alias("threshold"),
                "severity",
            )
        )

    return (
        ladder("rows_in", t.max_rows_in, "rows_in")
        .unionByName(ladder("deletes", t.max_deletes, "deletes"))
        .unionByName(ladder("duration_ms", t.max_duration_ms, "duration_ms"))
    )
