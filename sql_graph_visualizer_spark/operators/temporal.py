"""Temporal joins Spark lacks as built-ins: AS-OF join and binned range join.

The reference joins performance samples to the config/baseline "active at
that time" by doing lookups in its Go poll loop (latest baseline before a
sample, ``performance_analyzer.go:374-437`` compares each run against the
stored baseline version); a training-data pipeline needs the same shape
constantly (assign each event the feature/config version in force at its
timestamp). Spark has no ASOF JOIN operator, so:

- ``asof_join`` — the scalable composition: tag + union both sides,
  ONE shuffle on the key, and a running ``last(ignorenulls)`` window
  carries the most recent right-side payload forward onto each left row.
  No nested loop, no per-key driver work, no UDF; cost = one shuffle +
  one sort of |left|+|right|, independent of time-range density. This is
  the union-merge strategy databases use for merge-asof.
- ``range_join_binned`` — interval join (point ∈ [start, end)) without
  the O(|L|·|R|) nested-loop Catalyst falls back to for pure range
  predicates: intervals are exploded onto fixed-width time bins, events
  bucket to their bin, the join becomes an equi-join on (key, bin) that
  hash-partitions, and the exact range predicate filters residuals.
  Bin width trades explode factor vs candidate density exactly like
  every production interval-join implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    greatest ``right.ts_col <= left.ts_col`` for the same ``on`` key
    (ties at equal ts match). Left rows with no prior right row keep
    NULLs. ``tolerance``: optional max staleness (an INTERVAL string,
    e.g. ``'3 days'``) — older matches are nulled out, pandas
    merge_asof semantics."""
    rcols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    build = right.select(
        F.col(on),
        F.col(ts_col),
        F.struct(F.col(ts_col).alias(f"{ts_col}{suffix}"), *[F.col(c) for c in rcols]).alias("__r"),
        F.lit(0).alias("__side"),  # right sorts FIRST at equal ts -> inclusive match
    )
    probe = left.withColumn("__r", F.lit(None).cast(build.schema["__r"].dataType)).withColumn(
        "__side", F.lit(1)
    )
    u = probe.select(*left.columns, "__r", "__side").unionByName(
        build.select(
            F.col(on),
            F.col(ts_col),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on, ts_col)],
            "__r",
            "__side",
        ).select(*left.columns, "__r", "__side")
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    if tolerance is not None:
        fresh = F.col(f"__m.{ts_col}{suffix}") >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
        matched = matched.withColumn("__m", F.when(fresh, F.col("__m")))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"__m.{ts_col}{suffix}").alias(f"{ts_col}{suffix}"))
    out_cols.extend(F.col(f"__m.{c}").alias(c) for c in rcols)
    return matched.select(*out_cols)


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_width_seconds: int = 86_400,
) -> DataFrame:
    """Inner join of point events to half-open intervals
    (``start <= ts < end``) sharing a key, via time-bin bucketing so the
    heavy join is an equi-join on (key, bin) — never a nested loop.
    Output: event columns + the matched interval's columns."""
    sec = F.lit(int(bin_width_seconds))
    ev = events.withColumn("__bin", (F.unix_timestamp(ts_col) / sec).cast("long"))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / sec).cast("long"),
                # end is exclusive, but the end-instant's bin can still
                # hold qualifying events earlier in that bin
                (F.unix_timestamp(end_col) / sec).cast("long"),
            )
        ),
    )
    joined = ev.join(iv, on=[on, "__bin"], how="inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bin")
