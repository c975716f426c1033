"""Severity-weighted deterministic sampling (SURVEY §2.4 A9).

The reference samples events with ``rand()`` weighted by a severity
``when`` ladder (``simple_metrics_injector.go:266-285``) — each severity
class keeps a different fraction of rows. ``rand()`` is replay-hostile
(the same event samples differently on retry), so the graft's version is
a *deterministic* coin: a per-row hash compared against the severity's
keep-percentage. Same marginal rates, but idempotent under replay and
reproducible across runs/partitionings — the property every other
randomized piece of this engine (CDC generator, LSH hyperplanes) already
enforces.

Two coin choices:
- ``weighted_sample`` (default): xxhash64(key, salt) — fastest JVM path.
- ``arithmetic_coin``: a multiplicative-congruential mix on an integer
  key — chosen when an external SQL oracle must reproduce the exact
  sample (plain integer arithmetic, identical in any engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multiplicative congruential constants (Park–Miller minimal standard);
# small enough that key*A never overflows 63 bits for key < 2^31
_MCG_A = 48_271
_MCG_C = 11
_MCG_M = 100_003  # prime > 100 so percent buckets are near-uniform


def arithmetic_coin(key: Column) -> Column:
    """Deterministic pseudo-uniform value in [0, 100) from an integer
    key — identical arithmetic in Spark and ANSI SQL:
    ``((key * 48271 + 11) % 100003) % 100``."""
    return ((key.cast("long") * _MCG_A + _MCG_C) % _MCG_M) % 100


def weighted_sample(
    df: DataFrame,
    keep_pct: Column,
    key: Column,
    salt: int = 0,
    coin: Column | None = None,
) -> DataFrame:
    """Keep each row iff its deterministic coin lands under its
    ``keep_pct`` (0..100) — severity ladders pass a ``when`` ladder as
    ``keep_pct``. Pure filter: no shuffle, pushed into the scan."""
    c = coin if coin is not None else F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(100))
    return df.filter(c < keep_pct)


def severity_ladder(event_type: Column) -> Column:
    """The reference's severity→rate ladder
    (simple_metrics_injector.go:266-285): errors always kept, purchases
    mostly, interaction noise heavily downsampled."""
    return (
        F.when(event_type == "error", F.lit(100))
        .when(event_type == "purchase", F.lit(80))
        .when(event_type == "signup", F.lit(50))
        .otherwise(F.lit(10))
    )
