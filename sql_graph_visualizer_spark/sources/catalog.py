"""Table-list scan + whitelist/blacklist pruning (SURVEY §2.1 S4).

The reference lists INFORMATION_SCHEMA.TABLES and applies case-insensitive
include/exclude filtering before analysis (``GetTables`` /
``applyTableFiltering``, ``internal/infrastructure/persistence/mysql/
repository.go:262-319``; the filter config is ``DataFilteringConfig``).

Spark-first restatement: the "catalog" is either the session catalog
(``spark.catalog.listTables``) or a directory of parquet tables (the
sandbox testdata layout); filtering is driver-side list logic — a few
dozen names, nothing distributed. The filtered list feeds
``plans/discovery`` (metadata) and the rule engine (sources), so a
whitelist prunes every downstream scan before any plan is built —
the cheapest possible predicate pushdown.
"""

from __future__ import annotations

import fnmatch
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class TableFilter:
    """Case-insensitive include/exclude patterns (fnmatch globs), applied
    include-first like the reference's whitelist/blacklist pair."""

    include: tuple[str, ...] = field(default_factory=tuple)  # empty = all
    exclude: tuple[str, ...] = field(default_factory=tuple)

    def admits(self, name: str) -> bool:
        n = name.lower()
        if self.include and not any(fnmatch.fnmatch(n, p.lower()) for p in self.include):
            return False
        return not any(fnmatch.fnmatch(n, p.lower()) for p in self.exclude)


def list_tables(spark: SparkSession, path_or_db: str, flt: TableFilter | None = None) -> list[str]:
    """Filtered table names from a parquet directory (``*.parquet`` files
    or table subdirectories) or a session-catalog database."""
    flt = flt or TableFilter()
    if os.path.isdir(path_or_db):
        names = sorted(
            (e[: -len(".parquet")] if e.endswith(".parquet") else e)
            for e in os.listdir(path_or_db)
            if e.endswith(".parquet") or os.path.isdir(os.path.join(path_or_db, e))
        )
    else:
        names = sorted(t.name for t in spark.catalog.listTables(path_or_db))
    return [n for n in names if flt.admits(n)]


def load_tables(
    spark: SparkSession, sf_dir: str, flt: TableFilter | None = None
) -> dict[str, DataFrame]:
    """name → DataFrame for every admitted parquet table under sf_dir —
    the source dict the rule engine / discovery consume."""
    return {
        n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        for n in list_tables(spark, sf_dir, flt)
    }
