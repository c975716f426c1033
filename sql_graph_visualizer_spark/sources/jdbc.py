"""JDBC source adapter — MySQL/PostgreSQL extraction through Spark's JDBC
data source (SURVEY §2.1 S1–S3).

The reference extracts with hand-built SQL over a database/sql pool:
``SELECT {cols} FROM {table} [WHERE ...] [LIMIT n]`` plus an
INFORMATION_SCHEMA table listing (``internal/infrastructure/persistence/
mysql/repository.go:262-319,421-450``; the PostgreSQL twin mirrors it).

Spark-first restatement: pushdown is expressed by handing the database a
*subquery* as the JDBC relation (``dbtable = (SELECT ...) t``) — the
projection, predicate and limit run inside the database, and only the
result crosses the wire. Parallelism is Spark's stock JDBC range
partitioning (``partitionColumn``/``lowerBound``/``upperBound``/
``numPartitions``): N executors each open a range-bounded cursor, which
is how a 10^10-row table is pulled without a single-connection
bottleneck.

The sandbox has no database server, so the Spark read call is behind an
injectable ``reader`` hook: production uses the default (a real
``spark.read.format("jdbc")``), tests inject a fake that records the
exact options Spark would send and serves local DataFrames
(tests/test_jdbc.py). The query-construction logic — what the database
actually executes — is fully exercised either way.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from sql_graph_visualizer_spark.sources.catalog import TableFilter


@dataclass(frozen=True)
class JdbcConfig:
    """Connection spec (mysql.Config analogue, config.yml `mysql:` block)."""

    url: str  # jdbc:mysql://host:3306/db or jdbc:postgresql://...
    user: str = ""
    password: str = ""
    driver: str = ""  # optional explicit driver class
    fetchsize: int = 10_000  # rows per network round-trip
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        out = {"url": self.url, "fetchsize": str(self.fetchsize)}
        if self.user:
            out["user"] = self.user
        if self.password:
            out["password"] = self.password
        if self.driver:
            out["driver"] = self.driver
        out.update(self.extra)
        return out


def _subquery(
    table: str,
    columns: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
) -> str:
    """The pushed-down relation: mirrors the reference's hand-built
    extraction SQL (mysql/repository.go:421-450) — executed BY the
    database, not by Spark."""
    cols = ", ".join(columns) if columns else "*"
    sql = f"SELECT {cols} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    if limit is not None:
        sql += f" LIMIT {int(limit)}"
    return f"({sql}) AS sgv_src"


class JdbcSource:
    """S1/S2 scans + S3 pushed filter/limit extraction over JDBC,
    exposing the same ``load_tables`` surface as the parquet catalog so
    the rule engine / discovery consume either interchangeably."""

    def __init__(
        self,
        spark: SparkSession,
        config: JdbcConfig,
        reader: Callable[[dict[str, str]], DataFrame] | None = None,
    ):
        self.spark = spark
        self.config = config
        self._reader = reader or self._jdbc_read

    def _jdbc_read(self, options: dict[str, str]) -> DataFrame:
        r = self.spark.read.format("jdbc")
        for k, v in options.items():
            r = r.option(k, v)
        return r.load()

    def read(
        self,
        table: str,
        columns: list[str] | None = None,
        where: str | None = None,
        limit: int | None = None,
        partition_col: str | None = None,
        num_partitions: int = 8,
        bounds: tuple[int, int] | None = None,
    ) -> DataFrame:
        """One table/extract. With ``partition_col`` + ``bounds`` the read
        is range-partitioned across ``num_partitions`` concurrent cursors
        (each executor pulls one key range); without it, a single cursor —
        fine for dimension tables, wrong for fact tables."""
        opts = self.config.options()
        opts["dbtable"] = _subquery(table, columns, where, limit)
        if partition_col is not None:
            if bounds is None:
                raise ValueError("partitioned JDBC read needs explicit (lower, upper) bounds")
            opts.update(
                {
                    "partitionColumn": partition_col,
                    "lowerBound": str(bounds[0]),
                    "upperBound": str(bounds[1]),
                    "numPartitions": str(num_partitions),
                }
            )
        return self._reader(opts)

    def list_tables(self, database: str, flt: TableFilter | None = None) -> list[str]:
        """S4 over JDBC: INFORMATION_SCHEMA.TABLES listing with the same
        whitelist/blacklist filter as the parquet catalog
        (mysql/repository.go:262-319)."""
        flt = flt or TableFilter()
        q = (
            "SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{database}' AND table_type = 'BASE TABLE'"
        )
        opts = self.config.options()
        opts["dbtable"] = f"({q}) AS sgv_tables"
        rows = self._reader(opts).collect()
        return sorted(r[0] for r in rows if flt.admits(r[0]))

    def load_tables(
        self, database: str, flt: TableFilter | None = None
    ) -> dict[str, DataFrame]:
        """name → DataFrame for every admitted table — the source dict the
        rule engine / discovery consume (parquet-catalog parity)."""
        return {n: self.read(n) for n in self.list_tables(database, flt)}
