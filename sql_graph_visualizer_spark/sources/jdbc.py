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


def _q_ident(name: str, quote: str = "`") -> str:
    """Quote an identifier (optionally schema-qualified): each dot-part is
    wrapped in the dialect's quote char with embedded quotes doubled — a
    config-supplied table/column name can neither break the pushed query
    nor smuggle SQL into it."""
    return ".".join(
        quote + part.replace(quote, quote * 2) + quote for part in name.split(".")
    )


def _q_str(value: str) -> str:
    """Quote a string literal (embedded single quotes doubled)."""
    return "'" + value.replace("'", "''") + "'"


def _subquery(
    table: str,
    columns: list[str] | None = None,
    where: str | None = None,
    limit: int | None = None,
    quote: str = "`",
) -> str:
    """The pushed-down relation: mirrors the reference's hand-built
    extraction SQL (mysql/repository.go:421-450) — executed BY the
    database, not by Spark. Table/column identifiers are quoted;
    ``where`` is caller-supplied SQL by contract (the reference's rule
    files embed raw predicates)."""
    cols = ", ".join(_q_ident(c, quote) for c in columns) if columns else "*"
    sql = f"SELECT {cols} FROM {_q_ident(table, quote)}"
    if where:
        sql += f" WHERE {where}"
    if limit is not None:
        sql += f" LIMIT {int(limit)}"
    return f"({sql}) AS sgv_src"


# the reference's monitoring tick pulls exactly these counters
# (performance_schema_adapter.go:collectGlobalStatus)
DEFAULT_STATUS_VARS = (
    "Queries", "Connections", "Slow_queries", "Open_tables",
    "Threads_running", "Threads_connected",
    "Innodb_buffer_pool_read_requests", "Innodb_buffer_pool_reads",
    "Key_read_requests", "Key_reads",
    "Created_tmp_tables", "Created_tmp_disk_tables",
)


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
        # identifier quote char by dialect: ANSI double quotes for
        # PostgreSQL, backticks for MySQL/MariaDB
        self._quote = '"' if "postgresql" in config.url else "`"

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
        opts["dbtable"] = _subquery(table, columns, where, limit, quote=self._quote)
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
            f"WHERE table_schema = {_q_str(database)} AND table_type = 'BASE TABLE'"
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

    # ------------------------------------------------- catalog metadata (S5)

    def table_columns(self, database: str, table: str) -> DataFrame:
        """S5 column-metadata scan: INFORMATION_SCHEMA.COLUMNS ordered by
        ordinal position — the reference's getTableColumns
        (mysql/repository.go:349-395), with the schema made explicit
        instead of DATABASE() so one Spark session can catalog many
        databases."""
        q = (
            "SELECT column_name, data_type, is_nullable, column_key, "
            "column_default, extra "
            "FROM information_schema.columns "
            f"WHERE table_schema = {_q_str(database)} "
            f"AND table_name = {_q_str(table)} "
            "ORDER BY ordinal_position"
        )
        opts = self.config.options()
        opts["dbtable"] = f"({q}) AS sgv_cols"
        return self._reader(opts)

    def foreign_keys(self, database: str) -> DataFrame:
        """FK constraints for rule discovery (S6): the reference reads
        KEY_COLUMN_USAGE (schema_analyzer_service.go FK scan)."""
        q = (
            "SELECT table_name, column_name, referenced_table_name, "
            "referenced_column_name "
            "FROM information_schema.key_column_usage "
            f"WHERE table_schema = {_q_str(database)} "
            "AND referenced_table_name IS NOT NULL"
        )
        opts = self.config.options()
        opts["dbtable"] = f"({q}) AS sgv_fks"
        return self._reader(opts)

    def load_table_meta(self, database: str, flt: TableFilter | None = None):
        """database catalog → ``plans.discovery.TableMeta`` per admitted
        table, so ``discover_rules`` runs end-to-end from a live
        INFORMATION_SCHEMA instead of hand-declared metadata. The listing
        and FK scans are one pushed query each; column scans are one per
        table (dimension-table sized — catalogs are small)."""
        from sql_graph_visualizer_spark.plans.discovery import ForeignKey, TableMeta

        fks_by_table: dict[str, list[ForeignKey]] = {}
        for r in self.foreign_keys(database).collect():
            fks_by_table.setdefault(r[0], []).append(
                ForeignKey(column=r[1], ref_table=r[2], ref_column=r[3])
            )
        out: dict[str, TableMeta] = {}
        for name in self.list_tables(database, flt):
            cols = self.table_columns(database, name).collect()
            out[name] = TableMeta(
                name=name,
                columns=tuple(r[0] for r in cols),
                primary_key=tuple(r[0] for r in cols if (r[3] or "") == "PRI"),
                foreign_keys=tuple(fks_by_table.get(name, ())),
            )
        return out

    # ------------------------------------------- monitoring source (S14)

    def statement_digests(
        self,
        min_exec_count: int = 10,
        min_avg_latency_ms: float = 1.0,
        max_statements: int = 100,
        reference_units: bool = True,
    ) -> DataFrame:
        """The reference's per-tick statement poll
        (performance_schema_adapter.go:498-546): digest aggregate stats
        above execution-count and latency thresholds, top-N by total
        wait. The thresholds, ordering and LIMIT all run in the
        database; only the top-N rows cross the wire — at 10^6 distinct
        digests the pushed form is the difference between a KB and a GB
        per poll. Feeds ``operators/text.sql_digest_tables`` and the
        hotspot/QPS queries downstream.

        ``reference_units`` (ADVICE r5: the flag is NAMED for the quirk
        it opts into, so the default can't silently contradict the
        parameter name): performance_schema ``*_timer_wait`` columns
        are PICOSECONDS, but the reference converts its ms threshold
        with ×1e6 (ms→ns, performance_schema_adapter.go:528) — the
        effective filter is 1000× lower than "ms" implies (1 ms admits
        everything ≥ 1 µs). ``reference_units=True`` (default) keeps
        that exact conversion so a reference user sees identical digest
        sets; ``reference_units=False`` applies the true milliseconds
        threshold (×1e9)."""
        q = (
            "SELECT COALESCE(schema_name, 'NULL') AS schema_name, digest, "
            "COALESCE(digest_text, '') AS digest_text, count_star, "
            "sum_timer_wait, min_timer_wait, avg_timer_wait, max_timer_wait, "
            "sum_rows_affected, sum_rows_sent, sum_rows_examined, "
            "sum_created_tmp_tables, sum_created_tmp_disk_tables, "
            "sum_select_full_join, sum_select_scan, sum_sort_scan, "
            "sum_sort_rows, sum_no_index_used, sum_no_good_index_used, "
            "first_seen, last_seen "
            "FROM performance_schema.events_statements_summary_by_digest "
            f"WHERE count_star >= {int(min_exec_count)} "
            f"AND avg_timer_wait >= {int(min_avg_latency_ms * (1_000_000 if reference_units else 1_000_000_000))} "
            "ORDER BY sum_timer_wait DESC "
            f"LIMIT {int(max_statements)}"
        )
        opts = self.config.options()
        opts["dbtable"] = f"({q}) AS sgv_digests"
        return self._reader(opts)

    def global_status(self, variables: tuple[str, ...] = DEFAULT_STATUS_VARS) -> DataFrame:
        """The reference's global-status poll
        (performance_schema_adapter.go:collectGlobalStatus): the QPS /
        connections / buffer-pool counters its monitor derives metrics
        from, as (variable_name, variable_value) rows."""
        names = ", ".join(_q_str(v) for v in variables)
        q = (
            "SELECT variable_name, variable_value "
            "FROM performance_schema.global_status "
            f"WHERE variable_name IN ({names})"
        )
        opts = self.config.options()
        opts["dbtable"] = f"({q}) AS sgv_status"
        return self._reader(opts)
