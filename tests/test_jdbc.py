"""JDBC source adapter: pushdown SQL construction + catalog-parity surface.

No database server exists in the sandbox, so these tests inject a fake
reader that records the exact JDBC options Spark would send (the
contract with the database) and serves local DataFrames. The query text
the database would execute — the reference's extraction SQL
(mysql/repository.go:421-450) — is asserted verbatim.
"""

from __future__ import annotations

import pytest

from sql_graph_visualizer_spark.sources.catalog import TableFilter
from sql_graph_visualizer_spark.sources.jdbc import JdbcConfig, JdbcSource


class FakeDb:
    """Records options per read; serves DataFrames like a tiny database."""

    def __init__(self, spark, tables):
        self.spark = spark
        self.tables = tables  # name -> DataFrame
        self.calls: list[dict[str, str]] = []

    def __call__(self, options):
        self.calls.append(dict(options))
        rel = options["dbtable"]
        if "information_schema.tables" in rel:
            return self.spark.createDataFrame(
                [(n,) for n in self.tables], "table_name string"
            )
        for name, df in self.tables.items():
            if f"FROM {name}" in rel:
                return df
        raise AssertionError(f"unexpected relation {rel!r}")


@pytest.fixture()
def src(spark):
    tables = {
        "customer": spark.createDataFrame(
            [(1, "a", "BUILDING"), (2, "b", "MACHINERY")],
            "c_custkey long, c_name string, c_mktsegment string",
        ),
        "nation": spark.createDataFrame([(0, "FRANCE")], "n_nationkey int, n_name string"),
        "audit_log": spark.createDataFrame([(1,)], "x int"),
    }
    fake = FakeDb(spark, tables)
    cfg = JdbcConfig(url="jdbc:mysql://db.example:3306/tpch", user="u", fetchsize=5000)
    return JdbcSource(spark, cfg, reader=fake), fake


def test_pushdown_subquery_shape(src):
    s, fake = src
    s.read("customer", columns=["c_custkey", "c_name"], where="c_mktsegment = 'BUILDING'", limit=10)
    rel = fake.calls[-1]["dbtable"]
    assert rel == (
        "(SELECT c_custkey, c_name FROM customer "
        "WHERE c_mktsegment = 'BUILDING' LIMIT 10) AS sgv_src"
    )
    assert fake.calls[-1]["fetchsize"] == "5000"
    assert fake.calls[-1]["url"].endswith("/tpch")


def test_partitioned_read_options(src):
    s, fake = src
    s.read("customer", partition_col="c_custkey", num_partitions=16, bounds=(0, 1_000_000))
    opts = fake.calls[-1]
    assert opts["partitionColumn"] == "c_custkey"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == (
        "0", "1000000", "16",
    )
    with pytest.raises(ValueError):
        s.read("customer", partition_col="c_custkey")  # bounds are mandatory


def test_list_and_load_tables_filtered(src):
    s, fake = src
    names = s.list_tables("tpch", TableFilter(exclude=("audit_*",)))
    assert names == ["customer", "nation"]
    assert "information_schema.tables" in fake.calls[-1]["dbtable"]
    loaded = s.load_tables("tpch", TableFilter(exclude=("audit_*",)))
    assert set(loaded) == {"customer", "nation"}
    assert loaded["customer"].count() == 2
