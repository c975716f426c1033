"""Driver-contract tests: events-derived CDC log + entry queries vs DuckDB.

Mirrors the driver's correctness gate at sf0.001 (small/fast): run a
sample of ``queries()`` and compare sorted rows against ``oracle_sql()``
executed by DuckDB over the same parquet — fully independent recompute.
"""

from __future__ import annotations

import sys
from datetime import datetime
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

# fast representative sample: engine path, arrow-UDF graph, relational,
# text/dedup — the full battery runs in the driver at sf0.01
SAMPLE = [
    "cdc_final_state",
    "cdc_final_state_mor",
    "cdc_compact_lww",
    "cdc_schema_evolution",
    "cdc_lineage",
    "graph_has_turn_edges",
    "graph_rules_edges",
    "tpch_q1_pricing",
    "window_top3_orders",
    "dedup_exact",
    "sim_cosine_topk",
]


def _canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, name):
    sdf = E.queries()[name](spark, SF)
    scols = sorted(sdf.columns)
    srows = sorted((tuple(_canon(r[c]) for c in scols) for r in sdf.collect()), key=repr)
    res = duck.sql(E.oracle_sql()[name])
    order = sorted(range(len(res.columns)), key=lambda i: res.columns[i])
    dcols = [res.columns[i] for i in order]
    drows = sorted(
        (tuple(_canon(r[i]) for i in order) for r in res.fetchall()), key=repr
    )
    assert scols == dcols
    assert len(srows) == len(drows)
    assert srows == drows


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]


def test_every_query_has_callable_and_named_oracle_columns(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is callable and every oracle is parseable SQL
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    for name, sql in oracles.items():
        con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
