"""S4 table-list scan + whitelist/blacklist pruning."""

from __future__ import annotations

from sql_graph_visualizer_spark.sources.catalog import TableFilter, list_tables, load_tables

SF = "/root/testdata/sf0.001"


def test_list_tables_unfiltered(spark):
    names = list_tables(spark, SF)
    assert {"region", "nation", "customer", "supplier", "orders", "lineitem"} <= set(names)


def test_whitelist_blacklist(spark):
    # include-first, then exclude — case-insensitive globs like the
    # reference's applyTableFiltering
    flt = TableFilter(include=("NATION", "c*", "supplier"), exclude=("CUSTOMER",))
    assert list_tables(spark, SF, flt) == ["nation", "supplier"]
    assert TableFilter(exclude=("*item",)).admits("nation")
    assert not TableFilter(exclude=("*item",)).admits("LineItem")


def test_load_tables_feeds_rule_engine(spark):
    from sql_graph_visualizer_spark.plans.discovery import TPCH_METADATA, discover_rules
    from sql_graph_visualizer_spark.plans.graph_builder import build_nodes

    flt = TableFilter(include=("region", "nation", "customer", "supplier", "part", "lineitem"))
    sources = load_tables(spark, SF, flt)
    nrules, _ = discover_rules(TPCH_METADATA)
    nodes = build_nodes(sources, nrules)
    assert nodes.count() > 0
