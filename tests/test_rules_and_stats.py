"""YAML rule loading, schema discovery, column stats, sampling, alerts."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.plans.discovery import (
    TPCH_METADATA,
    ForeignKey,
    TableMeta,
    discover_rules,
    identify_graph_patterns,
    is_junction_table,
)
from sql_graph_visualizer_spark.plans.graph_builder import build_edges, build_nodes
from sql_graph_visualizer_spark.plans.rule_loader import parse_rules, resolve_sources

SF = "/root/testdata/sf0.001"

RULES_YAML = """
transform_rules:
  - name: "customers"
    rule_type: "node"
    source:
      type: "query"
      value: "SELECT c_custkey, c_name FROM customer"
    target_type: "Customer"
    field_mappings: {c_custkey: "id", c_name: "name"}
  - name: "nations"
    rule_type: "node"
    source: {type: "table", value: "nation"}
    target_type: "Nation"
    field_mappings: {n_nationkey: "id", n_name: "name"}
  - name: "customer_nation"
    rule_type: "relationship"
    relationship_type: "BELONGS_TO"
    source: {type: "table", value: "customer"}
    source_node: {type: "Customer", key: "c_custkey", target_field: "id"}
    target_node: {type: "Nation", key: "c_nationkey", target_field: "id"}
"""


def test_parse_rules_reference_shape():
    rs = parse_rules(RULES_YAML)
    assert [r.name for r in rs.node_rules] == ["customers", "nations"]
    cust = rs.node_rules[0]
    assert cust.id_col == "c_custkey" and cust.field_mappings == {"c_name": "name"}
    assert cust.source == "customers" and "SELECT" in rs.query_sources["customers"]
    rel = rs.relationship_rules[0]
    assert rel.relation_type == "BELONGS_TO"
    assert rel.source_node.node_type == "Customer" and rel.target_node.key == "c_nationkey"


def test_yaml_rules_equal_dataclass_rules(spark):
    """Loading rules from YAML produces the same graph as constructing
    the dataclasses by hand — the loader adds no semantics of its own."""
    from sql_graph_visualizer_spark.plans.rules import NodeMapping, NodeRule, RelationshipRule

    tables = {
        "customer": spark.read.parquet(f"{SF}/customer.parquet"),
        "nation": spark.read.parquet(f"{SF}/nation.parquet"),
    }
    rs = parse_rules(RULES_YAML)
    sources = resolve_sources(spark, rs, tables)
    yaml_nodes = build_nodes(sources, rs.node_rules)
    yaml_edges = build_edges(sources, yaml_nodes, rs.relationship_rules)

    hand_nodes = build_nodes(
        tables,
        [
            NodeRule("customers", "customer", "Customer", {"c_name": "name"}, "c_custkey", priority=1),
            NodeRule("nations", "nation", "Nation", {"n_name": "name"}, "n_nationkey", priority=2),
        ],
    )
    hand_edges = build_edges(
        tables,
        hand_nodes,
        [
            RelationshipRule(
                "customer_nation", "customer", "BELONGS_TO",
                NodeMapping("Customer", "c_custkey"), NodeMapping("Nation", "c_nationkey"),
            )
        ],
    )
    key = lambda df: sorted((r.src, r.dst, r.rel_type) for r in df.collect())  # noqa: E731
    assert key(yaml_edges) == key(hand_edges)
    nkey = lambda df: sorted((r.node_id, r.node_type) for r in df.collect())  # noqa: E731
    assert nkey(yaml_nodes) == nkey(hand_nodes)


def test_junction_detection_mirrors_reference_heuristics():
    fks = (ForeignKey("a_id", "a", "id"), ForeignKey("b_id", "b", "id"))
    # mostly-FK columns → junction
    assert is_junction_table(TableMeta("ab", ("a_id", "b_id", "qty"), ("a_id", "b_id"), fks))
    # join-table-looking name with 2 FKs → junction even with many columns
    assert is_junction_table(
        TableMeta("user_skills", ("a_id", "b_id", "c", "d", "e", "f"), ("a_id",), fks)
    )
    # single FK → node table
    assert not is_junction_table(TableMeta("t", ("id", "a_id"), ("id",), fks[:1]))


def test_discover_rules_tpch():
    nrules, rrules = discover_rules(TPCH_METADATA)
    assert {r.target_type for r in nrules} == {"Region", "Nation", "Customer", "Supplier", "Part"}
    by_name = {r.name: r for r in rrules}
    assert by_name["customer_c_nationkey_fk"].relation_type == "REFERENCES_NATION"
    junction = by_name["lineitem_junction"]
    assert junction.relation_type == "LINEITEM"
    assert junction.source_node.node_type == "Part"
    assert junction.target_node.node_type == "Supplier"
    assert junction.properties == {"l_quantity": "l_quantity"}


def test_graph_patterns_star_and_hierarchy():
    tables = [
        TableMeta("hub", ("id",), ("id",)),
        TableMeta("a", ("id", "h"), ("id",), (ForeignKey("h", "hub", "id"),)),
        TableMeta("b", ("id", "h"), ("id",), (ForeignKey("h", "hub", "id"),)),
        TableMeta("c", ("id", "h"), ("id",), (ForeignKey("h", "hub", "id"),)),
        TableMeta("emp", ("id", "mgr"), ("id",), (ForeignKey("mgr", "emp", "id"),)),
    ]
    pats = {(p["pattern_type"], p["center_table"]) for p in identify_graph_patterns(tables)}
    assert ("STAR_SCHEMA", "hub") in pats
    assert ("HIERARCHY", "emp") in pats


def test_column_profile_and_approx_distinct(spark):
    from sql_graph_visualizer_spark.operators.stats import column_profile

    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = column_profile(l, "l_partkey").collect()[0]
    approx = column_profile(l, "l_partkey", approx=True).collect()[0]
    assert exact.n_rows == l.count() and exact.n_nulls == 0
    # HLL within its 5% default rsd (generous 15% bound for tiny inputs)
    assert abs(approx.n_distinct - exact.n_distinct) <= max(0.15 * exact.n_distinct, 5)


def test_histogram_covers_all_rows(spark):
    from sql_graph_visualizer_spark.operators.stats import equi_width_histogram

    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    h = equi_width_histogram(l, "l_quantity", 0.0, 50.0, bins=10).collect()
    assert sum(r.n for r in h) == l.count()
    assert {r.bin for r in h} <= set(range(10))
    for r in h:
        assert r.bin_min >= r.bin * 5.0 and (r.bin_max <= (r.bin + 1) * 5.0 or r.bin == 9)


def test_weighted_sample_rates_and_determinism(spark):
    from sql_graph_visualizer_spark.operators.sampling import (
        severity_ladder,
        weighted_sample,
    )

    e = spark.read.parquet(f"{SF}/events.parquet")
    kept = weighted_sample(
        e, keep_pct=severity_ladder(F.col("event_type")), key=F.col("event_id")
    )
    rates = {
        r.event_type: r.kept / r.total
        for r in kept.groupBy("event_type").agg(F.count("*").alias("kept"))
        .join(e.groupBy("event_type").agg(F.count("*").alias("total")), "event_type")
        .collect()
    }
    assert rates.get("error", 1.0) == 1.0  # severity 100 keeps everything
    for t, r in rates.items():
        if t not in ("error",):
            assert r < 1.0
    # deterministic: the same sample on re-run and after repartitioning
    a = {r.event_id for r in kept.collect()}
    b = {r.event_id for r in weighted_sample(
        e.repartition(7), keep_pct=severity_ladder(F.col("event_type")), key=F.col("event_id")
    ).collect()}
    assert a == b


def test_alerts_ladder(spark):
    from sql_graph_visualizer_spark.streaming.alerts import AlertThresholds, alerts_from_lineage
    from sql_graph_visualizer_spark.streaming.metrics import LINEAGE_SCHEMA

    rows = [
        ("q", 0, 100, 100, 0, 1, False, 10, 1.0, 1, 0),     # quiet
        ("q", 1, 900, 890, 10, 1, False, 10, 1.0, 2, 0),    # rows_in warning
        ("q", 2, 1500, 1300, 200, 1, False, 10, 1.0, 3, 0),  # rows critical + deletes critical
    ]
    lineage = spark.createDataFrame(rows, LINEAGE_SCHEMA)
    t = AlertThresholds(max_rows_in=1000, max_deletes=100, max_duration_ms=10**9)
    alerts = {(r.epoch_id, r.metric): r.severity for r in alerts_from_lineage(lineage, t).collect()}
    assert alerts == {
        (1, "rows_in"): "warning",
        (2, "rows_in"): "critical",
        (2, "deletes"): "critical",
    }


def test_group_digest_udaf_equals_expression_twin(spark):
    """§2.10 UDAF surface: the GROUPED_AGG pandas digest must equal the
    decimal-expression twin value-for-value (same portable hash family,
    same mod-2^61-1 sum)."""
    from sql_graph_visualizer_spark.operators.stats import group_digest, group_digest_expr

    df = spark.createDataFrame(
        [(f"c{i % 5}", f"text body {i} {'x' * (i % 17)}") for i in range(300)],
        "conv_id string, text string",
    )
    rows = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    a = rows(group_digest(df, "conv_id", "text"))
    b = rows(group_digest_expr(df, "conv_id", "text"))
    assert a == b
    assert len(a) == 5 and all(r[2] > 0 for r in a)
