"""GraphQL Query-surface resolvers over materialized node/edge tables
(SURVEY §3.2; schema.resolvers.go:25-221 restated as DataFrame plans)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sql_graph_visualizer_spark.api import GraphQueryResolver


def _graph(spark):
    nodes = spark.createDataFrame(
        [
            ("User:1", "User", {"name": "ada", "email": "ada@x.io"}),
            ("User:2", "User", {"name": "grace", "email": "grace@x.io"}),
            ("Order:10", "Order", {"total": "99.5", "note": "gift for ada"}),
        ],
        "node_id string, node_type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("User:1", "Order:10", "PLACED", {"at": "2024-01-01"}),
            ("User:2", "User:1", "REFERRED", None),
        ],
        "src string, dst string, rel_type string, properties map<string,string>",
    )
    return GraphQueryResolver(nodes, edges)


def test_graph_full_export_shapes(spark):
    r = _graph(spark)
    nodes, rels = r.graph()
    assert nodes.columns == ["id", "label", "properties"]
    assert rels.columns == ["from", "to", "type", "properties"]
    nrows = {row.id: row for row in nodes.collect()}
    assert len(nrows) == 3
    # properties serialize as a JSON string (the GraphQL wire shape)
    assert json.loads(nrows["User:1"].properties) == {"name": "ada", "email": "ada@x.io"}
    rrows = {(row["from"], row["to"]): row for row in rels.collect()}
    assert rrows[("User:1", "Order:10")].type == "PLACED"
    assert json.loads(rrows[("User:2", "User:1")].properties) == {}  # NULL map → {}


def test_nodes_by_type_and_point_lookup(spark):
    r = _graph(spark)
    assert {row.id for row in r.nodes_by_type("User").collect()} == {"User:1", "User:2"}
    got = r.node("Order:10")
    assert got is not None and got["label"] == "Order"
    assert r.node("Order:999") is None


def test_relationships_by_type(spark):
    r = _graph(spark)
    rows = r.relationships_by_type("REFERRED").collect()
    assert [(x["from"], x["to"]) for x in rows] == [("User:2", "User:1")]


def test_search_nodes_any_property_contains(spark):
    r = _graph(spark)
    # matches a User property AND an Order note — cross-type, like the
    # reference's ANY(prop IN keys(n) ...) scan
    assert {row.id for row in r.search_nodes("ada").collect()} == {"User:1", "Order:10"}
    assert r.search_nodes("zzz").count() == 0
    # the filter runs inside the scan (pushed before collection): the
    # plan contains the exists predicate, not a post-collect filter
    plan = r.search_nodes("ada")._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan


def test_transform_data_mutation_runs_rule_engine(spark):
    from sql_graph_visualizer_spark.plans.rule_loader import RuleSet
    from sql_graph_visualizer_spark.plans.rules import NodeMapping, NodeRule, RelationshipRule

    users = spark.createDataFrame([(1, "ada"), (2, "grace")], "id long, name string")
    orders = spark.createDataFrame([(10, 1), (11, 2)], "id long, user_id long")
    rules = RuleSet(
        node_rules=[
            NodeRule("users", "users", "User", field_mappings={"name": "name"},
                     id_col="id", priority=1),
            NodeRule("orders", "orders", "Order", id_col="id", priority=2),
        ],
        relationship_rules=[
            RelationshipRule(
                "placed", "orders", "PLACED",
                NodeMapping("User", "user_id"), NodeMapping("Order", "id"),
                priority=3,
            )
        ],
    )
    nodes, edges = GraphQueryResolver.transform_data(
        {"users": users, "orders": orders}, rules
    )
    r = GraphQueryResolver(nodes, edges)
    assert r.nodes_by_type("User").count() == 2
    assert r.relationships_by_type("PLACED").count() == 2
    assert r.node("User:1")["label"] == "User"
