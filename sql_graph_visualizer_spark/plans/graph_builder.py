"""Compile transform rules into node/edge DataFrames.

The reference's two-pass pipeline (``transform_service.go:87-186``):
PASS 1 applies node rules row-at-a-time into a mutable GraphAggregate;
PASS 2 applies relationship rules, resolving both endpoints by linear
scan (``findNode``, O(N) per endpoint) or a nested-loop node×node join
(``createRelationshipsFromExistingNodes``, O(N·M),
``transform_service.go:361-444``).

Spark restatement: node rules are projections unioned by name; edge
rules are two hash joins against the nodes table (inner — dangling edges
dropped, matching findNode's warn+skip). Catalyst broadcasts the small
side; no nested loop exists anywhere.

Node identity & LWW: the reference upserts nodes keyed on (type, id),
last writer wins (``graph_aggregate.go:46-59``). With declarative rules,
"last" is rule priority then source order; we reproduce it with max_by
over (priority, rule_seq) — but in practice rules target disjoint types.

A grouped-map Arrow UDF variant (``build_edges_arrow``) exists for
shapes where per-group assembly is genuinely easier; it is semantically
identical to the join path (tests assert equality) and exists because
the north_star names vectorized Arrow UDF graph materialization as the
reference's signature feature.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_graph_visualizer_spark.plans.rules import NodeRule, RelationshipRule

NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("node_type", T.StringType(), False),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("rel_type", T.StringType(), False),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _props_map(mappings: dict[str, str]) -> F.Column:
    """properties map<string,string> from field mappings — the reference's
    per-row property-bag copy loop (transform_rule_aggregate.go:77-84),
    vectorized. Values stringified; NULLs dropped from the map."""
    if not mappings:
        return F.create_map().cast("map<string,string>")
    pairs = []
    for src, dst in mappings.items():
        pairs.append(F.lit(dst))
        pairs.append(F.col(src).cast("string"))
    m = F.create_map(*pairs)
    return F.map_filter(m, lambda _, v: v.isNotNull())


def build_nodes(sources: dict[str, DataFrame], rules: Iterable[NodeRule]) -> DataFrame:
    """PASS 1: one projection per rule, unioned, LWW-deduped on node_id."""
    parts = []
    for rule_seq, rule in enumerate(sorted(rules, key=lambda r: r.priority)):
        df = sources[rule.source]
        if rule.where:
            df = df.filter(rule.where)
        parts.append(
            df.select(
                F.concat_ws(":", F.lit(rule.target_type), F.col(rule.id_col).cast("string")).alias(
                    "node_id"
                ),
                F.lit(rule.target_type).alias("node_type"),
                _props_map(rule.field_mappings).alias("properties"),
                F.lit(rule.priority * 1_000_000 + rule_seq).alias("__rank"),
            ).dropDuplicates(["node_id"])
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # cross-rule LWW on node_id (graph_aggregate.go:46-51): highest rank wins
    winner = F.max_by(F.struct("node_type", "properties"), F.col("__rank")).alias("_w")
    return (
        out.groupBy("node_id")
        .agg(winner)
        .select("node_id", F.col("_w.node_type").alias("node_type"), F.col("_w.properties").alias("properties"))
    )


def build_edges(
    sources: dict[str, DataFrame], nodes: DataFrame, rules: Iterable[RelationshipRule]
) -> DataFrame:
    """PASS 2: endpoint resolution as two inner joins per rule against the
    nodes table (left_semi semantics folded into inner joins) — replaces
    the reference's O(N·M) nested loop (transform_service.go:361-444).

    The node-id set feeds 2 joins per relationship rule; without
    materialization Catalyst would re-derive the whole nodes pipeline
    (every node rule's scan + union + LWW dedup) once per endpoint —
    O(rules²) recompute. It is persisted here and computed once; blocks
    live until session eviction (LRU) — long-lived sessions building
    many graphs should materialize nodes to a table instead."""
    node_ids = nodes.select("node_id").distinct().persist()
    parts = []
    for rule in sorted(rules, key=lambda r: r.priority):
        df = sources[rule.source]
        if rule.where:
            df = df.filter(rule.where)
        edges = df.select(
            F.concat_ws(
                ":", F.lit(rule.source_node.node_type), F.col(rule.source_node.key).cast("string")
            ).alias("src"),
            F.concat_ws(
                ":", F.lit(rule.target_node.node_type), F.col(rule.target_node.key).cast("string")
            ).alias("dst"),
            F.lit(rule.relation_type).alias("rel_type"),
            _props_map(rule.properties).alias("properties"),
        ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        # inner-join endpoint existence checks (dangling edges dropped)
        edges = (
            edges.join(node_ids.withColumnRenamed("node_id", "src"), "src", "left_semi")
            .join(node_ids.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
        )
        parts.append(edges)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["src", "dst", "rel_type"])


# --------------------------------------------------------------- Arrow UDF


def build_conv_edges_arrow(transcripts: DataFrame) -> DataFrame:
    """Per-conversation edge assembly as a grouped-map Arrow UDF.

    The signature row→graph mapping (north_star): for each conversation
    group, emit conv→turn HAS_TURN edges and turn→tool USES_TOOL edges.
    Arrow-vectorized (one pandas DataFrame per conv group), zero per-row
    Python. Semantically identical to the join path — tests assert it.
    """
    out_schema = T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("dst", T.StringType()),
            T.StructField("rel_type", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]
        turn_ids = "Turn:" + conv + ":" + pdf["turn_idx"].astype(str)
        has_turn = pd.DataFrame(
            {
                "src": "Conversation:" + conv,
                "dst": turn_ids,
                "rel_type": "HAS_TURN",
                "turn_idx": pdf["turn_idx"].astype("int32"),
            }
        )
        tools = pdf[pdf["tool"].notna()]
        uses_tool = pd.DataFrame(
            {
                "src": "Turn:" + conv + ":" + tools["turn_idx"].astype(str),
                "dst": "Tool:" + tools["tool"],
                "rel_type": "USES_TOOL",
                "turn_idx": tools["turn_idx"].astype("int32"),
            }
        )
        return pd.concat([has_turn, uses_tool], ignore_index=True)

    return transcripts.select("conv_id", "turn_idx", "tool").groupBy("conv_id").applyInPandas(
        assemble, out_schema
    )
