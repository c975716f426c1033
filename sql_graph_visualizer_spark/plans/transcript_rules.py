"""The engine's standard rule set: transcripts → conversation graph.

This is the graft of the reference's YAML rules (``config/config.yml``
node rules at :140-520) onto the transcript domain: Conversation / Turn /
Tool nodes, HAS_TURN and USES_TOOL edges. Expressed as the same rule
dataclasses a user would write; ``build_transcript_graph`` compiles them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_graph_visualizer_spark.plans.graph_builder import build_edges, build_nodes
from sql_graph_visualizer_spark.plans.rules import NodeMapping, NodeRule, RelationshipRule

NODE_RULES = [
    NodeRule(
        name="conversation_nodes",
        source="conversations",
        target_type="Conversation",
        id_col="conv_id",
        field_mappings={"conv_id": "conv_id", "n_turns": "n_turns"},
        priority=1,
    ),
    NodeRule(
        name="turn_nodes",
        source="turns",
        target_type="Turn",
        id_col="turn_key",
        field_mappings={"conv_id": "conv_id", "turn_idx": "turn_idx", "role": "role"},
        priority=2,
    ),
    NodeRule(
        name="tool_nodes",
        source="tools",
        target_type="Tool",
        id_col="tool",
        field_mappings={"tool": "name"},
        priority=3,
    ),
]

REL_RULES = [
    RelationshipRule(
        name="conv_has_turn",
        source="turns",
        relation_type="HAS_TURN",
        source_node=NodeMapping("Conversation", "conv_id"),
        target_node=NodeMapping("Turn", "turn_key"),
        properties={"turn_idx": "turn_idx"},
        priority=1,
    ),
    RelationshipRule(
        name="turn_uses_tool",
        source="turns",
        relation_type="USES_TOOL",
        source_node=NodeMapping("Turn", "turn_key"),
        target_node=NodeMapping("Tool", "tool"),
        where="tool IS NOT NULL",
        properties={"turn_idx": "turn_idx"},
        priority=2,
    ),
]


def transcript_sources(transcripts: DataFrame) -> dict[str, DataFrame]:
    """Derive the rule source views from the transcripts table — the
    analogue of the reference's per-rule SourceSQL (one SQL query per
    rule, ``transform_service.go:99-115``), here shared scans Catalyst
    de-duplicates."""
    turns = transcripts.withColumn(
        "turn_key", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string"))
    )
    conversations = transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    tools = transcripts.filter(F.col("tool").isNotNull()).select("tool").distinct()
    return {"turns": turns, "conversations": conversations, "tools": tools}


def build_transcript_graph(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full two-pass build: nodes, then edges joined against them."""
    sources = transcript_sources(transcripts)
    nodes = build_nodes(sources, NODE_RULES)
    edges = build_edges(sources, nodes, REL_RULES)
    return nodes, edges
