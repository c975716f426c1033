"""Transform-rule model: the reference's YAML rule engine, Spark-first.

Reference: ``TransformRule{Name, SourceTable, SourceSQL, RuleType(node|
relationship), TargetType, Direction, FieldMappings, RelationType,
SourceNode/TargetNode NodeMapping{Type,Key,TargetField}, Properties,
Priority}`` (``internal/domain/valueobjects/transform/rule_type.go:21-41``),
loaded from YAML (``configrule/config_rule_repository.go:32-46,73-141``).

Here a rule is a plain dataclass; "applying" a rule is *compiling it to a
DataFrame plan* (projections/joins Catalyst optimizes), never a per-row
callback like the reference's ``ApplyRule``
(``transform_rule_aggregate.go:54-69``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class NodeMapping:
    """Endpoint spec of a relationship rule (rule_type.go:34-38)."""

    node_type: str
    key: str  # column in the rule's source DataFrame
    target_field: str = "id"  # property on the node it must equal


@dataclass(frozen=True)
class NodeRule:
    """Rows → nodes: field-mapped projection + rename + type tag
    (transform_rule_aggregate.go:71-87)."""

    name: str
    source: str  # source view/table name
    target_type: str
    field_mappings: dict[str, str] = field(default_factory=dict)  # src col -> prop name
    id_col: str = "id"  # column used as the node key
    where: str | None = None  # P4: rule-SQL predicate pushed into the scan
    priority: int = 1


@dataclass(frozen=True)
class RelationshipRule:
    """Rows → edges, endpoints resolved against existing nodes with
    inner-join semantics — dangling edges dropped, like the reference's
    findNode warn+skip (graph_aggregate.go:73-102)."""

    name: str
    source: str
    relation_type: str
    source_node: NodeMapping
    target_node: NodeMapping
    direction: str = "outgoing"
    properties: dict[str, str] = field(default_factory=dict)  # src col -> prop name
    where: str | None = None
    priority: int = 1


def node_id(node_type: str, key: str) -> str:
    """Deterministic surrogate node id. The reference falls back to a
    *random* UUID for missing ids (transform_service.go:202-207) — a
    replay-idempotence bug we deliberately fix (SURVEY §7.3)."""
    return f"{node_type}:{key}"
