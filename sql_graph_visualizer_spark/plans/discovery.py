"""Schema auto-discovery: derive transform rules from relational metadata.

Half the reference's pitch is *automatic* SQL→graph transformation: it
reads INFORMATION_SCHEMA.KEY_COLUMN_USAGE for FK constraints, classifies
each table as NODE or RELATIONSHIP (junction), detects graph patterns
(star schema, hierarchy), and generates transformation rules
(``internal/application/services/schema_analyzer_service.go:40-81,
116-193, 289-330``).

Spark has no INFORMATION_SCHEMA for parquet inputs, so the metadata is
declared (``TableMeta``) — exactly what a catalog (Unity/Glue/Hive) or a
JDBC information-schema scan would yield — and the analysis/rule
generation mirror the reference's heuristics:

- junction table ⇔ ≥2 FKs and (FK-column ratio > 0.6, or the name looks
  like a join table and it has ≥2 FKs) — ``isJunctionTable``,
  ``schema_analyzer_service.go:166-193``;
- node tables → one NodeRule each (``create_<table>_nodes``, Title-cased
  target type, non-FK columns as properties — ``generateNodeRule``);
- each FK on a node table → a RelationshipRule to the referenced table;
- junction tables → a RelationshipRule between the first two referenced
  tables, non-FK columns as edge properties;
- star-schema / hierarchy pattern detection (``identifyGraphPatterns``).

The generated rules compile to the same DataFrame plans as hand-written
ones (``plans/graph_builder``), so discovery output and manual config
are interchangeable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from sql_graph_visualizer_spark.plans.rules import NodeMapping, NodeRule, RelationshipRule


@dataclass(frozen=True)
class ForeignKey:
    """One KEY_COLUMN_USAGE row (column → ref_table.ref_column)."""

    column: str
    ref_table: str
    ref_column: str


@dataclass(frozen=True)
class TableMeta:
    """Declared relational metadata for one table — the caller's view of
    INFORMATION_SCHEMA (columns may be a projection: only declared
    columns become properties)."""

    name: str
    columns: tuple[str, ...]
    primary_key: tuple[str, ...]
    foreign_keys: tuple[ForeignKey, ...] = field(default_factory=tuple)


def _title(name: str) -> str:
    return "".join(p.capitalize() for p in name.split("_"))


def is_junction_table(t: TableMeta) -> bool:
    """The reference's heuristic (schema_analyzer_service.go:166-193):
    ≥2 FKs and either mostly-FK columns or a join-table-looking name."""
    if len(t.foreign_keys) < 2:
        return False
    if len(t.foreign_keys) / len(t.columns) > 0.6:
        return True
    return bool(re.search(r".+_.+", t.name.lower()))


def discover_rules(
    tables: list[TableMeta],
) -> tuple[list[NodeRule], list[RelationshipRule]]:
    """Generate node + relationship rules from declared FK metadata."""
    node_rules: list[NodeRule] = []
    rel_rules: list[RelationshipRule] = []
    for t in tables:
        fk_cols = {fk.column for fk in t.foreign_keys}
        if is_junction_table(t):
            a, b = t.foreign_keys[0], t.foreign_keys[1]
            props = {c: c for c in t.columns if c not in fk_cols}
            rel_rules.append(
                RelationshipRule(
                    name=f"{t.name}_junction",
                    source=t.name,
                    relation_type=t.name.upper(),
                    source_node=NodeMapping(_title(a.ref_table), a.column),
                    target_node=NodeMapping(_title(b.ref_table), b.column),
                    properties=props,
                    priority=len(node_rules) + len(rel_rules) + 1,
                )
            )
            continue
        pk = t.primary_key[0]
        props = {c: c for c in t.columns if c not in fk_cols and c != pk}
        node_rules.append(
            NodeRule(
                name=f"create_{t.name}_nodes",
                source=t.name,
                target_type=_title(t.name),
                id_col=pk,
                field_mappings=props,
                priority=len(node_rules) + 1,
            )
        )
        for fk in t.foreign_keys:
            rel_rules.append(
                RelationshipRule(
                    name=f"{t.name}_{fk.column}_fk",
                    source=t.name,
                    relation_type=f"REFERENCES_{fk.ref_table.upper()}",
                    source_node=NodeMapping(_title(t.name), pk),
                    target_node=NodeMapping(_title(fk.ref_table), fk.column),
                    priority=len(node_rules) + len(rel_rules) + 1,
                )
            )
    return node_rules, rel_rules


def identify_graph_patterns(tables: list[TableMeta]) -> list[dict]:
    """Star-schema and hierarchy detection
    (schema_analyzer_service.go:200-270): a table ≥3 other tables
    reference is a star center; a self-referencing table is a
    hierarchy. Confidence formulas mirror calculatePatternConfidence."""
    patterns: list[dict] = []
    for t in tables:
        incoming = sum(
            1 for o in tables for fk in o.foreign_keys if fk.ref_table == t.name
        )
        if incoming >= 3:
            patterns.append(
                {
                    "pattern_type": "STAR_SCHEMA",
                    "center_table": t.name,
                    "confidence": min(incoming * 0.2, 1.0),
                }
            )
        if any(fk.ref_table == t.name for fk in t.foreign_keys):
            patterns.append(
                {"pattern_type": "HIERARCHY", "center_table": t.name, "confidence": 0.9}
            )
    return patterns


# Declared metadata for the sandbox's TPC-H-ish testdata — what an
# information-schema scan of these tables would return. lineitem is
# declared with its join-key + quantity projection, which the junction
# heuristic classifies as the part↔supplier many-to-many (its TPC-H
# role); the quantity column rides along as an edge property.
TPCH_METADATA: list[TableMeta] = [
    TableMeta("region", ("r_regionkey", "r_name"), ("r_regionkey",)),
    TableMeta(
        "nation",
        ("n_nationkey", "n_name", "n_regionkey"),
        ("n_nationkey",),
        (ForeignKey("n_regionkey", "region", "r_regionkey"),),
    ),
    TableMeta(
        "customer",
        ("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        ("c_custkey",),
        (ForeignKey("c_nationkey", "nation", "n_nationkey"),),
    ),
    TableMeta(
        "supplier",
        ("s_suppkey", "s_name", "s_nationkey"),
        ("s_suppkey",),
        (ForeignKey("s_nationkey", "nation", "n_nationkey"),),
    ),
    TableMeta("part", ("p_partkey", "p_name", "p_brand"), ("p_partkey",)),
    TableMeta(
        "lineitem",
        ("l_partkey", "l_suppkey", "l_quantity"),
        ("l_orderkey", "l_linenumber"),
        (
            ForeignKey("l_partkey", "part", "p_partkey"),
            ForeignKey("l_suppkey", "supplier", "s_suppkey"),
        ),
    ),
]
