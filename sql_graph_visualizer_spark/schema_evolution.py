"""Merge-schema resolver: align micro-batch schemas to an evolving table.

The reference re-discovers schemas at connect time and fixes them per run
(``internal/application/services/schema_analyzer_service.go:40-81``); a
CDC engine instead meets schema changes *mid-stream*. This module decides,
per micro-batch:

- **added columns** (batch has a column the table lacks) → table schema
  gains the column (nullable, appended); old data reads back as NULL,
- **widening** (int32→int64, float→double, and int widening chains) →
  table column widens; both old files and the batch are cast up at read,
- **missing columns** (batch lacks a table column — e.g. tombstones or
  pre-evolution producers) → filled with NULL,
- anything else (incompatible type change, e.g. string→int) → error; a
  CDC pipeline must fail loudly rather than coerce lossily (contrast the
  reference's silent fmt.Sprintf coercion,
  ``transform_service.go:225-246``, which SURVEY §7.3 flags as a quirk we
  do not copy).

Pure functions over StructType + a select-based aligner, so they are
backend-agnostic (Iceberg's ``ALTER TABLE ADD COLUMN`` / type promotion,
or SnapshotTable's manifest schema registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# allowed widening lattice: target is the join of the two observed types
_WIDEN: dict[tuple[str, str], str] = {
    ("byte", "short"): "short",
    ("byte", "integer"): "integer",
    ("byte", "long"): "long",
    ("short", "integer"): "integer",
    ("short", "long"): "long",
    ("integer", "long"): "long",
    ("float", "double"): "double",
    ("integer", "double"): "double",
    ("long", "double"): "double",
}


def _join_type(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Least common widened type of two primitive types, or None."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    for (x, y), r in _WIDEN.items():
        if {an, bn} == {x, y}:
            return getattr(T, f"{r.capitalize()}Type")()
    return None


def evolve_schema(
    table: T.StructType, batch: T.StructType
) -> tuple[T.StructType, bool]:
    """Resolve the table's next schema given a batch schema.

    Returns (evolved_schema, changed). Raises TypeError on incompatible
    column type changes.
    """
    by_name = {f.name: f for f in batch.fields}
    fields: list[T.StructField] = []
    changed = False
    for f in table.fields:
        bf = by_name.pop(f.name, None)
        if bf is None or bf.dataType == f.dataType:
            fields.append(f)
            continue
        joined = _join_type(f.dataType, bf.dataType)
        if joined is None:
            raise TypeError(
                f"incompatible schema change for column {f.name!r}: "
                f"{f.dataType.simpleString()} vs {bf.dataType.simpleString()}"
            )
        if joined != f.dataType:
            changed = True
        fields.append(T.StructField(f.name, joined, nullable=True))
    for name, bf in by_name.items():  # new columns appended, nullable
        fields.append(T.StructField(name, bf.dataType, nullable=True))
        changed = True
    return T.StructType(fields), changed


def align_to_schema(
    df: DataFrame, target: T.StructType, keep_extra: list[str] | None = None
) -> DataFrame:
    """Project/cast ``df`` onto ``target`` (missing → NULL, present →
    cast), optionally carrying named extra columns through (the CDC meta
    columns ``op``/``seq`` ride alongside the payload during MERGE)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            src = have[f.name]
            cols.append(
                F.col(f.name) if src.dataType == f.dataType else F.col(f.name).cast(f.dataType)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    target_names = {f.name for f in target.fields}
    for name in keep_extra or []:
        if name in have and name not in target_names:
            cols.append(F.col(name))
    return df.select(*cols)
