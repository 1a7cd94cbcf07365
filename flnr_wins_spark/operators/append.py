"""R1 — Append / NO_TEST union (reference ``arcpy.Append_management(...,
"NO_TEST")``, ``src/wins_transform_staging.py:151-155,254,264``).

Semantics replicated: load rows into a template-schema table with NO schema
validation — columns map by name, source columns absent from the template are
dropped, template columns absent from the source become NULL, and types are
best-effort cast. The reference mutates the target in place; here the result
is a new DataFrame in exact template column order.

Scale notes: pure narrow ops (select/cast + unionByName) — no shuffle at all;
the union is a logical concatenation of partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: name-matched columns cast to the
    template type, missing columns NULL, extra columns dropped — the NO_TEST
    mapping of ``src/wins_transform_staging.py:155``.

    The cast is ``try_cast``, not ``cast``: under Spark 4's default ANSI
    mode a plain cast THROWS on an unparsable value at action time,
    whereas NO_TEST semantics (and this module's 'best-effort cast'
    contract) load NULL and continue. Source column names that collide
    case-insensitively are ambiguous and raise rather than silently
    picking whichever the dict kept last."""
    existing: dict[str, str] = {}
    for f in df.schema.fields:
        low = f.name.lower()
        if low in existing:
            raise ValueError(
                f"align_to_schema: source columns {existing[low]!r} and "
                f"{f.name!r} collide case-insensitively — mapping would be "
                "arbitrary"
            )
        existing[low] = f.name
    cols = []
    for field in schema.fields:
        src = existing.get(field.name.lower())
        if src is not None:
            cols.append(F.col(src).try_cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def append_no_test(template_schema: T.StructType, *sources: DataFrame) -> DataFrame:
    """Union any number of heterogeneous sources into the template schema
    (reference: the 5-service append loop, ``src/wins_transform_staging.py:151-155``)."""
    if not sources:
        raise ValueError("append_no_test requires at least one source")
    aligned = [align_to_schema(s, template_schema) for s in sources]
    out = aligned[0]
    for nxt in aligned[1:]:
        out = out.unionByName(nxt)
    return out
