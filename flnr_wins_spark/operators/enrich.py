"""R4+R5 — left-outer join enrichment (correlated UPDATE via join).

Reference: ``AddJoin(layer, key, lookup, lookup_key, "KEEP_ALL")`` then
``CalculateField(base.col = lookup.col)`` then ``RemoveJoin`` —
``src/wins_transform_staging.py:176-179`` (DESCRIPTION <- POD.PNTS_DESCR) and
``:200-204`` (STREAM_NAME <- POD.SRCE_GAZETTED). KEEP_ALL = left outer: rows
with no match get NULL (FIXTURES.md edge case 5).

Scale notes: the lookup (POD snapshot) is a dimension table — Spark
auto-broadcasts under the 10 MB threshold; ``broadcast_lookup=True`` forces
the hint for larger-but-still-small dims so the fact side never shuffles.
No RemoveJoin needed: lookup columns are projected away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    lookup: DataFrame,
    on: tuple[str, str],
    mapping: dict[str, str],
    broadcast_lookup: bool = True,
    keep_unmatched: bool = True,
) -> DataFrame:
    """Copy ``mapping[target] = lookup_source`` columns onto ``df`` via
    left-outer equi-join on ``on = (df_key, lookup_key)``.

    Column collisions are avoided by aliasing the lookup to only the columns
    it contributes. Output column order = input order (targets updated in
    place, appended if new) — mirroring the reference's in-place calculate.
    """
    df_key, lk_key = on
    needed = [lk_key] + [src for src in mapping.values() if src != lk_key]
    lk = lookup.select(*dict.fromkeys(needed)).alias("_lk")
    if broadcast_lookup:
        lk = F.broadcast(lk)
    base = df.alias("_base")
    how = "left" if keep_unmatched else "inner"
    joined = base.join(lk, F.col(f"_base.{df_key}") == F.col(f"_lk.{lk_key}"), how)

    existing = [f.name for f in df.schema.fields]
    cols = []
    for name in existing:
        if name in mapping:
            cols.append(F.col(f"_lk.{mapping[name]}").alias(name))
        else:
            cols.append(F.col(f"_base.{name}").alias(name))
    for target, src in mapping.items():
        if target not in existing:
            cols.append(F.col(f"_lk.{src}").alias(target))
    return joined.select(*cols)
