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
    needed = list(dict.fromkeys([lk_key] + [s for s in mapping.values() if s != lk_key]))
    # ONE row per lookup key, deterministically (first by the contributed
    # columns' sort order): the reference's correlated UPDATE semantics
    # assume a unique lookup — without this guard a duplicated lookup key
    # MULTIPLIES base rows, and downstream duplicate-QA then rejects
    # perfectly valid unique source rows as duplicates
    from pyspark.sql import Window

    w = Window.partitionBy(lk_key).orderBy(*[F.col(c) for c in needed])
    lk = (
        lookup.select(*needed)
        .withColumn("_lk_rn", F.row_number().over(w))
        .filter(F.col("_lk_rn") == 1)
        .drop("_lk_rn")
        .alias("_lk")
    )
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
