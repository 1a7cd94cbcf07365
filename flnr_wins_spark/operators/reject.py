"""R7/R8 — data-quality rejection splits.

The reference's QA stage (``src/wins_transform_staging.py:236-273``) moves bad
rows into a reject table and stamps REJECT_FLAG:

  * R7 duplicate keys: frequency table -> join back -> select FREQUENCY > 1 ->
    append to reject + delete from source + flag 'Duplicate TRRR_TAG'
    (``:243-257``). Note: ALL members of a duplicate group are rejected — no
    survivor is kept (FIXTURES.md edge case 3).
  * R8 referential integrity: left join POD -> select PNTS_CODE IS NULL (an
    anti-join) -> reject + flag 'TRRR_TAG not found in Water POD Table', the
    flag applied only where REJECT_FLAG IS NULL (``:257-273``, flag-precedence
    edge case 4).

Spark design: the reference's agg + self-join + delete dance collapses to a
single window count (R7) and a semi/anti split (R8); "delete from source"
becomes returning the kept complement — no mutation.

Scale notes: R7 is one shuffle on the key (window partitionBy) — strictly
better than the reference's two-pass agg+join. R8's lookup side is a
dimension: broadcast semi/anti joins, no fact shuffle. Skewed keys are
handled by AQE skew-join splitting (enabled in session.py).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DUPLICATE_FLAG = "Duplicate {key}"
UNMATCHED_FLAG = "{key} not found in {lookup_name}"


class RejectSplit(NamedTuple):
    kept: DataFrame
    rejected: DataFrame  # carries REJECT_FLAG


def reject_duplicates(
    df: DataFrame, key: str, flag: str | None = None, pin: bool = False
) -> RejectSplit:
    """Split rows whose ``key`` occurs more than once into the reject side —
    all group members rejected (``src/wins_transform_staging.py:249-256``).

    Single pass: window COUNT over partitionBy(key) replaces the reference's
    Frequency table + AddJoin (``:240-249``).

    ``pin=True`` persists the window-tagged frame (MEMORY_AND_DISK,
    spillable): kept and rejected are FILTERS of the same tagged subtree,
    so a caller consuming BOTH sides — the staging pipeline materializes
    kept tables AND the reject union — otherwise recomputes the upstream
    scan+enrich+window once per side. Single-side consumers keep the
    default (a persist would only add cache-write cost).
    """
    flag = flag or DUPLICATE_FLAG.format(key=key)
    if "__wins_freq" in df.columns:
        raise ValueError("reject_duplicates: input already has a __wins_freq column")
    cnt = F.count(F.lit(1)).over(Window.partitionBy(key))
    tagged = df.withColumn("__wins_freq", cnt)
    if pin:
        from pyspark import StorageLevel

        tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
    # NULL keys are never duplicates: the reference builds the frequency via
    # an equi-join back to the source (``:246-249``), and SQL equi-joins skip
    # NULL tags — FREQUENCY stays NULL, ``FREQUENCY > 1`` is false, the row
    # is KEPT. The window groups all NULLs together, so without this guard
    # >=2 NULL-keyed rows would diverge from reference semantics.
    is_dup = (F.col("__wins_freq") > 1) & F.col(key).isNotNull()
    kept = tagged.filter(~is_dup).drop("__wins_freq")
    rejected = (
        tagged.filter(is_dup)
        .drop("__wins_freq")
        .withColumn("REJECT_FLAG", _stamp_flag(df, flag))
    )
    return RejectSplit(kept=kept, rejected=rejected)


def _stamp_flag(df: DataFrame, flag: str):
    """Precedence-aware REJECT_FLAG stamp: the reference only flags rows
    whose flag is still NULL (``"REJECT_FLAG IS null"`` definition query,
    ``src/wins_transform_staging.py:268-269``) — an input already carrying
    a flag keeps it; a plain ``withColumn(lit)`` would clobber it."""
    if "REJECT_FLAG" in df.columns:
        return F.coalesce(F.col("REJECT_FLAG"), F.lit(flag))
    return F.lit(flag)


def reject_unmatched(
    df: DataFrame,
    lookup: DataFrame,
    on: tuple[str, str],
    flag: str | None = None,
    lookup_name: str = "lookup",
    broadcast_lookup: bool = True,
) -> RejectSplit:
    """Split rows whose key has no match in ``lookup`` into the reject side
    (``src/wins_transform_staging.py:257-265``): kept = LEFT SEMI join,
    rejected = LEFT ANTI join + flag.

    NULL keys never match an equi-join (same as the reference's SQL-engine
    join), so NULL-keyed rows are rejected.
    """
    df_key, lk_key = on
    flag = flag or UNMATCHED_FLAG.format(key=df_key, lookup_name=lookup_name)
    keys = lookup.select(F.col(lk_key).alias(lk_key)).dropDuplicates([lk_key])
    if broadcast_lookup:
        keys = F.broadcast(keys)
    cond = df[df_key] == keys[lk_key]
    kept = df.join(keys, cond, "left_semi")
    rejected = df.join(keys, cond, "left_anti").withColumn(
        "REJECT_FLAG", _stamp_flag(df, flag)
    )
    return RejectSplit(kept=kept, rejected=rejected)


def flag_where_null(rejected: DataFrame, flag: str) -> DataFrame:
    """Stamp ``flag`` only on rows not already flagged — the reference's
    definition-query layer ``"REJECT_FLAG IS null"`` before CalculateField
    (``src/wins_transform_staging.py:268-269``)."""
    return rejected.withColumn(
        "REJECT_FLAG", F.coalesce(F.col("REJECT_FLAG"), F.lit(flag))
    )
