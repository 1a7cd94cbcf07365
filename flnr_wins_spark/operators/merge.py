"""Incremental-snapshot operators: CDC diff, merge/upsert, SCD2 history.

The reference pipeline is a full refresh — every run re-downloads and
re-publishes everything (``src/wins_transform_staging.py:118-135,280-286``).
At 100 TB a full refresh is the wrong physical plan even when the logical
result is identical; these operators turn two snapshots into the incremental
facts a warehouse needs:

  * ``snapshot_diff``  — what changed between two snapshots (insert/update/
    delete rows), via one full-outer join on the key.
  * ``merge_upsert``   — SCD type 1: apply a changeset onto a target
    (matched rows replaced, new rows appended, optionally deletes applied).
  * ``scd2_apply``     — SCD type 2: maintain validity-interval history
    (close out changed rows, append new versions).

Scale notes: everything is a single equi-join (or anti/union) on the
business key — one shuffle each side, AQE-skew-splittable, no windows over
raw streams. Row-content comparison hashes the compared struct to one
64-bit value map-side (``xxhash64(struct)``), so wide rows never compare
column-by-column across the join, and the join payload can prune to
(key, digest) when callers only need keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digest(cols: Sequence[str]):
    # null-safe content digest: hashing the struct distinguishes NULL from
    # '' and encodes field order; 64-bit xxhash is fine for change *detection*
    # (a false negative needs a 2^-64 collision on the same key)
    return F.xxhash64(F.struct(*[F.col(c) for c in cols]))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Returns ``key_cols + [change_type]`` with change_type in
    ('insert', 'update', 'delete'); unchanged rows are dropped.
    ``compare_cols`` defaults to every non-key column shared by both sides.
    Assumes keys are unique per snapshot (a snapshot is a keyed table).
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(*keys, _digest(compare_cols).alias("_od"))
    n = new.select(*keys, _digest(compare_cols).alias("_nd"))
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_od").isNull(), "insert")
        .when(F.col("_nd").isNull(), "delete")
        .when(F.col("_od") != F.col("_nd"), "update")
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    delete_keys: DataFrame | None = None,
) -> DataFrame:
    """SCD type 1 merge: source rows replace matched target rows, unmatched
    source rows are inserted, ``delete_keys`` (a keyed frame) removes rows.

    Equivalent of ``MERGE INTO target USING source ON keys WHEN MATCHED THEN
    UPDATE WHEN NOT MATCHED THEN INSERT``: one anti join + union — the
    untouched majority of the target flows through with no comparison work.
    Columns follow the target's schema (source must carry them all).
    """
    keys = list(key_cols)
    kept = target.join(source.select(*keys), keys, "left_anti")
    out = kept.unionByName(source.select(*target.columns))
    if delete_keys is not None:
        out = out.join(delete_keys.select(*keys), keys, "left_anti")
    return out


# Safe type-widening lattice for schema evolution — the Iceberg/Delta rule
# set: integer chain widening and float->double only; everything else is a
# LOUD error (silently casting bigint->double or string->int loses data).
_WIDEN: dict[tuple[str, str], str] = {
    ("tinyint", "smallint"): "smallint",
    ("tinyint", "int"): "int",
    ("tinyint", "bigint"): "bigint",
    ("smallint", "int"): "int",
    ("smallint", "bigint"): "bigint",
    ("int", "bigint"): "bigint",
    ("float", "double"): "double",
}


def _evolved_type(name: str, t_type: str, s_type: str) -> str:
    if t_type == s_type:
        return t_type
    widened = _WIDEN.get((t_type, s_type)) or _WIDEN.get((s_type, t_type))
    if widened is None:
        raise ValueError(
            f"schema evolution cannot reconcile column '{name}': target is "
            f"{t_type}, source is {s_type} — only integer-chain and "
            "float->double widenings are safe; cast explicitly upstream"
        )
    return widened


def merge_upsert_evolve(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    delete_keys: DataFrame | None = None,
) -> DataFrame:
    """Delta-style ``MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT
    MATCHED THEN INSERT *`` **with schema evolution** (Delta's
    ``withSchemaEvolution()`` / Iceberg's safe type promotion):

      * columns only in ``source`` are ADDED to the result schema
        (appended after the target's columns, in source order); unmatched
        target rows carry NULL there;
      * columns only in ``target`` keep their old values on matched rows
        (``UPDATE SET *`` touches source columns only) and flow through
        unchanged on unmatched rows; pure inserts carry NULL there;
      * same-named columns with different types widen through the safe
        lattice (integer chain, float->double) — anything lossy raises.

    Physical shape: ONE full-outer equi-join on the key (AQE-skew-splittable;
    a small changeset side broadcasts under AQE), then a column-wise
    matched/unmatched projection — no second pass, no per-column joins.
    ``merge_upsert`` (same-schema SCD1) stays the cheaper anti-join+union
    when no evolution is needed — it never compares column values at all.

    Key columns must be present on both sides with reconcilable types.
    Reference parity: the reference's publish step is drop-and-replace
    (``wts.py:280-286``); MERGE is the incremental posture at 100 TB.
    """
    keys = list(key_cols)
    t_types = dict(target.dtypes)
    s_types = dict(source.dtypes)
    for k in keys:
        if k not in t_types or k not in s_types:
            raise ValueError(f"key column '{k}' must exist on both sides")
    # alias-qualified references, NOT DataFrame-object refs: target and
    # source routinely share lineage (both derived from one scan), where
    # df[c] is ambiguous under Spark's self-join check
    t = target.alias("_mt")
    s = source.withColumn("_src", F.lit(1)).alias("_ms")
    tc = lambda c: F.col(f"_mt.{c}")  # noqa: E731
    sc = lambda c: F.col(f"_ms.{c}")  # noqa: E731
    matched = sc("_src").isNotNull()
    out_cols = []
    for c in target.columns:
        if c in keys:
            kt = _evolved_type(c, t_types[c], s_types[c])
            out_cols.append(F.coalesce(tc(c), sc(c)).cast(kt).alias(c))
        elif c in s_types:
            w = _evolved_type(c, t_types[c], s_types[c])
            out_cols.append(
                F.when(matched, sc(c).cast(w)).otherwise(tc(c).cast(w)).alias(c)
            )
        else:  # target-only: UPDATE SET * leaves it; inserts get NULL
            out_cols.append(tc(c).alias(c))
    for c in source.columns:
        if c not in t_types and c != "_src":  # evolved (new) column
            out_cols.append(sc(c).alias(c))
    cond = None
    for k in keys:
        eq = tc(k) == sc(k)
        cond = eq if cond is None else (cond & eq)
    out = t.join(s, cond, "full_outer").select(*out_cols)
    if delete_keys is not None:
        out = out.join(delete_keys.select(*keys), keys, "left_anti")
    return out


def incremental_agg(
    prev: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    sign_col: str = "sign",
    count_col: str = "n",
) -> DataFrame:
    """Incremental maintenance of a (count, sums...) aggregate under a
    signed changeset — the materialized-view delta rule.

    ``prev`` holds the previous aggregate state: ``key_cols`` + ``count_col``
    + one column per ``sum_cols``. ``delta`` holds raw change rows carrying
    ``sign_col`` = +1 (insert) / -1 (delete); an update is a -1 old row plus
    a +1 new row. The new state is

        merge(prev, aggregate(delta))   (full-outer on keys, sums added,
                                         groups whose count reaches 0 drop)

    so a 100 TB fact table's aggregate refreshes at the cost of the DELTA,
    not the base: one partial agg over the changeset + one join against the
    (much smaller) aggregate table. Sums must be exact types (bigint /
    decimal) for the merged state to be independent of merge order —
    the same determinism rule as plans/common.py's dsum.
    """
    keys = list(key_cols)
    d = delta.groupBy(*keys).agg(
        F.sum(F.col(sign_col)).cast("bigint").alias("_dn"),
        *[
            F.sum(F.col(sign_col) * F.col(c)).alias(f"_d_{c}")
            for c in sum_cols
        ],
    )
    merged = prev.join(d, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col(count_col), F.lit(0).cast("bigint"))
            + F.coalesce(F.col("_dn"), F.lit(0).cast("bigint"))
        ).alias(count_col),
        *[
            (
                F.coalesce(F.col(c), F.lit(0).cast(prev.schema[c].dataType.simpleString()))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0).cast(prev.schema[c].dataType.simpleString()))
            ).alias(c)
            for c in sum_cols
        ],
    )
    return merged.filter(F.col(count_col) > 0)


def scd2_apply(
    history: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    batch_id: int,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """SCD type 2: apply snapshot ``source`` (version ``batch_id``) onto a
    history table carrying (``valid_from``, ``valid_to``, ``is_current``).

    Semantics per business key, against the current history row:
      * new key                -> open a new current row (valid_from=batch_id)
      * changed content        -> close the old row (valid_to=batch_id,
                                  is_current=false) and open a new one
      * unchanged              -> untouched
      * key absent from source -> close the old row (soft delete)
    Closed history rows always pass through unchanged. ``valid_from`` /
    ``valid_to`` are integer batch versions (monotonic run ids) — timestamp
    stamping belongs to the caller, keeping the operator deterministic.

    One join between the *current slice* of history and the source; the
    closed majority of a long history never joins anything.
    """
    keys = list(key_cols)
    data_cols = [c for c in source.columns if c not in set(keys)]
    if compare_cols is None:
        compare_cols = data_cols
    closed = history.filter(~F.col("is_current"))
    current = history.filter(F.col("is_current"))
    s = source.withColumn("_nd", _digest(compare_cols))
    joined = current.withColumn("_od", _digest(compare_cols)).join(
        s.select(*keys, F.col("_nd")), keys, "full_outer"
    )
    # current rows to close: content changed, or key gone from the source
    close = (
        joined.filter(
            F.col("_od").isNotNull() & (F.col("_nd").isNull() | (F.col("_nd") != F.col("_od")))
        )
        .select(*keys)
        .withColumn("_close", F.lit(True))
    )
    kept_current = (
        current.join(close, keys, "left")
        .withColumn("is_current", F.when(F.col("_close"), F.lit(False)).otherwise(F.col("is_current")))
        .withColumn(
            "valid_to", F.when(F.col("_close"), F.lit(batch_id)).otherwise(F.col("valid_to"))
        )
        .drop("_close")
    )
    # source rows to open: new key, or content changed vs current
    opens = (
        s.join(
            current.withColumn("_od", _digest(compare_cols)).select(*keys, "_od"),
            keys,
            "left",
        )
        .filter(F.col("_od").isNull() | (F.col("_od") != F.col("_nd")))
        .select(
            *keys,
            *data_cols,
            F.lit(batch_id).alias("valid_from"),
            F.lit(None).cast("int").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return closed.unionByName(kept_current).unionByName(opens.select(*history.columns))


def incremental_join(
    old_a: DataFrame,
    delta_a: DataFrame,
    old_b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
    prev: DataFrame | None = None,
) -> DataFrame:
    """Incremental maintenance of an INNER equi-join under insert-only
    deltas — the join delta rule of materialized-view maintenance:

        new_join = prev ∪ (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    ``prev`` is the previously-materialized join of (A_old, B_old); pass
    ``None`` to have it computed here (first build). The identity
    ``incremental == full rebuild of (A_old∪ΔA) ⋈ (B_old∪ΔB)`` holds
    exactly for inner equi-joins with insert-only deltas, which is what the
    registry oracle proves value-for-value. Deletes/updates need signed
    rows (see :func:`incremental_agg`) and a keyed prev — out of scope of
    this operator by design.

    Scale shape: the three delta terms each join a DELTA side against a
    base or another delta — deltas are typically table-fraction-sized, so
    Spark broadcasts them (AQE decides; the base sides are never
    re-shuffled when prev is materialized). Refresh cost follows the
    changes, not the accumulated base — the IVM selling point.
    """
    keys = list(on)
    if prev is None:
        prev = old_a.join(old_b, keys)
    return (
        prev.unionByName(delta_a.join(old_b, keys))
        .unionByName(old_a.join(delta_b, keys))
        .unionByName(delta_a.join(delta_b, keys))
    )
