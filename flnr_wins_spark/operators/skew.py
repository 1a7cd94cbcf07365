"""Skew-mitigation join utilities.

The reference never deals with skew (single-machine ArcPy, §4 of SURVEY.md);
at 100 TB a handful of hot keys in a shuffle join stalls the stage on one
task. Spark's AQE skew-join split (enabled in session.py) is the first line
of defense for batch sort-merge joins; this module is the manual fallback
for the cases AQE does not cover — broadcast-ineligible dimension joins with
known-hot keys, and stream-stream or stream-static joins where AQE does not
apply.

``salted_join`` implements the standard salt-and-replicate scheme:

  big side:   key -> (key, salt) with salt = hash(unique col) % buckets,
              spreading one hot key across ``buckets`` shuffle partitions;
  small side: replicated ``buckets`` times via a JVM-side explode so every
              (key, salt) bucket finds its match.

Cost model: small side shuffle volume multiplies by ``buckets`` — use the
smallest bucket count that flattens the hot keys, or pass ``hot_keys`` to
salt ONLY the skewed keys and join the long tail unsalted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_col: str | None = None,
    how: str = "inner",
    buckets: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``on``, salting the shuffle key.

    ``salt_col`` must be a (near-)unique column on the big side — its hash
    spreads rows of one join key uniformly over ``buckets``. Deterministic:
    xxhash64, no rand(). Result equals ``big.join(small, on, how)`` exactly.
    ``salt_col=None`` salts on ``xxhash64(*all columns)`` — near-unique
    without naming a key, the default the metadata-driven auto path uses
    (identical rows share a salt bucket, which only narrows the spread,
    never changes the join result).

    ``hot_keys`` (e.g. from ``sources.advisor.detect_key_skew``, which
    reads them from manifest metadata alone) salts ONLY the named keys:
    the hot slice joins salted, the long tail joins plain, and the union
    is the exact join — the small side's replication cost then scales
    with the hot keys' dimension rows, not the whole dimension. NULL
    join keys follow the tail branch, preserving plain-join semantics
    (never matching; null-filled under ``how='left'``).

    Supported ``how``: inner/left — the salted small side is a pure
    replication, so multiplicities and null-fill match the unsalted join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    if hot_keys is not None:
        if not hot_keys:
            return big.join(small, on, how)
        is_hot = F.col(on).isin(list(hot_keys))
        hot_part = salted_join(
            big.filter(is_hot), small.filter(is_hot), on, salt_col,
            how=how, buckets=buckets,
        )
        tail = big.filter(~is_hot | F.col(on).isNull()).join(small, on, how)
        # positional union: both branches produce [on, big-rest,
        # small-rest] by construction (key-list joins put the key first,
        # the salted branch drops _salt), and a NAME-based union breaks
        # when big and small legitimately share a non-key column name —
        # the same frames a plain join accepts
        return hot_part.union(tail)
    salt_src = (
        F.xxhash64(F.col(salt_col))
        if salt_col is not None
        else F.xxhash64(*[F.col(c) for c in big.columns])
    )
    big_s = big.withColumn(
        "_salt", F.pmod(salt_src, F.lit(buckets)).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def grid_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    grid: tuple[int, int] = (8, 8),
    hot_keys: list | None = None,
    left_salt_col: str | None = None,
    right_salt_col: str | None = None,
) -> DataFrame:
    """2-D grid (fragment-replicate) equi-join for keys hot on BOTH
    sides — the case per-side salting provably cannot fix: a key with
    |L_k| and |R_k| both huge has a genuinely quadratic |L_k| x |R_k|
    output, and salting one side still lands every pair through the
    other side's single partition of that key.

    The grid spreads the quadratic work over ``bl x br`` cells instead:

      left row:  cell column = hash(row) % bl, REPLICATED over all br
                 cell rows  -> (key, cl, 0..br-1);
      right row: cell row    = hash(row) % br, REPLICATED over all bl
                 cell columns -> (key, 0..bl-1, cr).

    A pair (l, r) meets in EXACTLY ONE cell — (cl(l), cr(r)) — so the
    join on (key, cl, cr) equals the plain join with no duplicates, and
    each cell carries ~|L_k|/bl x |R_k|/br of the output. Replication
    cost: the left slice shuffles br times, the right slice bl times —
    which is why ``hot_keys`` should scope the grid to the flagged keys
    only (the long tail joins plain; NULL keys follow the tail under
    ``hot_keys`` — dropped by inner semantics, null-padded by
    left/full).
    Deterministic: xxhash64 cell assignment (``*_salt_col`` names a
    near-unique column, else the hash of all that side's columns), no
    rand().

    ``how='left'`` cannot ride the replicated grid directly (an
    unmatched left row would null-fill once per phantom cell), so it
    decomposes exactly: the grid INNER join supplies every matched
    pair, and the null-padded complement comes from a left-anti probe
    of the left side against the right side's DISTINCT keys — a
    key-count-sized set, so the probe is skew-free and broadcastable
    even when the right side's hot key holds millions of rows. NULL
    left keys take the anti branch (they match nothing) and null-pad
    once, preserving plain left-join semantics. ``how='full'`` adds
    the transpose probe: a second anti join of the RIGHT side against
    the left side's distinct keys supplies the left-null-padded
    complement, so full outer = grid inner + two skew-free anti
    probes, with NULL keys on either side preserved exactly once.
    ``how='right'`` is the exact transpose of 'left' WITHOUT swapping
    the caller's column layout: grid inner + only the right-side anti
    probe (matchless right rows, including NULL right keys, emit once
    with the left columns null-padded).

    At 100 TB this is the self-join/heavy-overlap straggler killer:
    two fact tables sharing a mega-customer key join in bl x br
    parallel tasks instead of one."""
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            f"grid_salted_join supports inner/left/right/full, got {how!r}"
        )
    bl, br = grid
    if bl < 1 or br < 1:
        raise ValueError(f"grid dims must be >= 1, got {grid}")
    clash = {"_gsl", "_gsr"} & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"grid salt column name collision: {sorted(clash)}")
    if hot_keys is not None:
        if not hot_keys:
            return left.join(right, on, how)
        is_hot = F.col(on).isin(list(hot_keys))
        hot_part = grid_salted_join(
            left.filter(is_hot), right.filter(is_hot), on, how=how,
            grid=grid, left_salt_col=left_salt_col,
            right_salt_col=right_salt_col,
        )
        # hot keys are a disjoint key set, so hot rows can only match hot
        # rows: under inner/left the tail's right side may stay unfiltered
        # (hot right rows never match non-hot left keys), but FULL/RIGHT
        # must split the right too — an unfiltered right would re-emit the
        # hot rows as right-unmatched in the tail branch
        tail_r = (
            right.filter(~is_hot | F.col(on).isNull())
            if how in ("full", "right")
            else right
        )
        tail = left.filter(~is_hot | F.col(on).isNull()).join(tail_r, on, how)
        # positional union: both branches produce [on, left-rest,
        # right-rest] by construction (see salted_join — name-based
        # union breaks on legitimately shared non-key column names)
        return hot_part.union(tail)
    lsrc = (
        F.xxhash64(F.col(left_salt_col))
        if left_salt_col is not None
        else F.xxhash64(*[F.col(c) for c in left.columns])
    )
    rsrc = (
        F.xxhash64(F.col(right_salt_col))
        if right_salt_col is not None
        else F.xxhash64(*[F.col(c) for c in right.columns])
    )
    lg = left.withColumn(
        "_gsl", F.pmod(lsrc, F.lit(bl)).cast("int")
    ).withColumn("_gsr", F.explode(F.sequence(F.lit(0), F.lit(br - 1))))
    rg = right.withColumn(
        "_gsr", F.pmod(rsrc, F.lit(br)).cast("int")
    ).withColumn("_gsl", F.explode(F.sequence(F.lit(0), F.lit(bl - 1))))
    inner = lg.join(rg, [on, "_gsl", "_gsr"], "inner").drop("_gsl", "_gsr")
    if how == "inner":
        return inner
    parts = [inner]
    if how in ("left", "full"):
        # outer decomposition: matched pairs from the grid + ONE
        # null-padded row per matchless left row, found via an anti probe
        # against the right side's DISTINCT keys (key-count-sized —
        # skew-free however hot the right rows are). NULL keys match
        # nothing and null-pad.
        rkeys = right.select(on).distinct()
        left_rest = [c for c in left.columns if c != on]
        null_pad = [
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in right.schema.fields
            if f.name != on
        ]
        parts.append(
            left.join(rkeys, on, "left_anti").select(
                F.col(on), *[F.col(c) for c in left_rest], *null_pad
            )
        )
    if how in ("right", "full"):
        # the transpose probe: matchless RIGHT rows (keys absent from the
        # left's distinct-key set, plus NULL right keys) emit once with
        # the left columns null-padded, in the same
        # [on, left-rest, right-rest] layout
        lkeys = left.select(on).distinct()
        right_rest = [c for c in right.columns if c != on]
        null_pad_l = [
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
            if f.name != on
        ]
        parts.append(
            right.join(lkeys, on, "left_anti").select(
                F.col(on), *null_pad_l, *[F.col(c) for c in right_rest]
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
