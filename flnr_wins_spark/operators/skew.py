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
