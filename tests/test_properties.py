"""Property-based tests (hypothesis) for the semantic invariants that are
easy to get wrong and hard to hit with example tests:

  * reject_duplicates: kept + rejected is a PARTITION of the input; no kept
    key occurs twice; every rejected key occurs >= 2 times (reference
    semantics: no survivor, wts.py:243-257).
  * reject_unmatched: kept/rejected partition by lookup membership.
  * salted_join == plain join for any data and bucket count.
  * blank_to_null: '' -> NULL, everything else unchanged (wts.py:190-192).

Examples are kept small (Spark job per example); determinism comes from
hypothesis' own shrinking, not seeds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flnr_wins_spark.operators.reject import reject_duplicates, reject_unmatched
from flnr_wins_spark.operators.skew import salted_join
from flnr_wins_spark.operators.update import blank_to_null

KEYS = st.sampled_from(["a", "b", "c", "d"])
ROWS = st.lists(st.tuples(st.integers(0, 100), KEYS), min_size=0, max_size=12)

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, rid, k) for i, (rid, k) in enumerate(rows)],
        "uid long, rid long, key string",
    )


@given(rows=ROWS)
@SLOW
def test_reject_duplicates_partitions_input(spark, rows):
    df = _df(spark, rows)
    kept, rejected = reject_duplicates(df, key="key", flag="dup")
    kept_uids = {r.uid for r in kept.collect()}
    rej_uids = {r.uid for r in rejected.collect()}
    assert kept_uids | rej_uids == set(range(len(rows)))
    assert kept_uids & rej_uids == set()
    from collections import Counter

    counts = Counter(k for _, k in rows)
    assert all(counts[r.key] == 1 for r in kept.collect())
    assert all(counts[r.key] >= 2 for r in rejected.collect())


@given(
    rows=ROWS,
    lookup_keys=st.lists(KEYS, min_size=0, max_size=4, unique=True),
)
@SLOW
def test_reject_unmatched_partitions_by_membership(spark, rows, lookup_keys):
    df = _df(spark, rows)
    lookup = spark.createDataFrame(
        [(k,) for k in lookup_keys] or [(None,)], "key string"
    ).filter("key is not null")
    kept, rejected = reject_unmatched(df, lookup, on=("key", "key"), flag="nf")
    in_lookup = set(lookup_keys)
    for r in kept.collect():
        assert r.key in in_lookup
    for r in rejected.collect():
        assert r.key not in in_lookup
    assert kept.count() + rejected.count() == len(rows)


@given(rows=ROWS, buckets=st.sampled_from([1, 3, 8]))
@SLOW
def test_salted_join_equals_plain_join(spark, rows, buckets):
    big = _df(spark, rows)
    small = spark.createDataFrame([("a", 1), ("c", 2)], "key string, v int")
    got = salted_join(big, small, on="key", salt_col="uid", buckets=buckets)
    want = big.join(small, "key")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(["", " ", "x", "ab c"])),
        min_size=0,
        max_size=10,
    )
)
@SLOW
def test_blank_to_null(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "uid long, s string"
    )
    got = {r.uid: r.s for r in blank_to_null(df, "s").collect()}
    for i, v in enumerate(vals):
        assert got[i] == (None if v == "" else v)
