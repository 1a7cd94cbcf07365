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

import pytest
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
@pytest.mark.slow
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


NULLABLE_KEYS = st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d"]))
GRID_ROWS = st.lists(
    st.tuples(st.integers(0, 100), NULLABLE_KEYS), min_size=0, max_size=10
)


@given(
    lrows=GRID_ROWS,
    rrows=GRID_ROWS,
    grid=st.sampled_from([(1, 1), (1, 4), (4, 1), (3, 2)]),
    how=st.sampled_from(["inner", "left", "right", "full"]),
    hot=st.sampled_from([None, [], ["a"], ["a", "d"]]),
)
@pytest.mark.slow
@SLOW
def test_grid_salted_join_equals_plain_join(spark, lrows, rrows, grid, how, hot):
    """grid_salted_join == plain join for ANY data, grid shape, how, and
    hot-key scoping — including NULL keys on both sides (dropped by
    inner, null-padded exactly once by the preserving sides) and keys
    present on only one side. The outer decompositions (anti-probe
    null-pads) and the hot/tail split must never duplicate or drop a
    row."""
    from flnr_wins_spark.operators.skew import grid_salted_join

    left = spark.createDataFrame(
        [(i, k) for i, (rid, k) in enumerate(lrows)], "lid long, key string"
    )
    right = spark.createDataFrame(
        [(100 + i, k) for i, (rid, k) in enumerate(rrows)],
        "rid long, key string",
    )
    got = grid_salted_join(left, right, on="key", how=how, grid=grid, hot_keys=hot)
    want = left.join(right, "key", how)
    key = lambda row: tuple((x is None, x) for x in row)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )


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


@given(
    rows=st.lists(st.integers(-1000, 1000), min_size=1, max_size=20),
    parts=st.sampled_from([1, 3, 7]),
)
@SLOW
def test_global_row_number_is_rank_of_sorted_values(spark, rows, parts):
    from flnr_wins_spark.operators.ranking import global_row_number

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "uid long, v long"
    )
    got = {r.uid: r.rn for r in global_row_number(df, ["v", "uid"], num_partitions=parts).collect()}
    want = {
        uid: rank + 1
        for rank, (uid, _) in enumerate(
            sorted(enumerate(rows), key=lambda t: (t[1], t[0]))
        )
    }
    assert got == want


@given(
    rows=st.lists(st.integers(0, 50), min_size=2, max_size=20),
    k=st.sampled_from([1, 2, 5]),
)
@SLOW
def test_equidepth_bins_are_balanced_and_monotone(spark, rows, k):
    from flnr_wins_spark.operators.ranking import equidepth_bins

    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)], "uid long, v long")
    out = equidepth_bins(df, "v", "uid", k=k).collect()
    pops = {}
    for r in out:
        pops[r.bucket] = pops.get(r.bucket, 0) + 1
    assert sum(pops.values()) == len(rows)
    assert max(pops.values()) - min(pops.values()) <= 1
    by_rn = sorted(out, key=lambda r: r.rn)
    assert all(a.bucket <= b.bucket for a, b in zip(by_rn, by_rn[1:]))


@given(
    big_keys=st.lists(st.integers(0, 30), min_size=0, max_size=15),
    small_keys=st.lists(st.integers(0, 30), min_size=0, max_size=5, unique=True),
)
@SLOW
def test_bloom_prefilter_never_false_negative(spark, big_keys, small_keys):
    from pyspark.sql import functions as F

    from flnr_wins_spark.functions.sketches import bloom_prefilter

    big = spark.createDataFrame(
        [(i, k) for i, k in enumerate(big_keys)] or [(0, None)], "uid long, k long"
    ).filter("k is not null")
    keys = spark.createDataFrame(
        [(k,) for k in small_keys] or [(None,)], "kk long"
    ).filter("kk is not null")
    pre = {r.uid for r in bloom_prefilter(big, keys, "k", "kk", depth=2, hex_chars=1).collect()}
    member = set(small_keys)
    exact = {i for i, k in enumerate(big_keys) if k in member}
    assert exact <= pre


@pytest.mark.slow
@given(edges=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=15))
@SLOW
def test_star_cc_equals_label_cc(spark, edges):
    from flnr_wins_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    label = {r.id: r.cluster_id for r in connected_components(df, max_iter=30).collect()}
    star = {r.id: r.cluster_id for r in connected_components(df, max_iter=30, algorithm="star").collect()}
    assert star == label


# ---------------------------------------------------------------------------
# Round-4 operator invariants
# ---------------------------------------------------------------------------

WORD = st.text(alphabet="abc", min_size=1, max_size=6)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(lefts=st.lists(WORD, min_size=1, max_size=5, unique=True),
       rights=st.lists(WORD, min_size=1, max_size=5, unique=True))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_fuzzy_join_complete_within_blocking_contract(spark, lefts, rights):
    """Recall contract: every pair with lev <= max_dist AND equal 2-char
    lowered prefix MUST be found (blocking may only lose prefix-corrupted
    pairs, never in-contract ones); and nothing with lev > max_dist."""
    from flnr_wins_spark.operators.linkage import fuzzy_join

    ldf = spark.createDataFrame([(i, w) for i, w in enumerate(lefts)], "id long, name string")
    rdf = spark.createDataFrame([(i, w) for i, w in enumerate(rights)], "rid long, rname string")
    got = {(r["id"], r["rid"]) for r in fuzzy_join(ldf, rdf, "name", "rname", max_dist=2).collect()}
    for i, lw in enumerate(lefts):
        for j, rw in enumerate(rights):
            expected = _lev(lw, rw) <= 2 and lw[:2].lower() == rw[:2].lower()
            assert ((i, j) in got) == expected, (lw, rw)


def _bpe_merge_ref(words, pair):
    """Python reference: leftmost non-overlapping merge of `pair` in each
    symbol list."""
    a, b = pair
    out = []
    for syms in words:
        acc = []
        for s in syms:
            if acc and acc[-1] == a and s == b:
                acc[-1] = a + b
            else:
                acc.append(s)
        out.append(acc)
    return out


@given(words=st.lists(st.text(alphabet="ab", min_size=1, max_size=6),
                      min_size=1, max_size=4))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_bpe_first_round_matches_python_reference(spark, words):
    """The engine's round-1 argmax and merge application must agree with a
    direct Python implementation of Sennrich's algorithm."""
    from collections import Counter

    from flnr_wins_spark.functions.text import bpe_train

    text = " ".join(words)
    # python reference round 1 on the word-frequency collapsed vocab
    freq = Counter(words)
    pair_counts = Counter()
    for w, f in freq.items():
        for x, y in zip(w, w[1:]):
            pair_counts[(x, y)] += f
    if not pair_counts:
        return  # all 1-char words: no pairs, engine returns 0 merge rows
    # tie-break: max count, then lexicographically SMALLEST (a, b)
    top_cnt = max(pair_counts.values())
    best = min(p for p, c in pair_counts.items() if c == top_cnt)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = [r for r in bpe_train(docs, rounds=1).collect()]
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"]) == best and r["cnt"] == top_cnt


@given(w=st.integers(1, 5), h=st.integers(1, 5),
       data=st.binary(min_size=75, max_size=75), gray=st.booleans())
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_png_roundtrip_random_images(w, h, data, gray):
    from flnr_wins_spark.functions.multimodal import decode_image, encode_png

    ch = 1 if gray else 3
    px = data[: w * h * ch]
    got = decode_image(encode_png(ch, w, h, px, filter_cycle=True))
    assert got == (ch, w, h, px)


# ---------------------------------------------------------------------------
# Round-4 second wave: graph analytics, KMV, MaxMatch
# ---------------------------------------------------------------------------

EDGES = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=0, max_size=16
)


@given(edges=EDGES)
@SLOW
def test_triangle_counts_match_brute_force(spark, edges):
    from itertools import combinations

    from flnr_wins_spark.operators.graph import triangle_counts

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    want: dict[int, int] = {}
    for x, y, z in combinations(sorted({v for e in simple for v in e}), 3):
        if {(x, y), (y, z), (x, z)} <= simple:
            for v in (x, y, z):
                want[v] = want.get(v, 0) + 1
    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "id_a bigint, id_b bigint"
    )
    got = {r.id: r.triangles for r in triangle_counts(df).collect()}
    assert got == want


@given(edges=EDGES, k=st.integers(1, 4))
@SLOW
def test_kcore_is_fixpoint(spark, edges, k):
    """After enough rounds: every surviving vertex has core degree >= k, and
    the survivors equal the classic sequential peel's result."""
    from flnr_wins_spark.operators.graph import kcore

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    # sequential reference peel
    es = set(simple)
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            break
        es = {(a, b) for a, b in es if a not in drop and b not in drop}
    want: dict[int, int] = {}
    for a, b in es:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "id_a bigint, id_b bigint"
    )
    got = {r.id: r.core_degree for r in kcore(df, k=k, rounds=10).collect()}
    assert got == want
    assert all(d >= k for d in got.values())


@given(
    values=st.lists(st.integers(0, 500), min_size=0, max_size=40),
    cut=st.integers(0, 40),
)
@SLOW
def test_kmv_sketch_is_mergeable(spark, values, cut):
    """KMV mergeability: bottom-k of the union == bottom-k of (bottom-k(A) ∪
    bottom-k(B)) for ANY split — the property the streaming sink relies on."""
    from flnr_wins_spark.functions.sketches import kmv_distinct

    k = 8
    a = values[:cut]
    b = values[cut:]

    def sketch_hashes(vals):
        import hashlib

        hs = {
            int(hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:12], 16) for v in vals
        }
        return sorted(hs)[:k]

    merged = sorted(set(sketch_hashes(a)) | set(sketch_hashes(b)))[:k]
    assert merged == sketch_hashes(values)
    if not values:
        return
    # and the Spark operator's n_kept/est agrees with the local construction
    full = spark.createDataFrame([("g", v) for v in values], "g string, v int")
    row = kmv_distinct(full, "g", "v", k=k).collect()[0]
    hs = sketch_hashes(values)
    assert row.n_kept == len(hs)
    if len(hs) == k:
        assert abs(row.est_distinct - (k - 1) * (16**12) / hs[-1]) < 1e-6
    else:
        assert row.est_distinct == float(len(hs))


WORDS = st.lists(
    st.text(alphabet="abcz", min_size=1, max_size=10), min_size=1, max_size=8
)


@pytest.mark.slow
@given(words=WORDS)
@SLOW
def test_maxmatch_tokens_reconcatenate(spark, words):
    """Greedy MaxMatch invariants: per distinct word, the emitted tokens
    (ordered by position) concatenate back to the (truncated) word, and
    every token is in the vocabulary by construction."""
    from flnr_wins_spark.functions.text import maxmatch_token_counts

    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id bigint, text string"
    )
    out = maxmatch_token_counts(df, top_words=2, max_word_len=8, top_k=1000)
    totals = {r.tok: r.total for r in out.collect()}
    # total token-char mass == total truncated word-char mass over occurrences
    want_chars = sum(len(w[:8]) for w in words)
    got_chars = sum(len(tok) * n for tok, n in totals.items())
    assert got_chars == want_chars


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["en", "de", "fr"])),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    n=st.integers(1, 10),
)
@pytest.mark.slow
@SLOW
def test_corpus_mixture_budget_and_quota_invariants(spark, rows, n):
    """For ANY corpus and budget: output size <= n, per-source takes never
    exceed the source size, takes are the md5-smallest docs of each source,
    and the whole selection is a pure function of the input set."""
    from flnr_wins_spark.operators.sample import corpus_mixture

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = corpus_mixture(df, "lang", n=n).collect()
    assert len(out) <= n
    by_src = {}
    for r in out:
        by_src.setdefault(r.lang, []).append(r)
    sizes = {}
    for _, lang in rows:
        sizes[lang] = sizes.get(lang, 0) + 1
    import hashlib

    for lang, taken in by_src.items():
        assert len(taken) <= sizes[lang]
        # taken docs are exactly the md5-smallest of that source
        src_ids = [d for d, s in rows if s == lang]
        order = sorted(
            src_ids, key=lambda d: (hashlib.md5(f"{d}:mix42".encode()).hexdigest(), d)
        )
        assert sorted(r.id for r in taken) == sorted(order[: len(taken)])


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=2, max_size=14, unique=True)
)
@SLOW
def test_bottomk_quantiles_exact_when_k_covers_everything(spark, vals):
    """k >= n makes the 'sketch' the full data: estimates must equal the
    exact order statistics at ceil(q*n)."""
    import math

    from flnr_wins_spark.functions.sketches import bottomk_quantiles

    rows = [(i, "g", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    row = bottomk_quantiles(df, "event_type", "value", "event_id", k=100).collect()[0]
    s = sorted(float(v) for v in vals)
    n = len(s)
    assert row.n_kept == n
    assert row.q50 == s[math.ceil(0.5 * n) - 1]
    assert row.q90 == s[math.ceil(0.9 * n) - 1]


@given(
    lat_u=st.integers(0, 180_000_000),
    lon_u=st.integers(0, 360_000_000),
)
@pytest.mark.slow
@SLOW
def test_geohash_spark_matches_duckdb_dialect(spark, lat_u, lon_u):
    """The two dialect renderings of the unrolled geohash arithmetic must
    agree for ANY coordinate, including the exact top edges."""
    import duckdb

    from flnr_wins_spark.functions.geo import geohash_encode, geohash_expr_sql

    df = spark.createDataFrame([(lat_u, lon_u)], "lat_u long, lon_u long")
    got = df.select(geohash_encode("lat_u", "lon_u", 7).alias("g")).collect()[0].g
    want = duckdb.sql(
        "select " + geohash_expr_sql(str(lat_u), str(lon_u), 7, div="//")
    ).fetchone()[0]
    assert got == want


@given(
    vals=st.lists(st.integers(-32768, 32767), min_size=1, max_size=6)
)
@SLOW
def test_adpcm_constant_blocks_roundtrip_exactly(spark, vals):
    """ANY all-constant-block signal survives the lossy ADPCM codec
    bit-exactly (the invariant the oracle entry's construction relies on)."""
    from flnr_wins_spark.functions.multimodal import decode_wav, encode_wav_adpcm

    samples = [v for v in vals for _ in range(9)]
    ch, rate, out = decode_wav(encode_wav_adpcm(8000, samples))
    assert out == samples


@given(g=st.integers(0, 255))
@SLOW
def test_jpeg_dc_only_matches_integer_oracle_formula(spark, g):
    """Every flat tile decodes to exactly the closed-form integer value the
    JPEG oracle predicts — across the whole gray range."""
    import numpy as np

    from flnr_wins_spark.functions.jpeg import QUANT_LUMA, decode_jpeg, encode_jpeg

    img = np.full((8, 8), g, dtype=np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(8, 8, img.tobytes(), channels=1))
    x = 8 * (g - 128)
    dc = (abs(x) + QUANT_LUMA[0] // 2) // QUANT_LUMA[0] * (1 if x >= 0 else -1)
    assert set(px) == {max(0, min(255, 2 * dc + 128))}


@given(
    base=st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["a", "b", "c"]),
                  st.integers(-5, 5)),
        min_size=1, max_size=20, unique_by=lambda t: t[0],
    ),
    change=st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["a", "b", "c"]),
                  st.integers(-5, 5)),
        min_size=1, max_size=10, unique_by=lambda t: t[0],
    ),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_partition_pruned_merge_equals_whole_table_merge(
    spark, tmp_path_factory, base, change
):
    """Cross-implementation differential: merge_ptable (reads ONLY the
    changeset's partitions, carries the rest by reference) must land on
    exactly the rows merge_upsert_evolve produces against the full table
    — partition pruning is a physical optimization, never a semantics
    change. Changesets keep each key's partition (the documented
    contract; moves need explicit deletes)."""
    from flnr_wins_spark.operators.merge import merge_upsert_evolve
    from flnr_wins_spark.sources.ptable import merge_ptable, read_ptable, write_ptable

    schema = "id long, part string, v long"
    base_df = spark.createDataFrame(base, schema)
    # pin each changeset key to its base partition (no partition moves)
    part_of = {i: p for i, p, _ in base}
    change = [(i, part_of.get(i, p), v) for i, p, v in change]
    change_df = spark.createDataFrame(change, schema)

    path = str(tmp_path_factory.mktemp("pt") / "tbl")
    write_ptable(base_df, path, "part")
    merge_ptable(spark, path, change_df, ["id"])
    got = {tuple(r) for r in read_ptable(spark, path).select("id", "part", "v").collect()}
    want = {
        tuple(r)
        for r in merge_upsert_evolve(base_df, change_df, ["id"])
        .select("id", "part", "v")
        .collect()
    }
    assert got == want


@given(
    base=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-9, 9)),
        min_size=0, max_size=15, unique_by=lambda t: t[0],
    ),
    change=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-9, 9)),
        min_size=1, max_size=8, unique_by=lambda t: t[0],
    ),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_merge_evolve_is_idempotent(spark, base, change):
    """MERGE semantics: applying the same keyed changeset twice lands on
    the same table as applying it once (UPDATE SET * with identical
    values is a no-op; INSERT matches on the second pass and updates to
    itself). The property exactly-once replay protection relies on."""
    from flnr_wins_spark.operators.merge import merge_upsert_evolve

    schema = "id long, v long"
    t0 = spark.createDataFrame(base, schema) if base else spark.createDataFrame([], schema)
    s = spark.createDataFrame(change, schema)
    once = merge_upsert_evolve(t0, s, ["id"])
    twice = merge_upsert_evolve(once, s, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


# ---- manifest sidecars: the invariants that make metadata-only answers
# trustworthy for ANY data shape ----

SIDE_ROWS = st.lists(
    st.tuples(st.sampled_from(["p0", "p1", "p2"]),
              st.sampled_from(["u", "v", "w", "x", "y", ""])),
    min_size=1, max_size=14,
)

SIDE = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=SIDE_ROWS)
@SIDE
def test_sidecars_never_lie_for_any_data(spark, tmp_path_factory, rows):
    """For arbitrary data: metadata row counts equal the data's counts,
    bloom pruning never loses a present value (no false negatives), and
    the KMV table estimate is EXACT whenever total NDV < k."""
    from collections import Counter

    from flnr_wins_spark.sources.ptable import (
        ndv_table, partition_rows, prune_partitions_eq, write_ptable)

    # unique ids so merge-free semantics are unambiguous
    data = [(i, kb, val) for i, (kb, val) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, kb string, val string")
    path = str(tmp_path_factory.mktemp("side")) + "/tbl"
    write_ptable(
        df, path, "kb",
        stats_cols=["id"], bloom_cols=["val"], ndv_cols=["val"], ndv_k=64,
    )
    want = Counter(kb for _, kb, _ in data)
    assert partition_rows(spark, path) == dict(want)
    for _, kb, val in data:
        assert kb in prune_partitions_eq(spark, path, "val", val)
    n, est = ndv_table(spark, path, "val")
    true_ndv = len({v for _, _, v in data})
    assert (n, est) == (true_ndv, float(true_ndv))  # < k=64: exact


@given(rows=SIDE_ROWS)
@SIDE
def test_ptable_delta_reconciles_any_merge(spark, tmp_path_factory, rows):
    """For arbitrary data + an arbitrary-ish changeset: old aggregate +
    signed delta == new aggregate, per partition AND globally — the
    linear-aggregate cancellation ptable_delta is built on."""
    from collections import Counter

    from flnr_wins_spark.sources.ptable import ptable_delta, write_ptable

    data = [(i, kb, val) for i, (kb, val) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, kb string, val string")
    path = str(tmp_path_factory.mktemp("delta")) + "/tbl"
    write_ptable(df, path, "kb")
    # changeset derived from the data itself: update even ids, delete
    # ids % 3 == 0 (disjoint from updates), insert one new row
    upd = [(i, kb, val + "!") for i, kb, val in data if i % 2 == 0 and i % 3 != 0]
    ins = [(len(data) + 7, "p1", "new")]
    dels = [(i, kb) for i, kb, _ in data if i % 3 == 0]
    src = spark.createDataFrame(upd + ins, "id long, kb string, val string")
    dk = spark.createDataFrame(dels, "id long, kb string") if dels else None
    merge_args = {"delete_keys": dk} if dels else {}
    from flnr_wins_spark.sources.ptable import merge_ptable as _merge

    _merge(spark, path, src, ["id"], **merge_args)

    delta = ptable_delta(spark, path, 1, 2).collect()
    old = Counter(kb for _, kb, _ in data)
    d = Counter()
    for r in delta:
        d[r.kb] += r.sign
    new = Counter(
        r.kb for r in read_ptable_all(spark, path)
    )
    for kb in set(old) | set(new) | set(d):
        assert old.get(kb, 0) + d.get(kb, 0) == new.get(kb, 0), kb


def read_ptable_all(spark, path):
    from flnr_wins_spark.sources.ptable import read_ptable

    return read_ptable(spark, path).collect()


@given(
    vals=st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=200),
    n_parts=st.integers(min_value=1, max_value=6),
    k=st.integers(min_value=2, max_value=32),
)
@settings(max_examples=200, deadline=None)
def test_content_addressed_sample_mergeability(vals, n_parts, k):
    """The value-sample sidecar's core invariant, pure-Python model: for
    ANY partitioning of the values, the k hash-smallest of the union of
    per-partition k-hash-smallest (h, v) pairs equal the k hash-smallest
    over the whole table's distinct values — so the manifest-merged
    sample is EXACTLY the sample one global pass would produce."""
    import hashlib

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    parts = [set() for _ in range(n_parts)]
    for i, v in enumerate(vals):
        parts[i % n_parts].add(v)
    per = [
        sorted(((h60(v), v) for v in p))[:k] for p in parts if p
    ]
    merged = sorted({pair for sk in per for pair in sk})[:k]
    direct = sorted(((h60(v), v) for v in set(vals)))[:k]
    assert merged == direct


@given(
    data=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 3)),  # (value, partition)
        min_size=1, max_size=60,
    ),
    k=st.sampled_from([2, 3, 5]),
    threshold=st.sampled_from([2, 3, 6]),
)
@settings(max_examples=60, deadline=None)
def test_heavy_sidecar_merge_rule_exact(data, k, threshold):
    """merged_heavy_m's two exactness claims, property-checked without
    Spark against definition-conformant per-partition sidecars built
    with the same md5 content addressing:

      * every merged kmin count equals the brute-force global count
        (the hash-rank mergeability argument);
      * every hot value's [lb, lb+err] brackets its true count, with
        err == 0 whenever all containing partitions reported it.
    """
    import hashlib
    from collections import Counter

    from flnr_wins_spark.sources.ptable import merged_heavy_m

    def h60(v) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    parts: dict[str, Counter] = {}
    for v, p in data:
        parts.setdefault(str(p), Counter())[v] += 1
    heavy: dict = {}
    for pv, counts in parts.items():
        kmin = sorted(((h60(v), v, n) for v, n in counts.items()))[:k]
        hot = sorted(
            ((v, n) for v, n in counts.items() if n >= threshold),
            key=lambda e: (-e[1], str(e[0])),
        )
        heavy[pv] = {"k": {
            "kmin": [[h, v, n] for h, v, n in kmin],
            "hot": [[v, n] for v, n in hot],
        }}
    m = {
        "partitions": {pv: f"stage/m1/pb={pv}" for pv in parts},
        "heavy_cols": ["k"],
        "heavy_k": k,
        "heavy_threshold": threshold,
        "heavy": heavy,
    }
    kmin_merged, hot_merged = merged_heavy_m(m, "k")

    truth = Counter(v for v, _p in data)
    global_kmin = {v for _h, v in sorted((h60(v), v) for v in truth)[:k]}
    assert {v for v, _n in kmin_merged} == global_kmin
    for v, n in kmin_merged:
        assert n == truth[v], (v, n, truth[v])
    for v, (lb, err) in hot_merged.items():
        assert lb <= truth[v] <= lb + err, (v, lb, err, truth[v])
        # err == 0 exactly when EVERY partition reported v (hot or kmin);
        # a partition that merely lacks v still contributes error — the
        # merge cannot distinguish 'absent' from 'present below threshold'
        reported_everywhere = all(
            v in c
            and (
                c[v] >= threshold
                or v in {
                    vv for _h, vv, _n in
                    sorted(((h60(x), x, nn) for x, nn in c.items()))[:k]
                }
            )
            for c in parts.values()
        )
        assert (err == 0) == reported_everywhere, (v, err)
