"""Tests for round-4 ML-flavored operators: RRF fusion, k-NN
classification, hard-negative mining, weighted sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from flnr_wins_spark.functions.search import rrf_fuse
from flnr_wins_spark.functions.vectors import hard_negative_topk, knn_classify
from flnr_wins_spark.operators.sample import weighted_sample


def test_rrf_both_systems_beats_single(spark):
    lex = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    dense = spark.createDataFrame([(1, 3), (9, 1)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([lex, dense], k=10).collect()}
    assert out[1]["n_systems"] == 2
    # doc 1 (ranked by both) fuses above doc 9 (rank 1 in one system only)
    assert out[1]["rank"] < out[9]["rank"]
    assert abs(out[1]["rrf"] - (1 / 61 + 1 / 63)) < 1e-9


def test_knn_classify_separable_clusters(spark):
    train = [(i, [10.0, 0.0], 1) for i in range(100, 110)]
    train += [(i, [0.0, 10.0], 2) for i in range(200, 210)]
    test = [(1, [9.0, 1.0], None), (2, [1.0, 9.0], None)]
    df = spark.createDataFrame(
        train + test, "vec_id long, embedding array<double>, label int"
    )
    out = {r["id"]: r["pred_label"] for r in knn_classify(
        df.filter(F.col("vec_id") < 100), df.filter(F.col("vec_id") >= 100), k=3
    ).collect()}
    assert out == {1: 1, 2: 2}


def test_hard_negatives_exclude_same_label(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),
            (1, [0.99, 0.1], 1),   # same label: must never appear
            (2, [0.9, 0.2], 2),
            (3, [0.0, 1.0], 3),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    out = hard_negative_topk(df.filter(F.col("vec_id") == 0), df, k=2).collect()
    cands = [r["cand_id"] for r in out]
    assert 1 not in cands
    assert cands[0] == 2  # most similar different-label candidate first


def test_weighted_sample_prefers_heavy_rows(spark):
    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, "w", n=200, id_col="doc_id").collect()
    heavy = sum(1 for r in got if r["w"] == 100)
    assert heavy > 150  # 100x weight dominates the sample
    assert len(got) == 200


def test_weighted_sample_fractional_weights_not_collapsed(spark):
    """Advisor finding (r5): the DECIMAL(38,0) priority cast silently
    floored fractional weights — everything in (0, 0.5) collapsed to
    priority 0 and 1.4 vs 0.6 became indistinguishable. Fractional weight
    columns must route through the exact DECIMAL(38,6) numerator."""
    rows = [(i, 1.4 if i % 2 == 0 else 0.014) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "w", n=200, id_col="doc_id").collect()
    assert len(got) == 200
    heavy = sum(1 for r in got if r["w"] > 1.0)
    assert heavy > 150  # 100x weight dominates, exactly like the int path
    assert all(r["pri_q"] > 0 for r in got)  # no floor-to-zero collapse
    # sub-integer distinctions survive: 1.4 vs 0.6 weights produce
    # different priorities for the same id-hash
    a = weighted_sample(
        spark.createDataFrame([(7, 1.4)], "doc_id long, w double"), "w", n=1
    ).collect()[0]["pri_q"]
    b = weighted_sample(
        spark.createDataFrame([(7, 0.6)], "doc_id long, w double"), "w", n=1
    ).collect()[0]["pri_q"]
    assert a != b and a > b


def test_weighted_sample_excludes_nonpositive_and_is_stable(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 10)], "doc_id long, w long"
    )
    a = weighted_sample(df, "w", n=10).collect()
    b = weighted_sample(df.repartition(5), "w", n=10).collect()
    assert {r["doc_id"] for r in a} == {3, 4}
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# Real PNG codec (functions/multimodal.py round-4 addition)
# ---------------------------------------------------------------------------

def test_png_roundtrip_every_filter_type():
    from flnr_wins_spark.functions.multimodal import decode_image, encode_png

    import zlib as _z  # noqa: F401  (stdlib presence is the point)

    px = bytes((r * 37 + c * 11) % 256 for r in range(6) for c in range(5 * 3))
    # cycle filters 0-4 across 6 rows: every unfilter path executes
    data = encode_png(3, 5, 6, px, filter_cycle=True)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    ch, w, h, out = decode_image(data)
    assert (ch, w, h) == (3, 5, 6)
    assert out == px
    # and the all-None-filter variant too
    ch, w, h, out = decode_image(encode_png(3, 5, 6, px, filter_cycle=False))
    assert out == px


def test_png_grayscale_roundtrip():
    from flnr_wins_spark.functions.multimodal import decode_image, encode_png

    px = bytes(range(64))
    ch, w, h, out = decode_image(encode_png(1, 8, 8, px))
    assert (ch, w, h) == (1, 8, 8)
    assert out == px


def test_png_unsupported_color_type_raises():
    import pytest

    from flnr_wins_spark.functions.multimodal import decode_image, encode_png

    data = bytearray(encode_png(1, 2, 2, bytes(4)))
    # IHDR body starts at offset 16; color type is its 10th byte (offset 25).
    data[25] = 3  # palette
    # CRC now wrong too, but color type is checked during the chunk walk
    with pytest.raises((NotImplementedError, ValueError)):
        decode_image(bytes(data))


def test_feature_hash_embed_integer_and_stable(spark):
    from flnr_wins_spark.functions.vectors import feature_hash_embed

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma")], "doc_id long, text string"
    )
    a = {r["id"]: r["emb"] for r in feature_hash_embed(df, dim=4).collect()}
    b = {r["id"]: r["emb"] for r in feature_hash_embed(df.repartition(5), dim=4).collect()}
    assert a == b
    assert all(len(v) == 4 for v in a.values())
    # bag semantics: each of doc 1's 3 token occurrences contributes ±1,
    # so every component is an odd integer in [-3, 3]
    assert all(v == int(v) and abs(v) <= 3 and int(v) % 2 == 1 for v in a[1])


def test_rag_chunks_retrieval_finds_query_phrase(spark):
    from flnr_wins_spark.functions.vectors import (
        brute_force_topk,
        feature_hash_embed,
    )
    from flnr_wins_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, "zig zag zoom " * 30), (2, "aa bb cc " * 30)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, "text", "doc_id", chunk_tokens=16, overlap=4).select(
        F.concat_ws(":", "doc_id", "chunk_idx").alias("cid"), "chunk_text"
    )
    cemb = feature_hash_embed(chunks, text_col="chunk_text", id_col="cid")
    q = spark.createDataFrame([("q", "zig zag zoom")], "cid string, chunk_text string")
    qemb = feature_hash_embed(q, text_col="chunk_text", id_col="cid")
    top = brute_force_topk(qemb, cemb, k=3, query_id="id", cand_id="id", vec_col="emb").collect()
    assert all(r["cand_id"].startswith("1:") for r in top)  # doc-1 chunks win


def test_gif_lzw_roundtrip_with_dictionary_reset():
    from flnr_wins_spark.functions.multimodal import (
        _lzw_decode,
        _lzw_encode,
        decode_image,
        encode_gif,
    )

    # enough distinct phrases to fill the 4096-entry dict and force a CLEAR
    idx = bytes((i * 31 + (i >> 3)) % 256 for i in range(6000))
    assert _lzw_decode(_lzw_encode(idx, 8), 8, len(idx)) == list(idx)
    pal = b"".join(bytes([i, (i * 7) % 256, (i * 13) % 256]) for i in range(256))
    small = idx[:49]
    ch, w, h, px = decode_image(encode_gif(7, 7, small, pal))
    assert (ch, w, h) == (3, 7, 7)
    assert px == b"".join(pal[3 * i : 3 * i + 3] for i in small)


def test_gif_interlaced_decodes_to_same_pixels():
    """An interlaced encode of the same pixels must decode identically to
    the progressive one — the four-pass appendix-E deinterleave is a pure
    row permutation. Heights exercise every pass-boundary shape (h<8 has
    empty later passes; odd h; h=1 is pass-4-only ... no: h=1 is pass 1
    row 0 only)."""
    from flnr_wins_spark.functions.multimodal import decode_image, encode_gif

    pal = b"".join(bytes([i, (i * 7) % 256, (i * 13) % 256]) for i in range(256))
    for w, h in ((5, 13), (4, 8), (3, 1), (2, 2), (7, 9)):
        idx = bytes((r * w + c) * 29 % 256 for r in range(h) for c in range(w))
        plain = decode_image(encode_gif(w, h, idx, pal))
        inter = decode_image(encode_gif(w, h, idx, pal, interlace=True))
        assert inter == plain, (w, h)
        # and the interlaced stream really is permuted on the wire: the
        # two encodes differ whenever the permutation is non-identity
        if h > 2:
            assert encode_gif(w, h, idx, pal, interlace=True) != encode_gif(
                w, h, idx, pal
            )


def test_gif_deinterlace_rejects_short_pixel_stream():
    """r13 ADVICE: a truncated/corrupt LZW stream yielding fewer than
    width*height indices must be a loud ValueError in the interlaced
    path — the row-scatter's slice assignment would otherwise shrink the
    buffer and silently shift every later display row (unlike the
    progressive path's graceful tail degradation)."""
    import pytest

    from flnr_wins_spark.functions.multimodal import _gif_deinterlace

    with pytest.raises(ValueError, match="truncated or corrupt"):
        _gif_deinterlace(list(range(11)), 3, 4)  # 11 < 12
    with pytest.raises(ValueError, match="truncated or corrupt"):
        _gif_deinterlace(list(range(13)), 3, 4)  # surplus is corrupt too
    assert len(_gif_deinterlace(list(range(12)), 3, 4)) == 12


def test_gif_local_color_table_overrides_global():
    from flnr_wins_spark.functions.multimodal import decode_image, encode_gif

    pal = b"".join(bytes([i, 255 - i, (i * 3) % 256]) for i in range(256))
    idx = bytes(range(16))
    # local-table-only file (no global table at all)
    ch, w, h, px = decode_image(encode_gif(4, 4, idx, pal, local_palette=True))
    assert (ch, w, h) == (3, 4, 4)
    assert px == b"".join(pal[3 * i : 3 * i + 3] for i in idx)
    # interlace + local table together
    assert decode_image(
        encode_gif(4, 4, idx, pal, interlace=True, local_palette=True)
    ) == (ch, w, h, px)


def test_mulaw_expansion_reference_values():
    from flnr_wins_spark.functions.multimodal import _mulaw_expand

    # ITU-T G.711 table anchors
    assert _mulaw_expand(0x00) == -32124   # most negative
    assert _mulaw_expand(0x80) == 32124    # most positive
    assert _mulaw_expand(0xFF) == 0
    assert _mulaw_expand(0x7F) == 0
    # symmetry: clearing the sign bit negates
    for u in (0x05, 0x33, 0x61, 0x70):
        assert _mulaw_expand(u) == -_mulaw_expand(u | 0x80)


def test_mulaw_wav_decodes():
    from flnr_wins_spark.functions.multimodal import _mulaw_expand, decode_wav

    hdr = bytes.fromhex(
        "524946463c00000057415645666d7420100000000700"
        "0100401f0000401f0000010008006461746120000000"
    )
    payload = bytes(range(32))
    ch, rate, ss = decode_wav(hdr + payload)
    assert (ch, rate) == (1, 8000)
    assert ss == [_mulaw_expand(b) for b in payload]


_GIF_PAL = b"".join(bytes([i, (i * 7) % 256, (i * 13) % 256]) for i in range(256))


def _rgb(indices):
    return b"".join(_GIF_PAL[3 * i : 3 * i + 3] for i in indices)


def test_animated_gif_roundtrip_and_bounds_guard():
    import pytest

    from flnr_wins_spark.functions.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    frames = [bytes((i * k + 3) % 256 for i in range(16)) for k in range(1, 4)]
    g = encode_gif_animated(4, 4, frames, _GIF_PAL)
    dec = decode_gif_frames(g)
    assert [px for _, _, px in dec] == [_rgb(f) for f in frames]
    # a frame rect running past the logical screen is a loud ValueError
    # (r14: offsets COMPOSE now; out-of-bounds is the remaining refusal).
    # NB: find the image DESCRIPTOR 0x2c, not the first 0x2c byte — the
    # palette contains one (color index 44).
    bad = bytearray(g)
    pos = 6 + 7 + 768 + 19  # header + LSD + palette + NETSCAPE ext
    assert bad[pos] == 0x21 and bad[pos + 1] == 0xF9  # frame-0 GCE
    pos += 8  # GCE is 8 bytes: 21 f9 04 <4 data> 00
    assert bad[pos] == 0x2C
    bad[pos + 1] = 1  # left=1 with width=4 on a 4-wide screen
    with pytest.raises(ValueError, match="exceeds"):
        decode_gif_frames(bytes(bad))


def test_animated_gif_partial_update_composition():
    """r13 VERDICT task 4: partial-update frames compose over the canvas —
    offset rects, per-pixel transparency, disposal 1 (keep), 2 (restore
    rect to background), 3 (restore to previous). Expectations are
    hand-composed index canvases, independently of the decoder."""
    import pytest

    from flnr_wins_spark.functions.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    base = bytes(range(16))  # frame 0: full 4x4

    def compose(canvas, rect, left, top, w, h, transparent=None):
        out = bytearray(canvas)
        for r in range(h):
            for c in range(w):
                v = rect[r * w + c]
                if transparent is not None and v == transparent:
                    continue
                out[(top + r) * 4 + left + c] = v
        return bytes(out)

    # frame 1: 2x2 rect at (1,2), value 200 with one transparent pixel
    rect1 = bytes([200, 99, 201, 202])  # 99 = transparent
    f1 = compose(base, rect1, 1, 2, 2, 2, transparent=99)
    # disposal 1 on frame 1, then a fully-transparent probe frame 2:
    # canvas unchanged => probe shows f1
    g = encode_gif_animated(
        4, 4, [base, rect1, bytes([0])], _GIF_PAL,
        controls=[
            None,
            {"left": 1, "top": 2, "width": 2, "height": 2,
             "disposal": 1, "transparent": 99},
            {"left": 0, "top": 0, "width": 1, "height": 1,
             "disposal": 1, "transparent": 0},
        ],
    )
    dec = decode_gif_frames(g)
    assert [(w, h) for w, h, _ in dec] == [(4, 4)] * 3
    assert dec[0][2] == _rgb(base)
    assert dec[1][2] == _rgb(f1)
    assert dec[2][2] == _rgb(f1)  # disposal 1 kept the composed canvas

    # disposal 2: frame 1's rect restores to the BACKGROUND color
    # (background index 0 -> palette entry 0) before the probe
    g2 = encode_gif_animated(
        4, 4, [base, rect1, bytes([0])], _GIF_PAL,
        controls=[
            None,
            {"left": 1, "top": 2, "width": 2, "height": 2,
             "disposal": 2, "transparent": 99},
            {"left": 0, "top": 0, "width": 1, "height": 1,
             "disposal": 1, "transparent": 0},
        ],
    )
    dec2 = decode_gif_frames(g2)
    assert dec2[1][2] == _rgb(f1)
    restored = compose(f1, bytes([0, 0, 0, 0]), 1, 2, 2, 2)
    assert dec2[2][2] == _rgb(restored)

    # disposal 3: canvas restores to the PRE-frame state
    g3 = encode_gif_animated(
        4, 4, [base, rect1, bytes([0])], _GIF_PAL,
        controls=[
            None,
            {"left": 1, "top": 2, "width": 2, "height": 2,
             "disposal": 3, "transparent": 99},
            {"left": 0, "top": 0, "width": 1, "height": 1,
             "disposal": 1, "transparent": 0},
        ],
    )
    dec3 = decode_gif_frames(g3)
    assert dec3[1][2] == _rgb(f1)
    assert dec3[2][2] == _rgb(base)

    # reserved disposal methods stay loud
    raw = bytearray(g)
    pos = 6 + 7 + 768 + 19
    assert raw[pos + 1] == 0xF9
    raw[pos + 3] = 4 << 2  # disposal 4 (reserved)
    with pytest.raises(ValueError, match="reserved GIF disposal"):
        decode_gif_frames(bytes(raw))


def test_delta_gif_controls_reproduce_full_frames():
    """delta_gif_controls re-expresses frames 1..n-1 as bounding-rect
    deltas with transparency; composed decode must equal the full-frame
    decode EXACTLY — including an identical consecutive frame (degenerate
    1x1 fully-transparent rect)."""
    from flnr_wins_spark.functions.multimodal import (
        decode_gif_frames,
        delta_gif_controls,
        encode_gif_animated,
    )

    w, h = 5, 3
    f0 = bytes((7 * i + 1) % 256 for i in range(15))
    f1 = bytearray(f0)
    f1[6] = 250  # single-pixel change
    f2 = bytearray(f1)
    f2[0] = 13
    f2[14] = 98  # far corners: bbox = whole frame, interior unchanged
    frames = [f0, bytes(f1), bytes(f1), bytes(f2)]  # includes an identical pair

    dframes, controls = delta_gif_controls(w, h, [bytes(f) for f in frames])
    assert controls[1]["width"] == 1 and controls[1]["height"] == 1
    assert dframes[2] == b"\x00"  # identical frame degenerates
    assert controls[3]["width"] == w and controls[3]["height"] == h
    assert controls[3]["transparent"] is not None

    full = decode_gif_frames(encode_gif_animated(w, h, [bytes(f) for f in frames], _GIF_PAL))
    delta = decode_gif_frames(
        encode_gif_animated(w, h, dframes, _GIF_PAL, controls=controls)
    )
    assert full == delta


class TestMmrRerank:
    def test_diversity_beats_pure_relevance(self, spark):
        """Two near-identical high-relevance vectors: MMR must pick only one
        of them before moving to a diverse lower-relevance item."""
        from flnr_wins_spark.functions.vectors import mmr_rerank

        cands = spark.createDataFrame(
            [
                (1, [1.0, 0.0], 0.99),
                (2, [0.999, 0.01], 0.98),   # near-dup of 1
                (3, [0.0, 1.0], 0.50),      # orthogonal, diverse
            ],
            "id bigint, v array<double>, rel double",
        )
        out = {r.sel_rank: r.id for r in mmr_rerank(cands, k=2, lam=0.6, id_col="id").collect()}
        assert out[1] == 1      # highest relevance first
        assert out[2] == 3      # diversity wins over the near-dup

    def test_k_larger_than_pool(self, spark):
        from flnr_wins_spark.functions.vectors import mmr_rerank

        cands = spark.createDataFrame(
            [(1, [1.0, 0.0], 0.9), (2, [0.0, 1.0], 0.8)],
            "id bigint, v array<double>, rel double",
        )
        out = mmr_rerank(cands, k=5, id_col="id").collect()
        assert sorted(r.id for r in out) == [1, 2]
        assert sorted(r.sel_rank for r in out) == [1, 2]

    def test_empty_pool_returns_empty(self, spark):
        from flnr_wins_spark.functions.vectors import mmr_rerank

        cands = spark.createDataFrame([], "id bigint, v array<double>, rel double")
        out = mmr_rerank(cands, k=3, id_col="id")
        assert out.count() == 0
        assert out.columns == ["sel_rank", "id", "mmr_score"]


class TestCorpusMixture:
    def test_sqrt_temperature_upweights_small_sources(self, spark):
        from flnr_wins_spark.operators.sample import corpus_mixture

        rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = corpus_mixture(df, "lang", n=100, id_col="doc_id").collect()
        got = {}
        for r in out:
            got[r.lang] = got.get(r.lang, 0) + 1
        assert sum(got.values()) == 100
        # proportional would give small 10; sqrt tempering gives
        # 100*sqrt(100)/(sqrt(900)+sqrt(100)) = 25
        assert got["small"] == 25 and got["big"] == 75

    def test_small_source_contributes_everything_no_redistribution(self, spark):
        from flnr_wins_spark.operators.sample import corpus_mixture

        rows = [(i, "big") for i in range(400)] + [(900 + i, "tiny") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = corpus_mixture(df, "lang", n=100, id_col="doc_id").collect()
        got = {}
        for r in out:
            got[r.lang] = got.get(r.lang, 0) + 1
        # tiny's sqrt quota (100*2/22 = 9) exceeds its 4 docs: it gives all 4,
        # and the shortfall is NOT redistributed
        assert got["tiny"] == 4
        assert sum(got.values()) < 100

    def test_deterministic_across_partitionings(self, spark):
        from flnr_wins_spark.operators.sample import corpus_mixture

        rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(600)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        a = sorted(map(tuple, corpus_mixture(df, "lang", n=90).collect()))
        b = sorted(map(tuple, corpus_mixture(df.repartition(13), "lang", n=90).collect()))
        assert a == b and len(a) == 90

    def test_unsupported_temperature_rejected(self, spark):
        import pytest

        from flnr_wins_spark.operators.sample import corpus_mixture

        df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
        with pytest.raises(ValueError, match="temperature"):
            corpus_mixture(df, "lang", n=1, temperature=1.7)


# ---------------------------------------------------------------------------
# Cross-encoder-style reranker (functions/search.py round-6 addition)
# ---------------------------------------------------------------------------

def test_cross_rerank_phrase_signal_beats_bag_of_words(spark):
    """The reranker's reason to exist: two docs with IDENTICAL term
    overlap, but one contains the query words ADJACENT (phrase hit) —
    the phrase feature must rank it first, which no bag-of-words
    first-stage score can do."""
    from flnr_wins_spark.functions.search import cross_rerank

    queries = spark.createDataFrame(
        [(0, "fast spark engine")], "query_id long, q_text string"
    )
    docs = spark.createDataFrame(
        [
            (10, "the fast spark engine wins the race today"),   # adjacent
            (11, "engine parts spark when the fast car brakes"), # scattered
            (12, "nothing relevant here at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    out = cross_rerank(queries, docs, k=3).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked[0] == 10 and 12 not in ranked
    s = {r.doc_id: r.score for r in out}
    assert s[10] > s[11]  # same overlap, phrase hits decide


def test_cross_rerank_k_bounded_and_deterministic(spark):
    from flnr_wins_spark.functions.search import cross_rerank

    queries = spark.createDataFrame(
        [(0, "alpha beta gamma")], "query_id long, q_text string"
    )
    docs = spark.createDataFrame(
        [(i, f"alpha beta filler{i} gamma extra words") for i in range(30)],
        "doc_id long, text string",
    )
    a = cross_rerank(queries, docs, k=5).collect()
    b = cross_rerank(queries, docs.repartition(7), k=5).collect()
    assert len(a) == 5
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cross_rerank_query_side_broadcasts(spark):
    """Plan contract: the query side (and the query-vocab df/idf frames)
    must broadcast — the corpus side may never shuffle into a join with
    a handful of queries."""
    from flnr_wins_spark.functions.search import cross_rerank

    queries = spark.createDataFrame(
        [(0, "alpha beta")], "query_id long, q_text string"
    )
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(50)],
        "doc_id long, text string",
    )
    plan = cross_rerank(queries, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_target_encode_oof_keeps_null_category(spark):
    """Review finding (r6): the category joins were plain equi-joins, so
    NULL-category rows silently vanished from the output. NULL is its own
    category level — rows must survive with a well-defined encoding."""
    from flnr_wins_spark.operators.split import target_encode_oof

    rows = [(i, None if i % 3 == 0 else f"c{i % 2}", float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = target_encode_oof(df, "cat", "y", "id", k=3, prior_weight=5)
    got = out.collect()
    assert len(got) == 60  # nothing dropped
    nulls = [r for r in got if r.cat is None]
    assert len(nulls) == 20
    assert all(r.enc is not None for r in got)
    # determinism across partitionings
    b = target_encode_oof(df.repartition(7), "cat", "y", "id", k=3, prior_weight=5)
    assert sorted(map(tuple, got)) == sorted(map(tuple, b.collect()))


def test_cross_rerank_one_word_query_has_no_bigrams(spark):
    """Review finding (r6): sequence(1, 0) is DESCENDING in Spark, so a
    one-word query built bigrams over [1, 0] and crashed on
    element_at(arr, 0). Guarded: zero phrase hits, overlap/idf still
    score."""
    from flnr_wins_spark.functions.search import cross_rerank

    queries = spark.createDataFrame([(0, "alpha")], "query_id long, q_text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    out = cross_rerank(queries, docs, k=5).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].score > 0


def test_ranking_metrics_perfect_and_empty_rankings(spark):
    from flnr_wins_spark.functions.search import ranking_metrics

    # q0: perfect ranking (both relevant docs at ranks 1-2);
    # q1: zero hits in the top k
    results = spark.createDataFrame(
        [(0, 100, 1), (0, 101, 2), (0, 102, 3),
         (1, 200, 1), (1, 201, 2)],
        "query_id long, cand_id long, rank long",
    )
    labels = spark.createDataFrame(
        [(0, 100), (0, 101), (1, 999)], "query_id long, cand_id long"
    )
    got = {r.query_id: r for r in ranking_metrics(results, labels, k=10).collect()}
    assert got[0].recall_k == 1.0 and got[0].mrr == 1.0
    assert got[0].ndcg == 1.0  # perfect packing: dcg == ideal exactly
    assert got[0].dcg_e9 == got[0].ideal_e9
    assert got[1].hits_k == 0 and got[1].recall_k == 0.0
    assert got[1].mrr == 0.0 and got[1].ndcg == 0.0


def test_binary_hamming_topk_exact_when_rerank_covers_corpus(spark):
    """With rerank >= corpus size the hamming stage prunes nothing, so
    the final top-k must equal exact brute-force cosine top-k (same ids,
    same ranks, same cosines); hamming stays in [0, 64] and the plan
    stays JVM-side with the query side broadcast."""
    import random

    from flnr_wins_spark.functions.vectors import (
        binary_hamming_topk,
        brute_force_topk,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 3)
    got = binary_hamming_topk(queries, emb, k=4, rerank=30)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan
    g = {(r.query_id, r.rank): (r.cand_id, r.cosine, r.hamming) for r in got.collect()}
    want = brute_force_topk(queries, emb, k=4)
    w = {(r.query_id, r.rank): (r.cand_id, r.cosine) for r in want.collect()}
    assert set(g) == set(w)
    for key, (cid, cos, ham) in g.items():
        assert (cid, cos) == w[key]
        assert 0 <= ham <= 64


def test_binary_hamming_topk_zero_and_negative_sign_bits(spark):
    """Sign packing: zeros and negatives are 0-bits, positives 1-bits —
    an all-positive vector packs both halves to 2^32-1, an all-negative
    or all-zero vector to 0, and hamming between them is 64."""
    from flnr_wins_spark.functions.vectors import binary_hamming_topk

    rows = [
        (0, [1.0] * 64),
        (1, [-1.0] * 64),
        (2, [0.0] * 32 + [1.0] * 32),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = binary_hamming_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=2, rerank=3
    ).collect()
    ham = {r.cand_id: r.hamming for r in out}
    assert ham[1] == 64  # all bits differ
    assert ham[2] == 32  # the zero half differs from all-ones


def test_binary_hamming_topk_sub_64_dims(spark):
    """Vectors shorter than 64 dims must follow the documented contract
    — bits past the vector length read NULL -> 0 — instead of raising
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark's default ANSI mode
    (r11 ADVICE: element_at -> try_element_at in _sign_pack_half). A
    32-dim all-positive vector packs lo=2^32-1, hi=0, so against a
    32-dim all-negative vector the hamming is exactly 32."""
    from flnr_wins_spark.functions.vectors import binary_hamming_topk

    rows = [
        (0, [1.0] * 32),
        (1, [-1.0] * 32),
        (2, [1.0] * 16 + [-1.0] * 16),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = binary_hamming_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=2, rerank=3
    ).collect()
    ham = {r.cand_id: r.hamming for r in out}
    assert ham[1] == 32  # only the 32 real bits differ; padding bits agree
    assert ham[2] == 16


def test_gif_frames_decoder_handles_interlace_and_local_tables():
    """decode_gif_frames shares the interlace/local-table paths: a
    single-frame interlaced, local-table-only GIF decodes to the same
    frame the plain decoder returns for the progressive encode."""
    from flnr_wins_spark.functions.multimodal import (
        decode_gif_frames,
        decode_image,
        encode_gif,
    )

    pal = b"".join(bytes([i, (i * 11) % 256, (i * 5) % 256]) for i in range(256))
    idx = bytes((i * 37) % 256 for i in range(6 * 10))
    _ch, w, h, px = decode_image(encode_gif(6, 10, idx, pal))
    frames = decode_gif_frames(
        encode_gif(6, 10, idx, pal, interlace=True, local_palette=True)
    )
    assert frames == [(w, h, px)]


def test_ppm16_decode_rounds_exactly():
    """16-bit PPM/PGM (r14: previously an honest guard): 2-byte
    big-endian samples downconvert by exact integer rounding
    round(s*255/maxval); byte-doubled samples at maxval 65535 are
    lossless (s8*257 -> s8). Loud guards: truncation, sample > maxval,
    maxval outside 1..65535."""
    import pytest

    from flnr_wins_spark.functions.multimodal import decode_image

    vals = [0, 1, 7, 128, 254, 255]
    raster = b"".join(bytes([v, v]) for v in vals)  # s8*257 big-endian
    assert decode_image(b"P5\n3 2\n65535\n" + raster) == (1, 3, 2, bytes(vals))

    samples = [0, 2, 499, 500, 998, 1000]
    raster = b"".join(s.to_bytes(2, "big") for s in samples)
    ch, w, h, px = decode_image(b"P5\n6 1\n1000\n" + raster)
    assert px == bytes((s * 255 + 500) // 1000 for s in samples)

    rgb = [65535, 0, 32768]
    raster = b"".join(s.to_bytes(2, "big") for s in rgb)
    ch, w, h, px = decode_image(b"P6\n1 1\n65535\n" + raster)
    assert (ch, w, h) == (3, 1, 1)
    assert px == bytes((s * 255 + 32767) // 65535 for s in rgb)

    with pytest.raises(ValueError, match="truncated raster"):
        decode_image(b"P5\n3 2\n65535\n" + b"\x00" * 11)
    with pytest.raises(ValueError, match="exceeds maxval"):
        decode_image(b"P5\n1 1\n300\n" + (301).to_bytes(2, "big"))
    with pytest.raises(ValueError, match="maxval"):
        decode_image(b"P5\n1 1\n70000\n" + b"\x00\x00")


def test_gif_noninterlaced_truncated_stream_raises():
    """r14 ADVICE: a truncated LZW stream in a NON-interlaced frame must
    surface as the same descriptive ValueError the interlaced path raises,
    not a bare IndexError mid-composition. Fixture: a 2x2-encoded frame
    whose descriptor (and logical screen) are widened to 4x4, so the LZW
    stream yields 4 of the 16 needed indices."""
    import pytest

    from flnr_wins_spark.functions.multimodal import (
        decode_gif_frames,
        encode_gif_animated,
    )

    g = bytearray(encode_gif_animated(2, 2, [bytes([1, 2, 3, 4])], _GIF_PAL))
    g[6:8] = (4).to_bytes(2, "little")
    g[8:10] = (4).to_bytes(2, "little")
    pos = 6 + 7 + 768 + 19 + 8  # header+LSD+palette+NETSCAPE+GCE
    assert g[pos] == 0x2C
    g[pos + 5 : pos + 7] = (4).to_bytes(2, "little")
    g[pos + 7 : pos + 9] = (4).to_bytes(2, "little")
    with pytest.raises(ValueError, match="needs 16"):
        decode_gif_frames(bytes(g))
