"""Baseline JPEG codec tests (functions/jpeg.py).

No reference decoder exists in this container (no PIL/cv2/scipy), so the
evidence is layered the way the PNG/GIF/QOI codecs pin theirs:
  * DC-only streams decode to EXACTLY the integer-math prediction the
    oracle entry uses (all 256 gray levels);
  * smooth images round-trip within a small quantization bound (a
    transposed IDCT, wrong zigzag, or Huffman slip blows these up);
  * restart markers, subsampling, odd dimensions, and determinism;
  * honest guards for progressive/unknown streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from flnr_wins_spark.functions.jpeg import (
    QUANT_LUMA,
    decode_jpeg,
    encode_jpeg,
)


def _rha(x: float) -> int:
    return int(np.floor(x + 0.5)) if x >= 0 else -int(np.floor(-x + 0.5))


def _dc_only_value(g: int) -> int:
    """The oracle's closed form for a flat 8x8 tile of gray g."""
    dc = _rha(8 * (g - 128) / QUANT_LUMA[0])
    return max(0, min(255, 2 * dc + 128))


class TestDcOnlyExactness:
    def test_every_gray_level_decodes_to_the_integer_prediction(self):
        for g in range(256):
            img = np.full((8, 8), g, dtype=np.uint8)
            ch, w, h, px = decode_jpeg(encode_jpeg(8, 8, img.tobytes(), channels=1))
            assert (ch, w, h) == (1, 8, 8)
            assert set(px) == {_dc_only_value(g)}, f"gray {g}"

    def test_four_tile_image_matches_per_tile_prediction(self):
        tiles = [0, 255, 37, 200]
        img = np.zeros((16, 16), dtype=np.uint8)
        img[:8, :8], img[:8, 8:] = tiles[0], tiles[1]
        img[8:, :8], img[8:, 8:] = tiles[2], tiles[3]
        ch, w, h, px = decode_jpeg(encode_jpeg(16, 16, img.tobytes(), channels=1))
        out = np.frombuffer(px, dtype=np.uint8).reshape(16, 16)
        assert set(out[:8, :8].flat) == {_dc_only_value(tiles[0])}
        assert set(out[:8, 8:].flat) == {_dc_only_value(tiles[1])}
        assert set(out[8:, :8].flat) == {_dc_only_value(tiles[2])}
        assert set(out[8:, 8:].flat) == {_dc_only_value(tiles[3])}


class TestRoundTripBounds:
    def test_smooth_gray_gradient(self):
        img = np.clip(np.add.outer(np.arange(24) * 4, np.arange(32) * 3), 0, 255)
        img = img.astype(np.uint8)
        ch, w, h, px = decode_jpeg(encode_jpeg(32, 24, img.tobytes(), channels=1))
        assert (ch, w, h) == (1, 32, 24)
        out = np.frombuffer(px, dtype=np.uint8).reshape(24, 32).astype(int)
        assert np.abs(out - img.astype(int)).max() <= 8

    @pytest.mark.parametrize("sub", ["444", "420"])
    def test_smooth_color(self, sub):
        base = np.clip(np.add.outer(np.arange(16) * 6, np.arange(16) * 5), 0, 255)
        img = np.stack([base, 255 - base, np.full((16, 16), 100)], axis=2)
        img = img.astype(np.uint8)
        ch, w, h, px = decode_jpeg(
            encode_jpeg(16, 16, img.tobytes(), channels=3, subsampling=sub)
        )
        assert (ch, w, h) == (3, 16, 16)
        out = np.frombuffer(px, dtype=np.uint8).reshape(16, 16, 3).astype(int)
        # 4:2:0 averages then replicates chroma, so its bound is looser
        assert np.abs(out - img.astype(int)).max() <= (10 if sub == "444" else 24)

    def test_odd_dimensions_crop_back(self):
        rng = np.random.RandomState(11)
        img = np.clip(
            np.add.outer(np.arange(13) * 5, np.arange(11) * 7)
            + rng.randint(0, 8, (13, 11)),
            0,
            255,
        ).astype(np.uint8)
        ch, w, h, px = decode_jpeg(encode_jpeg(11, 13, img.tobytes(), channels=1))
        assert (ch, w, h) == (1, 11, 13)
        assert len(px) == 11 * 13

    def test_restart_markers_do_not_change_pixels(self):
        img = np.clip(np.add.outer(np.arange(24) * 7, np.arange(24) * 2), 0, 255)
        img = img.astype(np.uint8)
        plain = decode_jpeg(encode_jpeg(24, 24, img.tobytes(), channels=1))
        rst = decode_jpeg(
            encode_jpeg(24, 24, img.tobytes(), channels=1, restart_interval=2)
        )
        assert plain == rst

    def test_encode_is_deterministic(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        a = encode_jpeg(16, 16, img.tobytes(), channels=3, subsampling="420")
        b = encode_jpeg(16, 16, img.tobytes(), channels=3, subsampling="420")
        assert a == b


class TestProgressive:
    """Progressive (SOF2) streams must decode to pixels BYTE-IDENTICAL to
    the baseline stream of the same image: both encoders start from the
    same quantized coefficients, so any DC-first/refine, spectral-band,
    EOB-run, or AC-refinement slip shows up as a pixel diff."""

    @pytest.mark.parametrize(
        "name,ch,sub,shape",
        [
            ("gray-even", 1, "444", (16, 16)),
            ("gray-odd", 1, "444", (11, 13)),
            ("color-444", 3, "444", (16, 16)),
            ("color-420", 3, "420", (20, 12)),
        ],
    )
    def test_matches_baseline_on_noise(self, name, ch, sub, shape):
        from flnr_wins_spark.functions.jpeg import encode_jpeg_progressive

        rng = np.random.RandomState(hash(name) % 2**31)
        w, h = shape
        arr = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        pix = arr.tobytes()
        base = decode_jpeg(encode_jpeg(w, h, pix, channels=ch, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(w, h, pix, channels=ch, subsampling=sub)
        )
        assert base == prog

    def test_matches_baseline_on_smooth_image(self):
        # smooth high-band-sparse content drives cross-block EOB runs
        from flnr_wins_spark.functions.jpeg import encode_jpeg_progressive

        img = np.clip(np.add.outer(np.arange(24) * 4, np.arange(32) * 3), 0, 255)
        pix = img.astype(np.uint8).tobytes()
        assert decode_jpeg(encode_jpeg(32, 24, pix, channels=1)) == decode_jpeg(
            encode_jpeg_progressive(32, 24, pix, channels=1)
        )

    def test_matches_baseline_on_lone_high_frequency(self):
        # a single high-zigzag coefficient forces run > 15 before the new
        # nonzero — the ZRL path in both AC-first and AC-refinement scans
        from flnr_wins_spark.functions.jpeg import _C, encode_jpeg_progressive

        for amp in (150, 220, 300, 450):
            S = np.zeros((8, 8))
            S[7, 0] = amp  # natural index 56 = zigzag position 31
            spatial = _C.T @ S @ _C
            img = np.clip(np.floor(spatial + 128.5), 0, 255).astype(np.uint8)
            pix = np.tile(img, (2, 2)).tobytes()
            base = decode_jpeg(encode_jpeg(16, 16, pix, channels=1))
            prog = decode_jpeg(encode_jpeg_progressive(16, 16, pix, channels=1))
            assert base == prog, amp

    def test_dc_only_construction_still_exact(self):
        # progressive DC first+refine reconstructs the same DC the integer
        # oracle predicts
        from flnr_wins_spark.functions.jpeg import encode_jpeg_progressive

        for g in (0, 37, 128, 200, 255):
            img = np.full((8, 8), g, dtype=np.uint8)
            ch, w, h, px = decode_jpeg(
                encode_jpeg_progressive(8, 8, img.tobytes(), channels=1)
            )
            assert set(px) == {_dc_only_value(g)}, g


class TestGuards:
    def test_arithmetic_coded_raises(self):
        with pytest.raises(NotImplementedError, match="SOF"):
            decode_jpeg(b"\xff\xd8\xff\xc9\x00\x0b" + bytes(9))

    def test_non_jpeg_raises(self):
        with pytest.raises(NotImplementedError):
            decode_jpeg(b"notajpeg")

    def test_bad_pixel_buffer_rejected(self):
        with pytest.raises(ValueError):
            encode_jpeg(8, 8, b"\x00" * 10, channels=1)

    def test_decode_image_dispatches_jpeg(self):
        from flnr_wins_spark.functions.multimodal import decode_image

        img = np.full((8, 8), 99, dtype=np.uint8)
        ch, w, h, px = decode_image(encode_jpeg(8, 8, img.tobytes(), channels=1))
        assert (ch, w, h) == (1, 8, 8)
        assert set(px) == {_dc_only_value(99)}


class TestSparkPlumbing:
    def test_wrap_jpeg_extract_features_roundtrip(self, spark):
        from flnr_wins_spark.functions.jpeg import wrap_jpeg
        from flnr_wins_spark.functions.multimodal import extract_features
        from pyspark.sql import functions as F

        rows = [(i, bytes([10 * i + j for j in range(4)] * 64)) for i in range(6)]
        media = spark.createDataFrame(
            rows, "media_id long, content binary"
        ).withColumn("meta", F.struct(F.lit("image/jpeg").alias("mime")))
        feats = extract_features(wrap_jpeg(media, 1, 16, 16), fake=False).collect()
        assert len(feats) == 6
        for r in feats:
            f = r["feature"]
            assert (f[0], f[1], f[2]) == (1.0, 16.0, 16.0)
            assert 0.0 <= f[6] <= f[7] <= 255.0
