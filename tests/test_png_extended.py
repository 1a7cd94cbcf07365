"""Extended-PNG decode tests: palette (1/2/4/8-bit), 16-bit, sub-byte
grayscale, alpha stripping — the color-type/bit-depth matrix that
functions/multimodal._decode_png grew in round 5 (previously honest
NotImplementedError guards)."""

from __future__ import annotations

import binascii
import zlib

import pytest

from flnr_wins_spark.functions.multimodal import (
    decode_image,
    encode_png_gray16,
    encode_png_palette,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + binascii.crc32(ctype + body).to_bytes(4, "big")
    )


def _raw_png(width, height, depth, color, raster, extra=b"") -> bytes:
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([depth, color, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raster))
        + _chunk(b"IEND", b"")
    )


class TestPalette:
    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_roundtrip_all_depths_with_filter_cycling(self, depth):
        nent = 1 << depth
        w, h = 9, 7  # odd width: rows have bit padding at depth < 8
        palette = bytes((37 * i + c * 11) % 256 for i in range(nent) for c in range(3))
        indices = bytes((r * w + p) % nent for r in range(h) for p in range(w))
        png = encode_png_palette(w, h, indices, palette, depth=depth)
        ch, gw, gh, px = decode_image(png)
        assert (ch, gw, gh) == (3, w, h)
        want = b"".join(
            palette[3 * idx : 3 * idx + 3] for idx in indices
        )
        assert px == want

    def test_out_of_range_index_rejected(self):
        palette = bytes(6)  # 2 entries
        indices = bytes([0, 1, 3, 0])  # 3 exceeds the palette
        png = encode_png_palette(2, 2, indices, palette, depth=2)
        with pytest.raises(ValueError, match="palette index"):
            decode_image(png)

    def test_missing_plte_rejected(self):
        raster = bytes([0, 0b00010000])  # one row, filter 0
        png = _raw_png(2, 1, 4, 3, raster)
        with pytest.raises(ValueError, match="PLTE"):
            decode_image(png)


class TestGray16:
    def test_high_byte_conversion(self):
        w, h = 5, 4
        samples = [(i * 4099) % 65536 for i in range(w * h)]
        png = encode_png_gray16(w, h, samples)
        ch, gw, gh, px = decode_image(png)
        assert (ch, gw, gh) == (1, w, h)
        assert list(px) == [s >> 8 for s in samples]


class TestSubByteGray:
    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_scales_to_full_range(self, depth):
        w, h = 6, 2
        maxv = (1 << depth) - 1
        vals = [(i % (maxv + 1)) for i in range(w * h)]
        per_byte = 8 // depth
        stride = (w * depth + 7) // 8
        raster = bytearray()
        for r in range(h):
            raster.append(0)  # filter none
            row = bytearray(stride)
            for p in range(w):
                row[p // per_byte] |= vals[r * w + p] << (8 - depth * (p % per_byte + 1))
            raster += row
        png = _raw_png(w, h, depth, 0, bytes(raster))
        ch, gw, gh, px = decode_image(png)
        assert (ch, gw, gh) == (1, w, h)
        scale = 255 // maxv
        assert list(px) == [v * scale for v in vals]


class TestAlphaStripping:
    def test_rgba_drops_alpha(self):
        w, h = 3, 2
        pix = [(10 * i, 20 * i, 30 * i, 255 - i) for i in range(w * h)]
        raster = bytearray()
        for r in range(h):
            raster.append(0)
            for p in range(w):
                raster += bytes(pix[r * w + p])
        png = _raw_png(w, h, 8, 6, bytes(raster))
        ch, gw, gh, px = decode_image(png)
        assert (ch, gw, gh) == (3, w, h)
        assert list(px) == [v for p in pix for v in p[:3]]

    def test_gray_alpha_drops_alpha(self):
        raster = bytes([0, 7, 200, 9, 100])  # 1 row, 2 px of (gray, alpha)
        png = _raw_png(2, 1, 8, 4, raster)
        ch, gw, gh, px = decode_image(png)
        assert (ch, gw, gh) == (1, 2, 1)
        assert list(px) == [7, 9]


class TestGuards:
    def test_unknown_interlace_method_rejected(self):
        # Adam7 (method 1) now decodes for real; only methods 0/1 exist
        ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 0, 0, 0, 2])
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="interlace"):
            decode_image(png)

    def test_truncated_adam7_raster_rejected(self):
        # a 2x2 Adam7 stream needs 7 raster bytes (3 passes); 3 is short
        ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 0, 0, 0, 1])
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="raster"):
            decode_image(png)

    def test_invalid_depth_color_combo_rejected(self):
        png = _raw_png(2, 2, 16, 3, b"")  # 16-bit palette is not a thing
        with pytest.raises(ValueError, match="combination"):
            decode_image(png)


class TestAdam7:
    @pytest.mark.parametrize("ch", [1, 3])
    @pytest.mark.parametrize("w,h", [(16, 16), (13, 11), (8, 3), (1, 1), (3, 9)])
    def test_roundtrip_exact(self, ch, w, h):
        from flnr_wins_spark.functions.multimodal import encode_png_adam7

        pixels = bytes(((i * 37) + c * 11) % 256 for i in range(w * h) for c in range(ch))
        png = encode_png_adam7(ch, w, h, pixels)
        gch, gw, gh, px = decode_image(png)
        assert (gch, gw, gh) == (ch, w, h)
        assert px == pixels

    def test_tiny_images_skip_empty_passes(self):
        # a 2x2 image has empty passes 2,3 (need width>4 / height>4 regions)
        from flnr_wins_spark.functions.multimodal import encode_png_adam7

        pixels = bytes([10, 200, 30, 250])
        png = encode_png_adam7(1, 2, 2, pixels)
        ch, w, h, px = decode_image(png)
        assert (ch, w, h) == (1, 2, 2)
        assert px == pixels

    def test_interlaced_and_sequential_decode_identically(self):
        from flnr_wins_spark.functions.multimodal import encode_png, encode_png_adam7

        pixels = bytes((i * 91) % 256 for i in range(12 * 7 * 3))
        seq = decode_image(encode_png(3, 12, 7, pixels))
        inter = decode_image(encode_png_adam7(3, 12, 7, pixels))
        assert seq == inter
