"""Multimodal (image/audio/video) column plumbing (engine extension).

Design: media content is an opaque ``binary`` column + a typed metadata
struct — exactly how the reference carries geometry it never decodes
(SURVEY.md §1: opaque WKB, copied but not computed on). The Spark-side
plumbing (schemas, batch iteration, partitioning) is real and tested.
Decoding has two tiers:

  * :func:`decode_image` is a REAL stdlib-only decoder for binary PPM/PGM
    and uncompressed 24-bit BMP — header parsing, row-padding/ordering and
    channel normalization included — driven by ``extract_features(...,
    fake=False)``;
  * PNG decodes for REAL across the full spec matrix (stdlib zlib chunk
    walk + five-filter unfiltering at any bpp; palette/sub-byte/16-bit/
    alpha color types; Adam7 interlace via per-pass scatter,
    :func:`_decode_png`), with matching REAL encoders (:func:`encode_png`,
    :func:`encode_png_palette`, :func:`encode_png_gray16`,
    :func:`encode_png_adam7`) for round-trip entries;
  * GIF decodes (and encodes) for REAL as well — stdlib variable-width
    LZW in both directions (:func:`_decode_gif`/:func:`encode_gif`);
  * QOI (qoiformat.org) round-trips for REAL — the full op walk
    (RUN/INDEX/DIFF/LUMA/literals) is integer byte arithmetic
    (:func:`_decode_qoi`/:func:`encode_qoi`);
  * JPEG (baseline AND progressive) decodes for REAL in
    ``functions/jpeg.py``, dispatched from :func:`decode_image`;
  * genuinely absent codecs (webp/video containers, arithmetic-coded
    JPEG) raise ``NotImplementedError``; ``fake=True`` substitutes a
    deterministic digest decoder so those pipeline shapes can be
    exercised end-to-end anyway.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def to_media_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media-shaped table from any corpus: bytes = UTF-8 content
    (stand-in for real image/audio payloads), metadata populated for real."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


# one shared definition (see flnr_wins_spark/parallel.py); applied here
# before Python decode/encode passes — a single-file scan would otherwise
# run the whole mapInPandas stage in ONE Python worker. Decoders are
# per-row pure, so row placement cannot change any result.
from flnr_wins_spark.parallel import spread as _spread  # noqa: E402


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': digest bytes -> unit-range features.
    Stands in for PIL/libav decode, which is unavailable here."""
    h = hashlib.sha256(content or b"").digest()
    return [h[i % 32] / 255.0 for i in range(dim)]


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL image decode, stdlib-only: returns (channels, width, height,
    pixel bytes in row-major top-down, channel-interleaved order).

    Supported formats (chosen because they parse with no codec library):

      * binary PPM (``P6``, 3 channels) and PGM (``P5``, 1 channel) with
        full comment/whitespace header handling; maxval 256..65535
        rasters (2-byte big-endian samples per the Netpbm spec)
        downconvert to the module's 8-bit pixel contract by exact
        integer rounding round(s * 255 / maxval) — lossless for
        byte-doubled samples at maxval 65535 (s = b*257 -> b). 1-byte
        rasters keep their raw samples (the historical contract:
        sub-255 maxvals are not rescaled);
      * uncompressed 24-bit BI_RGB BMP — row padding stripped, bottom-up
        row order flipped, BGR reordered to RGB, so identical pixel content
        yields identical output bytes across the two container formats.

    Anything else raises ``NotImplementedError`` (the honest-guard
    convention this module has always used for absent codecs).
    """
    if not data:
        raise NotImplementedError("empty content is not a decodable image")
    if data[:2] in (b"P6", b"P5"):
        channels = 3 if data[:2] == b"P6" else 1
        # header = magic + 3 ints (width, height, maxval), tokens separated
        # by whitespace, '#' comments running to end-of-line, then ONE
        # whitespace byte before the raster
        pos, vals = 2, []
        while len(vals) < 3:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(data[start:pos]))
        pos += 1  # the single whitespace after maxval
        width, height, maxval = vals[0], vals[1], vals[2]
        if not 0 < maxval <= 65535:
            raise ValueError(f"PPM/PGM maxval {maxval} outside 1..65535")
        n = width * height * channels
        if maxval > 255:  # 2-byte big-endian samples (Netpbm spec)
            raw = data[pos : pos + 2 * n]
            if len(raw) != 2 * n:
                raise ValueError(
                    f"truncated raster: {len(raw)} of {2 * n} bytes"
                )
            half = maxval // 2
            out = bytearray(n)
            for i in range(n):
                s = (raw[2 * i] << 8) | raw[2 * i + 1]
                if s > maxval:
                    raise ValueError(
                        f"PPM/PGM sample {s} exceeds maxval {maxval}"
                    )
                out[i] = (s * 255 + half) // maxval
            return channels, width, height, bytes(out)
        pixels = data[pos : pos + n]
        if len(pixels) != n:
            raise ValueError(f"truncated raster: {len(pixels)} of {n} bytes")
        return channels, width, height, pixels
    if data[:2] == b"BM":
        if len(data) < 54:
            raise ValueError("truncated BMP header")
        off = int.from_bytes(data[10:14], "little")
        width = int.from_bytes(data[18:22], "little", signed=True)
        height = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        compression = int.from_bytes(data[30:34], "little")
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only uncompressed 24-bit BI_RGB BMP")
        top_down = height < 0
        height = abs(height)
        row_bytes = width * 3
        stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
        out = bytearray()
        for r in range(height):
            src_row = r if top_down else height - 1 - r
            row = data[off + src_row * stride : off + src_row * stride + row_bytes]
            if len(row) != row_bytes:
                raise ValueError("truncated BMP raster")
            for c in range(width):  # BGR -> RGB
                out += row[3 * c + 2 : 3 * c + 3]
                out += row[3 * c + 1 : 3 * c + 2]
                out += row[3 * c : 3 * c + 1]
        return 3, width, height, bytes(out)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(data)
    if data[:4] == b"qoif":
        return _decode_qoi(data)
    if data[:2] == b"\xff\xd8":
        from flnr_wins_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise NotImplementedError(
        "unrecognized image container (supported: P6/P5 PPM/PGM, 24-bit BMP, "
        "PNG, RGB QOI, baseline/progressive JPEG)"
    )


# Adam7 interlace pass grid: (x_origin, y_origin, x_step, y_step)
ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    """length + type + body + CRC32 — the one chunk writer every PNG
    encoder in this module shares."""
    import binascii

    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + binascii.crc32(ctype + body).to_bytes(4, "big")
    )


def _png_container(
    width: int, height: int, depth: int, color: int, raw: bytes,
    plte: bytes | None = None, interlace: int = 0,
) -> bytes:
    """Assemble IHDR(+PLTE)+IDAT(+IEND) around a filtered raster."""
    import zlib

    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([depth, color, 0, 0, interlace])
    )
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw, 6)) + _png_chunk(b"IEND", b"")


def _png_filter_row(line: bytes, prev: bytes, bpp: int, ftype: int) -> bytes:
    """Forward-filter one scanline (the encode half of the five spec
    filters, parameterized by bytes-per-pixel) — ONE implementation shared
    by every encoder, the mirror of the decoder's unfilter block."""
    stride = len(line)
    if ftype == 0:
        return bytes(line)
    if ftype == 1:  # Sub
        return bytes(
            (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
            for i in range(stride)
        )
    if ftype == 2:  # Up
        return bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
    if ftype == 3:  # Average
        return bytes(
            (line[i] - (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
            for i in range(stride)
        )
    return bytes(  # Paeth
        (
            line[i]
            - _paeth(
                line[i - bpp] if i >= bpp else 0,
                prev[i],
                prev[i - bpp] if i >= bpp else 0,
            )
        )
        & 0xFF
        for i in range(stride)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL stdlib PNG decode: chunk walk, zlib-inflated IDAT, full
    scanline unfiltering (all five filter types 0-4, any bytes-per-pixel).
    Supports every non-interlaced bit-depth/color-type combination of the
    spec: grayscale (1/2/4/8/16-bit), RGB (8/16), palette (1/2/4/8-bit via
    PLTE), gray+alpha and RGBA (8/16). Palette expands to RGB; alpha
    channels are STRIPPED (features operate on color planes); 16-bit
    samples take their high byte — all deterministic conversions. Adam7
    INTERLACED images decode too: the seven passes are independent
    sub-images (own dimensions, own filter chains) whose samples scatter
    back to the (x0 + i*dx, y0 + j*dy) grid positions; empty passes are
    skipped per spec. Returns (channels, width, height, pixel bytes),
    channels 1 or 3."""
    import zlib

    pos, idat, ihdr, plte = 8, bytearray(), None, None
    while pos + 8 <= len(data):
        clen = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("missing PNG IHDR")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    valid = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
    if color not in valid or depth not in valid[color]:
        raise ValueError(f"invalid PNG depth/color combination {depth}/{color}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bits_pp = depth * nch
    bpp = max(1, bits_pp // 8)  # filter offset, per spec: >=1 byte
    raw = zlib.decompress(bytes(idat))

    def unfilter_block(off: int, w: int, h: int) -> tuple[list[list[int]], int]:
        """Unfilter + unpack one (sub-)image of w x h pixels starting at
        ``off`` in the inflated stream; returns (rows-of-samples, consumed)."""
        stride = (w * bits_pp + 7) // 8
        out_rows: list[list[int]] = []
        prev = bytes(stride)
        p = off
        for _ in range(h):
            if p + 1 + stride > len(raw):
                raise ValueError("PNG raster size mismatch")
            ftype = raw[p]
            line = bytearray(raw[p + 1 : p + 1 + stride])
            p += 1 + stride
            if ftype == 1:  # Sub
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif ftype == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride):
                    left = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for i in range(stride):
                    left = line[i - bpp] if i >= bpp else 0
                    ul = prev[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
            elif ftype != 0:
                raise ValueError(f"unknown PNG filter type {ftype}")
            prev = bytes(line)
            # unpack the filtered bytes to per-pixel samples
            if depth == 8:
                samples = list(line)
            elif depth == 16:
                samples = list(line[0::2])  # high byte — deterministic 16->8
            else:
                samples = []
                per_byte = 8 // depth
                mask = (1 << depth) - 1
                for b in line:
                    for s in range(per_byte):
                        samples.append((b >> (8 - depth * (s + 1))) & mask)
                samples = samples[: w * nch]
            out_rows.append(samples)
        return out_rows, p - off

    if interlace == 0:
        rows, used = unfilter_block(0, width, height)
        if used != len(raw):
            raise ValueError("PNG raster size mismatch")
    else:  # Adam7: seven independent sub-images scattered onto the grid
        rows = [[0] * (width * nch) for _ in range(height)]
        off = 0
        for x0, y0, dx, dy in ADAM7_PASSES:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue  # empty pass: contributes no scanlines at all
            sub, used = unfilter_block(off, wp, hp)
            off += used
            for j, samples in enumerate(sub):
                y = y0 + j * dy
                for i in range(wp):
                    x = x0 + i * dx
                    for c in range(nch):
                        rows[y][x * nch + c] = samples[i * nch + c]
        if off != len(raw):
            raise ValueError("PNG raster size mismatch")
    if color == 3:
        out = bytearray()
        nent = len(plte) // 3
        for samples in rows:
            for idx in samples:
                if idx >= nent:
                    raise ValueError(f"palette index {idx} out of range")
                out += plte[3 * idx : 3 * idx + 3]
        return 3, width, height, bytes(out)
    if color in (4, 6):  # strip alpha
        keep = nch - 1
        out = bytearray()
        for samples in rows:
            for p in range(width):
                for c in range(keep):
                    out.append(samples[p * nch + c])
        return keep, width, height, bytes(out)
    if depth < 8:  # sub-byte grayscale scales to full 8-bit range
        scale = 255 // ((1 << depth) - 1)
        return 1, width, height, bytes(
            s * scale for samples in rows for s in samples
        )
    return nch, width, height, bytes(s for samples in rows for s in samples)


def encode_png(
    channels: int, width: int, height: int, pixels: bytes, filter_cycle: bool = True
) -> bytes:
    """REAL stdlib PNG encode (zlib + crc32): 8-bit gray (1ch) or RGB
    (3ch), non-interlaced. With ``filter_cycle`` row r is forward-filtered
    with type ``r % 5`` — deliberately exercising every unfilter path in
    :func:`_decode_png` on round-trip."""
    assert channels in (1, 3) and len(pixels) == width * height * channels
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = pixels[r * stride : (r + 1) * stride]
        ftype = (r % 5) if filter_cycle else 0
        raw.append(ftype)
        raw += _png_filter_row(line, prev, channels, ftype)
        prev = line
    return _png_container(width, height, 8, 2 if channels == 3 else 0, bytes(raw))


def encode_png_palette(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    depth: int = 8,
    filter_cycle: bool = True,
) -> bytes:
    """REAL indexed-color PNG encode: palette entries (RGB triples) in a
    PLTE chunk, pixel indices packed MSB-first at ``depth`` bits (1/2/4/8),
    rows forward-filtered with type ``r % 5`` when ``filter_cycle`` (the
    filters operate on the PACKED bytes with bpp=1, per spec — exactly the
    path :func:`_decode_png` must invert for sub-byte images)."""
    assert depth in (1, 2, 4, 8) and len(indices) == width * height
    assert len(palette) % 3 == 0 and len(palette) // 3 <= (1 << depth)
    per_byte = 8 // depth
    stride = (width * depth + 7) // 8
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = bytearray(stride)
        for p in range(width):
            idx = indices[r * width + p]
            row[p // per_byte] |= idx << (8 - depth * (p % per_byte + 1))
        line = bytes(row)
        ftype = (r % 5) if filter_cycle else 0
        raw.append(ftype)
        raw += _png_filter_row(line, prev, 1, ftype)
        prev = line
    return _png_container(width, height, depth, 3, bytes(raw), plte=palette)


def encode_png_gray16(
    width: int, height: int, samples: list[int], filter_cycle: bool = True
) -> bytes:
    """REAL 16-bit grayscale PNG encode (big-endian samples, bpp=2 filters)
    — the fixture source for the decoder's 16-bit high-byte path."""
    assert len(samples) == width * height
    raw = bytearray()
    prev = bytes(width * 2)
    for r in range(height):
        line = b"".join(
            samples[r * width + p].to_bytes(2, "big") for p in range(width)
        )
        ftype = (r % 5) if filter_cycle else 0
        raw.append(ftype)
        raw += _png_filter_row(line, prev, 2, ftype)
        prev = line
    return _png_container(width, height, 16, 0, bytes(raw))


def encode_png_adam7(
    channels: int, width: int, height: int, pixels: bytes
) -> bytes:
    """REAL Adam7-interlaced PNG encode (8-bit gray/RGB): each of the
    seven passes is an independent sub-image with its own filter chain
    (cycling 0-4 per pass row) — the fixture source for the decoder's
    interlaced scatter path."""
    assert channels in (1, 3) and len(pixels) == width * height * channels
    raw = bytearray()
    for x0, y0, dx, dy in ADAM7_PASSES:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        prev = bytes(wp * channels)
        for j in range(hp):
            y = y0 + j * dy
            line = b"".join(
                pixels[(y * width + x0 + i * dx) * channels :][:channels]
                for i in range(wp)
            )
            ftype = j % 5
            raw.append(ftype)
            raw += _png_filter_row(line, prev, channels, ftype)
            prev = line
    return _png_container(
        width, height, 8, 2 if channels == 3 else 0, bytes(raw), interlace=1
    )


def wrap_png_palette(
    media: DataFrame, width: int, height: int, depth: int = 4
) -> DataFrame:
    """Re-container per-row (indices, palette) binaries as a REAL indexed
    PNG: ``content`` holds width*height index bytes followed by the RGB
    palette (the last 3*2^depth bytes). Arrow-batched narrow map — the
    encode half of the palette-PNG round-trip entry."""

    nent = 1 << depth
    split = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(
                lambda b: encode_png_palette(
                    width,
                    height,
                    bytes(b)[:split],
                    bytes(b)[split : split + 3 * nent],
                    depth=depth,
                )
            )
            yield pdf

    return _spread(media).mapInPandas(batches, schema=media.schema)


def wrap_png(media: DataFrame, channels: int, width: int, height: int) -> DataFrame:
    """Re-container raw pixel bytes in the ``content`` column as a REAL PNG
    (see :func:`encode_png`; row filters cycle 0-4). A narrow Arrow-batched
    map — the deterministic encode half of the PNG round-trip entry."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(
                lambda b: encode_png(channels, width, height, bytes(b))
            )
            yield pdf

    return _spread(media).mapInPandas(batches, schema=media.schema)


def _real_features(content: bytes) -> list[float]:
    """8-dim feature vector from a REAL decode — every component is an exact
    small integer (as a double), so a SQL oracle that knows the image
    construction can reproduce the values bit-for-bit: [channels, width,
    height, sum(ch 0), sum(ch 1), sum(ch 2), min byte, max byte]."""
    channels, width, height, px = decode_image(content)
    sums = [0, 0, 0]
    for i, b in enumerate(px):
        sums[i % channels] += b
    return [
        float(channels),
        float(width),
        float(height),
        float(sums[0]),
        float(sums[1]),
        float(sums[2]),
        float(min(px)) if px else 0.0,
        float(max(px)) if px else 0.0,
    ]


def extract_features(
    media: DataFrame, dim: int = 8, fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + featurize media content via mapInPandas (Arrow batches).

    ``fake=True`` runs the deterministic digest-based stand-in decoder.
    ``fake=False`` runs a REAL stdlib decode (:func:`decode_image` — binary
    PPM/PGM and uncompressed 24-bit BMP) producing the integer-exact 8-dim
    feature of :func:`_real_features` (``dim`` is ignored in real mode);
    content in any OTHER container still raises ``NotImplementedError`` at
    execution time, because general codecs (PIL/pyav) are not available in
    this environment. The Spark plumbing — schema contract, Arrow batch
    iteration, partition parallelism — is identical in both modes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            featurize = (
                (lambda b: _fake_decode(b, dim)) if fake else _real_features
            )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.sha256(bytes(b) if b is not None else b"").hexdigest()
                    ),
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["content"].map(lambda b: featurize(bytes(b or b""))),
                }
            )
            yield out

    return _spread(media).mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_hash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to ``n_frames``
    frame rows via mapInPandas (the cardinality-changing shape a real
    pyav/ffmpeg sampler needs). The fake 'decoder' slices the content bytes
    into n equal spans — deterministic, so an SQL oracle can verify the
    fan-out, boundaries, and hashes exactly.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video codecs unavailable in this environment; pass fake=True"
                )
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                length = len(data)
                for i in range(n_frames):
                    lo = (i * length) // n_frames
                    hi = ((i + 1) * length) // n_frames
                    frame = data[lo:hi]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_hash": hashlib.sha256(frame).hexdigest(),
                            "n_bytes": len(frame),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return _spread(media).mapInPandas(batches, schema=FRAME_SCHEMA)


def resize_image(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Image resize plumbing: content passes through a Pandas-batched
    transform; metadata records the new dimensions. With ``fake=False`` the
    codec step raises (PIL absent); with ``fake=True`` content is passed
    through untouched so the schema/batching contract is exercised."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; pass fake=True"
                )
            out = pdf[["media_id", "content"]].copy()
            out["mime"] = "application/octet-stream"
            out["width"] = width
            out["height"] = height
            out["n_bytes"] = pdf["content"].map(lambda b: len(b) if b is not None else 0)
            yield out

    flat = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    out = _spread(media).mapInPandas(batches, schema=flat)
    return out.select(
        "media_id",
        "content",
        F.struct("mime", "width", "height", "n_bytes").alias("meta"),
    )


def dhash_bits(content: bytes, hash_size: int = 8) -> int:
    """Perceptual DIFFERENCE HASH of one image, from a REAL decode: decode
    (PPM/PGM/BMP — :func:`decode_image`), integer luma for RGB
    ((299r + 587g + 114b) // 1000 — exact, engine-reproducible),
    nearest-neighbor downsample to (hash_size+1) x hash_size (source
    column for grid x is (x * width) // (hash_size + 1); identity when
    the image is already that size), then one bit per horizontal
    gradient: bit y*hash_size + x set iff pixel(y, x) > pixel(y, x+1).
    Returns the hash as an UNSIGNED int of hash_size^2 bits. Every step
    is integer-exact, so a SQL oracle that knows the image construction
    reproduces the hash bit-for-bit (the _real_features discipline)."""
    channels, width, height, px = decode_image(content)

    def luma(x: int, y: int) -> int:
        if channels == 1:
            return px[y * width + x]
        o = (y * width + x) * channels
        return (299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]) // 1000

    hs = hash_size
    v = 0
    for y in range(hs):
        sy = (y * height) // hs
        for x in range(hs):
            left = luma((x * width) // (hs + 1), sy)
            right = luma(((x + 1) * width) // (hs + 1), sy)
            if left > right:
                v |= 1 << (y * hs + x)
    return v


def image_dhash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """Per-image perceptual dHash over a (media_id, content) frame —
    executor-side mapInPandas (Arrow batches, the decoder discipline of
    :func:`extract_features`). Emits the hash as a zero-padded lowercase
    hex string (hash_size^2 / 4 chars): hex is sign-trap-free across
    engines where a 64-bit integer is not, and band substrings for the
    LSH join slice directly off it. Near-dup detection composes this
    with a banded Hamming join exactly like SimHash over text — see the
    graded entry x_multimodal_dhash_dedup."""
    width = (hash_size * hash_size) // 4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [
                        format(dhash_bits(bytes(c), hash_size), f"0{width}x")
                        for c in pdf["content"]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.StringType()),
        ]
    )
    return _spread(media.select("media_id", "content")).mapInPandas(batches, schema=schema)


def audio_fingerprint_bits(content: bytes, n_bits: int = 64) -> int:
    """Perceptual ENERGY-GRADIENT fingerprint of one audio clip, from a
    REAL decode (:func:`decode_wav`): channel 0 samples split into
    ``n_bits + 1`` near-equal frames (frame f spans sample indexes
    [(f*n)//(n_bits+1), ((f+1)*n)//(n_bits+1))), per-frame energy is the
    exact integer sum of squared samples, and bit f is set iff
    energy(f) > energy(f+1) — the temporal twin of
    :func:`dhash_bits`'s horizontal gradient. Integer-exact end to end,
    so a SQL oracle that knows the clip construction reproduces the
    fingerprint bit-for-bit."""
    channels, _rate, samples = decode_wav(content)
    mono = samples[::channels]
    n = len(mono)
    nf = n_bits + 1
    if n < nf:
        raise ValueError(
            f"clip has {n} samples; the {n_bits}-bit fingerprint needs "
            f"at least {nf} (one per frame)"
        )
    e = []
    for f in range(nf):
        lo, hi = (f * n) // nf, ((f + 1) * n) // nf
        e.append(sum(s * s for s in mono[lo:hi]))
    v = 0
    for f in range(n_bits):
        if e[f] > e[f + 1]:
            v |= 1 << f
    return v


def audio_fingerprint(media: DataFrame, n_bits: int = 64) -> DataFrame:
    """Per-clip audio fingerprint over a (media_id, content) frame —
    executor-side mapInPandas, hex-string output, same contract as
    :func:`image_dhash` (near-dup detection composes with a banded
    Hamming join; see the graded entry x_multimodal_audio_dedup)."""
    width = n_bits // 4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "afp": [
                        format(audio_fingerprint_bits(bytes(c), n_bits), f"0{width}x")
                        for c in pdf["content"]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("afp", T.StringType()),
        ]
    )
    return _spread(media.select("media_id", "content")).mapInPandas(batches, schema=schema)


# ---------------------------------------------------------------------------
# Audio: typed metadata + chunk manifests (no codec required)
# ---------------------------------------------------------------------------

def to_audio_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Audio-shaped table with typed metadata synthesized deterministically
    (the fixture has no real audio): bytes = UTF-8 content stand-in,
    sample_rate/n_samples derived from content length. The metadata layout
    (mime, sample_rate, n_samples, n_bytes) is the real contract a loader
    fills from file headers."""
    content = F.encode(F.col(text_col), "UTF-8")
    n_chars = F.length(F.col(text_col)).cast("bigint")
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("audio/pcm").alias("mime"),
            F.when(F.col(id_col) % 4 == 0, 44100).otherwise(16000).alias("sample_rate"),
            (n_chars * 400 + 37).alias("n_samples"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def audio_chunk_manifest(
    audio: DataFrame, chunk_seconds: int = 10, bytes_per_sample: int = 2
) -> DataFrame:
    """Fixed-duration chunk manifest over audio metadata: one row per
    (media_id, chunk_idx) with exact sample and byte ranges — the fan-out a
    distributed loader executes BEFORE any decode touches bytes, so a 100 TB
    audio corpus schedules chunk reads from metadata alone (range requests,
    no full-file pulls). Pure integer arithmetic (ceil via `(n + c - 1) div
    c`), no UDF, narrow map + generate.

    Returns (media_id, chunk_idx, start_sample, chunk_samples, start_byte,
    chunk_bytes); the final chunk is short when duration doesn't divide
    evenly. Zero-sample rows yield no chunks.
    """
    rate = F.col("meta.sample_rate").cast("bigint")
    n = F.col("meta.n_samples")
    spc = rate * chunk_seconds
    n_chunks = F.expr(
        f"(meta.n_samples + CAST(meta.sample_rate AS BIGINT) * {chunk_seconds} - 1) "
        f"div (CAST(meta.sample_rate AS BIGINT) * {chunk_seconds})"
    )
    staged = audio.select(
        "media_id", n.alias("_n"), spc.alias("_spc"), n_chunks.alias("_nc")
    ).filter(F.col("_nc") > 0)
    exploded = staged.select(
        "media_id",
        "_n",
        "_spc",
        F.posexplode(F.expr("sequence(0, _nc - 1)")).alias("chunk_idx", "_k"),
    )
    start = F.col("_k") * F.col("_spc")
    csamp = F.least(F.col("_spc"), F.col("_n") - start)
    return exploded.select(
        "media_id",
        F.col("chunk_idx"),
        start.alias("start_sample"),
        csamp.alias("chunk_samples"),
        (start * bytes_per_sample).alias("start_byte"),
        (csamp * bytes_per_sample).alias("chunk_bytes"),
    )


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """REAL audio decode, stdlib-only: RIFF/WAVE container, uncompressed
    PCM16 or G.711 mu-law (format 7, expanded to linear PCM16). Returns (channels, sample_rate, samples) with samples as signed
    16-bit little-endian ints in interleaved frame order.

    Chunk walking honors the RIFF spec (4-byte id + LE32 size, chunks pad to
    even offsets), so files with extra chunks (LIST/INFO, fact) decode the
    same as minimal ones. Non-PCM encodings and bit depths other than 16
    raise ``NotImplementedError`` — the module's honest-guard convention for
    absent codecs (general audio codec libraries are not available here).
    Reference analog: the opaque binary carry at wts.py:132,155 — upgraded
    from carry-only to decode, the audio twin of :func:`decode_image`.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "unrecognized audio container (supported: RIFF/WAVE PCM16)"
        )
    fmt: tuple[int, int, int, int] | None = None
    payload: bytes | None = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        csz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if not (
                (audio_format == 1 and bits == 16)
                or (audio_format == 7 and bits == 8)
                or (audio_format == 0x11 and bits == 4 and channels == 1)
            ):
                raise NotImplementedError(
                    "only PCM16, G.711 mu-law, or mono IMA-ADPCM WAV"
                )
            fmt = (channels, rate, audio_format, block_align)
        elif cid == b"data":
            if len(body) != csz:
                raise ValueError("truncated data chunk")
            payload = body
        pos += 8 + csz + (csz & 1)  # chunks pad to even boundaries
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    if fmt[2] == 7:  # G.711 mu-law: one byte per sample, expand to PCM16
        return fmt[0], fmt[1], [_mulaw_expand(b) for b in payload]
    if fmt[2] == 0x11:  # IMA ADPCM (DVI): 4-bit nibbles, per-block state
        out: list[int] = []
        ba = fmt[3]
        if ba < 5:
            raise ValueError("IMA-ADPCM block align must be >= 5")
        for off in range(0, len(payload), ba):
            block = payload[off : off + ba]
            if len(block) < 4:
                raise ValueError("truncated IMA-ADPCM block header")
            out.extend(_adpcm_decode_block(block))
        return fmt[0], fmt[1], out
    if len(payload) % 2:
        raise ValueError("odd PCM16 payload length")
    samples = [
        int.from_bytes(payload[i : i + 2], "little", signed=True)
        for i in range(0, len(payload), 2)
    ]
    return fmt[0], fmt[1], samples


# IMA/DVI ADPCM tables (public spec: IMA Recommended Practices, 1992)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA-ADPCM state transition; returns (new predictor, new index).
    Pure integer arithmetic — deterministic in any implementation."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX[nibble & 7]))
    return pred, index


def _adpcm_decode_block(block: bytes) -> list[int]:
    """Decode one mono IMA-ADPCM block: 4-byte header (int16 predictor —
    emitted as the block's first sample — uint8 step index, reserved),
    then two low-nibble-first samples per data byte."""
    pred = int.from_bytes(block[0:2], "little", signed=True)
    index = block[2]
    if index > 88:
        raise ValueError(f"IMA-ADPCM step index {index} out of range")
    out = [pred]
    for b in block[4:]:
        for nibble in (b & 0x0F, b >> 4):
            pred, index = _adpcm_step(pred, index, nibble)
            out.append(pred)
    return out


def encode_wav_adpcm(
    rate: int, samples: list[int], samples_per_block: int = 9
) -> bytes:
    """Encode mono PCM16 samples as a REAL IMA-ADPCM WAV (format 0x11):
    per block, the first sample goes verbatim into the header along with
    the RUNNING step index (standard practice — the index adapts across
    blocks so sloped signals keep tracking), and the remaining
    ``samples_per_block - 1`` samples quantize through the standard
    nibble search + shared state transition.

    Exactness property the oracle entry uses: an ALL-CONSTANT-BLOCK
    signal decodes bit-exactly — zero nibbles at step index 0 have
    diff 7>>3 = 0 and the index stays clamped at 0, so the carried
    index never leaves 0 and every block reproduces its header value
    verbatim. (samples_per_block - 1) must be even (two nibbles/byte)."""
    if (samples_per_block - 1) % 2:
        raise ValueError("samples_per_block - 1 must be even")
    if len(samples) % samples_per_block:
        raise ValueError("sample count must be a multiple of samples_per_block")
    block_align = 4 + (samples_per_block - 1) // 2
    blocks = bytearray()
    index = 0
    for off in range(0, len(samples), samples_per_block):
        chunk = samples[off : off + samples_per_block]
        pred = chunk[0]
        blocks += int(pred).to_bytes(2, "little", signed=True) + bytes([index, 0])
        nibbles = []
        for s in chunk[1:]:
            step = _IMA_STEPS[index]
            delta = s - pred
            nibble = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                nibble |= 4
                delta -= step
            if delta >= step >> 1:
                nibble |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nibble |= 1
            pred, index = _adpcm_step(pred, index, nibble)
            nibbles.append(nibble)
        for i in range(0, len(nibbles), 2):
            blocks.append(nibbles[i] | (nibbles[i + 1] << 4))
    n_blocks = len(samples) // samples_per_block
    data = bytes(blocks)
    fmt = (
        (0x11).to_bytes(2, "little")      # wFormatTag = IMA ADPCM
        + (1).to_bytes(2, "little")       # mono
        + rate.to_bytes(4, "little")
        + (rate * block_align // samples_per_block).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")       # bits per sample
        + (2).to_bytes(2, "little")       # cbSize
        + samples_per_block.to_bytes(2, "little")
    )
    fact = (n_blocks * samples_per_block).to_bytes(4, "little")
    riff = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + len(fact).to_bytes(4, "little") + fact
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _mulaw_expand(u: int) -> int:
    """G.711 mu-law byte -> linear PCM (the standard ITU-T expansion):
    complement, split sign/exponent/mantissa, reconstruct
    ((mantissa << 3) + 0x84) << exponent, re-bias by 0x84. Pure integer
    arithmetic — which is what lets a SQL oracle recompute expected
    samples from a known construction."""
    u = ~u & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    x = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return -x if sign else x


def _audio_features(content: bytes) -> list[float]:
    """8-dim feature vector from a REAL WAV decode — every component is an
    exact integer (as a double), so a SQL oracle that knows the audio
    construction reproduces the values bit-for-bit: [channels, sample_rate,
    n_samples, sum, min, max, sum(|s|), zero_crossings]."""
    channels, rate, ss = decode_wav(content)
    crossings = sum(1 for a, b in zip(ss, ss[1:]) if a * b < 0)
    return [
        float(channels),
        float(rate),
        float(len(ss)),
        float(sum(ss)),
        float(min(ss)) if ss else 0.0,
        float(max(ss)) if ss else 0.0,
        float(sum(abs(s) for s in ss)),
        float(crossings),
    ]


def wrap_wav_adpcm(
    media: DataFrame, samples_per_block: int = 9, rate: int = 8000
) -> DataFrame:
    """Re-container per-row binary content as a REAL mono IMA-ADPCM WAV:
    each consecutive little-endian int16 of ``content`` becomes one
    CONSTANT block of ``samples_per_block`` samples (the construction
    that decodes bit-exactly — see :func:`encode_wav_adpcm`). Arrow-
    batched narrow map, the encode half of the ADPCM round-trip entry."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def build(b: bytes) -> bytes:
            b = bytes(b)
            vals = [
                int.from_bytes(b[i : i + 2], "little", signed=True)
                for i in range(0, len(b) - len(b) % 2, 2)
            ]
            samples = [v for v in vals for _ in range(samples_per_block)]
            return encode_wav_adpcm(rate, samples, samples_per_block)

        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(build)
            yield pdf

    return _spread(media).mapInPandas(batches, schema=media.schema)


def extract_audio_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """REAL WAV decode + integer-exact featurize via mapInPandas (Arrow
    batches) — same plumbing contract as :func:`extract_features` (schema,
    batch iteration, partition parallelism), same output shape
    (``FEATURE_SCHEMA``), but the decoder is :func:`decode_wav` and the
    feature is :func:`_audio_features`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.sha256(
                            bytes(b) if b is not None else b""
                        ).hexdigest()
                    ),
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": pdf["content"].map(
                        lambda b: _audio_features(bytes(b or b""))
                    ),
                }
            )

    return _spread(media).mapInPandas(batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL GIF codec (stdlib-only LZW)
# ---------------------------------------------------------------------------

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(height: int) -> list[int]:
    """Display-row order of an interlaced GIF's stream rows (GIF89a
    appendix E four-pass scheme): pass 1 every 8th row from 0, pass 2
    every 8th from 4, pass 3 every 4th from 2, pass 4 every 2nd from 1.
    Stream row i carries display row order[i]."""
    return [
        r
        for start, step in _GIF_INTERLACE_PASSES
        for r in range(start, height, step)
    ]


def _gif_deinterlace(indices: list[int], width: int, height: int) -> list[int]:
    # A short LZW stream would shrink the scattered rows via the slice
    # assignment below and silently shift every subsequent display row —
    # worse than the progressive path's graceful short-run degradation —
    # so a truncated/corrupt stream is a loud error here (r13 ADVICE).
    if len(indices) != width * height:
        raise ValueError(
            f"interlaced GIF pixel stream has {len(indices)} indices, "
            f"expected {width * height} ({width}x{height}): truncated or "
            "corrupt LZW stream cannot be row-scattered"
        )
    out: list[int] = [0] * (width * height)
    for stream_i, disp_r in enumerate(_gif_interlace_order(height)):
        out[disp_r * width : (disp_r + 1) * width] = indices[
            stream_i * width : (stream_i + 1) * width
        ]
    return out


def _decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL stdlib GIF decode: header walk, global color table, full
    variable-width LZW decompression (clear/end codes, width growth to 12
    bits, LSB-first packing), palette mapping to interleaved RGB,
    four-pass interlace deinterleave, local color tables (a frame's
    local table overrides the global one per spec). First image frame
    only."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w_screen = int.from_bytes(data[6:8], "little")
    h_screen = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 ** ((flags & 7) + 1)
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            width = int.from_bytes(data[pos + 5 : pos + 7], "little")
            height = int.from_bytes(data[pos + 7 : pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            frame_palette = palette
            if iflags & 0x80:  # local color table overrides the global
                n = 2 ** ((iflags & 7) + 1)
                frame_palette = data[pos : pos + 3 * n]
                pos += 3 * n
            if frame_palette is None:
                raise ValueError("GIF image with no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            indices = _lzw_decode(bytes(lzw), min_code, width * height)
            if iflags & 0x40:
                indices = _gif_deinterlace(indices, width, height)
            out = bytearray()
            for i in indices:
                out += frame_palette[3 * i : 3 * i + 3]
            return 3, width, height, bytes(out)
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def _lzw_decode(data: bytes, min_code: int, expect: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit stream, CLEAR=2^min, END=CLEAR+1,
    code width starts at min+1 and grows when the dict fills it, capped at
    12 bits until the next CLEAR."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code + 1

    width = min_code + 1
    reset()
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out[:expect]
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out[:expect]


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """GIF-flavor LZW encoder (dictionary-building, the real thing): emits
    CLEAR, then longest-match codes, growing width exactly when the DECODER's
    table reaches the width limit, CLEAR+reset at 4096 entries, END last."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    width = min_code + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # the decoder adds its entry AFTER reading the next code, so the
        # width must grow when next_code EXCEEDS the current capacity
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = fresh()
            next_code = end + 1
            width = min_code + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    interlace: bool = False,
    local_palette: bool = False,
) -> bytes:
    """REAL minimal GIF89a encode: 256-color table, one image frame,
    genuine dictionary-building LZW (see :func:`_lzw_encode`).
    ``interlace=True`` emits rows in the four-pass appendix-E stream
    order with the interlace flag set; ``local_palette=True`` carries
    the table as the frame's LOCAL color table (no global one) — both
    exist so the decoder's interlace/local-table paths have
    construction-checked fixtures."""
    assert len(indices) == width * height and len(palette) == 768
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    if local_palette:
        out += bytes([0x07, 0, 0])  # no global table
    else:
        out += bytes([0x80 | 0x07, 0, 0])  # global table, 256 entries
        out += palette
    out += b"\x2c" + bytes(4) + width.to_bytes(2, "little") + height.to_bytes(2, "little")
    iflags = (0x40 if interlace else 0) | (0x80 | 0x07 if local_palette else 0)
    out += bytes([iflags])
    if local_palette:
        out += palette
    if interlace:
        rows = [indices[r * width : (r + 1) * width] for r in range(height)]
        indices = b"".join(rows[r] for r in _gif_interlace_order(height))
    out += bytes([8])  # LZW min code size
    lzw = _lzw_encode(indices, 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def wrap_gif(
    media: DataFrame,
    width: int,
    height: int,
    palette: bytes,
    interlace: bool = False,
    local_palette: bool = False,
) -> DataFrame:
    """Re-container raw palette-index bytes in ``content`` as a REAL GIF
    (LZW-compressed; optionally interlaced and/or local-color-table).
    Arrow-batched narrow map — the encode half of the GIF round-trip
    entry."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(
                lambda b: encode_gif(
                    width, height, bytes(b), palette,
                    interlace=interlace, local_palette=local_palette,
                )
            )
            yield pdf

    return _spread(media).mapInPandas(batches, schema=media.schema)


def decode_gif_frames(data: bytes) -> list[tuple[int, int, bytes]]:
    """REAL animated-GIF decode WITH composition state: every image frame
    is LZW-inflated, deinterlaced if flagged, palette-mapped (per-frame
    local color tables override the global) and COMPOSED onto a
    logical-screen canvas honoring the preceding graphic-control
    extension — partial-update rects at (left, top), per-pixel
    transparency (pixels equal to the GCE transparent index leave the
    canvas untouched), and disposal methods 0/1 (keep), 2 (restore the
    rect to the background color — the global-palette background index,
    black when there is no global table), and 3 (restore the canvas to
    its pre-frame state). Emits one full-canvas snapshot per image
    frame: [(screen_w, screen_h, rgb bytes), ...]. Full-frame streams
    (the only kind the round-13 decoder accepted) compose to exactly
    the per-frame pixels, so this is a strict extension. Reserved
    disposal methods 4-7 raise ValueError (loud, never guessed)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w_screen = int.from_bytes(data[6:8], "little")
    h_screen = int.from_bytes(data[8:10], "little")
    flags = data[10]
    bg_index = data[11]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 ** ((flags & 7) + 1)
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    bg_rgb = (
        palette[3 * bg_index : 3 * bg_index + 3]
        if palette is not None and 3 * bg_index + 3 <= len(palette)
        else b"\x00\x00\x00"
    )
    canvas = bytearray(bg_rgb * (w_screen * h_screen))
    frames: list[tuple[int, int, bytes]] = []
    disposal = 0
    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        if block == 0x21:
            label = data[pos + 1]
            if label == 0xF9:  # graphic control: applies to the NEXT image
                packed = data[pos + 3]
                disposal = (packed >> 2) & 7
                transparent = data[pos + 6] if packed & 1 else None
                if disposal > 3:
                    raise ValueError(
                        f"reserved GIF disposal method {disposal}"
                    )
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            left = int.from_bytes(data[pos + 1 : pos + 3], "little")
            top = int.from_bytes(data[pos + 3 : pos + 5], "little")
            width = int.from_bytes(data[pos + 5 : pos + 7], "little")
            height = int.from_bytes(data[pos + 7 : pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            if left + width > w_screen or top + height > h_screen:
                raise ValueError(
                    f"GIF frame rect {width}x{height}@({left},{top}) exceeds "
                    f"the {w_screen}x{h_screen} logical screen"
                )
            frame_palette = palette
            if iflags & 0x80:  # local color table overrides the global
                n = 2 ** ((iflags & 7) + 1)
                frame_palette = data[pos : pos + 3 * n]
                pos += 3 * n
            if frame_palette is None:
                raise ValueError("GIF image with no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1  # the terminating 0-length sub-block
            indices = _lzw_decode(bytes(lzw), min_code, width * height)
            if iflags & 0x40:
                indices = _gif_deinterlace(indices, width, height)
            elif len(indices) != width * height:
                # same contract as _gif_deinterlace's guard: a truncated
                # LZW stream must surface as a descriptive error, not an
                # IndexError mid-composition
                raise ValueError(
                    f"GIF frame pixel stream has {len(indices)} indices; "
                    f"the {width}x{height} rect needs {width * height}"
                )
            saved = bytes(canvas) if disposal == 3 else None
            for r in range(height):
                row = (top + r) * w_screen
                for c in range(width):
                    i = indices[r * width + c]
                    if transparent is not None and i == transparent:
                        continue
                    o = 3 * (row + left + c)
                    canvas[o : o + 3] = frame_palette[3 * i : 3 * i + 3]
            frames.append((w_screen, h_screen, bytes(canvas)))
            if disposal == 2:  # restore the frame's rect to background
                for r in range(height):
                    row = (top + r) * w_screen
                    for c in range(width):
                        o = 3 * (row + left + c)
                        canvas[o : o + 3] = bg_rgb
            elif disposal == 3:  # restore to the pre-frame canvas
                canvas = bytearray(saved)
            disposal = 0
            transparent = None
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return frames


def encode_gif_animated(
    width: int,
    height: int,
    frames: list[bytes],
    palette: bytes,
    delay_cs: int = 10,
    controls: list[dict | None] | None = None,
) -> bytes:
    """REAL minimal animated GIF89a: NETSCAPE loop extension, per-frame
    graphic-control extension + image descriptor, genuine LZW per frame.

    ``controls`` (optional, one entry per frame, ``None`` = full-frame
    defaults) makes frame k a PARTIAL-UPDATE frame: ``{"left", "top",
    "width", "height"}`` place the frame's rect on the logical screen
    (``frames[k]`` must then hold rect-sized index bytes), ``"disposal"``
    (0-3) packs into the GCE disposal field, and ``"transparent"`` (a
    palette index or None) sets the GCE transparency flag+index so
    rect pixels equal to it leave the composed canvas untouched —
    the construction half of :func:`decode_gif_frames`'s composition
    canvas, so delta-framed fixtures are construction-checked."""
    assert len(palette) == 768
    if controls is None:
        controls = [None] * len(frames)
    assert len(controls) == len(frames)
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])
    out += palette
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for fr, ctl in zip(frames, controls):
        ctl = ctl or {}
        left = ctl.get("left", 0)
        top = ctl.get("top", 0)
        w = ctl.get("width", width)
        h = ctl.get("height", height)
        disposal = ctl.get("disposal", 0)
        transparent = ctl.get("transparent")
        assert len(fr) == w * h and left + w <= width and top + h <= height
        packed = ((disposal & 7) << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes([packed])
        out += delay_cs.to_bytes(2, "little")
        out += bytes([transparent or 0, 0])
        out += b"\x2c"
        out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0, 8])
        lzw = _lzw_encode(fr, 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


GIF_FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def gif_frame_features(media: DataFrame, sample: list[int]) -> DataFrame:
    """REAL video-style frame sampling: decode an animated GIF's frames
    (:func:`decode_gif_frames`), keep the requested ``sample`` indices, and
    emit integer-exact per-frame channel sums — the real-codec upgrade of
    the fake ``sample_frames`` fan-out (same mapInPandas shape, 1 row in ->
    k frame rows out)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames = decode_gif_frames(bytes(content))
                for k in sample:
                    _w, _h, px = frames[k]
                    sums = [0, 0, 0]
                    for i, byte in enumerate(px):
                        sums[i % 3] += byte
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": k,
                            "n_frames": len(frames),
                            "sum_r": sums[0],
                            "sum_g": sums[1],
                            "sum_b": sums[2],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_FRAME_FEATURE_SCHEMA.fields]
            )

    return _spread(media).mapInPandas(batches, schema=GIF_FRAME_FEATURE_SCHEMA)


def delta_gif_controls(
    width: int, height: int, frames: list[bytes]
) -> tuple[list[bytes], list[dict | None]]:
    """Re-express full frames 1..n-1 as PARTIAL-UPDATE deltas: each
    becomes the bounding rect of pixels that changed vs the previous
    frame, with unchanged pixels INSIDE the rect set to a transparent
    index (the smallest byte value absent from the rect's changed
    pixels — always exists: a rect holds < 256 distinct changed values
    whenever any pixel is unchanged) and disposal 1 (do not dispose),
    so composition over the canvas reproduces the full frames EXACTLY
    by construction. A frame identical to its predecessor degenerates
    to a fully-transparent 1x1 rect. Returns (frames', controls) for
    :func:`encode_gif_animated`."""
    out_frames: list[bytes] = [frames[0]]
    controls: list[dict | None] = [None]
    for prev, cur in zip(frames, frames[1:]):
        changed = [i for i in range(width * height) if cur[i] != prev[i]]
        if not changed:
            out_frames.append(b"\x00")
            controls.append(
                {"left": 0, "top": 0, "width": 1, "height": 1,
                 "disposal": 1, "transparent": 0}
            )
            continue
        rows = [i // width for i in changed]
        cols = [i % width for i in changed]
        top, bot = min(rows), max(rows)
        left, right = min(cols), max(cols)
        w, h = right - left + 1, bot - top + 1
        rect_has_unchanged = len(changed) < w * h
        if rect_has_unchanged:
            used = {cur[i] for i in changed}
            # if all 256 byte values appear among changed pixels there is
            # no free transparent index — overwrite unchanged pixels with
            # their own value instead (a no-op on the canvas)
            transparent = next((v for v in range(256) if v not in used), None)
        else:
            transparent = None
        rect = bytearray()
        for r in range(top, bot + 1):
            for c in range(left, right + 1):
                i = r * width + c
                rect.append(
                    transparent
                    if cur[i] == prev[i] and transparent is not None
                    else cur[i]
                )
        controls.append(
            {"left": left, "top": top, "width": w, "height": h,
             "disposal": 1, "transparent": transparent}
        )
        out_frames.append(bytes(rect))
    return out_frames, controls


def wrap_gif_animated(
    media: DataFrame,
    width: int,
    height: int,
    n_frames: int,
    palette: bytes,
    delta: bool = False,
) -> DataFrame:
    """Re-container raw concatenated per-frame index bytes in ``content`` as
    a REAL animated GIF (content length must be n_frames * width * height).
    ``delta=True`` ships frames 1..n-1 as partial-update bounding-rect
    deltas with transparency (:func:`delta_gif_controls`) — composed
    output is identical by construction, so the same oracle value-checks
    the composition canvas."""
    size = width * height

    def build(b) -> bytes:
        frames = [bytes(b)[k * size : (k + 1) * size] for k in range(n_frames)]
        if delta:
            frames, controls = delta_gif_controls(width, height, frames)
        else:
            controls = None
        return encode_gif_animated(width, height, frames, palette, controls=controls)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(build)
            yield pdf

    return _spread(media).mapInPandas(batches, schema=media.schema)


# ---------------------------------------------------------------------------
# QOI ("Quite OK Image", qoiformat.org spec 1.0) — a REAL compressed format
# whose whole codec is integer byte ops, so both halves live here stdlib-only.
# ---------------------------------------------------------------------------

def _qoi_index(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(channels: int, width: int, height: int, pixels: bytes) -> bytes:
    """REAL QOI encode (RGB, spec 1.0): greedy per-pixel op selection —
    RUN (<=62) for repeats, INDEX against the rolling 64-slot color table,
    DIFF for per-channel deltas in [-2,1], LUMA for green-anchored deltas,
    RGB literal otherwise. Alpha fixed at 255 (3-channel path)."""
    assert channels == 3 and len(pixels) == width * height * 3
    out = bytearray(b"qoif")
    out += width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes([3, 0])
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(width * height):
        r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        pos = _qoi_index(r, g, b, 255)
        if index[pos] == (r, g, b, 255):
            out.append(pos)
        else:
            index[pos] = (r, g, b, 255)
            dr = ((r - pr + 128) & 0xFF) - 128
            dg = ((g - pg + 128) & 0xFF) - 128
            db = ((b - pb + 128) & 0xFF) - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([0xFE, r, g, b])
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def _decode_qoi(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL QOI decode: full op set (RGB/RGBA literals, INDEX, DIFF, LUMA,
    RUN) with the rolling color table; emits RGB (alpha channel accepted in
    the stream but dropped — 4-channel containers still decode)."""
    if data[:4] != b"qoif" or len(data) < 14:
        raise ValueError("not a QOI stream")
    width = int.from_bytes(data[4:8], "big")
    height = int.from_bytes(data[8:12], "big")
    out = bytearray()
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    n_px = width * height
    while len(out) < 3 * n_px:
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        elif byte >> 6 == 0:  # INDEX
            r, g, b, a = index[byte]
            out += bytes((r, g, b))
            index[_qoi_index(r, g, b, a)] = (r, g, b, a)
            continue
        elif byte >> 6 == 1:  # DIFF
            r = (r + ((byte >> 4) & 3) - 2) & 0xFF
            g = (g + ((byte >> 2) & 3) - 2) & 0xFF
            b = (b + (byte & 3) - 2) & 0xFF
        elif byte >> 6 == 2:  # LUMA
            dg = (byte & 0x3F) - 32
            nxt = data[pos]
            pos += 1
            r = (r + dg + ((nxt >> 4) & 0x0F) - 8) & 0xFF
            g = (g + dg) & 0xFF
            b = (b + dg + (nxt & 0x0F) - 8) & 0xFF
        else:  # RUN
            run = (byte & 0x3F) + 1
            out += bytes((r, g, b)) * run
            continue
        index[_qoi_index(r, g, b, a)] = (r, g, b, a)
        out += bytes((r, g, b))
    if len(out) != 3 * n_px:
        raise ValueError("QOI run overflow past raster end")
    return 3, width, height, bytes(out)


def wrap_qoi(media: DataFrame, width: int, height: int) -> DataFrame:
    """Re-container raw RGB pixel bytes in ``content`` as a REAL QOI stream
    (:func:`encode_qoi`) — the encode half of the QOI round-trip entry;
    narrow Arrow-batched map, same shape as :func:`wrap_png`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(
                lambda b: encode_qoi(3, width, height, bytes(b))
            )
            yield pdf

    return _spread(media).mapInPandas(batches, schema=media.schema)
