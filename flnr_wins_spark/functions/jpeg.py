"""Baseline JPEG (JFIF) codec, stdlib+numpy only — the decode half is the
real product surface (web-crawl corpora are overwhelmingly JPEG), the encode
half exists so tests and the construction-checked oracle entry can build
genuine JPEG streams without PIL.

Reference parity note: the reference pipeline carries image-bearing blobs
opaquely (`/root/reference/src/wins_transform_staging.py:132,155` — SHAPE
passthrough); decoding is extension scope for the LLM-data-pipeline surface,
same contract as the PNG/GIF/QOI codecs in functions/multimodal.py.

Scope (honest-guard convention): baseline sequential (SOF0/1) AND
progressive (SOF2 — spectral selection + successive approximation, EOB
runs) Huffman decoding, 8-bit samples, grayscale or YCbCr with 4:4:4 /
4:2:2 / 4:2:0 subsampling, restart markers. Hierarchical, arithmetic
coding, and 12-bit precision raise ``NotImplementedError``.

Determinism: every step is integer arithmetic except the 8x8 (I)DCT, which
runs in float64 through one fixed numpy matrix product and rounds with
floor(x + 0.5) — bit-stable on a host, and EXACT (integer/8 is an exact
binary float) for DC-only blocks, which is what the oracle-checked entry
uses. Color conversion uses libjpeg's 16-bit fixed-point constants, so it is
integer-exact end to end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from flnr_wins_spark.parallel import spread as _spread

# ---------------------------------------------------------------------------
# Spec tables (ITU-T T.81 Annex K) — quantization + typical Huffman tables
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# natural (row-major) order; q[0] == 16 is what the DC-only oracle relies on
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (bits[1..16], huffval) — Annex K "typical" tables
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis matrix: C[u, x] = c(u)/2 * cos((2x+1)u pi / 16).
# Forward: S = C s C^T ; inverse: s = C^T S C. One fixed float64 matrix.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _rha(x: float) -> int:
    """Round half away from zero — the quantizer rounding, chosen because a
    SQL oracle reproduces it with integer ops: sign(a) * ((2|a| + q) // 2q)."""
    return int(np.floor(x + 0.5)) if x >= 0 else -int(np.floor(-x + 0.5))


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


# fixed-point color constants (libjpeg jccolor/jdcolor, scale 2^16)
_FIX = lambda x: int(x * 65536 + 0.5)  # noqa: E731
_ONE_HALF = 1 << 15


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = (_FIX(0.299) * r + _FIX(0.587) * g + _FIX(0.114) * b + _ONE_HALF) >> 16
    cb = ((-_FIX(0.168735892) * r - _FIX(0.331264108) * g + _FIX(0.5) * b
           + _ONE_HALF) >> 16) + 128
    cr = ((_FIX(0.5) * r - _FIX(0.418687589) * g - _FIX(0.081312411) * b
           + _ONE_HALF) >> 16) + 128
    return _clamp(y), _clamp(cb), _clamp(cr)


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    cb -= 128
    cr -= 128
    r = y + ((_FIX(1.402) * cr + _ONE_HALF) >> 16)
    g = y - ((_FIX(0.344136286) * cb + _FIX(0.714136286) * cr + _ONE_HALF) >> 16)
    b = y + ((_FIX(1.772) * cb + _ONE_HALF) >> 16)
    return _clamp(r), _clamp(g), _clamp(b)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    surfaces RSTn markers to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached: feed padding bits; caller handles the marker
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker byte pair; returns the marker code."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or d[self.pos + 1] in (0x00, 0xFF):
            self.pos += 1
        m = d[self.pos + 1]
        self.pos += 2
        return m


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t raw bits to the signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline (SOF0/SOF1) or PROGRESSIVE (SOF2) Huffman JFIF
    stream. Returns (channels, width, height, pixel bytes row-major,
    channel-interleaved; channels is 1 for grayscale, 3 for YCbCr->RGB).

    Architecture: every entropy-coded scan decodes into per-component raw
    DCT-coefficient planes — baseline is the degenerate one-scan case
    (Ss=0, Se=63, Ah=Al=0, interleaved); progressive accumulates DC/AC
    first and refinement scans (spectral selection + successive
    approximation, EOB runs, per the T.81 G.2 procedures). Dequantization,
    IDCT, chroma upsampling, and color conversion run once at EOI from the
    final coefficients, so a spectral/successive scan script and a
    baseline scan of the same quantized coefficients decode to IDENTICAL
    pixels (the property the tests pin).

    Supports 8-bit samples, 1 or 3 components, subsampling up to 2x2,
    restart intervals, 8/16-bit quantization tables. Hierarchical,
    arithmetic-coded, and 12-bit frames raise ``NotImplementedError`` —
    the module's honest-guard convention.
    """
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG stream (missing SOI)")
    qt: dict[int, list[int]] = {}
    hufftabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    coefs = None
    restart_interval = 0
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = data[i + 1]
        i += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[i : i + 2], "big")
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = list(seg[p : p + 64])
                    p += 64
                else:
                    vals = [
                        int.from_bytes(seg[p + 2 * k : p + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                    p += 128
                table = [0] * 64
                for k in range(64):
                    table[ZIGZAG[k]] = vals[k]
                qt[tq] = table
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                hufftabs[(tc, th)] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit sample precision")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError("only 1- or 3-component JPEG")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("subsampling factors above 2 not supported")
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            frame = {
                "w": width, "h": height, "comps": comps,
                "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
                "progressive": marker == 0xC2,
            }
            # raw coefficient planes (natural order), MCU-padded
            coefs = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported frame type SOF marker 0x{marker:02X}")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(
                    k for k, x in enumerate(frame["comps"]) if x["id"] == cs
                )
                scan.append((ci, tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahl = seg[3 + 2 * ns]
            i = _decode_scan_into(
                data, i + seglen, frame, scan, hufftabs, restart_interval,
                coefs, ss, se, ahl >> 4, ahl & 0x0F,
            )
            continue
        i += seglen
    if frame is None or coefs is None:
        raise ValueError("no frame decoded")
    return _reconstruct(frame, coefs, qt)


def _comp_blocks(frame, ci):
    """True (non-padded) block-grid dims for a component — what
    non-interleaved scans traverse (T.81 A.2.2)."""
    c = frame["comps"][ci]
    cw = (frame["w"] * c["h"] + frame["hmax"] - 1) // frame["hmax"]
    ch = (frame["h"] * c["v"] + frame["vmax"] - 1) // frame["vmax"]
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_scan_into(
    data, pos, frame, scan, hufftabs, restart_interval, coefs, ss, se, ah, al
):
    """Decode one entropy-coded scan into the raw coefficient planes.
    Returns the stream offset just past the scan. Handles all four
    progressive scan kinds plus the baseline full-band scan uniformly."""
    br = _BitReader(data, pos)
    pred = [0] * len(frame["comps"])
    eobrun = 0

    def decode_block(ci, by, bx, td, ta):
        nonlocal eobrun
        block = coefs[ci][by, bx]
        if ss == 0:
            if ah == 0:  # DC first (or baseline DC)
                t = _huff_decode(br, hufftabs[(0, td)])
                diff = _extend(br.bits(t), t)
                pred[ci] += diff
                block[0] = pred[ci] << al
            else:  # DC refinement: one raw bit
                if br.bit():
                    block[0] |= 1 << al
            if se == 0:
                return
        if ah == 0:  # AC first scan (or baseline AC band)
            if eobrun > 0:
                eobrun -= 1
                return
            k = max(ss, 1)
            act = hufftabs[(1, ta)]
            while k <= se:
                rs = _huff_decode(br, act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    # EOBn: run of 2^r + bits(r) blocks ends here
                    eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                    break
                k += r
                if k > se:
                    raise ValueError("AC index overflow")
                block[ZIGZAG[k]] = _extend(br.bits(s), s) << al
                k += 1
        else:  # AC refinement scan (T.81 G.1.2.3)
            act = hufftabs[(1, ta)]
            p1, m1 = 1 << al, -1 << al

            def refine(k):
                v = block[ZIGZAG[k]]
                if v and br.bit() and not (abs(v) & p1):
                    block[ZIGZAG[k]] += p1 if v > 0 else m1

            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(br, act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) + (br.bits(r) if r else 0)
                            break
                        val = 0  # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("invalid refinement magnitude")
                        val = p1 if br.bit() else m1
                    while k <= se:
                        if block[ZIGZAG[k]] != 0:
                            refine(k)
                            k += 1
                        else:
                            if r == 0:
                                if val:
                                    block[ZIGZAG[k]] = val
                                k += 1
                                break
                            r -= 1
                            k += 1
            if eobrun > 0:
                while k <= se:
                    refine(k)
                    k += 1
                eobrun -= 1

    def restart():
        nonlocal eobrun, pred
        m = br.align_to_marker()
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
        pred = [0] * len(frame["comps"])
        eobrun = 0

    if len(scan) > 1 or (ss == 0 and not frame["progressive"]):
        # interleaved: MCU traversal over all scan components
        count = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if restart_interval and count and count % restart_interval == 0:
                    restart()
                for ci, td, ta in scan:
                    c = frame["comps"][ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                ci, my * c["v"] + by, mx * c["h"] + bx, td, ta
                            )
                count += 1
    else:
        # non-interleaved: the single component's true block grid
        ci, td, ta = scan[0]
        bh, bw = _comp_blocks(frame, ci)
        count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and count and count % restart_interval == 0:
                    restart()
                decode_block(ci, by, bx, td, ta)
                count += 1
    # skip remaining pad bits, then rewind before any non-RST marker so the
    # outer loop sees the next segment
    br.acc = 0
    br.nbits = 0
    d = br.data
    p = br.pos
    while p < len(d) - 1 and (d[p] != 0xFF or d[p + 1] in (0x00, 0xFF)):
        p += 1
    return p


def _reconstruct(frame, coefs, qt):
    """Dequantize + IDCT all blocks, upsample, color-convert — shared back
    half for baseline and progressive."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        q = np.array(qt[c["tq"]], dtype=np.int64)
        by_n, bx_n = coefs[ci].shape[:2]
        plane = np.zeros((by_n * 8, bx_n * 8), dtype=np.int32)
        for by in range(by_n):
            for bx in range(bx_n):
                block = coefs[ci][by, bx].astype(np.int64) * q
                spatial = _C.T @ block.reshape(8, 8).astype(np.float64) @ _C
                px = np.floor(spatial + 128.5).astype(np.int32)
                np.clip(px, 0, 255, out=px)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
        planes.append(plane)
    if len(comps) == 1:
        return 1, w, h, planes[0][:h, :w].astype(np.uint8).tobytes()
    out = np.zeros((h, w, 3), dtype=np.uint8)
    ups = []
    for ci, c in enumerate(comps):
        ys = (np.arange(h) * c["v"]) // frame["vmax"]
        xs = (np.arange(w) * c["h"]) // frame["hmax"]
        ups.append(planes[ci][np.ix_(ys, xs)])
    yp, cbp, crp = ups[0], ups[1], ups[2]
    for yy in range(h):
        for xx in range(w):
            out[yy, xx] = _ycbcr_to_rgb(
                int(yp[yy, xx]), int(cbp[yy, xx]), int(crp[yy, xx])
            )
    return 3, w, h, out.tobytes()


# ---------------------------------------------------------------------------
# Encoder (fixture/oracle side)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _csize(v: int) -> int:
    """Magnitude category (number of bits) of a coefficient value."""
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def _block_zz(block, q):
    """Forward-DCT + quantize one level-shifted spatial block; returns the
    64 zigzag-order coefficients."""
    coef = _C @ block.astype(np.float64) @ _C.T
    # snap near-integer coefficients: a flat block's DC is EXACTLY 8*mean,
    # but float cosine products leave ~1e-13 noise that flips the quantizer
    # at .5 boundaries — the DC-only oracle entry needs rha() of the exact
    # rational, and snapping is a no-op for genuinely fractional coefficients
    snapped = np.round(coef)
    coef = np.where(np.abs(coef - snapped) < 1e-6, snapped, coef)
    zz = [0] * 64
    for k in range(64):
        nat = ZIGZAG[k]
        zz[k] = _rha(coef.flat[nat] / q[nat])
    return zz


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    """Quantize one level-shifted spatial block and Huffman-encode it
    (baseline full-band coding). Returns the new DC predictor."""
    zz = _block_zz(block, q)
    diff = zz[0] - pred
    t = _csize(diff)
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s = _csize(zz[k])
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        v = zz[k]
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return zz[0]


def _prepare_components(width, height, pixels, channels, subsampling):
    """Shared encode front half: color transform, chroma downsample,
    MCU-pad by edge replication, level shift. Returns (comps, hmax, vmax,
    mcux, mcuy) with each comp carrying its padded int32 plane."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 1:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": arr[:, :, 0]}]
    else:
        ycc = np.zeros((height, width, 3), dtype=np.int32)
        for yy in range(height):
            for xx in range(width):
                ycc[yy, xx] = _rgb_to_ycbcr(*(int(v) for v in arr[yy, xx]))
        sub = [(1, 1)] * 3 if subsampling == "444" else [(2, 2), (1, 1), (1, 1)]
        hmax = max(s[0] for s in sub)
        vmax = max(s[1] for s in sub)
        comps = []
        for ci in range(3):
            hs, vs = sub[ci]
            plane = ycc[:, :, ci]
            if (hs, vs) != (hmax, vmax):
                # box-average downsample by the factor ratio (2x2 -> 1)
                fy, fx = vmax // vs, hmax // hs
                ph = (height + fy - 1) // fy
                pw = (width + fx - 1) // fx
                dn = np.zeros((ph, pw), dtype=np.int32)
                for yy in range(ph):
                    for xx in range(pw):
                        cell = plane[
                            yy * fy : min((yy + 1) * fy, height),
                            xx * fx : min((xx + 1) * fx, width),
                        ]
                        dn[yy, xx] = _rha(float(cell.mean()))
                plane = dn
            comps.append(
                {"id": ci + 1, "h": hs, "v": vs, "tq": 0 if ci == 0 else 1,
                 "plane": plane}
            )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its MCU-aligned size by edge replication
    for c in comps:
        ph, pw = mcuy * 8 * c["v"], mcux * 8 * c["h"]
        plane = c["plane"]
        ys = np.minimum(np.arange(ph), plane.shape[0] - 1)
        xs = np.minimum(np.arange(pw), plane.shape[1] - 1)
        c["plane"] = plane[np.ix_(ys, xs)].astype(np.int32) - 128
    return comps, hmax, vmax, mcux, mcuy


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode row-major 8-bit pixels (gray when ``channels=1``, RGB
    interleaved when 3) as a real baseline JFIF stream with the Annex K
    quantization and Huffman tables. ``subsampling``: "444" or "420"
    (3-channel only); ``restart_interval`` > 0 writes a DRI segment and
    RSTn markers every N MCUs (predictors reset — exercises the decoder's
    restart path). Deterministic: fixed tables, fixed-point color
    conversion, float64 DCT with half-away-from-zero quantizer rounding."""
    comps, hmax, vmax, mcux, mcuy = _prepare_components(
        width, height, pixels, channels, subsampling
    )
    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                q = QUANT_LUMA if c["tq"] == 0 else QUANT_CHROMA
                dct, act = (dc_l, ac_l) if c["tq"] == 0 else (dc_c, ac_c)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        block = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(bw, block, q, dct, act, pred[ci])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tq: int, table: list[int]) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(table[ZIGZAG[k]] for k in range(64)))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += dqt(0, QUANT_LUMA)
    if len(comps) == 3:
        out += dqt(1, QUANT_CHROMA)
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC0, sof)
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if len(comps) == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([len(comps)])
    for c in comps:
        td_ta = 0x00 if c["tq"] == 0 else 0x11
        sos += bytes([c["id"], td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Progressive AC scans need EOBn symbols (r<<4 with r=1..14), which the
# Annex K baseline tables don't carry. This "flat" table holds every rs
# symbol: 255 codes at 8 bits + 1 at 9 (the all-ones 8-bit code must stay
# reserved per T.81 C.2), canonical order = symbol order.
_AC_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_AC_FLAT_VALS = list(range(256))


def _trunc(v: int, al: int) -> int:
    """Point transform for AC coefficients: divide by 2^Al toward zero."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    subsampling: str = "444",
) -> bytes:
    """Encode pixels as a PROGRESSIVE (SOF2) JFIF stream exercising every
    scan kind the decoder implements: interleaved DC first at Al=1, DC
    refinement, per-component spectral-selection AC first scans (bands
    1-5 and 6-63) at Al=1 with cross-block EOB-run accumulation, and
    per-component AC refinement scans down to Al=0.

    Starts from the SAME quantized coefficients as :func:`encode_jpeg`
    (shared `_prepare_components` + `_block_zz`), so decoding this stream
    must yield pixels IDENTICAL to decoding the baseline stream — the
    equivalence the test suite pins.
    """
    comps, hmax, vmax, mcux, mcuy = _prepare_components(
        width, height, pixels, channels, subsampling
    )
    frame = {
        "w": width, "h": height, "comps": comps,
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
    }
    # full-band quantized coefficients for every MCU-grid block
    zz_all = []
    for c in comps:
        q = QUANT_LUMA if c["tq"] == 0 else QUANT_CHROMA
        rows = []
        for by in range(mcuy * c["v"]):
            row = []
            for bx in range(mcux * c["h"]):
                block = c["plane"][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                row.append(_block_zz(block, q))
            rows.append(row)
        zz_all.append(rows)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_flat = _build_codes(_AC_FLAT_BITS, _AC_FLAT_VALS)

    def comp_true_blocks(ci):
        c = comps[ci]
        cw = (width * c["h"] + hmax - 1) // hmax
        ch = (height * c["v"] + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def sos_header(scan_comps, ss, se, ah, al):
        body = bytes([len(scan_comps)])
        for ci in scan_comps:
            td = 0 if comps[ci]["tq"] == 0 else 1
            body += bytes([comps[ci]["id"], (td << 4) | 0x02])  # ta=2: flat AC
        body += bytes([ss, se, (ah << 4) | al])
        return bytes([0xFF, 0xDA]) + (len(body) + 2).to_bytes(2, "big") + body

    scans = bytearray()

    # --- scan 1: DC first, interleaved, Al=1 -------------------------------
    bw = _BitWriter()
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                dct = dc_l if c["tq"] == 0 else dc_c
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = zz_all[ci][my * c["v"] + by][mx * c["h"] + bx][0] >> 1
                        diff = v - pred[ci]
                        pred[ci] = v
                        t = _csize(diff)
                        code, ln = dct[t]
                        bw.put(code, ln)
                        if t:
                            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    scans += sos_header(list(range(len(comps))), 0, 0, 0, 1) + bw.out

    # --- per-component AC first scans (two spectral bands), Al=1 -----------
    def ac_first_scan(ci, ss, se, al):
        bw = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_flat[r << 4]
                bw.put(code, ln)
                if r:
                    bw.put(eobrun - (1 << r), r)
                eobrun = 0

        bh, bwd = comp_true_blocks(ci)
        for by in range(bh):
            for bx in range(bwd):
                ts = [_trunc(v, al) for v in zz_all[ci][by][bx]]
                last = 0
                for k in range(ss, se + 1):
                    if ts[k]:
                        last = k
                if last == 0:  # band all zero -> extend the EOB run
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(ss, last + 1):
                    if ts[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_flat[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    s = _csize(ts[k])
                    code, ln = ac_flat[(run << 4) | s]
                    bw.put(code, ln)
                    v = ts[k]
                    bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < se:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        bw.flush()
        return sos_header([ci], ss, se, 0, al) + bw.out

    for ci in range(len(comps)):
        scans += ac_first_scan(ci, 1, 5, 1)
        scans += ac_first_scan(ci, 6, 63, 1)

    # --- scan: DC refinement, interleaved, Al=0 ----------------------------
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bw.put(zz_all[ci][my * c["v"] + by][mx * c["h"] + bx][0] & 1, 1)
    bw.flush()
    scans += sos_header(list(range(len(comps))), 0, 0, 1, 0) + bw.out

    # --- per-component AC refinement scans, Ah=1 -> Al=0 -------------------
    def ac_refine_scan(ci, ss, se, al):
        bw = _BitWriter()
        bh, bwd = comp_true_blocks(ci)
        for by in range(bh):
            for bx in range(bwd):
                ts = [_trunc(v, al) for v in zz_all[ci][by][bx]]
                news = [k for k in range(ss, se + 1) if abs(ts[k]) == 1]
                if not news:
                    code, ln = ac_flat[0x00]  # EOB covering just this block
                    bw.put(code, ln)
                    for k in range(ss, se + 1):
                        if ts[k]:
                            bw.put(abs(ts[k]) & 1, 1)
                    continue
                k = ss
                for nk in news:
                    while True:
                        run = sum(1 for j in range(k, nk) if ts[j] == 0)
                        if run <= 15:
                            break
                        code, ln = ac_flat[0xF0]  # ZRL: 16 zero-history slots
                        bw.put(code, ln)
                        cnt = 0
                        while cnt < 16:
                            if ts[k] == 0:
                                cnt += 1
                            else:
                                bw.put(abs(ts[k]) & 1, 1)
                            k += 1
                    code, ln = ac_flat[(run << 4) | 1]
                    bw.put(code, ln)
                    bw.put(1 if ts[nk] > 0 else 0, 1)
                    while k < nk:
                        if ts[k]:
                            bw.put(abs(ts[k]) & 1, 1)
                        k += 1
                    k = nk + 1
                if k <= se:
                    code, ln = ac_flat[0x00]
                    bw.put(code, ln)
                    for j in range(k, se + 1):
                        if ts[j]:
                            bw.put(abs(ts[j]) & 1, 1)
        bw.flush()
        return sos_header([ci], ss, se, al + 1, al) + bw.out

    for ci in range(len(comps)):
        scans += ac_refine_scan(ci, 1, 63, 0)

    # --- headers -----------------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tq: int, table: list[int]) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(table[ZIGZAG[k]] for k in range(64)))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, QUANT_LUMA)
    if len(comps) == 3:
        out += dqt(1, QUANT_CHROMA)
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    if len(comps) == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(1, 2, _AC_FLAT_BITS, _AC_FLAT_VALS)
    out += scans
    out += b"\xff\xd9"
    return bytes(out)


def wrap_jpeg_progressive(media, channels: int, width: int, height: int,
                          subsampling: str = "444"):
    """Re-container raw pixel bytes as a PROGRESSIVE (SOF2) JPEG stream
    (see :func:`encode_jpeg_progressive`) — the encode half of the
    progressive round-trip entry; mirrors :func:`wrap_jpeg`."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(
                lambda b: encode_jpeg_progressive(
                    width, height, bytes(b), channels=channels,
                    subsampling=subsampling,
                )
            )
            yield pdf

    return _spread(media).mapInPandas(batches, schema=media.schema)


def wrap_jpeg(media, channels: int, width: int, height: int, subsampling: str = "444"):
    """Re-container raw pixel bytes in the ``content`` column as a REAL
    baseline JPEG (see :func:`encode_jpeg`). A narrow Arrow-batched map —
    the deterministic encode half of the JPEG round-trip entry; mirrors
    multimodal.wrap_png."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(
                lambda b: encode_jpeg(
                    width, height, bytes(b), channels=channels,
                    subsampling=subsampling,
                )
            )
            yield pdf

    return _spread(media).mapInPandas(batches, schema=media.schema)
