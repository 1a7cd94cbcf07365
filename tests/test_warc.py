"""WARC container ingestion tests — sources/warc.py (ISO 28500 /
Common Crawl multi-member-gzip layout)."""

from __future__ import annotations

import gzip

import pytest

from flnr_wins_spark.sources.warc import (
    encode_warc_gz,
    parse_warc_record,
    split_gzip_members,
)


def _recs(n=3):
    return [
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:doc:{i}>",
                "WARC-Target-URI": f"http://crawl.test/doc/{i}",
                "Content-Type": "text/html",
            },
            "payload": f"<p>doc {i} body</p>".encode(),
        }
        for i in range(n)
    ]


def test_roundtrip_multi_member():
    blob = encode_warc_gz(_recs(3))
    members = list(split_gzip_members(blob))
    assert len(members) == 3  # one gzip member PER RECORD (seekable layout)
    for i, m in enumerate(members):
        headers, payload = parse_warc_record(m)
        assert headers["_version"] == "WARC/1.0"
        assert headers["WARC-Type"] == "response"
        assert headers["WARC-Record-ID"] == f"<urn:doc:{i}>"
        assert int(headers["Content-Length"]) == len(payload)
        assert payload == f"<p>doc {i} body</p>".encode()


def test_encoding_is_deterministic():
    assert encode_warc_gz(_recs()) == encode_warc_gz(_recs())


def test_members_are_standard_gzip():
    # each member must decompress with plain stdlib gzip too (real WARC
    # readers split-then-gunzip)
    blob = encode_warc_gz(_recs(1))
    assert gzip.decompress(blob).startswith(b"WARC/1.0\r\n")


def test_payload_may_contain_crlf_and_binary():
    payload = b"\r\n\r\nWARC/1.0 fake header inside payload\x00\xff" * 10
    blob = encode_warc_gz(
        [{"headers": {"WARC-Type": "resource"}, "payload": payload}]
    )
    headers, got = parse_warc_record(next(split_gzip_members(blob)))
    assert got == payload  # Content-Length framing, not delimiter scanning


def test_malformed_records_raise_loudly():
    with pytest.raises(ValueError, match="no header terminator"):
        parse_warc_record(b"WARC/1.0\r\nWARC-Type: response")
    with pytest.raises(ValueError, match="bad version line"):
        parse_warc_record(b"HTTP/1.1 200 OK\r\n\r\nbody")
    with pytest.raises(ValueError, match="missing Content-Length"):
        parse_warc_record(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody")
    with pytest.raises(ValueError, match="truncated payload"):
        parse_warc_record(
            b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
        )


def test_read_warc_spark_roundtrip(spark, tmp_path):
    from flnr_wins_spark.sources.warc import read_warc, warc_text

    # two files, three records each, written as real .warc.gz
    for f in range(2):
        recs = [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": f"http://t/{f}/{i}",
                    "Content-Type": "text/html",
                },
                "payload": f"file {f} rec {i}".encode(),
            }
            for i in range(3)
        ]
        (tmp_path / f"{f}.warc.gz").write_bytes(encode_warc_gz(recs))
    df = warc_text(read_warc(spark, str(tmp_path)))
    rows = df.collect()
    assert len(rows) == 6
    got = {(r.target_uri, r.rec_idx, r.text, r.content_length) for r in rows}
    assert ("http://t/1/2", 2, "file 1 rec 2", len(b"file 1 rec 2")) in got
    # plan contract: Arrow-batched decode, never row-at-a-time Python
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_zstd_bare_magic_is_a_truncated_frame():
    # r10: zstd is a real path now (pyarrow codec + RFC 8878 walk); a
    # bare magic with no header is a LOUD truncation, never a hang or
    # an empty iterator
    from flnr_wins_spark.sources.warc import split_zstd_frames

    with pytest.raises(ValueError, match="truncated"):
        next(split_zstd_frames(b"\x28\xb5\x2f\xfd"))


def test_warc_roundtrip_property():
    """Property: any (headers, payload) set round-trips bit-exactly
    through encode -> member-split -> parse, including empty payloads,
    high-bit bytes, and CRLF-rich content."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.lists(
        st.binary(min_size=0, max_size=200), min_size=1, max_size=6
    )

    @given(ps=payloads)
    @settings(max_examples=25, deadline=None)
    def check(ps):
        recs = [
            {"headers": {"WARC-Type": "resource", "WARC-Record-ID": f"<r:{i}>"},
             "payload": p}
            for i, p in enumerate(ps)
        ]
        blob = encode_warc_gz(recs)
        members = list(split_gzip_members(blob))
        assert len(members) == len(ps)
        for i, m in enumerate(members):
            headers, payload = parse_warc_record(m)
            assert payload == ps[i]
            assert headers["WARC-Record-ID"] == f"<r:{i}>"

    check()


# ---------------------------------------------------------------------------
# zstd (.warc.zst) container — round 10: the honest guard became a real path
# (pyarrow's bundled zstd codec + a pure RFC 8878 frame walk)
# ---------------------------------------------------------------------------

def _zrecs():
    return [
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:{i}>",
                "WARC-Target-URI": f"http://example.com/{i}",
                "Content-Type": "text/html",
            },
            "payload": (f"<html>doc {i}</html>" * (i + 1)).encode(),
        }
        for i in range(4)
    ]


def test_zstd_roundtrip_and_skippable_frames():
    from flnr_wins_spark.sources.warc import (
        encode_warc_zst,
        parse_warc_record,
        split_zstd_frames,
    )

    blob = encode_warc_zst(_zrecs())
    got = [parse_warc_record(m) for m in split_zstd_frames(blob)]
    assert [h["WARC-Target-URI"] for h, _p in got] == [
        f"http://example.com/{i}" for i in range(4)
    ]
    assert got[2][1] == b"<html>doc 2</html>" * 3
    # a leading skippable frame (the dictionary-carrier slot in the
    # crawl layout) is skipped, not decoded
    skip = (0x184D2A50).to_bytes(4, "little") + (5).to_bytes(4, "little") + b"DICT!"
    assert len(list(split_zstd_frames(skip + blob))) == 4


def test_zstd_loud_failures():
    import pytest

    from flnr_wins_spark.sources.warc import encode_warc_zst, split_zstd_frames

    with pytest.raises(ValueError, match="not a zstd frame"):
        list(split_zstd_frames(b"garbage bytes here"))
    # truncated final frame
    blob = encode_warc_zst(_zrecs())
    with pytest.raises(ValueError):
        list(split_zstd_frames(blob[: len(blob) - 3]))
    # a frame declaring a dictionary ID: honest NotImplementedError.
    # Craft one by flipping the frame-header descriptor's DID flag on a
    # real frame (magic[4] is the descriptor byte).
    frame = bytearray(encode_warc_zst(_zrecs()[:1]))
    frame[4] |= 0b01
    with pytest.raises(NotImplementedError, match="dictionary"):
        list(split_zstd_frames(bytes(frame)))


def test_zstd_truncated_skippable_frames_raise():
    """Skippable frames keep the loud-truncation contract (ADVICE r10):
    a header too short for its 4-byte size field, and a declared size
    running past the buffer, both raise — neither silently stops the
    split (which would drop every following content frame)."""
    import pytest

    from flnr_wins_spark.sources.warc import encode_warc_zst, split_zstd_frames

    blob = encode_warc_zst(_zrecs())
    magic = (0x184D2A50).to_bytes(4, "little")
    # header cut mid-size-field: int.from_bytes on the short slice would
    # silently yield a wrong size
    for cut in (magic + (99).to_bytes(4, "little")[:2],
                blob + magic + (5).to_bytes(4, "little")[:3]):
        with pytest.raises(ValueError, match="truncated zstd skippable"):
            list(split_zstd_frames(cut))
    # declared size past the buffer end
    short = blob + magic + (100).to_bytes(4, "little") + b"only-ten-b"
    with pytest.raises(ValueError, match="truncated zstd skippable"):
        list(split_zstd_frames(short))
    # intact skippable between content frames still splits cleanly
    ok = blob + magic + (3).to_bytes(4, "little") + b"pad" + blob
    assert len(list(split_zstd_frames(ok))) == 8


def test_read_warc_zst_through_spark(spark, tmp_path):
    """The Spark read path detects the zstd container per file and yields
    the same row shape as the gzip path."""
    from flnr_wins_spark.sources.warc import encode_warc_zst, read_warc, warc_text

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "part-0.warc.zst").write_bytes(encode_warc_zst(_zrecs()))
    df = read_warc(spark, str(d))
    rows = {r["target_uri"]: r for r in df.collect()}
    assert len(rows) == 4
    assert rows["http://example.com/1"]["content_length"] == len(
        b"<html>doc 1</html>" * 2
    )
    texts = {r["target_uri"]: r["text"] for r in warc_text(df).collect()}
    assert texts["http://example.com/3"] == "<html>doc 3</html>" * 4


def test_read_warc_mixed_containers_and_unknown_magic(spark, tmp_path):
    from flnr_wins_spark.sources.warc import (
        encode_warc_gz,
        encode_warc_zst,
        read_warc,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(encode_warc_gz(_zrecs()[:2]))
    (d / "b.warc.zst").write_bytes(encode_warc_zst(_zrecs()[2:]))
    assert read_warc(spark, str(d)).count() == 4

    (d / "c.warc.gz").write_bytes(b"not a container")
    import pytest

    # the executor-side ValueError surfaces loudly (PySpark wraps it)
    with pytest.raises(Exception, match="unrecognized WARC container"):
        read_warc(spark, str(d)).count()


def test_dict_zstd_probe_and_decode_path():
    """r12 VERDICT task 6: dictionary-frame .warc.zst decodes IF a
    dict-capable zstd binding (zstandard/pyzstd) is importable, else the
    walker keeps its honest loud raise. This container ships neither
    binding, so the None arm is the documented binding-absent check; the
    round-trip arm runs automatically if a binding ever appears."""
    import pytest

    from flnr_wins_spark.sources.warc import (
        dict_zstd_binding,
        encode_warc_zst,
        split_zstd_frames,
    )

    binding = dict_zstd_binding()
    if binding is None:
        # documented absence: the dict-flagged-frame raise names both
        # probe targets so the remedy is in the message
        frame = bytearray(encode_warc_zst(_zrecs()[:1]))
        frame[4] |= 0b01
        with pytest.raises(NotImplementedError, match="zstandard"):
            list(split_zstd_frames(bytes(frame)))
        return

    # binding present: build a real dictionary-compressed frame behind a
    # skippable carrier and round-trip it through the splitter
    import zstandard

    samples = [f"<html>sample doc {i}</html>".encode() * 4 for i in range(64)]
    dict_bytes = zstandard.train_dictionary(4096, samples).as_bytes()
    cdict = zstandard.ZstdCompressionDict(dict_bytes)
    payload = b"<html>dictionary-compressed record</html>" * 3
    frame = zstandard.ZstdCompressor(dict_data=cdict).compress(payload)
    carrier = (
        (0x184D2A5D).to_bytes(4, "little")
        + len(dict_bytes).to_bytes(4, "little")
        + dict_bytes
    )
    got = list(split_zstd_frames(carrier + frame))
    assert got == [payload]
    # a PADDING skippable (non-dictionary nibble) between the carrier and
    # the content frame must not clobber the dictionary
    pad = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"pad"
    assert list(split_zstd_frames(carrier + pad + frame)) == [payload]
    # and a dict frame with NO carrier is a loud ValueError
    with pytest.raises(ValueError, match="no preceding skippable"):
        list(split_zstd_frames(frame))


def _fake_dict_frame() -> bytes:
    """Hand-crafted dict-flagged zstd frame the RFC 8878 walker parses
    deterministically (binding-independent — never actually decoded):
    fhd 0x21 = single_segment + 1-byte Dictionary_ID, 1-byte FCS, one
    final raw block of 4 stored bytes."""
    return (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x21, 0x07, 0x04])       # fhd, DID=7, FCS=4
        + (1 | (4 << 3)).to_bytes(3, "little")  # last raw block, 4 bytes
        + b"RAW!"
    )


def test_lazy_dict_promotion_validates_padding_payloads(monkeypatch):
    """r13 ADVICE (warc.py): a non-0x184D2A5D skippable (padding) must
    NOT be adopted eagerly as the dictionary — it is promoted lazily,
    only when a dict-flagged frame needs it AND it carries the zstd
    dictionary magic 0xEC30A437; garbage padding before a dict frame is
    a clear ValueError, not an opaque zstd decode error. A fake binding
    is injected so the needs_dict path runs in this binding-less
    container; the real-binding round-trip lives in
    test_dict_zstd_probe_and_decode_path."""
    import pytest

    from flnr_wins_spark.sources import warc as W

    calls = []

    def fake(frame: bytes, dict_bytes: bytes) -> bytes:
        calls.append((frame, dict_bytes))
        return b"DECODED"

    monkeypatch.setattr(W, "_DICT_ZSTD_PROBED", True)
    monkeypatch.setattr(W, "_DICT_ZSTD", fake)

    frame = _fake_dict_frame()
    pad = (0x184D2A50).to_bytes(4, "little") + (8).to_bytes(4, "little") + b"garbage!"
    dict_payload = b"\x37\xa4\x30\xec" + b"rest-of-trained-dictionary"
    dictish_pad = (
        (0x184D2A50).to_bytes(4, "little")
        + len(dict_payload).to_bytes(4, "little")
        + dict_payload
    )
    carrier = (
        (0x184D2A5D).to_bytes(4, "little") + (7).to_bytes(4, "little") + b"rawdict"
    )

    # garbage padding is NOT a dictionary: loud ValueError naming the magic
    with pytest.raises(ValueError, match="0xEC30A437"):
        list(W.split_zstd_frames(pad + frame))
    assert calls == []

    # a padding-nibble payload WITH the dictionary magic promotes lazily
    assert list(W.split_zstd_frames(dictish_pad + frame)) == [b"DECODED"]
    assert calls[-1] == (frame, dict_payload)

    # the reserved 0x184D2A5D carrier always wins, raw payload accepted
    # as-is, regardless of padding order around it
    assert list(W.split_zstd_frames(pad + carrier + frame)) == [b"DECODED"]
    assert calls[-1] == (frame, b"rawdict")
    assert list(W.split_zstd_frames(carrier + pad + frame)) == [b"DECODED"]
    assert calls[-1] == (frame, b"rawdict")
