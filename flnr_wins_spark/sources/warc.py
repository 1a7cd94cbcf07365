"""WARC (Web ARChive, ISO 28500) ingestion — the container format web-crawl
corpora actually arrive in (Common Crawl publishes ~1 GB ``.warc.gz`` files).

Layout: a Common Crawl WARC file is a sequence of CONCATENATED GZIP
MEMBERS, one member per WARC record, so readers can split records without
decompressing the whole file. Each decompressed record is::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <urn:...>\r\n
    WARC-Target-URI: http://...\r\n
    Content-Type: text/html\r\n
    Content-Length: N\r\n
    \r\n
    <N payload bytes>\r\n\r\n

Spark shape: ``spark.read.format("binaryFile")`` yields one (path, content)
row per file; a ``mapInPandas`` pass (Arrow-batched, never row-at-a-time
Python) splits members with stdlib zlib (member boundary = ``unused_data``)
and parses headers, emitting one row per record with the payload as a
``binary`` column plus typed metadata — ready for the existing
html_strip -> quality-rules -> dedup curation chain.

Parallelism contract at 100 TB: one FILE is one task (binaryFile does not
split), which matches the corpus layout — crawls ship as many ~1 GB files,
so a 100 TB crawl is ~100k independent tasks. Splitting INSIDE a file at
gzip-member boundaries would need a custom InputFormat; per-file
parallelism is the standard engine posture for WARC.

Everything here is stdlib (zlib, gzip framing) — no external WARC libs.
The reference has no crawl ingestion (its sources are a remote catalog and
an SDE database, ``wts.py:118-135``); this is extension surface for the
LLM-data-pipeline mandate.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def encode_warc_gz(records: Iterable[dict]) -> bytes:
    """Encode records as a multi-member-gzip WARC blob (the Common Crawl
    layout: one gzip member per record). Each record dict carries
    ``headers`` (ordered name->value, Content-Length added automatically)
    and ``payload`` (bytes). ``mtime=0`` and fixed compression level keep
    the encoding a pure function of the content — the same determinism
    discipline as the image/audio codecs in functions/multimodal.py."""
    out = []
    for rec in records:
        headers = dict(rec["headers"])
        payload = bytes(rec["payload"])
        lines = [b"WARC/1.0"]
        for k, v in headers.items():
            lines.append(f"{k}: {v}".encode())
        lines.append(f"Content-Length: {len(payload)}".encode())
        raw = _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        member = co.compress(raw) + co.flush()
        # zero out the gzip MTIME field (bytes 4-7) — compressobj writes
        # zeros already, but make the determinism contract explicit
        assert member[4:8] == b"\x00\x00\x00\x00"
        out.append(member)
    return b"".join(out)


def split_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenated-member gzip blob, yielding one bytes
    object per member (stdlib zlib loop on ``unused_data``)."""
    rest = bytes(blob)
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        data = d.decompress(rest)
        data += d.flush()
        yield data
        rest = d.unused_data
        if not rest or not rest.startswith(b"\x1f\x8b"):
            break


def split_zstd_frames(blob: bytes) -> Iterator[bytes]:
    """Split a concatenated-frame ``.warc.zst`` blob (the newer Common
    Crawl layout: one zstd frame per record, optional shared-dictionary
    frames skipped). Gated behind the zstd bindings (``zstandard`` pip
    package, or the ``compression.zstd`` stdlib module from Python 3.14):
    neither ships in this container, so this raises NotImplementedError
    with the exact dependency to install — the honest-guard convention of
    functions/multimodal.py (adjacent working gzip path above)."""
    try:
        import zstandard  # noqa: F401
    except ImportError:
        try:
            from compression import zstd  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "zstd WARC support needs the 'zstandard' package (or Python "
                ">= 3.14's compression.zstd); the gzip member path "
                "(split_gzip_members) is fully implemented"
            ) from None
    raise NotImplementedError(
        "zstd bindings present but frame-split not wired in this build"
    )  # pragma: no cover — unreachable in this container


def parse_warc_record(raw: bytes) -> tuple[dict, bytes]:
    """Parse one decompressed WARC record into (headers dict incl. the
    version line under ``_version``, payload bytes). Raises ValueError on
    a malformed record — loud, never silently skipped."""
    head_end = raw.find(_CRLF + _CRLF)
    if head_end < 0:
        raise ValueError("malformed WARC record: no header terminator")
    head_lines = raw[:head_end].split(_CRLF)
    version = head_lines[0].decode("ascii", "replace")
    if not version.startswith("WARC/"):
        raise ValueError(f"malformed WARC record: bad version line {version!r}")
    headers: dict[str, str] = {"_version": version}
    for line in head_lines[1:]:
        k, _, v = line.decode("utf-8", "replace").partition(":")
        headers[k.strip()] = v.strip()
    n = int(headers.get("Content-Length", "-1"))
    if n < 0:
        raise ValueError("malformed WARC record: missing Content-Length")
    payload = raw[head_end + 4 : head_end + 4 + n]
    if len(payload) != n:
        raise ValueError(
            f"malformed WARC record: truncated payload ({len(payload)} < {n})"
        )
    return headers, payload


_WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.warc.gz`` files under ``path`` into one row per WARC record:
    (path, rec_idx, warc_type, record_id, target_uri, content_type,
    content_length, payload binary). One file = one task (see module
    docstring); the member split + header parse runs Arrow-batched."""
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for idx, member in enumerate(split_gzip_members(r["content"])):
                    headers, payload = parse_warc_record(member)
                    rows.append(
                        {
                            "path": r["path"],
                            "rec_idx": idx,
                            "warc_type": headers.get("WARC-Type"),
                            "record_id": headers.get("WARC-Record-ID"),
                            "target_uri": headers.get("WARC-Target-URI"),
                            "content_type": headers.get("Content-Type"),
                            "content_length": len(payload),
                            "payload": payload,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _WARC_SCHEMA.fields]
            ) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _WARC_SCHEMA.fields}
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(decode, schema=_WARC_SCHEMA)


def warc_text(df: DataFrame, encoding: str = "UTF-8") -> DataFrame:
    """Decode the payload column to text JVM-side (no Python round trip) —
    the handoff point into the html_strip -> quality -> dedup chain."""
    return df.withColumn("text", F.decode(F.col("payload"), encoding))
