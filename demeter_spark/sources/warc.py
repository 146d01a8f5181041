"""WARC (Web ARChive, ISO 28500) reader/writer — the Common Crawl
container format, pure stdlib.

The north-star input is "an Iceberg table of Common-Crawl-style web pages
(url, warc_ts, html, text, lang)" (BASELINE.json input_hint); this source
closes the loop one step earlier: it ingests the WARC files such a table
is LOADED FROM. The reference's closest analogue is its zip/DBF sidecar
walking (sources/archives.py here; demeter fetches zipped shapefiles) —
WARC is the webtext counterpart container.

Format (public spec): a WARC file is a sequence of records, each
  WARC/1.0 CRLF
  <header-name>: <value> CRLF ...
  CRLF
  <Content-Length bytes of payload> CRLF CRLF
Common Crawl serves them as multi-member gzip (one member per record);
zlib's gzip mode decompresses concatenated members natively.

Spark shape: one task per WARC file via ``binaryFile`` (the Common Crawl
distribution unit, ~1 GB gzip members) -> ``mapInPandas`` record walker
that emits one row per *response* record with the HTTP envelope stripped:
(url, warc_ts, html, http_status, mime, warc_file). The walker is
Arrow-batched and allocation-light (memoryview slicing, no per-record
copies of the tail). Feeding the rows through the existing
``synth.extract_text_expr`` lands exactly the input_hint table shape.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame

_CRLF = b"\r\n"


def warc_bytes(
    records: list[dict],
    compress: bool = False,
) -> bytes:
    """Serialize records to WARC/1.0 bytes. Each record dict: ``type``
    ('response'|'request'|'warcinfo'), ``url``, ``date`` (ISO-8601 Z),
    ``payload`` (bytes; for responses, the full HTTP response). With
    ``compress``, each record becomes its own gzip member (the Common
    Crawl layout). Deterministic: gzip mtime pinned to 0."""
    out = io.BytesIO()
    for rec in records:
        payload = rec["payload"]
        headers = [
            ("WARC-Type", rec["type"]),
            ("WARC-Date", rec["date"]),
            ("Content-Length", str(len(payload))),
        ]
        if rec.get("url"):
            headers.append(("WARC-Target-URI", rec["url"]))
        if rec["type"] == "response":
            headers.append(
                ("Content-Type", "application/http; msgtype=response")
            )
        body = (
            b"WARC/1.0" + _CRLF
            + b"".join(
                f"{k}: {v}".encode() + _CRLF for k, v in headers
            )
            + _CRLF
            + payload
            + _CRLF + _CRLF
        )
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(body)
            out.write(buf.getvalue())
        else:
            out.write(body)
    return out.getvalue()


def http_response_bytes(
    body: bytes, status: int = 200, mime: str = "text/html"
) -> bytes:
    """Minimal valid HTTP/1.1 response envelope around a body."""
    return (
        f"HTTP/1.1 {status} OK".encode() + _CRLF
        + f"Content-Type: {mime}".encode() + _CRLF
        + f"Content-Length: {len(body)}".encode() + _CRLF
        + _CRLF
        + body
    )


def _maybe_decompress(data: bytes) -> bytes:
    """Concatenated gzip members -> plain bytes (zlib handles member
    boundaries natively in a loop); plain input passes through."""
    if not data[:2] == b"\x1f\x8b":
        return data
    out, pos = [], 0
    view = memoryview(data)
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(view[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt trailing garbage: fail loudly
            raise ValueError(f"gzip member did not advance at offset {pos}")
        pos += consumed
    return b"".join(out)


def parse_warc(data: bytes):
    """Yield dicts (type, url, date, payload) for every record. Malformed
    structure raises ValueError (fail-loudly contract of the codec layer).
    """
    data = _maybe_decompress(data)
    view = memoryview(data)
    pos = 0
    while pos < len(data):
        # tolerate inter-record padding CRLFs
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= len(data):
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header block at {pos}")
        head = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at {pos}: {head[0]!r}")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at {pos}")
        body_start = hdr_end + 4
        payload = bytes(view[body_start : body_start + length])
        if len(payload) != length:
            raise ValueError(f"truncated payload at {pos}")
        yield {
            "type": fields.get("warc-type", ""),
            "url": fields.get("warc-target-uri"),
            "date": fields.get("warc-date"),
            "payload": payload,
        }
        pos = body_start + length


def split_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, mime, body) from an HTTP response payload; fail-loudly."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("payload is not an HTTP response")
    head = payload[:sep].decode("utf-8", "replace").split("\r\n")
    status = int(head[0].split(" ", 2)[1])
    mime = ""
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            mime = v.strip().split(";")[0].strip()
    return status, mime, payload[sep + 4 :]


WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, http_status int,"
    " mime string, warc_file string"
)


def read_warc(spark, path: str) -> DataFrame:
    """WARC files -> one row per response record:
    (url, warc_ts, html, http_status, mime, warc_file).

    One task per file (``binaryFile``; Common Crawl's ~1 GB segment files
    are the natural parallel unit — a 10^12-page crawl is ~10^6 files,
    which is the partition count). The record walk is a single
    ``mapInPandas`` pass; html is the byte-exact HTTP body, so the
    downstream extract_text invariant (byte-identical text per url)
    starts from the true crawl bytes."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def _walk(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "url", "warc_ts", "html", "http_status", "mime", "warc_file"
            )}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(content)):
                    if rec["type"] != "response":
                        continue
                    status, mime, body = split_http_response(rec["payload"])
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(
                        datetime.strptime(
                            rec["date"], "%Y-%m-%dT%H:%M:%SZ"
                        ).replace(tzinfo=timezone.utc)
                    )
                    rows["html"].append(body)
                    rows["http_status"].append(status)
                    rows["mime"].append(mime)
                    rows["warc_file"].append(fpath)
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(_walk, WARC_SCHEMA)
