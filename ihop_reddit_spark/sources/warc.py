"""WARC (ISO 28500 / WARC/1.0) ingestion — the container format web-crawl
corpora actually arrive in (Common-Crawl-style: thousands of ~1 GB
``.warc.gz`` files of per-record gzip members).

Three pieces, all stdlib-only:

* :func:`warc_record_bytes` / :func:`write_warc` — a minimal WARC/1.0
  writer (warcinfo header record + response records wrapping an HTTP/1.1
  message), used by tests and the oracle fixture; per-record gzip members
  when ``gzip_members=True`` — the standard layout, because member
  boundaries are record boundaries (a reader can skip without inflating
  everything).
* :func:`iter_warc_records` — streaming parser: WARC header block →
  named fields + Content-Length payload → HTTP status/headers/body split
  for ``application/http`` blocks. Tolerates both plain and gzip streams
  (``gzip.GzipFile`` walks concatenated members transparently).
* :class:`WarcDataSource` — a Spark 4 Python Data Source (format
  ``"warc"``): one planner task per file (gzip members make a file
  cheap to stream but not randomly splittable — file grain IS the
  parallelism unit, exactly the zstjsonl contract), fixed schema
  ``(url, warc_date, record_type, content_type, http_status, payload)``.

Scale shape: at 100 TB the WARC set is O(100k) files; enumeration happens
at planning time, each task streams one file with O(record) memory, and
everything downstream (html_to_text → the crawl_corpus flagship) is the
already-audited extraction plan. Reference parity: none — the reference
ingests Reddit dumps; this belongs to the crawl tier the brief adds.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import io
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

_CRLF = b"\r\n"


def warc_record_bytes(
    url: str,
    payload: bytes,
    *,
    warc_date: str = "2026-01-01T00:00:00Z",
    content_type: str = "text/html",
    status: int = 200,
    record_type: str = "response",
    content_encoding: str | None = None,
) -> bytes:
    """One WARC/1.0 record wrapping an HTTP/1.1 response. The record id is
    content-addressed (md5 of type+url) so fixtures are bit-deterministic
    — no uuid, no clock. ``content_encoding`` COMPRESSES the body with
    the named HTTP coding (gzip/deflate/br/zstd) and emits the matching
    ``Content-Encoding`` header — the fixture side of the reader's
    transparent body decoding."""
    if content_encoding:
        payload = _encode_body(payload, content_encoding)
    enc_hdr = (
        f"Content-Encoding: {content_encoding}\r\n" if content_encoding
        else ""
    )
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        + enc_hdr
        + f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload
    rid = hashlib.md5(f"{record_type}:{url}".encode()).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {record_type}\r\n".encode()
        + f"WARC-Record-ID: <urn:md5:{rid}>\r\n".encode()
        + f"WARC-Date: {warc_date}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"Content-Type: application/http;msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def warcinfo_bytes(filename: str) -> bytes:
    info = b"software: ihop_reddit_spark warc writer\r\n"
    rid = hashlib.md5(f"warcinfo:{filename}".encode()).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        + f"WARC-Record-ID: <urn:md5:{rid}>\r\n".encode()
        + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + f"WARC-Filename: {filename}\r\n".encode()
        + b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(info)}\r\n".encode()
        + _CRLF
    )
    return head + info + _CRLF + _CRLF


def write_warc(path: str, records: list[bytes], *, gzip_members: bool = True) -> None:
    """Write a ``.warc`` / ``.warc.gz`` file: a warcinfo head record plus
    ``records`` (bytes from :func:`warc_record_bytes`). With
    ``gzip_members`` every record is its OWN gzip member (the standard
    web-archive layout)."""
    parts = [warcinfo_bytes(os.path.basename(path))] + list(records)
    with open(path, "wb") as f:
        if gzip_members:
            for p in parts:
                # mtime=0: deterministic bytes (gzip stores a timestamp)
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(p)
                f.write(buf.getvalue())
        else:
            for p in parts:
                f.write(p)


#: HTTP content codings the reader decodes transparently. gzip/deflate
#: via zlib; br/zstd via pyarrow's bundled codecs (no extra install —
#: the same arrow build Spark already requires). Real crawls are full
#: of these: br alone is ~a third of responses, and a pipeline that
#: hands compressed bytes to the HTML extractor silently yields junk.
_CODING_TO_ARROW = {"gzip": "gzip", "x-gzip": "gzip", "br": "brotli",
                    "zstd": "zstd"}


def _encode_body(payload: bytes, coding: str) -> bytes:
    coding = coding.strip().lower()
    if coding == "deflate":
        import zlib

        return zlib.compress(payload)
    codec = _CODING_TO_ARROW.get(coding)
    if codec is None:
        raise ValueError(f"unsupported Content-Encoding {coding!r}")
    import pyarrow as pa

    if codec == "gzip":
        import gzip as _gz
        import io

        buf = io.BytesIO()
        # mtime=0: deterministic bytes for content-addressed fixtures
        with _gz.GzipFile(fileobj=buf, mode="wb", mtime=0) as fh:
            fh.write(payload)
        return buf.getvalue()
    sink = pa.BufferOutputStream()
    with pa.output_stream(sink, compression=codec) as out:
        out.write(payload)
    return sink.getvalue().to_pybytes()


def decode_content_encoding(payload: bytes, encoding: str | None) -> bytes:
    """Decode one HTTP ``Content-Encoding`` coding (or a comma-chained
    list, applied right-to-left per RFC 9110). Unknown codings raise —
    a body the pipeline cannot decode must fail loudly, not flow
    compressed bytes into the text extractor."""
    if not encoding:
        return payload
    for coding in reversed([c.strip().lower()
                            for c in encoding.split(",") if c.strip()]):
        if coding == "identity":
            continue
        if coding == "deflate":
            import zlib

            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                # some servers send raw deflate without the zlib wrapper
                payload = zlib.decompress(payload, -15)
            continue
        codec = _CODING_TO_ARROW.get(coding)
        if codec is None:
            raise ValueError(f"unsupported Content-Encoding {coding!r}")
        import pyarrow as pa

        payload = pa.input_stream(
            pa.BufferReader(payload), compression=codec
        ).read()
    return payload


def _read_exact(stream, n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = stream.read(n - len(out))
        if not chunk:
            raise ValueError("truncated WARC record payload")
        out += chunk
    return out


def _read_line(stream) -> bytes:
    line = stream.readline()
    if line and not line.endswith(b"\n"):
        raise ValueError("truncated WARC header line")
    return line


def iter_warc_records(stream) -> Iterator[dict]:
    """Yield dicts: ``{url, warc_date, record_type, content_type,
    http_status, payload}`` per record. ``content_type``/``http_status``/
    ``payload`` come from the embedded HTTP message for
    ``application/http`` blocks; other blocks (warcinfo, metadata) carry
    the raw block as payload with NULL status. Raises ``ValueError`` on
    malformed/truncated records — a corrupt archive should fail loudly,
    not silently drop the tail."""
    while True:
        line = _read_line(stream)
        if not line:
            return
        if line.strip() == b"":
            continue  # inter-record padding
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:30]!r}")
        headers: dict[str, str] = {}
        while True:
            h = _read_line(stream)
            if h in (_CRLF, b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        block = _read_exact(stream, length)
        rec = {
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_type": headers.get("warc-type", "unknown"),
            "content_type": None,
            "http_status": None,
            "payload": block,
        }
        if headers.get("content-type", "").startswith("application/http"):
            head, sep, body = block.partition(b"\r\n\r\n")
            if sep:
                http_lines = head.split(b"\r\n")
                first = http_lines[0].split()
                if len(first) >= 2 and first[0].startswith(b"HTTP/"):
                    try:
                        rec["http_status"] = int(first[1])
                    except ValueError:
                        pass
                content_encoding = None
                for hl in http_lines[1:]:
                    k, _, v = hl.decode("utf-8", "replace").partition(":")
                    hk = k.strip().lower()
                    if hk == "content-type":
                        rec["content_type"] = v.strip()
                    elif hk == "content-encoding":
                        content_encoding = v.strip()
                rec["payload"] = decode_content_encoding(
                    body, content_encoding
                )
        yield rec


WARC_SCHEMA_DDL = (
    "url string, warc_date string, record_type string, "
    "content_type string, http_status int, payload binary"
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires a path")
        if os.path.isdir(path):
            self.files = sorted(
                glob.glob(os.path.join(path, "**", "*.warc"), recursive=True)
                + glob.glob(
                    os.path.join(path, "**", "*.warc.gz"), recursive=True
                )
            )
        else:
            self.files = sorted(glob.glob(path)) or [path]

    def partitions(self) -> Sequence[InputPartition]:
        # one task per file: gzip members stream but don't split
        return [_WarcFilePartition(f) for f in self.files]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        raw = open(partition.path, "rb")
        stream = (
            gzip.GzipFile(fileobj=raw)
            if partition.path.endswith(".gz")
            else raw
        )
        try:
            for rec in iter_warc_records(stream):
                yield (
                    rec["url"],
                    rec["warc_date"],
                    rec["record_type"],
                    rec["content_type"],
                    rec["http_status"],
                    rec["payload"],
                )
        finally:
            stream.close()
            raw.close()


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA_DDL

    def reader(self, schema: T.StructType) -> WarcReader:
        return WarcReader(self.options)
