"""Minimal WARC/1.0 reader + writer (stdlib-only) — crawl-archive
ingestion for the web-document pipeline.

WARC is the standard container for web crawls (ISO 28500; what Common
Crawl ships). A file is a sequence of records, each:

    WARC/1.0\r\n
    <header: value>\r\n ...          (Content-Length is mandatory)
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n                          (record separator)

``response`` records hold an HTTP message in the block; the reader
splits status line / headers / body by the HTTP Content-Length. Gzipped
archives (.warc.gz) are one gzip MEMBER per record — the reader
decompresses concatenated members with a ``zlib`` loop (stdlib ``gzip``
stops after the first member when sizes lie; decompressobj does not).

The writer exists so the gate corpus can synthesize archives from the
``documents`` table inside workers; handwritten fixtures in
``tests/test_web.py`` cover the reader independently.
"""

from __future__ import annotations

import gzip
import zlib

from tesseract_glue_spark.errors import ExtractionError

CRLF = b"\r\n"


class WarcDecodeError(ExtractionError):
    """Structurally invalid WARC buffer (bad magic, framing, or gzip)."""


def encode_warc_record(
    warc_type: str, headers: dict[str, str], block: bytes
) -> bytes:
    head = [b"WARC/1.0"]
    head.append(f"WARC-Type: {warc_type}".encode())
    for k, v in headers.items():
        head.append(f"{k}: {v}".encode())
    head.append(b"Content-Length: %d" % len(block))
    return CRLF.join(head) + CRLF + CRLF + block + CRLF + CRLF


def encode_http_response(
    status: int, reason: str, content_type: str, body: bytes
) -> bytes:
    return (
        b"HTTP/1.1 %d %s\r\nContent-Type: %s\r\nContent-Length: %d\r\n\r\n%s"
        % (status, reason.encode(), content_type.encode(), len(body), body)
    )


def encode_warc(
    records: list[tuple[str, str, dict[str, str], bytes]], compress: bool = True
) -> bytes:
    """Build an archive from (warc_type, target_uri, extra_headers,
    block) tuples. ``compress=True`` emits one gzip member per record —
    the .warc.gz convention that keeps records independently seekable."""
    out = bytearray()
    for warc_type, uri, extra, block in records:
        headers = {"WARC-Target-URI": uri, **extra} if uri else dict(extra)
        rec = encode_warc_record(warc_type, headers, block)
        out += gzip.compress(rec) if compress else rec
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(data[pos:])
        except zlib.error as e:
            raise WarcDecodeError(f"bad gzip member at {pos}: {e}") from e
        if not d.eof:
            raise WarcDecodeError(f"truncated gzip member at {pos}")
        consumed = len(data) - pos - len(d.unused_data)
        pos += consumed
    return bytes(out)


def iter_warc_records(data: bytes) -> list[dict]:
    """All records of an archive (plain or gzipped), each as a dict with
    lower-cased WARC headers plus ``warc_type`` and ``block``."""
    data = bytes(data or b"")
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    if not data.startswith(b"WARC/"):
        raise WarcDecodeError("not a WARC archive (missing WARC/ magic)")
    records = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 5] != b"WARC/":
            raise WarcDecodeError(f"bad record magic at {pos}")
        hdr_end = data.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            raise WarcDecodeError("unterminated record header")
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcDecodeError("record missing valid Content-Length") from e
        block_start = hdr_end + 4
        block = data[block_start : block_start + length]
        if len(block) != length:
            raise WarcDecodeError("record block truncated")
        # reserved keys LAST: a crafted record carrying a header literally
        # named "block" or "warc_type" must not displace the payload (it
        # would surface later as an untyped TypeError instead of a
        # WarcDecodeError / status route)
        records.append(
            {**headers, "warc_type": headers.get("warc-type", ""), "block": block}
        )
        pos = block_start + length
        while data[pos : pos + 2] == CRLF:
            pos += 2
    return records


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, lower-cased headers, body) from an HTTP response block;
    body honors HTTP Content-Length when present."""
    hdr_end = block.find(CRLF + CRLF)
    if hdr_end < 0 or not block.startswith(b"HTTP/"):
        raise WarcDecodeError("response block is not an HTTP message")
    lines = block[:hdr_end].split(CRLF)
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError) as e:
        raise WarcDecodeError("bad HTTP status line") from e
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    body = block[hdr_end + 4 :]
    if "content-length" in headers:
        try:
            body = body[: int(headers["content-length"])]
        except ValueError:
            pass
    return status, headers, body


def decode_http_body(body: bytes, content_type: str) -> str:
    """Text decode honoring the Content-Type ``charset=`` parameter,
    defaulting to UTF-8, never raising: real crawls are full of
    latin-1/cp1252 pages (and lying charset labels) — a strict decode
    would kill the Spark task instead of degrading, violating the
    typed-error policy used for PDF/WARC structural failures."""
    charset = "utf-8"
    for part in content_type.split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset" and v.strip():
            charset = v.strip().strip("\"'")
            break
    try:
        return body.decode(charset, errors="replace")
    except LookupError:  # unknown/garbage codec label
        return body.decode("utf-8", errors="replace")


def warc_responses(data: bytes) -> list[dict]:
    """The ingestion projection: one dict per ``response`` record —
    url, http_status, content_type, body. Request/metadata/warcinfo
    records are skipped (crawlers interleave them; only responses carry
    page payloads)."""
    out = []
    for rec in iter_warc_records(data):
        if rec["warc_type"] != "response":
            continue
        status, headers, body = parse_http_response(rec["block"])
        out.append(
            {
                "url": rec.get("warc-target-uri", ""),
                "http_status": status,
                "content_type": headers.get("content-type", ""),
                "body": body,
            }
        )
    return out
