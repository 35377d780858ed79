"""WARC/1.0 container codec (r8) — the ingest format of web-crawl
training pipelines (Common Crawl ships WARC; the first stage of every
public web-corpus recipe is "read WARC, keep responses, strip the
HTTP envelope").  Pure-Python reader/writer over opaque binary
payloads, driven through Arrow ``mapInPandas`` like the multimodal
codecs: the Spark-side contract is (blob) -> one row per contained
record, and the blob column stays untouched by column pruning until
the extract stage actually runs.

Spec surface implemented (ISO 28500 / the public WARC/1.0 format):
version line, CRLF header block (WARC-Type, WARC-Target-URI,
WARC-Record-ID, Content-Type, Content-Length), Content-Length-framed
payload, double-CRLF record separator.  For ``response`` records the
HTTP envelope is parsed too: status line + headers, body after the
first CRLFCRLF.  Tolerant reader: malformed records are SKIPPED (a
truncated tail must not sink the blob), unknown record types pass
through with their raw payload length.
"""

from __future__ import annotations

import hashlib


def _crlf_headers(pairs: list[tuple[str, str]]) -> bytes:
    return b"".join(f"{k}: {v}\r\n".encode() for k, v in pairs)


def encode_warc(records: list[dict]) -> bytes:
    """Minimal REAL WARC/1.0 writer: one record per input dict
    ``{"type": "response"|"request"|..., "uri": str, "body": bytes,
    "http_status": int, "http_content_type": str}``.  ``response`` /
    ``request`` records get an HTTP envelope; other types carry the
    body verbatim.  Record IDs are deterministic (md5 of type#uri) so
    output is reproducible."""
    out = []
    for r in records:
        typ = r.get("type", "response")
        uri = r.get("uri", "")
        body = r.get("body", b"")
        if isinstance(body, str):
            body = body.encode()
        if typ == "response":
            status = int(r.get("http_status", 200))
            ctype = r.get("http_content_type", "text/plain")
            payload = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            ptype = "application/http; msgtype=response"
        elif typ == "request":
            payload = (
                f"GET {uri} HTTP/1.1\r\nHost: x\r\n\r\n"
            ).encode() + body
            ptype = "application/http; msgtype=request"
        else:
            payload = body
            ptype = "application/octet-stream"
        rid = hashlib.md5(f"{typ}#{uri}".encode()).hexdigest()
        head = b"WARC/1.0\r\n" + _crlf_headers(
            [
                ("WARC-Type", typ),
                ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
                ("WARC-Target-URI", uri),
                ("Content-Type", ptype),
                ("Content-Length", str(len(payload))),
            ]
        ) + b"\r\n"
        out.append(head + payload + b"\r\n\r\n")
    return b"".join(out)


def encode_warc_gz(records: list[dict]) -> bytes:
    """The actual Common Crawl wire format: each WARC record gzipped
    as its OWN gzip member and the members concatenated — the layout
    that makes per-record random access (offset + length from the
    CDX index) possible on .warc.gz files.  Deterministic output
    (mtime pinned to 0)."""
    import gzip as _gzip
    import io as _io

    out = []
    for r in records:
        raw = encode_warc([r])
        buf = _io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(raw)
        out.append(buf.getvalue())
    return b"".join(out)


def decode_warc(payload: bytes) -> list[dict]:
    """REAL WARC/1.0 record walk: returns one dict per well-formed
    record — {type, uri, record_id, content_length, http_status,
    http_content_type, body (bytes, HTTP envelope stripped for
    response records), body_chars, body_h (repo-standard 60-bit md5
    of the body)} — skipping malformed records (tolerant reader).

    Accepts BOTH the plain concatenated form and the Common Crawl
    ``.warc.gz`` member-per-record form: a gzip magic prefix routes
    through multi-member decompression first (stdlib zlib consumes one
    member at a time, so truncated trailing members are skipped like
    any other malformed record)."""
    if payload[:2] == b"\x1f\x8b":
        import zlib as _zlib

        chunks, pos, n = [], 0, len(payload)
        while pos < n and payload[pos : pos + 2] == b"\x1f\x8b":
            d = _zlib.decompressobj(16 + _zlib.MAX_WBITS)
            try:
                chunks.append(d.decompress(payload[pos:]))
                d.flush()
            except _zlib.error:
                break
            if not d.eof:  # truncated member
                break
            consumed = (n - pos) - len(d.unused_data)
            if consumed <= 0:
                break
            pos += consumed
        payload = b"".join(chunks)
    out: list[dict] = []
    pos = 0
    n = len(payload)
    while True:
        idx = payload.find(b"WARC/1.0\r\n", pos)
        if idx < 0:
            break
        hdr_end = payload.find(b"\r\n\r\n", idx)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        ok = True
        for line in payload[idx + 10 : hdr_end].split(b"\r\n"):
            if b":" not in line:
                ok = False
                break
            k, v = line.split(b":", 1)
            headers[k.strip().decode(errors="replace").lower()] = (
                v.strip().decode(errors="replace")
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            ok = False
            clen = 0
        body_start = hdr_end + 4
        if not ok or body_start + clen > n:
            pos = idx + 10
            continue
        raw = payload[body_start : body_start + clen]
        typ = headers.get("warc-type", "")
        rec: dict = {
            "type": typ,
            "uri": headers.get("warc-target-uri", ""),
            "record_id": headers.get("warc-record-id", ""),
            "content_length": clen,
            "http_status": None,
            "http_content_type": None,
            "body": raw,
        }
        if typ == "response" and raw.startswith(b"HTTP/"):
            env_end = raw.find(b"\r\n\r\n")
            if env_end >= 0:
                env = raw[:env_end].split(b"\r\n")
                parts = env[0].split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for line in env[1:]:
                    if line.lower().startswith(b"content-type:"):
                        rec["http_content_type"] = (
                            line.split(b":", 1)[1].strip().decode(errors="replace")
                        )
                rec["body"] = raw[env_end + 4 :]
        body = rec["body"]
        rec["body_chars"] = len(body)
        rec["body_h"] = int(
            hashlib.md5(body).hexdigest()[:15], 16
        )
        out.append(rec)
        pos = body_start + clen
    return out
