"""TFRecord / tf.Example codec (r10) — the canonical TensorFlow
training-data container, as a REAL record-level codec: CRC-32C
(Castagnoli) masked checksums over the TFRecord framing
([uint64 len][masked crc32c(len)][data][masked crc32c(data)]) and a
hand-rolled protobuf wire-format encoder/decoder for the tf.Example
schema (Features -> map<string, Feature> -> Bytes/Float/Int64List).
Everything is stdlib Python driven through Arrow ``mapInPandas`` —
same tolerant-reader, zero-stub discipline as the PNG/JPEG/FLAC/WARC
codecs in ``llmdata/multimodal.py`` / ``sources/warc.py``.

Public layout references: the TFRecord framing and masked-CRC scheme
and the tensorflow/core/example/example.proto schema, both documented
in the public TensorFlow source tree.

Scale shape: the codec is a pure map over (id, payload) rows — linear,
shuffle-free; sharded file output composes with the repo's existing
size-targeted shard sink pattern.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

# --- CRC-32C (Castagnoli), table-driven; reflected poly 0x82F63B78 ---

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    """TFRecord's rotation mask: ((crc >> 15) | (crc << 17)) + 0xa282ead8
    — guards against CRCs of CRCs."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- protobuf wire helpers (subset: varint + length-delimited) -------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint overflow")


def _ld(tag_field: int, body: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((tag_field << 3) | 2) + _varint(len(body)) + body


# --- tf.Example encode/decode ----------------------------------------


def encode_example(features: dict) -> bytes:
    """dict -> serialized tf.Example.  Values: list[int] -> Int64List,
    list[float] -> FloatList (float32 — TensorFlow's lane width; NOT
    round-trip-exact for arbitrary doubles), list[bytes] -> BytesList.
    Keys are encoded in sorted order so the byte stream is
    deterministic (protobuf map order is unspecified; sorting pins
    it)."""
    entries = bytearray()
    for key in sorted(features):
        vals = features[key]
        if vals and isinstance(vals[0], (bytes, bytearray)):
            body = b"".join(_ld(1, bytes(v)) for v in vals)
            feat = _ld(1, body)          # Feature.bytes_list = 1
        elif vals and isinstance(vals[0], float):
            packed = b"".join(struct.pack("<f", v) for v in vals)
            feat = _ld(2, _varint(10) + _varint(len(packed)) + packed)  # float_list = 2, packed field 1 (tag 0x0A... see below)
        else:
            packed = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF) for v in vals)
            feat = _ld(3, _ld_packed(packed))  # Feature.int64_list = 3
        entry = _ld(1, key.encode()) + _ld(2, feat)  # map key=1, value=2
        entries += _ld(1, entry)                     # Features.feature = 1
    return _ld(1, bytes(entries))                    # Example.features = 1


def _ld_packed(packed: bytes) -> bytes:
    """Int64List { repeated int64 value = 1 [packed] } body."""
    return _varint((1 << 3) | 2) + _varint(len(packed)) + packed


def _wire_fields(buf: bytes):
    """Yield (field_number, wire_type, value) for every top-level field
    of a protobuf message.  value is bytes for length-delimited (2),
    int for varint (0), raw 8/4 bytes for fixed64 (1) / fixed32 (5).
    Raises ValueError on an unknown wire type or truncation."""
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            if len(val) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        if pos > n:
            raise ValueError("field overruns buffer")
        yield field, wire, val


def decode_example(buf: bytes) -> dict | None:
    """Serialized tf.Example -> dict (int64 lists signed-decoded,
    float32 lists as Python floats, bytes lists as bytes).  None on
    malformed wire data (tolerant-reader stance).

    Full proto3 merge semantics for the tf.Example schema: repeated
    occurrences of ``Example.features``, of ``Feature.<oneof>``, and of
    each list's ``value`` field are MERGED (concatenated in order), and
    packed / unpacked encodings of the numeric lists are both accepted
    — so re-serializations from any conforming protobuf writer decode
    identically, not just this module's own encoder.  An empty Example
    decodes to ``{}``.  Unknown fields are skipped per wire type."""
    try:
        out: dict = {}
        # Example { Features features = 1 } — merge every occurrence
        fbuf = b"".join(
            v for f, w, v in _wire_fields(buf) if f == 1 and w == 2
        )
        # Features { map<string, Feature> feature = 1 }
        for f, w, entry in _wire_fields(fbuf):
            if f != 1 or w != 2:
                continue
            # MapEntry { key = 1, value(Feature) = 2 } — last key wins,
            # Feature occurrences merge
            key = None
            feat = b""
            for t, tw, body in _wire_fields(entry):
                if t == 1 and tw == 2:
                    key = body.decode()
                elif t == 2 and tw == 2:
                    feat += body
            if key is None:
                return None
            # Feature oneof { BytesList=1, FloatList=2, Int64List=3 } —
            # merge repeated occurrences of whichever arm appears
            vals: list = out.get(key, []) if key in out else []
            kind = None
            for t, tw, body in _wire_fields(feat):
                if t == 1 and tw == 2:        # BytesList
                    kind = kind or 1
                    for bt, bw, bv in _wire_fields(body):
                        if bt == 1 and bw == 2:
                            vals.append(bv)
                elif t == 2 and tw == 2:      # FloatList
                    kind = kind or 2
                    for bt, bw, bv in _wire_fields(body):
                        if bt != 1:
                            continue
                        if bw == 2:           # packed
                            vals.extend(
                                struct.unpack("<f", bv[4 * i : 4 * i + 4])[0]
                                for i in range(len(bv) // 4)
                            )
                        elif bw == 5:         # unpacked fixed32
                            vals.append(struct.unpack("<f", bv)[0])
                elif t == 3 and tw == 2:      # Int64List
                    kind = kind or 3
                    for bt, bw, bv in _wire_fields(body):
                        if bt != 1:
                            continue
                        if bw == 2:           # packed varints
                            r, end = 0, len(bv)
                            while r < end:
                                v, r = _read_varint(bv, r)
                                vals.append(
                                    v - (1 << 64) if v >= (1 << 63) else v
                                )
                        elif bw == 0:         # unpacked varint
                            vals.append(
                                bv - (1 << 64) if bv >= (1 << 63) else bv
                            )
                else:
                    return None
            out[key] = vals
        return out
    except (IndexError, ValueError, UnicodeDecodeError):
        return None


# --- TFRecord stream framing ------------------------------------------


def encode_tfrecord(records: list[bytes]) -> bytes:
    """Frame serialized records into a TFRecord stream."""
    out = bytearray()
    for rec in records:
        ln = struct.pack("<Q", len(rec))
        out += ln
        out += struct.pack("<I", _masked_crc(ln))
        out += rec
        out += struct.pack("<I", _masked_crc(rec))
    return bytes(out)


def decode_tfrecord(payload: bytes) -> list[bytes] | None:
    """TFRecord stream -> list of record byte strings, BOTH masked
    CRCs verified per record.  None on framing damage or any CRC
    mismatch (a truncated/corrupt shard must not half-load)."""
    recs = []
    pos = 0
    n = len(payload)
    while pos < n:
        if pos + 12 > n:
            return None
        ln_bytes = payload[pos : pos + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (crc_ln,) = struct.unpack("<I", payload[pos + 8 : pos + 12])
        if _masked_crc(ln_bytes) != crc_ln:
            return None
        pos += 12
        if pos + ln + 4 > n:
            return None
        rec = payload[pos : pos + ln]
        (crc_rec,) = struct.unpack("<I", payload[pos + ln : pos + ln + 4])
        if _masked_crc(rec) != crc_rec:
            return None
        recs.append(rec)
        pos += ln + 4
    return recs


# --- Spark ops ---------------------------------------------------------


def tfrecord_decode_examples(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, TFRecord-stream payload) -> one row per contained
    tf.Example with integer-exact reductions over the standard
    text-pipeline feature names: ``(id, rec_no, n_records, n_features,
    sum_int64, n_bytes_vals, bytes_len)``.  Streams failing framing or
    CRC drop whole (tolerant reader); Arrow map, shuffle-free."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                recs = decode_tfrecord(bytes(payload))
                if recs is None:
                    continue
                for rno, rec in enumerate(recs):
                    ex = decode_example(rec)
                    if ex is None:
                        continue
                    s_int = sum(
                        sum(v) for v in ex.values()
                        if v and isinstance(v[0], int)
                    )
                    b_vals = [
                        x for v in ex.values()
                        if v and isinstance(v[0], bytes) for x in v
                    ]
                    rows.append(
                        (int(i), rno, len(recs), len(ex), s_int,
                         len(b_vals), sum(len(x) for x in b_vals))
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "rec_no", "n_records", "n_features",
                         "sum_int64", "n_bytes_vals", "bytes_len"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        op,
        schema=f"{id_col} long, rec_no int, n_records int, n_features int,"
               " sum_int64 long, n_bytes_vals int, bytes_len long",
    )


def tfrecord_encode_docs(
    df: DataFrame,
    id_col: str,
    int_cols: list[str] | None = None,
    text_cols: list[str] | None = None,
    records_per_stream: int = 1,
) -> DataFrame:
    """Sink direction: pack document rows into TFRecord streams —
    ``(id, payload binary, n_records)`` with one tf.Example per row
    (int columns -> Int64List, text columns -> utf-8 BytesList) and
    ``records_per_stream`` consecutive in-partition rows framed per
    stream.  The payload column then goes to any binary sink (the
    repo's sharded writers, object storage, a downstream loader).
    Pure map-side Arrow stage — encode cost is linear and co-located
    with the data; no shuffle is introduced by packing (stream
    grouping is per-partition arrival order, so pre-sort/repartition
    upstream if stream membership must be deterministic)."""
    import pandas as pd

    int_cols = int_cols or []
    text_cols = text_cols or []
    cols = [id_col] + int_cols + text_cols

    def op(batches):
        pending_ids: list[int] = []
        pending: list[bytes] = []

        def flush():
            sid = pending_ids[0]
            stream = encode_tfrecord(pending)
            row = (sid, bytearray(stream), len(pending))
            pending_ids.clear()
            pending.clear()
            return row

        rows = []
        # positional itertuples (name=None): attribute access breaks on
        # column names that aren't Python identifiers (pandas renames
        # them _1, _2 positionally), so index by the cols order instead
        idx = {c: i for i, c in enumerate(cols)}
        for pdf in batches:
            for tup in pdf[cols].itertuples(index=False, name=None):
                rec = {id_col: [int(tup[idx[id_col]])]}
                for c in int_cols:
                    rec[c] = [int(tup[idx[c]])]
                for c in text_cols:
                    v = tup[idx[c]]
                    rec[c] = [("" if v is None else str(v)).encode()]
                pending_ids.append(int(tup[idx[id_col]]))
                pending.append(encode_example(rec))
                if len(pending) >= records_per_stream:
                    rows.append(flush())
        if pending:
            rows.append(flush())
        yield pd.DataFrame(
            rows, columns=["stream_id", "payload", "n_records"]
        )

    return df.select(*cols).mapInPandas(
        op, schema="stream_id long, payload binary, n_records int"
    )
