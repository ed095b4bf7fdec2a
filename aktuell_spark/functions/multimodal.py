"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

Images/audio/video ride as ``binary`` columns next to typed metadata
(mime, width/height, duration). The Spark-side machinery — schema,
partition sizing, UDF signature, batch shape — is real and tested.
Two REAL codecs are implemented stdlib-only: PNG header decode
(signature + IHDR parse with CRC verification, ``decode_png_header``)
and WAV/RIFF header decode (fmt/data chunk walk, ``decode_wav_header``)
— the synthesized WAV fixtures round-trip through Python's own ``wave``
module as independent proof. One level deeper is real too (round 5):
``decode_png_scanline`` inflates the first IDAT scanline (stdlib zlib,
filter type 0) and ``decode_wav_pcm`` reads the first PCM samples —
exact-integer pixel/sample stats, oracle-verified against the fixtures'
closed forms. FULL-image decode is real too (round 5b):
``decode_png_pixels`` unfilters every scanline across all five PNG
filter types (None/Sub/Up/Average/Paeth — encoder and decoder both
spec-implemented, pinned to hand-computed vectors in tests), and the
WAV path reads every PCM sample. Only general foreign codecs (JPEG,
MP3, H.264 — the part that needs PIL/librosa/ffmpeg, absent in this
container) remain the declared ``decode_stub`` fake.

Scale: ``mapInPandas`` streams Arrow batches; binary payloads never
materialize on the driver. Partition sizing for blob tables should be
row-count based (``maxRecordsPerFile`` / salted repartition), not byte
based, because blob sizes dominate row width.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_FEATURE_DIM = 8


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = repeatable pseudo-random
    bytes derived from (id, seed); mime cycles through image/audio."""
    # size partitions to rows: tiny tables shouldn't pay one Python
    # worker spin-up per core in the downstream mapInPandas
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 64))
    return (
        spark.range(0, n, 1, n_parts)
        .withColumn("media_id", F.col("id"))
        .withColumn(
            "mime",
            F.element_at(
                F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ),
        )
        .withColumn(
            "payload",
            F.unhex(F.repeat(F.substring(F.md5(F.concat(F.col("id"), F.lit(seed))), 1, 16), 8)),
        )
        .withColumn(
            "meta",
            F.create_map(F.lit("source"), F.lit("synthetic"), F.lit("seed"), F.lit(str(seed))),
        )
        .select("media_id", "mime", "payload", "meta")
    )


def decode_stub(payload: bytes, mime: str) -> list[float]:
    """Deterministic fake decode: feature = normalized byte histogram
    over _FEATURE_DIM buckets. Swap for a real codec (PIL/librosa/ffmpeg)
    in production; those imports are intentionally absent here."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    if not mime.split("/")[0] in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for mime {mime!r}")
    buckets = [0] * _FEATURE_DIM
    for b in payload:
        buckets[b % _FEATURE_DIM] += 1
    total = max(sum(buckets), 1)
    return [round(b / total, 6) for b in buckets]


# -- real codecs (stdlib only) ----------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): the neighbor (left, up,
    up-left) whose value is closest to a + b - c, ties left-first."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_filter_row(row: bytes, prev: bytes, bpp: int, ftype: int) -> bytes:
    """Apply PNG filter ``ftype`` (0-4) to one raw scanline — the
    ENCODER direction (raw -> filtered), spec §9."""
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            out[i] = (x - a) % 256
        elif ftype == 2:
            out[i] = (x - b) % 256
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) % 256
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return bytes(out)


def _png_unfilter_row(filt: bytes, prev: bytes, bpp: int, ftype: int) -> bytes:
    """Invert ``_png_filter_row`` — the DECODER direction (filtered ->
    raw). Reconstruction uses already-reconstructed left/up bytes, so
    the row builds in place left-to-right (spec §9, Recon fns)."""
    if ftype == 0:
        return bytes(filt)
    out = bytearray(len(filt))
    for i, x in enumerate(filt):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            out[i] = (x + a) % 256
        elif ftype == 2:
            out[i] = (x + b) % 256
        elif ftype == 3:
            out[i] = (x + (a + b) // 2) % 256
        elif ftype == 4:
            out[i] = (x + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return bytes(out)


def png_bytes(width: int, height: int, seed: int = 0, color_type: int = 2,
              row_filter=None) -> bytes:
    """A minimal REAL PNG: signature + IHDR + one zlib IDAT + IEND, with
    correct chunk CRCs — any standard decoder opens it. Deterministic in
    (width, height, seed) so planted fixtures are reproducible.

    ``row_filter``: optional ``y -> filter type (0-4)``; rows are then
    REALLY filtered per the PNG spec before compression (pixel values
    are unchanged — filtering only changes the encoding). Default None
    keeps the historical all-zero-filter stream byte-identical."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    channels = _PNG_CHANNELS[color_type]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    row_len = width * channels
    parts, prev = [], bytes(row_len)
    for y in range(height):
        row = bytes(((x * 31 + y * 17 + seed) % 256) for x in range(row_len))
        ftype = row_filter(y) if row_filter is not None else 0
        parts.append(bytes([ftype]) + _png_filter_row(row, prev, channels, ftype))
        prev = row
    raw = b"".join(parts)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def decode_png_header(payload: bytes | None) -> dict | None:
    """Parse + validate a PNG header: signature, IHDR layout, and the
    IHDR CRC (a flipped bit anywhere in the header returns None, not
    garbage dims). Returns width/height/bit_depth/color_type/channels."""
    if payload is None or len(payload) < 33 or bytes(payload[:8]) != _PNG_SIG:
        return None
    length, typ = struct.unpack(">I4s", payload[8:16])
    if typ != b"IHDR" or length != 13:
        return None
    w, h, depth, color, _comp, _filt, _inter = struct.unpack(">IIBBBBB", payload[16:29])
    (crc,) = struct.unpack(">I", payload[29:33])
    if crc != (zlib.crc32(bytes(payload[12:29])) & 0xFFFFFFFF):
        return None
    return {"width": w, "height": h, "bit_depth": depth,
            "color_type": color, "channels": _PNG_CHANNELS.get(color)}


def wav_bytes(n_samples: int, sample_rate: int = 16000, channels: int = 1,
              bits: int = 16, seed: int = 0) -> bytes:
    """A REAL RIFF/WAVE file (PCM fmt + data chunks) — round-trips
    through Python's stdlib ``wave`` module. Deterministic samples."""
    data = b"".join(struct.pack("<h", ((i * 997 + seed) % 65536) - 32768)
                    for i in range(n_samples * channels))
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * bits // 8, channels * bits // 8, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_header(payload: bytes | None) -> dict | None:
    """Walk RIFF chunks to the fmt + data pair: channels, sample rate,
    bit depth, sample count. Truncated/foreign bytes return None."""
    if (payload is None or len(payload) < 36 or bytes(payload[:4]) != b"RIFF"
            or bytes(payload[8:12]) != b"WAVE"):
        return None
    pos, out = 12, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack("<4sI", payload[pos:pos + 8])
        if cid == b"fmt " and clen >= 16:
            _f, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", payload[pos + 8:pos + 24])
            out = {"channels": ch, "sample_rate": rate, "bit_depth": bits}
        elif cid == b"data" and out is not None:
            out["n_samples"] = clen // max(1, out["channels"] * out["bit_depth"] // 8)
            return out
        pos += 8 + clen + (clen % 2)
    return out


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
    ]
)


def synthesize_real_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic table of REAL decodable blobs: PNG images (varying
    dims) alternating with WAV audio (varying rates), plus a corrupt
    payload every 8th row to exercise the validity path. Blobs are built
    INSIDE mapInPandas — distributed synthesis, nothing on the driver."""
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32 or 1))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            mimes, payloads = [], []
            for i in ids:
                if i % 8 == 7:  # corrupt: truncated signature
                    mimes.append("image/png")
                    payloads.append(b"\x89PNG-broken" + bytes([i % 256]) * 16)
                elif i % 2 == 0:
                    mimes.append("image/png")
                    payloads.append(png_bytes(4 + i % 13, 3 + i % 7, seed=seed + i))
                else:
                    mimes.append("audio/wav")
                    payloads.append(wav_bytes(50 + i % 40, 8000 * (1 + i % 3),
                                              1 + i % 2, seed=seed + i))
            yield pd.DataFrame({"media_id": ids, "mime": mimes, "payload": payloads})

    return spark.range(0, n, 1, n_parts).mapInPandas(
        fn,
        schema="media_id long, mime string, payload binary",
    )


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched header decode over binary payloads: the REAL codec
    path (PNG IHDR + CRC, WAV RIFF walk). Unknown mimes / corrupt bytes
    yield valid=false rows — a data-quality signal, not a job failure.
    Payload is dropped on output (metadata only crosses the shuffle)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, p in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                meta = (decode_png_header(p) if mime == "image/png"
                        else decode_wav_header(p) if mime == "audio/wav" else None)
                rows.append({
                    "media_id": mid, "mime": mime,
                    "n_bytes": len(p) if p is not None else 0,
                    "valid": meta is not None,
                    "width": (meta or {}).get("width"),
                    "height": (meta or {}).get("height"),
                    "channels": (meta or {}).get("channels"),
                    "bit_depth": (meta or {}).get("bit_depth"),
                    "sample_rate": (meta or {}).get("sample_rate"),
                    "n_samples": (meta or {}).get("n_samples"),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.mapInPandas(fn, schema=MEDIA_META_SCHEMA)


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch decodes vectorized-per-row inside
    the worker (the real implementation would call into a native codec
    releasing the GIL). Output drops the payload — features only.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


# -- deep decode, one level below the headers (round 5) ----------------
# Inflate the first PNG scanline (stdlib zlib; filter type 0 — the type
# the fixture encoder emits) and read the first PCM samples of a WAV —
# bounded work per blob regardless of payload size. Filter types 1-4
# (Sub/Up/Average/Paeth unfiltering) remain the declared stub boundary;
# a foreign PNG using them returns valid_deep=false rather than garbage.

PCM_STAT_SAMPLES = 64


def decode_png_scanline(payload: bytes | None) -> dict | None:
    """Decompress the first IDAT scanline and return EXACT-integer pixel
    stats (sum + count — no float leaves the decoder). Returns None for
    invalid headers, truncated zlib streams, or filter types != 0."""
    hdr = decode_png_header(payload)
    if hdr is None or hdr["bit_depth"] != 8:
        return None
    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        if typ == b"IDAT":
            idat += bytes(payload[pos + 8:pos + 8 + ln])
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if not idat:
        return None
    row_len = hdr["width"] * hdr["channels"]
    try:
        # bounded inflate: only the filter byte + one scanline leaves
        # zlib, however large the image is
        raw = zlib.decompressobj().decompress(idat, 1 + row_len)
    except zlib.error:
        return None
    if len(raw) < 1 + row_len or raw[0] != 0:
        return None
    row = raw[1:1 + row_len]
    return {"px_sum": sum(row), "n_px": len(row)}


MAX_DECODE_PIXELS = 1 << 24  # 16M px-bytes per blob: bounds worker memory
                             # against absurd declared dims; real images
                             # at scale decode in tiles, not one row


def decode_png_pixels(payload: bytes | None,
                      max_pixels: int = MAX_DECODE_PIXELS) -> dict | None:
    """FULL pixel decode: inflate every IDAT scanline and unfilter all
    five PNG filter types (None/Sub/Up/Average/Paeth, spec §9). Returns
    exact-integer stats — px_sum/n_px over the whole image, row count,
    and a bitmask of filter types seen — so a closed-form oracle can
    value-verify the complete unfilter path. None for invalid headers,
    truncated/corrupt zlib, oversize declared dims, or unknown filter
    bytes."""
    hdr = decode_png_header(payload)
    if hdr is None or hdr["bit_depth"] != 8 or not hdr["channels"]:
        return None
    row_len = hdr["width"] * hdr["channels"]
    height = hdr["height"]
    if row_len * height > max_pixels:
        return None
    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        if typ == b"IDAT":
            idat += bytes(payload[pos + 8:pos + 8 + ln])
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if not idat:
        return None
    want = (1 + row_len) * height
    try:
        raw = zlib.decompressobj().decompress(idat, want)
    except zlib.error:
        return None
    if len(raw) < want:
        return None
    px_sum, filters_mask = 0, 0
    prev = bytes(row_len)
    for y in range(height):
        off = y * (1 + row_len)
        ftype = raw[off]
        if ftype > 4:
            return None
        filters_mask |= 1 << ftype
        prev = _png_unfilter_row(raw[off + 1:off + 1 + row_len], prev,
                                 hdr["channels"], ftype)
        px_sum += sum(prev)
    return {"px_sum": px_sum, "n_px": row_len * height,
            "n_rows": height, "filters_mask": filters_mask}


def decode_wav_pcm(payload: bytes | None,
                   max_samples: int = PCM_STAT_SAMPLES) -> dict | None:
    """Read the first ``max_samples`` 16-bit PCM values from the data
    chunk: peak (max |v|) and sum of squares, both exact integers."""
    hdr = decode_wav_header(payload)
    if hdr is None or hdr.get("n_samples") is None or hdr["bit_depth"] != 16:
        return None
    pos = 12
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack("<4sI", payload[pos:pos + 8])
        if cid == b"data":
            # bound by the bytes ACTUALLY present, not the declared
            # clen: a truncated payload (header intact, data cut
            # short) must return the module's "truncated bytes →
            # None" contract, not crash the task in struct.unpack
            avail = (len(payload) - pos - 8) // 2
            if clen // 2 > avail:
                return None
            n = min(max_samples, clen // 2)
            if n == 0:
                return {"pcm_peak": 0, "pcm_sumsq": 0, "n_pcm": 0}
            vals = struct.unpack(f"<{n}h", payload[pos + 8:pos + 8 + 2 * n])
            return {
                "pcm_peak": max(abs(v) for v in vals),
                "pcm_sumsq": sum(v * v for v in vals),
                "n_pcm": n,
            }
        pos += 8 + clen + (clen % 2)
    return None


MEDIA_CONTENT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("valid_deep", T.BooleanType(), False),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("n_px", T.IntegerType(), True),
        T.StructField("pcm_peak", T.IntegerType(), True),
        T.StructField("pcm_sumsq", T.LongType(), True),
        T.StructField("n_pcm", T.IntegerType(), True),
    ]
)


def extract_media_content(df: DataFrame) -> DataFrame:
    """Arrow-batched DEEP decode over binary payloads: PNG scanline
    inflate + WAV PCM stats inside the same mapInPandas shape as the
    header path. All emitted stats are exact integers, so the closed-
    form fixture oracle (see queries.q_media_content) verifies the full
    synthesize → encode → inflate/unpack round trip bit-for-bit."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, p in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                stats = (decode_png_scanline(p) if mime == "image/png"
                         else decode_wav_pcm(p) if mime == "audio/wav" else None)
                rows.append({
                    "media_id": mid, "mime": mime,
                    "valid_deep": stats is not None,
                    "px_sum": (stats or {}).get("px_sum"),
                    "n_px": (stats or {}).get("n_px"),
                    "pcm_peak": (stats or {}).get("pcm_peak"),
                    "pcm_sumsq": (stats or {}).get("pcm_sumsq"),
                    "n_pcm": (stats or {}).get("n_pcm"),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_CONTENT_SCHEMA.fields])

    return df.mapInPandas(fn, schema=MEDIA_CONTENT_SCHEMA)


# -- full-image decode: every scanline, all five filter types ----------

MEDIA_PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("valid_deep", T.BooleanType(), False),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("n_rows", T.IntegerType(), True),
        T.StructField("filters_mask", T.IntegerType(), True),
        T.StructField("pcm_peak", T.IntegerType(), True),
        T.StructField("pcm_sumsq", T.LongType(), True),
        T.StructField("n_pcm", T.IntegerType(), True),
    ]
)


def synthesize_filtered_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Like ``synthesize_real_media`` but PNG rows cycle through ALL
    five PNG filter types (``y % 5`` — row 0 is filter 0, so the
    first-scanline decoder still reads these). Pixel VALUES are the
    same closed form; only the encoding differs — which is exactly what
    makes the full-decode oracle meaningful."""
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32 or 1))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            mimes, payloads = [], []
            for i in ids:
                if i % 8 == 7:  # corrupt: truncated signature
                    mimes.append("image/png")
                    payloads.append(b"\x89PNG-broken" + bytes([i % 256]) * 16)
                elif i % 2 == 0:
                    mimes.append("image/png")
                    payloads.append(png_bytes(4 + i % 13, 3 + i % 7,
                                              seed=seed + i,
                                              row_filter=lambda y: y % 5))
                else:
                    mimes.append("audio/wav")
                    payloads.append(wav_bytes(50 + i % 40, 8000 * (1 + i % 3),
                                              1 + i % 2, seed=seed + i))
            yield pd.DataFrame({"media_id": ids, "mime": mimes, "payload": payloads})

    return spark.range(0, n, 1, n_parts).mapInPandas(
        fn,
        schema="media_id long, mime string, payload binary",
    )


def extract_media_pixels(df: DataFrame) -> DataFrame:
    """Arrow-batched FULL decode: every PNG scanline unfiltered
    (all five filter types) and every WAV PCM sample read — exact
    integers end-to-end, blobs never on the driver. The closed-form
    fixture oracle verifies the complete synthesize → filter → deflate
    → inflate → unfilter round trip value-by-value."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, p in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                stats = (decode_png_pixels(p) if mime == "image/png"
                         else decode_wav_pcm(p, max_samples=1 << 31)
                         if mime == "audio/wav" else None)
                rows.append({
                    "media_id": mid, "mime": mime,
                    "valid_deep": stats is not None,
                    "px_sum": (stats or {}).get("px_sum"),
                    "n_px": (stats or {}).get("n_px"),
                    "n_rows": (stats or {}).get("n_rows"),
                    "filters_mask": (stats or {}).get("filters_mask"),
                    "pcm_peak": (stats or {}).get("pcm_peak"),
                    "pcm_sumsq": (stats or {}).get("pcm_sumsq"),
                    "n_pcm": (stats or {}).get("n_pcm"),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_PIXELS_SCHEMA.fields])

    return df.mapInPandas(fn, schema=MEDIA_PIXELS_SCHEMA)
