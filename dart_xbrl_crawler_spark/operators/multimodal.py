"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with real Spark plumbing (schema, partitioning, Arrow batch
shape).

Decode status per modality: audio/wav has a REAL PCM decoder
(decode_wav — stdlib wave + numpy sample stats); image/png has a REAL
pixel decoder (decode_png — stdlib zlib + per-row unfilter, filters
0-4, color types 0/2/3/4/6 at depth 8); JPEG/GIF/video decode stays a
deterministic stub / NotImplementedError gate (no codec libraries in
this container).  Everything around the codecs (mapInPandas
signatures, header metadata from magic bytes, batch sizing,
partition-by-media-type layout) is real and tested, so swapping in a
real JPEG/video codec is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("magic_hex", T.StringType(), True),
    ]
)

FEATURE_OUT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"ID3": "audio/mp3",
    b"\x00\x00\x00": "video/mp4",  # ftyp boxes start with size prefix
    b"PK": "application/zip",
}


def sniff_media(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """Magic-byte media typing, all built-in expressions (no UDF):
    hex-prefix dispatch on the binary column."""
    prefix = F.hex(F.expr(f"substring({binary_col}, 1, 4)"))
    mt = F.lit(None).cast("string")
    for magic, typ in _MAGIC.items():
        mt = F.when(prefix.startswith(magic.hex().upper()), typ).otherwise(mt)
    return df.withColumn("media_type", mt).withColumn(
        "n_bytes", F.octet_length(F.col(binary_col)).cast("long")
    )


HEADER_META = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
    ]
)


def parse_header(payload: bytes, media_type: str | None) -> dict:
    """REAL container-header metadata in pure Python — no codec library:
    PNG IHDR width/height, JPEG SOFn dimensions (marker walk), WAV fmt
    chunk sample-rate/channels.  Only pixel/sample DECODE stays stubbed
    (decode_stub below)."""
    out = {"width": None, "height": None, "sample_rate": None, "n_channels": None}
    try:
        if media_type == "image/png" and len(payload) >= 24:
            # 8-byte signature, IHDR length+type, then width/height u32be
            if payload[12:16] == b"IHDR":
                out["width"] = int.from_bytes(payload[16:20], "big")
                out["height"] = int.from_bytes(payload[20:24], "big")
        elif media_type == "image/jpeg":
            i = 2
            n = len(payload)
            while i + 9 < n:
                if payload[i] != 0xFF:
                    i += 1
                    continue
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
                # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    out["height"] = int.from_bytes(payload[i + 5 : i + 7], "big")
                    out["width"] = int.from_bytes(payload[i + 7 : i + 9], "big")
                    break
                i += 2 + seg_len
        elif media_type == "audio/wav" and len(payload) >= 36:
            # RIFF....WAVE then chunk walk to 'fmt '
            if payload[8:12] == b"WAVE":
                i = 12
                n = len(payload)
                while i + 8 <= n:
                    cid = payload[i : i + 4]
                    clen = int.from_bytes(payload[i + 4 : i + 8], "little")
                    if cid == b"fmt " and i + 16 <= n:
                        out["n_channels"] = int.from_bytes(
                            payload[i + 10 : i + 12], "little"
                        )
                        out["sample_rate"] = int.from_bytes(
                            payload[i + 12 : i + 16], "little"
                        )
                        break
                    i += 8 + clen + (clen & 1)
    except Exception:
        pass  # malformed header → nulls (error path is data)
    return out


def extract_header_meta(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas header-metadata extraction: (url, media_type, width,
    height, sample_rate, n_channels).  Pure-Python byte slicing per
    payload — no decode, no codec dependency."""
    src = sniff_media(df, binary_col).select("url", binary_col, "media_type")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                parse_header(bytes(p) if p is not None else b"", mt)
                for p, mt in zip(pdf[binary_col], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [m["n_channels"] for m in metas], dtype="Int32"
                    ),
                }
            )

    return src.mapInPandas(run, schema=HEADER_META)


AUDIO_STATS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
    ]
)


def decode_wav(payload: bytes) -> dict | None:
    """REAL PCM sample decode — stdlib ``wave`` + numpy, no codec
    library.  Returns sample-level stats (duration, RMS, peak) or None
    for non-PCM/malformed payloads (the error path is data).  This is
    the audio modality's real decoder; image/video decode stays behind
    decode_stub (no codec libs in this container)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            fr = w.getframerate()
            nf = w.getnframes()
            raw = w.readframes(nf)
    except Exception:
        return None
    if fr <= 0 or nch <= 0:
        return None
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    return {
        "sample_rate": fr,
        "n_channels": nch,
        "duration_s": nf / fr,
        "n_samples": int(len(x)),
        "rms": float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
        "peak": float(np.max(np.abs(x))) if len(x) else 0.0,
    }


def extract_audio_stats(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas PCM decode over audio/wav payloads: (url,
    sample_rate, n_channels, duration_s, n_samples, rms, peak).
    Non-wav rows are filtered JVM-side BEFORE the Arrow channel — only
    audio bytes ride to python."""
    src = (
        sniff_media(df, binary_col)
        .filter(F.col("media_type") == "audio/wav")
        .select("url", binary_col)
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url, payload in zip(pdf["url"], pdf[binary_col]):
                s = decode_wav(bytes(payload) if payload is not None else b"")
                s = s or {
                    "sample_rate": None,
                    "n_channels": None,
                    "duration_s": None,
                    "n_samples": None,
                    "rms": None,
                    "peak": None,
                }
                rows.append({"url": url, **s})
            out = pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "sample_rate",
                    "n_channels",
                    "duration_s",
                    "n_samples",
                    "rms",
                    "peak",
                ],
            )
            for c, dt in (
                ("sample_rate", "Int32"),
                ("n_channels", "Int32"),
                ("n_samples", "Int64"),
            ):
                out[c] = pd.array(out[c], dtype=dt)
            yield out

    return src.mapInPandas(run, schema=AUDIO_STATS)


def decode_png(payload: bytes) -> np.ndarray | None:
    """REAL PNG pixel decode in pure Python — stdlib zlib inflate +
    per-row unfilter (filters 0-4: None/Sub/Up/Average/Paeth), no codec
    library.  Returns an (H, W, C) uint8 array, or None for payloads
    outside the decoded envelope (16-bit depth, interlaced) and for
    malformed data — the error path is data, not an exception.

    Covers color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA) at bit depth 8.  The row loop is honest-python (unfilter
    is sequential by definition); a production cluster swaps in a C
    codec behind the same signature — the Spark-side plumbing
    (mapInPandas batches, JVM-side media filter) is identical."""
    import zlib

    try:
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        pos, n = 8, len(payload)
        ihdr = None
        plte = b""
        idat = bytearray()
        while pos + 8 <= n:
            clen = int.from_bytes(payload[pos : pos + 4], "big")
            ctype = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + clen]
            if ctype == b"IHDR":
                ihdr = body
            elif ctype == b"PLTE":
                plte = body
            elif ctype == b"IDAT":
                idat += body
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
        if ihdr is None or not idat:
            return None
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        bit_depth, color_type, _, _, interlace = ihdr[8:13]
        if bit_depth != 8 or interlace != 0 or w <= 0 or h <= 0:
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = w * channels
        if len(raw) < h * (stride + 1):
            return None
        out = bytearray(h * stride)
        prev = bytearray(stride)
        for y in range(h):
            off = y * (stride + 1)
            ftype = raw[off]
            row = bytearray(raw[off + 1 : off + 1 + stride])
            if ftype == 1:  # Sub
                for i in range(channels, stride):
                    row[i] = (row[i] + row[i - channels]) & 0xFF
            elif ftype == 2:  # Up
                for i in range(stride):
                    row[i] = (row[i] + prev[i]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride):
                    a = row[i - channels] if i >= channels else 0
                    row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for i in range(stride):
                    a = row[i - channels] if i >= channels else 0
                    b = prev[i]
                    c = prev[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[i] = (row[i] + pred) & 0xFF
            elif ftype != 0:
                return None
            out[y * stride : (y + 1) * stride] = row
            prev = row
        px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, channels)
        if color_type == 3:  # palette → RGB
            if len(plte) < 3:
                return None
            pal = np.frombuffer(plte, dtype=np.uint8)
            pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
            px = pal[np.minimum(px[:, :, 0], len(pal) - 1)]
        return px
    except Exception:
        return None


def decode_stub(payload: bytes, media_type: str | None) -> np.ndarray:
    """Codec dispatch: image/png decodes REAL pixels (decode_png) and
    features are per-channel means over the 8-bin row partition of the
    image; remaining image/video types keep the deterministic stub
    (no JPEG/video codec in this container — swap for PIL/ffmpeg when
    available)."""
    if media_type is None:
        raise NotImplementedError("unknown media type — no codec registered")
    if media_type == "image/png":
        px = decode_png(payload)
        if px is not None:
            gray = px.astype(np.float32).mean(axis=2) / 255.0
            bins = np.array_split(gray, 8, axis=0)
            return np.array([b.mean() if b.size else 0.0 for b in bins],
                            dtype=np.float32)
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (h.reshape(8, 8).sum(axis=1) / 255.0).astype(np.float32)


IMAGE_STATS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("std", T.DoubleType(), True),
    ]
)


def extract_image_stats(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas REAL pixel decode over image/png payloads: (url,
    width, height, n_channels, mean, std).  Non-png rows are filtered
    JVM-side BEFORE the Arrow channel — only image bytes ride to
    python; undecodable payloads yield null stats (error path is
    data)."""
    src = (
        sniff_media(df, binary_col)
        .filter(F.col("media_type") == "image/png")
        .select("url", binary_col)
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url, payload in zip(pdf["url"], pdf[binary_col]):
                px = decode_png(bytes(payload) if payload is not None else b"")
                if px is None:
                    rows.append(
                        {"url": url, "width": None, "height": None,
                         "n_channels": None, "mean": None, "std": None}
                    )
                else:
                    x = px.astype(np.float64)
                    rows.append(
                        {
                            "url": url,
                            "width": int(px.shape[1]),
                            "height": int(px.shape[0]),
                            "n_channels": int(px.shape[2]),
                            "mean": float(x.mean()),
                            "std": float(x.std()),
                        }
                    )
            out = pd.DataFrame(
                rows,
                columns=["url", "width", "height", "n_channels", "mean", "std"],
            )
            for c in ("width", "height", "n_channels"):
                out[c] = pd.array(out[c], dtype="Int32")
            yield out

    return src.mapInPandas(run, schema=IMAGE_STATS)


def extract_features(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas feature extraction over binary payloads — real Arrow
    plumbing, stub decode.  Unknown media types yield null features
    (the error path is data, not an exception)."""
    src = sniff_media(df, binary_col).select("url", binary_col, "media_type")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, mt in zip(pdf[binary_col], pdf["media_type"]):
                if mt is None or payload is None:
                    feats.append(None)
                else:
                    feats.append(
                        [float(x) for x in decode_stub(bytes(payload), mt)]
                    )
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return src.mapInPandas(run, schema=FEATURE_OUT)
