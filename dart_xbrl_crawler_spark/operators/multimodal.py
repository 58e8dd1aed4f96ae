"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with real Spark plumbing (schema, partitioning, Arrow batch
shape) and STUBBED codecs.

The decode step is deliberately a deterministic fake / NotImplementedError
gate — the image/audio libraries are not in this container.  Everything
around it (mapInPandas signatures, metadata extraction from magic
bytes, batch sizing, partition-by-media-type layout) is real and
tested, so swapping in a real codec is a one-function change.
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


def decode_stub(payload: bytes, media_type: str | None) -> np.ndarray:
    """STUB codec: a deterministic 8-dim 'feature' from payload bytes.
    Swap for a real decoder (PIL/librosa/ffmpeg) when available."""
    if media_type is None:
        raise NotImplementedError("unknown media type — no codec registered")
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (h.reshape(8, 8).sum(axis=1) / 255.0).astype(np.float32)


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
