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
