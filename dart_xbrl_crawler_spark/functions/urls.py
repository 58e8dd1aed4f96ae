"""URL canonicalization + hashing for the frontier.

The reference assembles URLs by hand (query-param dicts at
/root/reference/dart_api_manager.py:235-244,341-344) and dedups work by
directory existence (dart_api_manager.py:388-389).  Here the URL is the
key: ``url_canon`` is the canonical spelling, ``url_hash =
xxhash64(url_canon)`` (built-in, JVM-side) keys the seen-set and every
frontier partition.

Canonicalization is the one parse-heavy step → an Arrow-batched pandas
UDF returning a struct (url_canon, host).  Everything downstream stays
in Catalyst.

Spec (idempotent — property-tested):
  * scheme + host lowercased; default ports (:80 http, :443 https) dropped
  * fragment dropped
  * query params sorted by (key, value), empty trailing separators dropped
  * empty path → '/'
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CANON_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
    ]
)


def canonicalize_one(url: str) -> tuple[str, str]:
    """Pure-python canonicalizer (shared by the vectorized UDF and the
    oracle-side tests)."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url, ""
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        netloc = f"{host}:{port}"
    else:
        netloc = host
    q = sorted(parse_qsl(parts.query, keep_blank_values=True))
    path = parts.path or "/"
    canon = urlunsplit((scheme, netloc, path, urlencode(q), ""))
    return canon, host


@F.pandas_udf(_CANON_SCHEMA)
def _canonicalize_udf(urls: pd.Series) -> pd.DataFrame:
    out = urls.map(canonicalize_one)
    return pd.DataFrame(
        {"url_canon": out.map(lambda t: t[0]), "host": out.map(lambda t: t[1])}
    )


def with_url_canon(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add url_canon, host, url_hash columns.  xxhash64 stays JVM-side."""
    return (
        df.withColumn("_c", _canonicalize_udf(F.col(url_col)))
        .withColumn("url_canon", F.col("_c.url_canon"))
        .withColumn("host", F.col("_c.host"))
        .drop("_c")
        .withColumn("url_hash", F.xxhash64("url_canon"))
    )
