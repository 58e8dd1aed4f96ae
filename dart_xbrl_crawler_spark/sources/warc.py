"""WARC source/sink — the container format actual Common-Crawl-style
pages arrive in (north-star input: `pages(url, warc_ts, html, …)`).

The reference never reads WARC (its pages come from the DART OpenAPI),
but a web-scale frontier's fetch corpus does: ``read_warc`` turns a
directory of ``.warc`` / ``.warc.gz`` files into the engine's pages
schema, and ``warc_bytes``/``write_warc`` build valid files for
round-trip tests and for archiving fetched rounds.

Spark shape: ``binaryFile`` source (one task per file — WARC is a
concatenation format with no intra-file split points unless an index
is present) → ``mapInPandas`` record walk in pure Python (stdlib gzip
handles the per-record-gzipped member stream Common Crawl uses).  At
100 TB scale the unit of parallelism is the file/segment, which is how
Common Crawl ships (≈1 GB segments, tens of thousands per crawl) — the
reader never needs more than one segment in memory per task.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_FROM_WARC = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("source_file", T.StringType(), False),
    ]
)


def _parse_warc_stream(data: bytes) -> Iterator[dict]:
    """Walk concatenated WARC records: version line, headers,
    Content-Length payload, blank-line separators.  For ``response``
    records the HTTP header block is stripped so ``html`` is the body."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n or not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            break
        payload = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        rec_type = headers.get("warc-type", "")
        body = payload
        if rec_type == "response" and payload[:5] in (b"HTTP/",):
            http_end = payload.find(b"\r\n\r\n")
            if http_end >= 0:
                body = payload[http_end + 4 :]
        yield {
            "url": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "type": rec_type,
            "body": body,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Directory/glob of .warc[.gz] files → pages-shaped DataFrame."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fpath.endswith(".gz"):
                    # multi-member streams (per-record gzip) included
                    data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
                for rec in _parse_warc_stream(data):
                    if rec["type"] in record_types and rec["url"]:
                        rows.append(
                            (
                                rec["url"],
                                rec["date"],
                                rec["body"],
                                rec["type"],
                                fpath,
                            )
                        )
            out = pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "warc_type", "source_file"],
            )
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            yield out

    return files.mapInPandas(parse, schema=PAGES_FROM_WARC)


def warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """(url, iso_ts, body) rows → one valid WARC file's bytes (response
    records with a minimal HTTP header block)."""
    out = io.BytesIO()
    for url, ts, body in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode("latin-1")
        out.write(header)
        out.write(http)
        out.write(b"\r\n\r\n")
    return out.getvalue()


def write_warc(pages: DataFrame, out_dir: str) -> None:
    """Archive pages(url, warc_ts, html) as one WARC file per partition
    — the fetch round's archival sink."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def dump(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        recs: list[tuple[str, str, bytes]] = []
        for pdf in it:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                iso = (
                    pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                    if ts is not None
                    else "1970-01-01T00:00:00Z"
                )
                recs.append((url, iso, bytes(html) if html is not None else b""))
        if recs:
            name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.warc")
            with open(name, "wb") as f:
                f.write(warc_bytes(recs))
        yield pd.DataFrame({"n": [len(recs)]})

    pages.select("url", "warc_ts", "html").mapInPandas(
        dump, schema="n long"
    ).collect()
