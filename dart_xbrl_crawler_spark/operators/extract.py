"""Vectorized extract kernel: zipped mini-XBRL / HTML pages → long fact
rows + byte-identical extracted text.

Spark surface: ``mapInPandas`` (the UDTF shape — one page row explodes
into many fact rows, SURVEY.md §2.10).  Inside a batch everything is
columnar pandas/numpy; the only per-item Python is the ZIP/JSON parse
itself (unavoidable, analogous to the reference's ``zipfile`` +
``dart_fss`` parse at /root/reference/dart_api_manager.py:369-415 and
xbrl_processor.py:505-745).  All fact-level transforms — predicates,
period format/filter/reclass, hierarchy rewrites, last-wins class-id
mapping — are batch-wide vectorized operations, NOT per-row loops.

Semantics contract: byte-identical output to oracle.extract_facts_rowwise
/ extract_text_rowwise per url (tests/test_extract_identity.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import oracle
from ..schemas import FACTS_PRE_JOIN

# extract_facts output: url + the pre-join facts schema
FACTS_OUT = T.StructType(
    [T.StructField("url", T.StringType(), False)] + list(FACTS_PRE_JOIN.fields)
)

TEXT_OUT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("parse_ok", T.BooleanType(), False),
        T.StructField("n_facts", T.LongType(), False),
    ]
)

_META_COLS = ["url", "html", "report_nm", "rcept_dt"]

_EMPTY_LONG_COLS = [
    "doc_idx",
    "report_type",
    "order_no",
    "account_id",
    "account_name",
    "account_name_en",
    "class1",
    "class2",
    "class3",
    "period_raw",
    "fs",
    "amount",
]


def _parse_batch(pdf: pd.DataFrame, run_ts: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Parse a batch of pages.

    Returns (docs, long):
      docs — one row per input page: doc_idx, url, is_zip, parse_ok,
             year, mm, receipt_ymd, corp_code
      long — one row per (concept × fact) across all parsed documents,
             with raw (unfiltered) values.
    """
    doc_rows = []
    long_parts: list[pd.DataFrame] = []
    for i, (url, html, report_nm, rcept_dt) in enumerate(
        zip(pdf["url"], pdf["html"], pdf["report_nm"], pdf["rcept_dt"])
    ):
        html_b = bytes(html) if html is not None else b""
        is_zip = html_b[:2] == b"PK"
        parse_ok = False
        year = mm = ""
        corp_code = ""
        if is_zip:
            member_corp, doc = oracle.parse_mini_xbrl(html_b)
            if doc is not None:
                m = oracle._REPORT_NM_RE.search(report_nm or "")
                if m:
                    year, mm = m.group(1), m.group(2)
                elif rcept_dt and len(str(rcept_dt)) == 8:
                    year, mm = str(rcept_dt)[:4], str(rcept_dt)[4:6]
                if year:
                    parse_ok = True
                    corp_code = member_corp or ""
                    recs = []
                    for report_type in ("BS", "CIS"):
                        stmt = (doc.get("statements") or {}).get(report_type)
                        if not stmt:
                            continue
                        for order_no, concept in enumerate(
                            stmt.get("concepts", []), start=1
                        ):
                            facts = concept.get("facts", [])
                            if not facts:
                                continue
                            recs.append(
                                (
                                    report_type,
                                    order_no,
                                    str(concept.get("concept_id", "")),
                                    str(concept.get("label_ko", "")),
                                    str(concept.get("label_en", "")),
                                    str(concept.get("class1", "") or ""),
                                    str(concept.get("class2", "") or ""),
                                    str(concept.get("class3", "") or ""),
                                    [str(f.get("period", "")) for f in facts],
                                    [str(f.get("fs", "")) for f in facts],
                                    [f.get("amount") for f in facts],
                                )
                            )
                    if recs:
                        cdf = pd.DataFrame(
                            recs,
                            columns=[
                                "report_type",
                                "order_no",
                                "account_id",
                                "account_name",
                                "account_name_en",
                                "class1",
                                "class2",
                                "class3",
                                "period_raw",
                                "fs",
                                "amount",
                            ],
                        )
                        # concept-level → fact-level, columnar explode
                        cdf = cdf.explode(["period_raw", "fs", "amount"])
                        cdf.insert(0, "doc_idx", i)
                        long_parts.append(cdf)
        rd = str(rcept_dt) if rcept_dt is not None else ""
        receipt_ymd = (
            f"{rd[:4]}-{rd[4:6]}-{rd[6:8]}"
            if len(rd) == 8 and rd.isdigit()
            else run_ts[:10]
        )
        doc_rows.append((i, url, is_zip, parse_ok, year, mm, receipt_ymd, corp_code))

    docs = pd.DataFrame(
        doc_rows,
        columns=[
            "doc_idx",
            "url",
            "is_zip",
            "parse_ok",
            "year",
            "mm",
            "receipt_ymd",
            "corp_code",
        ],
    )
    if long_parts:
        long = pd.concat(long_parts, ignore_index=True)
    else:
        long = pd.DataFrame(columns=_EMPTY_LONG_COLS)
    return docs, long


def _transform_long(long: pd.DataFrame, docs: pd.DataFrame, run_ts: str) -> pd.DataFrame:
    """Batch-wide vectorized fact pipeline (spec: oracle.py).  Input is
    the raw fact-level frame; output is final FACT_COLUMNS + doc_idx,
    sorted deterministically within each document."""
    if long.empty:
        return pd.DataFrame(columns=["doc_idx", *oracle.FACT_COLUMNS])

    df = long.merge(
        docs[["doc_idx", "year", "mm", "receipt_ymd", "corp_code"]],
        on="doc_idx",
        how="left",
    )

    # predicates: period shape, numeric nonzero amount ------------------
    shape_ok = df["period_raw"].str.match(r"^\d{8}(-\d{8})?$", na=False)
    amount = pd.to_numeric(df["amount"], errors="coerce")
    df = df.assign(amount=amount)[shape_ok & amount.notna() & (amount != 0.0)].copy()
    if df.empty:
        return pd.DataFrame(columns=["doc_idx", *oracle.FACT_COLUMNS])

    # period format ------------------------------------------------------
    raw = df["period_raw"]
    s = raw.str.slice(0, 8)
    start_iso = s.str.slice(0, 4) + "-" + s.str.slice(4, 6) + "-" + s.str.slice(6, 8)
    e = raw.str.slice(9, 17)
    end_iso = e.str.slice(0, 4) + "-" + e.str.slice(4, 6) + "-" + e.str.slice(6, 8)
    is_range = raw.str.len() == 17
    df["period"] = np.where(is_range, start_iso + " ~ " + end_iso, start_iso)

    # period filter: needle 'YYYY-MM' at position 0 or 13 (equivalent to
    # the reference's substring containment for these fixed shapes)
    needle = df["year"] + "-" + df["mm"]
    p = df["period"].astype(str)
    keep = (p.str.slice(0, 7) == needle) | (p.str.slice(13, 20) == needle)
    df = df[keep].copy()
    if df.empty:
        return pd.DataFrame(columns=["doc_idx", *oracle.FACT_COLUMNS])

    # fs_type --------------------------------------------------------------
    df["fs_type"] = np.where(df["fs"].str.contains("연결", na=False), "연결", "별도")

    # -- hierarchy improve (BS only; order matters vs 총계-strip below) --
    is_bs = df["report_type"] == "BS"
    df["class1"] = np.where(
        is_bs, df["class1"].map(oracle.OUTLINE_REWRITE).fillna(df["class1"]), df["class1"]
    )
    blank2 = is_bs & (df["class1"] == df["class2"]) & df["class1"].isin(oracle.TOTALS)
    df.loc[blank2, "class2"] = ""
    df.loc[is_bs & (df["account_name"] == "자산총계"), "order_no"] = 0
    section_min = df.groupby(["doc_idx", "report_type", "class1"])["order_no"].transform("min")
    reassign = is_bs & df["account_name"].isin(("부채총계", "자본총계"))
    df.loc[reassign, "order_no"] = section_min[reassign]
    df = df[~(is_bs & (df["account_name"] == "자본과부채총계"))].copy()
    if df.empty:
        return pd.DataFrame(columns=["doc_idx", *oracle.FACT_COLUMNS])

    # -- enrich/save ------------------------------------------------------
    # last-wins account_name → account_id per document
    mapping = df.drop_duplicates(["doc_idx", "account_name"], keep="last")[
        ["doc_idx", "account_name", "account_id"]
    ]
    for k in ("class1", "class2", "class3"):
        m = mapping.rename(columns={"account_name": k, "account_id": f"{k}_id"})
        df = df.merge(m, on=["doc_idx", k], how="left")
        df[f"{k}_id"] = df[f"{k}_id"].fillna("")

    df["report_name"] = df["report_type"].map(oracle.REPORT_NAME_MAP).fillna("")

    # period reclassification
    p = df["period"]
    rng_mask = p.str.len() > 10
    sy = pd.to_numeric(p.str.slice(0, 4), errors="coerce")
    sm = pd.to_numeric(p.str.slice(5, 7), errors="coerce")
    ey = pd.to_numeric(p.str.slice(13, 17), errors="coerce")
    em = pd.to_numeric(p.str.slice(18, 20), errors="coerce")
    months = (ey - sy) * 12 + (em - sm) + 1
    is_bs2 = df["report_type"] == "BS"
    df["period"] = np.where(
        is_bs2,
        "당기",
        np.where(rng_mask & (months > 3), "누적", "3개월"),
    )

    # 총계-strip (save-time, AFTER hierarchy improve), BS only
    strip_name = is_bs2 & df["account_name"].isin(oracle.TOTAL_STRIP)
    df.loc[strip_name, "account_name"] = df.loc[strip_name, "account_name"].map(
        oracle.TOTAL_STRIP
    )
    strip_c1 = is_bs2 & df["class1"].isin(oracle.TOTAL_STRIP)
    df.loc[strip_c1, "class1"] = df.loc[strip_c1, "class1"].map(oracle.TOTAL_STRIP)

    df["crawl_time"] = run_ts
    df["order_no"] = df["order_no"].astype("int32")

    df = df.sort_values(
        ["doc_idx", "report_type", "order_no", "period", "fs_type", "account_id"],
        kind="mergesort",
    ).reset_index(drop=True)
    return df[["doc_idx", *oracle.FACT_COLUMNS]]


def _facts_batches(
    it: Iterator[pd.DataFrame], run_ts: str
) -> Iterator[pd.DataFrame]:
    out_cols = ["url", *oracle.FACT_COLUMNS]
    for pdf in it:
        docs, long = _parse_batch(pdf, run_ts)
        facts = _transform_long(long, docs, run_ts)
        facts = facts.merge(docs[["doc_idx", "url"]], on="doc_idx", how="left")
        yield facts[out_cols]


def _text_batches(it: Iterator[pd.DataFrame], run_ts: str) -> Iterator[pd.DataFrame]:
    for pdf in it:
        docs, long = _parse_batch(pdf, run_ts)
        facts = _transform_long(long, docs, run_ts)

        # ZIP docs → canonical TSV (vectorized string build)
        if not facts.empty:
            line = facts["order_no"].astype(str)
            for c in oracle.FACT_COLUMNS[1:]:
                col = facts[c].map(repr) if c == "amount" else facts[c].astype(str)
                line = line + "\t" + col
            tsv = (
                pd.DataFrame({"doc_idx": facts["doc_idx"], "line": line})
                .groupby("doc_idx")["line"]
                .agg("\n".join)
            )
            n_facts = facts.groupby("doc_idx").size()
        else:
            tsv = pd.Series(dtype=object)
            n_facts = pd.Series(dtype="int64")

        out = docs.set_index("doc_idx")
        out["text"] = tsv
        out["n_facts"] = n_facts
        out["n_facts"] = out["n_facts"].fillna(0).astype("int64")

        # non-ZIP pages → stripped HTML text (vectorized regex chain)
        html = pdf["html"].reset_index(drop=True)
        gen_mask = (~out["is_zip"]).to_numpy()
        if gen_mask.any():
            raw = html[gen_mask].map(
                lambda b: b.decode("utf-8", errors="replace") if b else ""
            )
            s = raw.str.replace(oracle._SCRIPT_RE, " ", regex=True)
            s = s.str.replace(oracle._TAG_RE, " ", regex=True)
            for k, v in oracle._ENTITIES.items():
                s = s.str.replace(k, v, regex=False)
            s = s.str.replace(oracle._WS_RE, " ", regex=True).str.strip()
            out.loc[gen_mask, "text"] = s.values
        out["text"] = out["text"].fillna("")
        # a ZIP page that parsed to zero facts still 'parsed ok' iff the
        # zip opened; failed = zip page with parse_ok False
        out["parse_ok"] = np.where(out["is_zip"], out["parse_ok"], True)
        yield out.reset_index()[["url", "text", "parse_ok", "n_facts"]]


def extract_facts(pages: DataFrame, run_ts: str) -> DataFrame:
    """pages(url, html, report_nm, rcept_dt, …) → long facts
    (url + FACTS_PRE_JOIN).  Projects away every unneeded column before
    the UDF so the Arrow channel only carries what the kernel reads."""
    src = pages.select(*_META_COLS)
    return src.mapInPandas(
        lambda it: _facts_batches(it, run_ts), schema=FACTS_OUT
    )


def extract_text(pages: DataFrame, run_ts: str) -> DataFrame:
    """pages → (url, text, parse_ok, n_facts): the byte-identity surface."""
    src = pages.select(*_META_COLS)
    return src.mapInPandas(
        lambda it: _text_batches(it, run_ts), schema=TEXT_OUT
    )


def attach_corp_name(facts: DataFrame, corp_map: DataFrame) -> DataFrame:
    """corp_code → corp_name via broadcast join with the reference's
    fallback chain (exact → zero-stripped loose match → 'Corp_{code}',
    xbrl_processor.py:281-306) — normalization done ONCE, in Catalyst."""
    dim = (
        corp_map.filter(
            F.col("dart_corp_code").isNotNull() & F.col("dart_corp").isNotNull()
        )
        .select(
            F.lpad(F.col("dart_corp_code"), 8, "0").alias("corp_code"),
            F.col("dart_corp").alias("corp_name"),
        )
        .dropDuplicates(["corp_code"])
    )
    joined = facts.join(F.broadcast(dim), "corp_code", "left")
    return joined.withColumn(
        "corp_name",
        F.coalesce(F.col("corp_name"), F.concat(F.lit("Corp_"), F.col("corp_code"))),
    )
