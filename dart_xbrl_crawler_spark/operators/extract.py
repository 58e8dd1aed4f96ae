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
    # flat columnar accumulators — ONE DataFrame per batch, never per doc
    c_doc: list[int] = []
    c_rt: list[str] = []
    c_ord: list[int] = []
    c_id: list[str] = []
    c_ko: list[str] = []
    c_en: list[str] = []
    c_c1: list[str] = []
    c_c2: list[str] = []
    c_c3: list[str] = []
    c_per: list[str] = []
    c_fs: list[str] = []
    c_amt: list = []

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
                    for report_type in ("BS", "CIS"):
                        stmt = (doc.get("statements") or {}).get(report_type)
                        if not stmt:
                            continue
                        # wide→long unpivot (xbrl_processor.py:505-745):
                        # per concept row × tuple-labeled period column.
                        # Null cells drop here; numeric / zero / NaN /
                        # period-shape filtering stays vectorized in
                        # _transform_long.  Duplicate period columns
                        # emit duplicate cells (reference semantics).
                        columns = [
                            (
                                str(c[0]) if c and len(c) > 0 else "",
                                str(c[1][0])
                                if c and len(c) > 1 and c[1]
                                else "연결재무제표",
                            )
                            for c in stmt.get("columns", [])
                        ]
                        for order_no, concept in enumerate(
                            stmt.get("rows", []), start=1
                        ):
                            values = concept.get("values", [])
                            cells = [
                                (p, fs, v)
                                for (p, fs), v in zip(columns, values)
                                if v is not None
                            ]
                            nf = len(cells)
                            if not nf:
                                continue
                            c_doc.extend([i] * nf)
                            c_rt.extend([report_type] * nf)
                            c_ord.extend([order_no] * nf)
                            c_id.extend([str(concept.get("concept_id", ""))] * nf)
                            c_ko.extend([str(concept.get("label_ko", ""))] * nf)
                            c_en.extend([str(concept.get("label_en", ""))] * nf)
                            c_c1.extend([str(concept.get("class1", "") or "")] * nf)
                            c_c2.extend([str(concept.get("class2", "") or "")] * nf)
                            c_c3.extend([str(concept.get("class3", "") or "")] * nf)
                            c_per.extend(cell[0] for cell in cells)
                            c_fs.extend(cell[1] for cell in cells)
                            c_amt.extend(cell[2] for cell in cells)
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
    long = pd.DataFrame(
        {
            "doc_idx": c_doc,
            "report_type": c_rt,
            "order_no": c_ord,
            "account_id": c_id,
            "account_name": c_ko,
            "account_name_en": c_en,
            "class1": c_c1,
            "class2": c_c2,
            "class3": c_c3,
            "period_raw": c_per,
            "fs": c_fs,
            "amount": c_amt,
        }
    )
    return docs, long


_PERIOD_SHAPE = oracle._PERIOD_RE


def _transform_long(long: pd.DataFrame, docs: pd.DataFrame, run_ts: str) -> pd.DataFrame:
    """Batch-wide columnar fact pipeline (spec: oracle.py).

    Implementation note: string steps use compiled-regex/dict list
    comprehensions over numpy object arrays rather than chained pandas
    ``.str`` ops — for object dtype those are Python loops anyway, and
    each chained op materializes a full-batch temporary.  Under 32
    parallel workers that allocation churn collapsed aggregate
    throughput ~8× (measured); the single-temporary form scales.
    Doc-level attrs join by plain fancy-indexing (doc_idx is the row
    position in ``docs`` by construction — no merge needed).
    """
    empty = pd.DataFrame(columns=["doc_idx", *oracle.FACT_COLUMNS])
    if long.empty:
        return empty

    doc_idx = long["doc_idx"].to_numpy(dtype=np.int64)
    raw = long["period_raw"].to_numpy(dtype=object)
    amount = pd.to_numeric(long["amount"], errors="coerce").to_numpy(dtype=np.float64)

    # doc-level attrs by position
    d_year = docs["year"].to_numpy(dtype=object)
    d_mm = docs["mm"].to_numpy(dtype=object)

    # predicates + period filter in ONE pass ---------------------------
    match = _PERIOD_SHAPE.match
    n = len(raw)
    keep_idx = []
    periods = []
    append_i = keep_idx.append
    append_p = periods.append
    for i in range(n):
        a = amount[i]
        if a != a or a == 0.0:
            continue
        r = raw[i]
        if not match(r):
            continue
        if len(r) == 17:
            p = f"{r[:4]}-{r[4:6]}-{r[6:8]} ~ {r[9:13]}-{r[13:15]}-{r[15:17]}"
            di = doc_idx[i]
            needle = f"{d_year[di]}-{d_mm[di]}"
            if p[:7] != needle and p[13:20] != needle:
                continue
        else:
            p = f"{r[:4]}-{r[4:6]}-{r[6:8]}"
            di = doc_idx[i]
            if p[:7] != f"{d_year[di]}-{d_mm[di]}":
                continue
        append_i(i)
        append_p(p)
    if not keep_idx:
        return empty

    idx = np.array(keep_idx, dtype=np.int64)
    doc_idx = doc_idx[idx]
    amount = amount[idx]
    period = periods  # python list, aligned with idx
    order_no = long["order_no"].to_numpy(dtype=np.int64)[idx]
    report_type = long["report_type"].to_numpy(dtype=object)[idx]
    account_id = long["account_id"].to_numpy(dtype=object)[idx]
    account_name = long["account_name"].to_numpy(dtype=object)[idx]
    account_name_en = long["account_name_en"].to_numpy(dtype=object)[idx]
    class1 = long["class1"].to_numpy(dtype=object)[idx]
    class2 = long["class2"].to_numpy(dtype=object)[idx]
    class3 = long["class3"].to_numpy(dtype=object)[idx]
    fs = long["fs"].to_numpy(dtype=object)[idx]
    m = len(idx)

    fs_type = ["연결" if "연결" in s else "별도" for s in fs]

    # -- hierarchy improve (BS only; order matters vs 총계-strip below) --
    outline = oracle.OUTLINE_REWRITE
    totals = oracle.TOTALS
    for i in range(m):
        if report_type[i] == "BS":
            c1 = class1[i]
            c1 = outline.get(c1, c1)
            class1[i] = c1
            if c1 == class2[i] and c1 in totals:
                class2[i] = ""
            if account_name[i] == "자산총계":
                order_no[i] = 0
    section_min: dict[tuple, int] = {}
    for i in range(m):
        k = (doc_idx[i], report_type[i], class1[i])
        o = order_no[i]
        if k not in section_min or o < section_min[k]:
            section_min[k] = o
    drop = np.zeros(m, dtype=bool)
    for i in range(m):
        if report_type[i] == "BS":
            an = account_name[i]
            if an in ("부채총계", "자본총계"):
                order_no[i] = section_min[(doc_idx[i], report_type[i], class1[i])]
            elif an == "자본과부채총계":
                drop[i] = True
    if drop.any():
        sel = ~drop
        doc_idx, amount, order_no = doc_idx[sel], amount[sel], order_no[sel]
        report_type, account_id = report_type[sel], account_id[sel]
        account_name, account_name_en = account_name[sel], account_name_en[sel]
        class1, class2, class3 = class1[sel], class2[sel], class3[sel]
        fs_type = [fs_type[i] for i in range(m) if sel[i]]
        period = [period[i] for i in range(m) if sel[i]]
        m = len(doc_idx)
    if m == 0:
        return empty

    # -- enrich/save ------------------------------------------------------
    # last-wins account_name → account_id per document (single dict pass)
    name_to_id: dict[tuple, str] = {}
    for i in range(m):
        name_to_id[(doc_idx[i], account_name[i])] = account_id[i]
    g = name_to_id.get
    class1_id = [g((doc_idx[i], class1[i]), "") for i in range(m)]
    class2_id = [g((doc_idx[i], class2[i]), "") for i in range(m)]
    class3_id = [g((doc_idx[i], class3[i]), "") for i in range(m)]

    rn_map = oracle.REPORT_NAME_MAP
    strip = oracle.TOTAL_STRIP
    report_name = [rn_map.get(rt, "") for rt in report_type]
    for i in range(m):
        if report_type[i] == "BS":
            period[i] = "당기"
            an = account_name[i]
            if an in strip:
                account_name[i] = strip[an]
            c1 = class1[i]
            if c1 in strip:
                class1[i] = strip[c1]
        else:
            p = period[i]
            if len(p) == 10:
                period[i] = "3개월"
            else:
                months = (int(p[13:17]) - int(p[:4])) * 12 + (
                    int(p[18:20]) - int(p[5:7])
                ) + 1
                period[i] = "3개월" if months <= 3 else "누적"

    # deterministic final sort (python sort over key tuples — one pass)
    order = sorted(
        range(m),
        key=lambda i: (
            doc_idx[i],
            report_type[i],
            order_no[i],
            period[i],
            fs_type[i],
            account_id[i],
        ),
    )
    take = np.array(order, dtype=np.int64)

    d_receipt = docs["receipt_ymd"].to_numpy(dtype=object)
    d_corp = docs["corp_code"].to_numpy(dtype=object)
    sdoc = doc_idx[take]
    return pd.DataFrame(
        {
            "doc_idx": sdoc,
            "order_no": order_no[take].astype(np.int32),
            "year": d_year[sdoc],
            "mm": d_mm[sdoc],
            "receipt_ymd": d_receipt[sdoc],
            "corp_code": d_corp[sdoc],
            "report_type": report_type[take],
            "report_name": [report_name[i] for i in order],
            "account_id": account_id[take],
            "account_name": account_name[take],
            "account_name_en": account_name_en[take],
            "class1": class1[take],
            "class2": class2[take],
            "class3": class3[take],
            "class1_id": [class1_id[i] for i in order],
            "class2_id": [class2_id[i] for i in order],
            "class3_id": [class3_id[i] for i in order],
            "fs_type": [fs_type[i] for i in order],
            "period": [period[i] for i in order],
            "amount": amount[take],
            "crawl_time": run_ts,
        },
        columns=["doc_idx", *oracle.FACT_COLUMNS],
    )


def _facts_batches(
    it: Iterator[pd.DataFrame], run_ts: str
) -> Iterator[pd.DataFrame]:
    out_cols = ["url", *oracle.FACT_COLUMNS]
    for pdf in it:
        docs, long = _parse_batch(pdf, run_ts)
        facts = _transform_long(long, docs, run_ts)
        # doc_idx == row position in docs → plain fancy-index, no merge
        d_url = docs["url"].to_numpy(dtype=object)
        facts.insert(0, "url", d_url[facts["doc_idx"].to_numpy(dtype=np.int64)]
                     if len(facts) else np.array([], dtype=object))
        yield facts[out_cols]


def _text_batches(it: Iterator[pd.DataFrame], run_ts: str) -> Iterator[pd.DataFrame]:
    for pdf in it:
        docs, long = _parse_batch(pdf, run_ts)
        facts = _transform_long(long, docs, run_ts)

        # ZIP docs → canonical TSV: one '\t'.join per row, rows grouped
        # by doc via a single pass (facts are doc-sorted) — avoids the
        # 20× full-batch string-concat temporaries of the Series form
        if not facts.empty:
            cols = []
            for c in oracle.FACT_COLUMNS:
                v = facts[c].to_numpy(dtype=object)
                if c == "amount":
                    cols.append([repr(x) for x in v])
                elif c == "order_no":
                    cols.append([str(int(x)) for x in v])
                else:
                    cols.append(v)
            join = "\t".join
            lines = [join(row) for row in zip(*cols)]
            fdoc = facts["doc_idx"].to_numpy(dtype=np.int64)
            tsv_map: dict[int, list[str]] = {}
            for di, ln in zip(fdoc, lines):
                tsv_map.setdefault(int(di), []).append(ln)
            tsv = pd.Series({k: "\n".join(v) for k, v in tsv_map.items()}, dtype=object)
            n_facts = pd.Series({k: len(v) for k, v in tsv_map.items()}, dtype="int64")
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
    """corp_code → corp_name via broadcast joins with the reference's
    full fallback chain (xbrl_processor.py:281-306):

      1. exact match on the LPAD-8 code (the reference dict keys the raw
         ``str(corp_code)``; normalize_corp_map lpads, which already
         absorbs short unpadded keys like '123');
      2. zero-stripped *loose* match — ``lstrip('0')`` both sides
         (xbrl_processor.py:296-303; catches keys the lpad can't, e.g.
         over-long '0000000123').  The reference takes the first dict
         hit; we pin min(corp_name) for determinism;
      3. ``Corp_{code}`` default (xbrl_processor.py:305).

    Raw maps with duplicate codes go through normalize_corp_map's
    pinned min-name dedup, never a nondeterministic dropDuplicates."""
    from ..sources.corp_map import normalize_corp_map

    dim = normalize_corp_map(corp_map).select(
        F.col("dart_corp_code").alias("corp_code"),
        F.col("dart_corp").alias("corp_name"),
    )
    # loose dim keyed by the zero-stripped RAW code (pre-lpad, like the
    # reference's dict keys), deterministic min-name per stripped key
    loose = (
        corp_map.filter(
            F.col("dart_corp_code").isNotNull() & F.col("dart_corp").isNotNull()
        )
        .select(
            F.regexp_replace(F.col("dart_corp_code"), "^0+", "").alias("_stripped"),
            F.col("dart_corp").alias("_loose_name"),
        )
        .groupBy("_stripped")
        .agg(F.min("_loose_name").alias("_loose_name"))
    )
    joined = (
        facts.join(F.broadcast(dim), "corp_code", "left")
        .withColumn(
            "_stripped", F.regexp_replace(F.col("corp_code"), "^0+", "")
        )
        .join(F.broadcast(loose), "_stripped", "left")
    )
    return joined.withColumn(
        "corp_name",
        F.coalesce(
            F.col("corp_name"),
            F.col("_loose_name"),
            F.concat(F.lit("Corp_"), F.col("corp_code")),
        ),
    ).drop("_stripped", "_loose_name")
