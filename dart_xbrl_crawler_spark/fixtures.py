"""Deterministic synthetic fixtures (FIXTURES.md).

Everything is seeded ``random.Random`` + injected timestamps — never
wall-clock (the reference leaks ``datetime.now()`` at
/root/reference/xbrl_processor.py:795,883; we must not).

The golden ``pages.text`` column is produced by the row-at-a-time oracle
(oracle.py) at generation time; the vectorized engine must reproduce it
byte-identically.
"""

from __future__ import annotations

import io
import json
import random
import zipfile
from datetime import datetime, timedelta, timezone

import pandas as pd

from . import oracle

RUN_TS = "2026-01-16 00:00:00"  # injected crawl_time for all fixtures
EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_ACCOUNTS_BS = [
    # (concept_id, label_ko, label_en, class1, class2, class3)
    ("ifrs-full_Assets", "자산총계", "Total assets", "자산 [개요]", "자산 [개요]", ""),
    ("ifrs-full_CurrentAssets", "유동자산", "Current assets", "자산총계", "유동자산", ""),
    ("ifrs-full_CashAndCashEquivalents", "현금및현금성자산", "Cash", "자산총계", "유동자산", "현금및현금성자산"),
    ("ifrs-full_PropertyPlantAndEquipment", "유형자산", "PP&E", "자산총계", "비유동자산", "유형자산"),
    ("ifrs-full_Liabilities", "부채총계", "Total liabilities", "부채 [개요]", "부채 [개요]", ""),
    ("ifrs-full_CurrentLiabilities", "유동부채", "Current liabilities", "부채총계", "유동부채", ""),
    ("ifrs-full_Equity", "자본총계", "Total equity", "자본 [개요]", "자본 [개요]", ""),
    ("ifrs-full_IssuedCapital", "자본금", "Issued capital", "자본총계", "자본금", ""),
    ("ifrs-full_EquityAndLiabilities", "자본과부채총계", "Equity and liabilities", "자본과부채총계", "", ""),
    # duplicate label with a different id → last-wins mapping test
    ("dart_CustomAssets2", "유동자산", "Current assets (alt)", "자산총계", "유동자산", ""),
    # class1 == class2 ∈ totals → class2-blanking path (xbrl_processor.py:1031-1042)
    ("dart_AssetsDetail", "자산상세", "Assets detail", "자산총계", "자산총계", ""),
]

_ACCOUNTS_CIS = [
    ("ifrs-full_Revenue", "수익(매출액)", "Revenue", "수익 [개요]", "", ""),
    ("ifrs-full_CostOfSales", "매출원가", "Cost of sales", "수익 [개요]", "매출원가", ""),
    ("ifrs-full_GrossProfit", "매출총이익", "Gross profit", "수익 [개요]", "매출총이익", ""),
    ("ifrs-full_ProfitLoss", "당기순이익", "Profit", "수익 [개요]", "당기순이익", ""),
]

_REPORT_KINDS = ["반기보고서", "분기보고서", "사업보고서"]
_NON_PERIODIC = ["임시보고서", "주요사항보고서", "사업보고서"]  # last lacks (YYYY.MM)


def build_mini_xbrl_zip(
    corp_code: str, as_of: str, doc: dict, member_date: str | None = None
) -> bytes:
    """Serialize a mini-XBRL document into an in-memory ZIP with one
    ``entity{corp}_{date}.xbrl`` member (the shape the reference globs
    for, /root/reference/dart_api_manager.py:399)."""
    member = f"entity{corp_code}_{member_date or as_of}.xbrl"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # fixed date_time keeps the zip bytes deterministic
        info = zipfile.ZipInfo(member, date_time=(2026, 1, 1, 0, 0, 0))
        zf.writestr(info, json.dumps(doc, ensure_ascii=False, sort_keys=True))
    return buf.getvalue()


def _mk_doc(rng: random.Random, year: int, mm: int) -> dict:
    """One WIDE-matrix document (mini-xbrl-2) exercising every
    extract-kernel path.  Shape mirrors the reference's pandas frame
    (rows = concepts, columns = tuple-labeled periods,
    xbrl_processor.py:458-503), so the kernel must actually unpivot:

      * instant + range periods, ≤3-month and >3-month spans,
        out-of-period (previous-year) columns — period filter;
      * 연결/별도 columns, plus a column with NO fs tuple (reference
        defaults it to 연결, xbrl_processor.py:597-601);
      * a column whose label fails the period-shape regex (dropped,
        xbrl_processor.py:589-591) and a DUPLICATE period column
        (emits duplicate rows — reference appends without dedup);
      * cell values: zero (dropped), null, NaN (dropped), non-numeric
        string (dropped), negative, >1e12 floats.
    """
    q_end = f"{year}{mm:02d}30" if mm in (6, 9) else f"{year}{mm:02d}31"
    q_start = f"{year}{mm - 2:02d}01"
    y_start = f"{year}0101"
    other_year = f"{year - 1}{mm:02d}30"

    def columns_for(report_type: str) -> list[list]:
        if report_type == "BS":
            dates = [q_end, other_year]
        else:
            dates = [f"{q_start}-{q_end}", f"{y_start}-{q_end}", q_end]
        cols: list[list] = []
        for fs in ("연결재무제표", "별도재무제표"):
            for d in dates:
                cols.append([d, [fs]])
        cols.append(["주석", ["연결재무제표"]])  # regex-rejected label
        cols.append([q_end, ["연결재무제표"]])  # duplicate period column
        cols.append([q_end, []])  # missing fs tuple → 연결 default
        return cols

    def cell(rng: random.Random):
        r = rng.random()
        if r < 0.06:
            return 0.0  # zero → dropped
        if r < 0.10:
            return None  # null cell → dropped
        if r < 0.13:
            return float("nan")  # NaN → dropped
        if r < 0.16:
            return "n/a"  # non-numeric → dropped
        return round(rng.uniform(-5e12, 5e12), 2)

    def stmt(rows: list[tuple], report_type: str) -> dict:
        cols = columns_for(report_type)
        out_rows = []
        for cid, ko, en, c1, c2, c3 in rows:
            out_rows.append(
                {
                    "concept_id": cid,
                    "label_ko": ko,
                    "label_en": en,
                    "class1": c1,
                    "class2": c2,
                    "class3": c3,
                    "values": [cell(rng) for _ in cols],
                }
            )
        return {"columns": cols, "rows": out_rows}

    return {
        "doc_format": "mini-xbrl-2",
        "statements": {
            "BS": stmt(_ACCOUNTS_BS, "BS"),
            "CIS": stmt(_ACCOUNTS_CIS, "CIS"),
        },
    }


def gen_corp_map(n_corps: int, seed: int = 42) -> pd.DataFrame:
    """Company dimension with nulls, dupes and absent codes
    (FIXTURES.md §4)."""
    rng = random.Random(seed * 7 + 1)
    rows = []
    for i in range(n_corps):
        code = f"{(i + 1) * 37 % 10**8:08d}"
        rows.append(
            {
                "dart_corp": f"회사{i}",
                "dart_corp_code": code,
                "stock_nm": f"주식{i}",
                "stock_code": f"{i:06d}",
                "listed_yn": "Y" if rng.random() < 0.7 else "N",
            }
        )
    # duplicates (GROUP BY dedup path) and a null-code row (presence filter)
    rows.append(dict(rows[0]))
    rows.append(
        {
            "dart_corp": "널회사",
            "dart_corp_code": None,
            "stock_nm": None,
            "stock_code": None,
            "listed_yn": "N",
        }
    )
    return pd.DataFrame(rows)


def corp_codes(n_corps: int) -> list[str]:
    return [f"{(i + 1) * 37 % 10**8:08d}" for i in range(n_corps)]


def gen_seeds(n_corps: int, seed: int = 42, heavy_corp_disclosures: int = 8) -> pd.DataFrame:
    """rcp_no seed list (FIXTURES.md §3): periodic + non-periodic names,
    rcept_dt ties, one corp over the top-5 cap."""
    rng = random.Random(seed * 7 + 2)
    rows = []
    rank = 0
    for ci, code in enumerate(corp_codes(n_corps)):
        n_disc = heavy_corp_disclosures if ci == 0 else rng.randint(1, 4)
        for d in range(n_disc):
            year = 2025
            mm = [3, 6, 9, 12][d % 4]
            kind = rng.choice(_REPORT_KINDS) if rng.random() < 0.8 else rng.choice(_NON_PERIODIC)
            if kind in _REPORT_KINDS:
                report_nm = f"{kind} ({year}.{mm:02d})"
            else:
                report_nm = kind
            # ties: first two disclosures of corp 0 share rcept_dt
            day = 10 if (ci == 0 and d < 2) else 10 + d
            rcept_dt = f"{year}{mm:02d}{day:02d}"
            rcept_no = f"{rcept_dt}{ci:03d}{d:03d}"
            rows.append(
                {
                    "rcept_no": rcept_no,
                    "corp_code": code,
                    "report_nm": report_nm,
                    "rcept_dt": rcept_dt,
                    "seed_rank": rank,
                }
            )
            rank += 1
    return pd.DataFrame(rows)


def gen_robots(n_hosts: int = 50, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed * 7 + 3)
    rows = [{"host": "dart.fss.or.kr", "disallow_prefix": "/private", "crawl_delay_ms": 60}]
    for k in range(n_hosts):
        blocked = rng.random() < 0.05
        rows.append(
            {
                "host": f"host{k}.example",
                "disallow_prefix": "/" if blocked else ("/admin" if rng.random() < 0.3 else None),
                "crawl_delay_ms": rng.choice([100, 250, 500, 1000]),
            }
        )
    return pd.DataFrame(rows)


def gen_pages(
    n_corps: int = 6,
    n_generic: int = 200,
    n_hosts: int = 20,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Full fixture bundle → (pages, seeds, corp_map, robots).

    pages: DART-shaped rows (ZIP payloads, 1:1 with periodic seeds),
    canonicalization-trap duplicates, corrupt-PK rows, and a skewed
    long tail of generic HTML rows (≥60% on one host — the north_rule
    skew shape).
    """
    rng = random.Random(seed)
    seeds = gen_seeds(n_corps, seed)
    corp_map = gen_corp_map(n_corps, seed)
    robots = gen_robots(n_hosts, seed)

    pages_rows = []
    ts = EPOCH

    def add_page(url: str, html: bytes | None, lang: str, report_nm=None, rcept_dt=None):
        nonlocal ts
        ts = ts + timedelta(seconds=7)
        text = oracle.extract_text_rowwise(url, html, report_nm, rcept_dt, RUN_TS)
        pages_rows.append(
            {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}
        )

    # --- DART rows: one ZIP per periodic seed -------------------------
    for s in seeds.to_dict("records"):
        url = f"https://dart.fss.or.kr/api/fnlttXbrl.xml?rcept_no={s['rcept_no']}"
        if oracle.is_periodic_report(s["report_nm"]):
            m = oracle._REPORT_NM_RE.search(s["report_nm"])
            year, mm = int(m.group(1)), int(m.group(2))
            doc = _mk_doc(rng, year, mm)
            as_of = f"{year}-{mm:02d}-30"
            html = build_mini_xbrl_zip(s["corp_code"], as_of, doc)
        else:
            html = b"<!doctype html><html><body>non-periodic</body></html>"
        add_page(url, html, "ko", s["report_nm"], s["rcept_dt"])

    # canonicalization traps: same logical DART url, messy spellings
    trap_seed = seeds.iloc[0]
    trap_base = f"rcept_no={trap_seed['rcept_no']}"
    for variant in (
        f"https://DART.FSS.OR.KR/api/fnlttXbrl.xml?{trap_base}",
        f"https://dart.fss.or.kr/api/fnlttXbrl.xml?{trap_base}#frag",
        f"https://dart.fss.or.kr:443/api/fnlttXbrl.xml?{trap_base}&",
    ):
        add_page(variant, b"<!doctype html><html>dup</html>", "ko",
                 trap_seed["report_nm"], trap_seed["rcept_dt"])

    # corrupt-PK rows (error path, dart_api_manager.py:353)
    for i in range(3):
        add_page(
            f"https://dart.fss.or.kr/api/fnlttXbrl.xml?rcept_no=9999000000{i:03d}",
            b"PK\x03\x04corrupted-not-a-zip" + bytes([i]),
            "ko",
            "반기보고서 (2025.06)",
            "20250630",
        )

    # --- generic long tail: skewed host distribution ------------------
    langs = ["en", "ko", "ja"]
    for i in range(n_generic):
        if rng.random() < 0.6:
            host = "dart.fss.or.kr"  # giant host (skew)
            path = f"/dsab007/page{i}"
        else:
            host = f"host{rng.randint(0, n_hosts - 1)}.example"
            path = f"/p/{i}"
        url = f"https://{host}{path}"
        body = f"<html><head><title>t{i}</title></head><body><p>doc {i} &amp; words {rng.randint(0, 999)}</p></body></html>"
        add_page(url, body.encode(), rng.choice(langs))

    pages = pd.DataFrame(pages_rows)
    return pages, seeds, corp_map, robots
