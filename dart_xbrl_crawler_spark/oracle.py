"""Reference-semantics oracle: row-at-a-time extract kernel + sequential
crawl-schedule model.

This module re-states the *behavior* of the reference extract pipeline
(/root/reference/xbrl_processor.py:505-1089 — unpivot, period filter,
hierarchy rewrites, enrich) and its sequential crawl loop
(/root/reference/dart_api_manager.py:491-540 — corp-major order,
date-desc, top-5 cap) in deliberately naive row-at-a-time Python.

It is the byte-identity oracle for tests AND the producer of the golden
``pages.text`` column in fixtures.  The production engine
(operators/extract.py) implements the same spec vectorized; tests assert
byte-identical output per url.  Keep this module slow and obvious —
never import it from the hot path.

Known reference defects are intentionally NOT reproduced (SURVEY.md §0):
wall-clock fallbacks become an injected ``run_ts``; dict/file-order
dependent ties get explicit deterministic tie-breakers.
"""

from __future__ import annotations

import re

FACT_COLUMNS = [
    "order_no",
    "year",
    "mm",
    "receipt_ymd",
    "corp_code",
    "report_type",
    "report_name",
    "account_id",
    "account_name",
    "account_name_en",
    "class1",
    "class2",
    "class3",
    "class1_id",
    "class2_id",
    "class3_id",
    "fs_type",
    "period",
    "amount",
    "crawl_time",
]

REPORT_NAME_MAP = {"BS": "재무상태표", "CIS": "포괄손익계산서"}
# 총계-strip applied at save time to account_name AND class1, BS only
# (xbrl_processor.py:820-839).
TOTAL_STRIP = {"자산총계": "자산", "부채총계": "부채", "자본총계": "자본"}
# [개요] → 총계 rewrite on class1, BS only, applied BEFORE the strip
# (xbrl_processor.py:1018-1029 runs before 820-839; order matters).
OUTLINE_REWRITE = {
    "자산 [개요]": "자산총계",
    "부채 [개요]": "부채총계",
    "자본 [개요]": "자본총계",
}
TOTALS = ("자산총계", "부채총계", "자본총계")

_PERIOD_RE = re.compile(r"^\d{8}(-\d{8})?$")
_REPORT_NM_RE = re.compile(r"\((\d{4})\.(\d{2})\)")
_PERIODIC_RE = re.compile(r"(반기보고서|분기보고서|사업보고서)")


def _iso(d8: str) -> str:
    return f"{d8[:4]}-{d8[4:6]}-{d8[6:8]}"


def format_period(raw: str) -> str:
    """YYYYMMDD → 'YYYY-MM-DD'; YYYYMMDD-YYYYMMDD → 'start ~ end'
    (xbrl_processor.py:603-611 semantics)."""
    if "-" in raw:
        start, end = raw.split("-", 1)
        return f"{_iso(start)} ~ {_iso(end)}"
    return _iso(raw)


def reclassify_period(report_type: str, period: str) -> str:
    """BS → '당기'; CIS instant → '3개월'; CIS range → '3개월' iff the
    span is ≤3 months else '누적' (xbrl_processor.py:929-957)."""
    if report_type == "BS":
        return "당기"
    if len(period) == 10:  # single ISO date
        return "3개월"
    start, end = period.split(" ~ ")
    sy, sm = int(start[:4]), int(start[5:7])
    ey, em = int(end[:4]), int(end[5:7])
    months = (ey - sy) * 12 + (em - sm) + 1
    return "3개월" if months <= 3 else "누적"


def is_periodic_report(report_nm: str) -> bool:
    """Frontier filter: periodic report names carrying '(YYYY.MM)'
    (dart_api_manager.py:298-326)."""
    return bool(
        report_nm
        and _PERIODIC_RE.search(report_nm)
        and _REPORT_NM_RE.search(report_nm)
    )


def parse_mini_xbrl(html: bytes) -> tuple[str | None, dict | None]:
    """Open the in-memory ZIP, find the first ``entity{8}_*.xbrl``
    member, parse its JSON body.  Returns (corp_code, doc) or
    (None, None) on any failure (corrupt ZIP, no member, bad JSON) —
    the failure row becomes state='failed' upstream.

    Document format ``mini-xbrl-2`` is a WIDE matrix, mirroring the
    reference's pandas frame (tuple-labeled period columns,
    xbrl_processor.py:458-503): per statement,
      columns: [[date_str, [fs_str]], ...]   # may repeat, may be junk
      rows:    [{concept_id, label_ko, label_en, class1..3,
                 values: [cell per column]}, ...]
    The kernel's job is the wide→long unpivot (xbrl_processor.py:505-745).

    Dispatch lives in doc_parsers.parse_document (format sniff →
    registry): the same call also understands real XBRL 2.1 instance
    XML members, so the oracle and the kernel share one seam."""
    from . import doc_parsers

    return doc_parsers.parse_document(html)


def extract_facts_rowwise(
    url: str,
    html: bytes,
    report_nm: str | None,
    rcept_dt: str | None,
    run_ts: str,
    seed_corp_code: str | None = None,
) -> list[dict]:
    """The extract kernel, row at a time.  One page → many fact rows
    (FACT_COLUMNS order; corp_name joined later, outside the kernel)."""
    corp_code, doc = parse_mini_xbrl(html)
    if doc is None:
        return []
    if corp_code is None:
        corp_code = seed_corp_code or ""

    # target period from report_nm '(YYYY.MM)'; fallback rcept_dt year/mm
    # (reference fallback: metadata yyyy+month, xbrl_processor.py:663-717)
    m = _REPORT_NM_RE.search(report_nm or "")
    if m:
        year, mm = m.group(1), m.group(2)
    elif rcept_dt and len(rcept_dt) == 8:
        year, mm = rcept_dt[:4], rcept_dt[4:6]
    else:
        return []
    needle = f"{year}-{mm}"

    receipt_ymd = (
        _iso(rcept_dt) if rcept_dt and len(rcept_dt) == 8 and rcept_dt.isdigit()
        else run_ts[:10]  # deterministic: injected run date, never now()
    )

    rows: list[dict] = []
    statements = doc.get("statements", {})
    for report_type in ("BS", "CIS"):
        stmt = statements.get(report_type)
        if not stmt:
            continue
        # -- wide→long unpivot (xbrl_processor.py:505-745): walk each
        # concept row × each tuple-labeled period column.  The reference
        # checks numeric-nonzero FIRST, then the column's date shape;
        # a malformed column label silently drops its cells, and a
        # DUPLICATE period column emits duplicate rows (no dedup).
        columns = [
            (str(c[0]) if c and len(c) > 0 else "",
             str(c[1][0]) if c and len(c) > 1 and c[1] else "연결재무제표")
            for c in stmt.get("columns", [])
        ]
        order_no = 0
        for concept in stmt.get("rows", []):
            order_no += 1  # 1-based source order (xbrl_processor.py:403)
            values = concept.get("values", [])
            for (raw, fs), amt in zip(columns, values):
                if amt is None:
                    continue
                try:
                    amount = float(amt)
                except (TypeError, ValueError):
                    continue
                if amount != amount or amount == 0.0:  # NaN or zero drop
                    continue
                if not _PERIOD_RE.match(raw):
                    continue  # column label isn't a period → not data
                period = format_period(raw)
                if needle not in period:
                    continue
                fs_type = "연결" if "연결" in fs else "별도"
                rows.append(
                    {
                        "order_no": order_no,
                        "report_type": report_type,
                        "account_id": str(concept.get("concept_id", "")),
                        "account_name": str(concept.get("label_ko", "")),
                        "account_name_en": str(concept.get("label_en", "")),
                        "class1": str(concept.get("class1", "") or ""),
                        "class2": str(concept.get("class2", "") or ""),
                        "class3": str(concept.get("class3", "") or ""),
                        "fs_type": fs_type,
                        "period": period,
                        "amount": amount,
                    }
                )

    # -- hierarchy improve (BS only; xbrl_processor.py:971-1089) --------
    for r in rows:
        if r["report_type"] == "BS" and r["class1"] in OUTLINE_REWRITE:
            r["class1"] = OUTLINE_REWRITE[r["class1"]]
    for r in rows:
        if (
            r["report_type"] == "BS"
            and r["class1"] == r["class2"]
            and r["class1"] in TOTALS
        ):
            r["class2"] = ""
    for r in rows:
        if r["report_type"] == "BS" and r["account_name"] == "자산총계":
            r["order_no"] = 0
    section_min: dict[tuple[str, str], int] = {}
    for r in rows:
        k = (r["report_type"], r["class1"])
        if k not in section_min or r["order_no"] < section_min[k]:
            section_min[k] = r["order_no"]
    for r in rows:
        if r["report_type"] == "BS" and r["account_name"] in (
            "부채총계",
            "자본총계",
        ):
            r["order_no"] = section_min[(r["report_type"], r["class1"])]
    rows = [
        r
        for r in rows
        if not (r["report_type"] == "BS" and r["account_name"] == "자본과부채총계")
    ]

    # -- enrich/save (xbrl_processor.py:786-969) -------------------------
    # class-id map: account_name → account_id, last occurrence wins
    # (iterrows overwrite, xbrl_processor.py:892-910)
    name_to_id: dict[str, str] = {}
    for r in rows:
        name_to_id[r["account_name"]] = r["account_id"]
    for r in rows:
        r["class1_id"] = name_to_id.get(r["class1"], "")
        r["class2_id"] = name_to_id.get(r["class2"], "")
        r["class3_id"] = name_to_id.get(r["class3"], "")
        r["report_name"] = REPORT_NAME_MAP.get(r["report_type"], "")
        r["period"] = reclassify_period(r["report_type"], r["period"])
        if r["report_type"] == "BS":
            if r["account_name"] in TOTAL_STRIP:
                r["account_name"] = TOTAL_STRIP[r["account_name"]]
            if r["class1"] in TOTAL_STRIP:
                r["class1"] = TOTAL_STRIP[r["class1"]]
        r["year"] = year
        r["mm"] = mm
        r["receipt_ymd"] = receipt_ymd
        r["corp_code"] = corp_code
        r["crawl_time"] = run_ts

    # deterministic final sort (reference: report_type, order_no with
    # unstable ties — we pin explicit tie-breakers)
    rows.sort(
        key=lambda r: (
            r["report_type"],
            r["order_no"],
            r["period"],
            r["fs_type"],
            r["account_id"],
        )
    )
    return [{c: r[c] for c in FACT_COLUMNS} for r in rows]


# ---------------------------------------------------------------------------
# canonical text serialization — the byte-identity surface per url
# ---------------------------------------------------------------------------

def facts_to_text(rows: list[dict]) -> str:
    """Canonical TSV of the fact rows.  Floats via repr() (shortest
    round-trip — stable across pandas/pyarrow versions)."""
    lines = []
    for r in rows:
        parts = []
        for c in FACT_COLUMNS:
            v = r[c]
            parts.append(repr(v) if isinstance(v, float) else str(v))
        lines.append("\t".join(parts))
    return "\n".join(lines)


_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&nbsp;": " ",
}


def html_to_text(html: bytes) -> str:
    """Deterministic plain-text extraction for generic (non-ZIP) pages:
    drop script/style, strip tags, decode the common entities, collapse
    whitespace."""
    try:
        s = html.decode("utf-8", errors="replace")
    except Exception:
        return ""
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for k, v in _ENTITIES.items():
        s = s.replace(k, v)
    return _WS_RE.sub(" ", s).strip()


def extract_text_rowwise(
    url: str,
    html: bytes | None,
    report_nm: str | None,
    rcept_dt: str | None,
    run_ts: str,
) -> str:
    """Per-url extracted text: ZIP payloads → canonical facts TSV;
    HTML payloads → stripped text; corrupt/empty → ''."""
    if not html:
        return ""
    if html[:2] == b"PK":
        rows = extract_facts_rowwise(url, html, report_nm, rcept_dt, run_ts)
        return facts_to_text(rows)
    return html_to_text(html)


# ---------------------------------------------------------------------------
# sequential crawl-schedule model (dart_api_manager.py:491-540)
# ---------------------------------------------------------------------------

def sequential_schedule(
    seeds: list[dict],
    per_corp_cap: int = 5,
    page_size: int = 100,
    window: tuple[str, str] | None = None,
) -> list[str]:
    """The reference's visit order: corps in seed_rank order (corp-major
    loop); within a corp, disclosures date-desc (API `sort=date desc`),
    page-1 truncation at ``page_size``, then the ``[:per_corp_cap]``
    slice.  Ties on rcept_dt break by rcept_no desc (explicit, for
    reproducibility).  ``window=(bgn_de, end_de)`` models the API-side
    date-range params (dart_api_manager.py:220-243): it filters BEFORE
    truncation, like the API does.  Returns the ordered rcept_no list."""
    by_corp: dict[str, list[dict]] = {}
    corp_order: list[str] = []
    for s in sorted(seeds, key=lambda s: s["seed_rank"]):
        c = s["corp_code"]
        if c not in by_corp:
            by_corp[c] = []
            corp_order.append(c)
        by_corp[c].append(s)
    visits: list[str] = []
    for c in corp_order:
        disclosures = [
            s for s in by_corp[c] if is_periodic_report(s.get("report_nm") or "")
        ]
        if window is not None:
            disclosures = [
                s for s in disclosures if window[0] <= s["rcept_dt"] <= window[1]
            ]
        disclosures.sort(key=lambda s: (s["rcept_dt"], s["rcept_no"]), reverse=True)
        disclosures = disclosures[:page_size][:per_corp_cap]
        visits.extend(s["rcept_no"] for s in disclosures)
    return visits
