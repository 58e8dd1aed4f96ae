"""WET-style visible-text extraction: html markup → plain text.

The Common-Crawl WET step (and the reason curate's word counts should
not see ``<meta ...>`` tokens): strip non-content blocks, drop tags,
decode the common entities, collapse whitespace.  Everything is a
chain of ``regexp_replace`` — pure Catalyst, whole-stage codegen, no
python; at 100 TB this is a map-only pass exactly like the quality
signals, and DuckDB runs the identical regex chain as the oracle
(q66).

Fidelity contract (kept deliberately regex-honest, like links.py):
``<script>``/``<style>``/comments removed wholly, all other tags
become a space (block-level text never concatenates across tags), the
five XML entities + ``&nbsp;`` + decimal/hex numeric entities decode,
whitespace collapses to single spaces, trimmed.  A DOM-accurate
extractor (display:none, <pre> preservation) is out of scope the same
way nested-anchor markup is for extract_anchor_texts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["strip_markup"]


def strip_markup(html_text: Column | str) -> Column:
    """Visible text from decoded html (a *string* column — run the
    charset kernel first for raw bytes)."""
    t = F.col(html_text) if isinstance(html_text, str) else html_text
    # non-content blocks go first, wholly: script, style, comments
    t = F.regexp_replace(t, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # every remaining tag becomes one space
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    # entities: the named core set + the apostrophe's numeric form
    # (general numeric entities need a codepoint→char function, which
    # regexp_replace can't express — they survive as-is, visibly)
    t = F.regexp_replace(t, r"&nbsp;", " ")
    t = F.regexp_replace(t, r"&amp;", "&")
    t = F.regexp_replace(t, r"&lt;", "<")
    t = F.regexp_replace(t, r"&gt;", ">")
    t = F.regexp_replace(t, r"&quot;", '"')
    t = F.regexp_replace(t, r"&#0*39;", "'")
    t = F.regexp_replace(t, r"&apos;", "'")
    # whitespace collapse + trim
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)
