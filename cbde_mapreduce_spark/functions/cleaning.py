"""Text-cleaning column expressions for corpus preprocessing.

Every function here returns a pyspark Column built ONLY from JVM-side
built-ins (regexp_replace / lower / trim) — no Python UDFs — so cleaning a
100 TB corpus stays inside whole-stage codegen and the expressions fuse
with neighbouring projections in one pass over the data.

The regexes avoid constructs whose semantics differ between engines
(no lookbehind, no backrefs), so the same patterns run under Java regex
(Spark) and RE2 (DuckDB/Go tooling) alike.

The fixture corpus (documents.text) is pre-cleaned word salad, so these are
exercised in tests/test_cleaning.py over constructed raw-web-shaped inputs
rather than as vacuous oracle queries over already-clean data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Order matters: tags before entities (entities may appear inside attrs),
#: PII before whitespace collapse (redaction tokens add no stray spaces).
_HTML_TAG = r"<[^>]{0,500}>"
_HTML_ENTITY = r"&(?:[a-zA-Z]{2,10}|#[0-9]{1,7}|#x[0-9a-fA-F]{1,6});"
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: Phone-ish: optional +CC, then 7-15 digits allowing separators — anchored
#: on digit boundaries so prices/years (shorter runs) are untouched.
_PHONE = r"\+?[0-9][0-9()\[\] .-]{6,18}[0-9]"
_LONG_DIGITS = r"[0-9]{9,}"
_IPV4 = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"
_CONTROL = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_MULTI_WS = r"\s+"


def strip_html(col: Column | str) -> Column:
    """Remove markup: tags dropped, entities replaced with a space."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _HTML_TAG, " ")
    return F.regexp_replace(c, _HTML_ENTITY, " ")


def redact_pii(col: Column | str) -> Column:
    """Replace emails, phone numbers, long ID numbers and IPv4 addresses
    with typed placeholder tokens (the corpus-sanitization pass every
    training pipeline runs before tokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, _IPV4, "<IP>")
    # long bare digit runs are IDs, not phones — redact them first so the
    # separator-tolerant phone pattern can't swallow them
    c = F.regexp_replace(c, _LONG_DIGITS, "<ID>")
    return F.regexp_replace(c, _PHONE, "<PHONE>")


def normalize_ws(col: Column | str) -> Column:
    """Drop control characters, collapse whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _CONTROL, " ")
    return F.trim(F.regexp_replace(c, _MULTI_WS, " "))


def clean_text(col: Column | str, lowercase: bool = False) -> Column:
    """Full cleaning pass: strip markup -> redact PII -> normalize space.

    One fused expression tree — Catalyst folds the chained regexp_replace
    calls into a single projection, so the pass costs one scan regardless
    of how many stages are composed here.
    """
    c = redact_pii(strip_html(col))
    if lowercase:
        c = F.lower(c)
    return normalize_ws(c)
