"""Scalar text helpers — E5 RTL detection, E6 Arabic-Indic numerals,
E7 filename sanitization, E14 export-document layout.

All are pure functions with exact reference parity; the Spark-side
equivalents (built-in column expressions where possible) live in
v2_ocr_spark.operators.relational.
"""

from __future__ import annotations

import re

from v2_ocr_spark.kernels.markdown import JS_WS, js_trim

# E5 — reference: app/documents/[id]/page.tsx:100-103.
RTL_DETECT_PATTERN = "[֑-߿יִ-﷽ﹰ-ﻼ]"
_RTL_DETECT = re.compile(RTL_DETECT_PATTERN)

# E6 — reference: app/documents/[id]/page.tsx:153-158.
ARABIC_NUMERALS = "٠١٢٣٤٥٦٧٨٩"
_ASCII_DIGITS = "0123456789"
_NUM_TRANSLATION = str.maketrans(_ASCII_DIGITS, ARABIC_NUMERALS)

# E7 — reference: lib/utils.ts:29-71. JS \s == the JS whitespace class.
_JS_WS_CLASS = "[" + re.escape(JS_WS) + "]"
_ILLEGAL = re.compile(r'[<>:"/\\|?*]')
_LEADING_DOTS = re.compile(r"^\.+")
_WS_RUNS = re.compile(_JS_WS_CLASS + "+")

SEPARATOR = "=" * 80  # E14 — page.tsx:632


def is_rtl_text(text: str | None) -> bool:
    """E5: true iff the text contains any RTL-block character."""
    return bool(text) and _RTL_DETECT.search(text) is not None


def to_arabic_numerals(value, language: str) -> str:
    """E6: digits 0-9 -> Arabic-Indic, only for lang 'ar' or 'fa'."""
    s = str(value)
    if language not in ("ar", "fa"):
        return s
    return s.translate(_NUM_TRANSLATION)


def safe_download_name(filename: str | None, fallback_date: str) -> str:
    """E7: sanitize a filename for export (lib/utils.ts:29-71).

    ``fallback_date`` is the DD-MM-YYYY string the reference derives
    from ``new Date()`` — injected for determinism.
    """
    fallback = f"Export_{fallback_date}"
    if filename is None or not js_trim(filename):
        return fallback

    sanitized = _ILLEGAL.sub("", filename)
    sanitized = _LEADING_DOTS.sub("", sanitized)
    sanitized = _WS_RUNS.sub(" ", sanitized)
    sanitized = js_trim(sanitized)
    if not sanitized:
        return fallback

    # utils.ts:45 — slashes were removed above, so this is a no-op kept
    # for parity; lastSlashIndex below is therefore always -1.
    sanitized = sanitized.replace("/", "_").replace("\\", "_")

    last_dot = sanitized.rfind(".")
    if last_dot == 0:
        return sanitized  # dot-file: returned as-is (utils.ts:53-55)

    if last_dot > 0:
        base_name = sanitized[:last_dot].replace(".", "_")
    else:
        base_name = sanitized

    return base_name[: 255 - 4]


def export_document_text(
    document_name: str,
    pages: list[tuple[int, str]],
    exported_at: str,
) -> str:
    """E14: exact export .txt layout (app/documents/[id]/page.tsx:629-655).

    ``pages`` is [(page_number, text)] in any order; they are sorted by
    page number, exactly like the defensive sort at page.tsx:644.
    ``exported_at`` replaces ``new Date().toLocaleString()`` for
    determinism.
    """
    n = len(pages)
    header = "\n".join(
        [
            SEPARATOR,
            f"Document: {document_name}",
            f"Exported: {exported_at}",
            f"Total Pages: {n}",
            SEPARATOR,
            "\n",
        ]
    )
    blocks = [
        "\n".join([SEPARATOR, f"Page {p} of {n}", SEPARATOR, "", text, "\n"])
        for p, text in sorted(pages, key=lambda x: x[0])
    ]
    return header + "\n".join(blocks)


def normalize_storage_path(path: str | None, user_id: str) -> str | None:
    """E8 — de-duplicate leading `userId/` prefixes
    (reference: lib/storage/path.ts:1-9; inverse parse
    app/documents/[id]/page.tsx:105-120). Kept for lineage-path parity;
    the engine itself stores no blob paths."""
    if path is None:
        return None
    prefix = f"{user_id}/"
    normalized = path
    while normalized.startswith(prefix):
        normalized = normalized[len(prefix):]
    return normalized


def rate_limit_countdown(retry_after_s: float, elapsed_ms: float) -> int:
    """E13 — remaining rate-limit seconds shown in the status text
    (reference: app/components/document-list.tsx:231-233:
    max(0, ceil((retryAfter*1000 - elapsed)/1000)))."""
    import math

    return max(0, math.ceil((retry_after_s * 1000 - elapsed_ms) / 1000))
