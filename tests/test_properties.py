"""Property-based tests (SURVEY.md §5.2 item 6) — hypothesis over the
pure kernels; no SparkSession needed."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from v2_ocr_spark.kernels.blocks import is_rtl, reassemble_blocks
from v2_ocr_spark.kernels.markdown import (
    JS_WS,
    clean_markdown,
    js_trim,
    paragraph_spans,
)
from v2_ocr_spark.kernels.textfns import safe_download_name, to_arabic_numerals

MARKDOWNISH = st.lists(
    st.sampled_from(
        list("abc $![]()\\{}\n\t\ufeff ")
        + ["$$", "![x](y)", "\\begin{aligned}", "\\end{aligned}"]
    ),
    max_size=60,
).map("".join)


@given(MARKDOWNISH)
@settings(max_examples=300, deadline=None)
def test_e1_idempotent(s):
    """Cleanup is a fixpoint EXCEPT when a replacement manufactures a
    new aligned pair (JS replace resumes after each substitution, so
    nested \begin{aligned} blocks unwrap one level per pass — pinned
    as the golden case nested_aligned_single_pass). Restrict the
    property to inputs that can't manufacture pairs."""
    if s.count("\\begin{aligned}") > 1:
        return
    once = clean_markdown(s)
    assert clean_markdown(once) == once


@given(MARKDOWNISH)
@settings(max_examples=300, deadline=None)
def test_e1_never_longer_than_input(s):
    assert len(clean_markdown(s)) <= len(s)


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_e1_preserves_plain_text(s):
    """Text with no markdown markers and no JS whitespace at the edges
    passes through unchanged."""
    if any(m in s for m in ("![", "$$", "\\begin{aligned}")):
        return
    trimmed = js_trim(s)
    assert clean_markdown(trimmed) == trimmed


@given(MARKDOWNISH)
@settings(max_examples=200, deadline=None)
def test_e1_trim_is_js_trim(s):
    out = clean_markdown(s)
    assert out == out.strip(JS_WS)


@given(MARKDOWNISH)
@settings(max_examples=200, deadline=None)
def test_spans_partition_cleaned_text(s):
    cleaned = clean_markdown(s)
    spans = paragraph_spans(cleaned)
    prev = -1
    for start, end, kind in spans:
        assert 0 <= start < end <= len(cleaned)
        assert start > prev
        prev = end
        seg = cleaned[start:end]
        assert "\n\n" not in seg


WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lo"), max_codepoint=0x6FF),
    min_size=1,
    max_size=8,
)
BLOCKS = st.fixed_dictionaries(
    {
        "language": st.sampled_from(["ar", "en", "fa", "he", "fr", "AR-sa", "de"]),
        "regions": st.lists(
            st.fixed_dictionaries(
                {
                    "lines": st.lists(
                        st.fixed_dictionaries(
                            {
                                "words": st.lists(
                                    st.fixed_dictionaries({"text": WORD}),
                                    min_size=1,
                                    max_size=5,
                                )
                            }
                        ),
                        max_size=3,
                    )
                }
            ),
            max_size=3,
        ),
    }
)


@given(BLOCKS)
@settings(max_examples=200, deadline=None)
def test_e3_word_multiset_preserved(doc):
    """Reassembly reorders words (RTL) but never adds/drops/edits them."""
    payload = json.dumps(doc, ensure_ascii=False)
    text, spans = reassemble_blocks(payload)
    expected_words = sorted(
        w["text"]
        for r in doc["regions"]
        for ln in r["lines"]
        for w in ln["words"]
    )
    got_words = sorted(w for w in text.replace("\n", " ").split(" ") if w)
    # empty-word entries collapse; filter both sides the same way
    assert got_words == sorted(w for w in expected_words if w)


@given(BLOCKS)
@settings(max_examples=100, deadline=None)
def test_e3_rtl_reverses_ltr_keeps(doc):
    payload = json.dumps(doc, ensure_ascii=False)
    text, _ = reassemble_blocks(payload)
    lines = [
        [w["text"] for w in ln["words"]]
        for r in doc["regions"]
        for ln in r["lines"]
    ]
    got_lines = [ln.split(" ") for ln in text.split("\n") if ln != ""]
    src = [ln for ln in lines if ln]
    if is_rtl(doc["language"]):
        src = [list(reversed(ln)) for ln in src]
    # compare only when no empty words distort the split
    if all(all(w for w in ln) for ln in lines):
        assert got_lines == [ln for ln in src if ln != [""]]


@given(st.integers(min_value=0, max_value=10**9),
       st.sampled_from(["ar", "fa", "en", "he", "de"]))
@settings(max_examples=200, deadline=None)
def test_e6_numerals_roundtrip(n, lang):
    out = to_arabic_numerals(n, lang)
    assert len(out) == len(str(n))
    if lang in ("ar", "fa"):
        back = out.translate(str.maketrans("٠١٢٣٤٥٦٧٨٩", "0123456789"))
        assert back == str(n)
    else:
        assert out == str(n)


@given(st.one_of(st.none(), st.text(max_size=300)))
@settings(max_examples=300, deadline=None)
def test_e7_always_safe(name):
    out = safe_download_name(name, "16-08-2026")
    assert out
    assert len(out) <= 251
    assert not any(c in out for c in '<>:"/\\|?*')


# ---------------------------------------------------------------------------
# E15 HTML kernel properties
# ---------------------------------------------------------------------------

HTMLISH = st.lists(
    st.sampled_from(
        list("ab <>&;/\"'\n\t")
        + [
            "<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>",
            "<script>", "</script>", "<nav>", "</nav>", "<h1>", "</h1>",
            "<br>", "<!--", "-->", "&amp;", "&#65;", "<li>", "</li>",
            "word", "longer words to cross thresholds",
        ]
    ),
    max_size=40,
).map("".join)


@given(HTMLISH)
@settings(max_examples=300, deadline=None)
def test_e15_total_and_deterministic(s):
    from v2_ocr_spark.kernels.htmlx import extract_html

    assert extract_html(s) == extract_html(s)


@given(HTMLISH)
@settings(max_examples=300, deadline=None)
def test_e15_spans_tile_output(s):
    from v2_ocr_spark.kernels.htmlx import extract_html

    text, spans = extract_html(s)
    pos = 0
    for start, end, _kind in spans:
        assert start == pos and end >= start
        pos = end + 2
    if spans:
        assert spans[-1][1] == len(text)
    else:
        assert text == ""


def _divergent_markup(s: str) -> bool:
    """The pinned divergence class: inputs containing junk-markup
    constructs where flatten_html (the PRODUCTION spec) intentionally
    differs from html.parser — html.parser variously flushes the junk
    as phantom text, truncates the document (non-CDATA marked
    sections), or abandons half-parsed tags; the fast path consumes
    each construct deterministically and keeps parsing. Classes:
      * comment/CDATA/decl/PI/end-tag unterminated at EOF;
      * non-CDATA marked sections ('<![...'), and declarations with
        internal-subset brackets ('<!DOCTYPE x [...');
      * a stray/unclosed quote inside a tag;
      * a '<' inside a tag candidate.
    Outside these classes the two parsers agree node-for-node
    (300k-doc fuzz, goldens, all fixture payloads). Closers use
    html.parser's loose forms ('--\\s*>', ']\\s*]\\s*>')."""
    import re as _re

    for opener, closer, off in (
        ("<!--", r"--\s*>", 4),
        ("<![CDATA[", r"\]\s*\]\s*>", 9),
    ):
        j = s.rfind(opener)
        if j != -1 and not _re.search(closer, s[j + off:]):
            return True
    for opener in ("<!", "<?", "</"):
        j = s.rfind(opener)
        if j != -1 and s.find(">", j) == -1:
            return True
    # non-CDATA marked sections and declarations with internal-subset
    # brackets hit markupbase's stateful scanners — junk class
    if _re.search(r"<!\[(?!CDATA\[)", s):
        return True
    if _re.search(r"<![a-zA-Z][^>]*\[", s):
        return True
    # a '<' INSIDE a tag candidate: html.parser abandons the tag and
    # re-parses from the inner '<'; the fast tokenizer keeps it in the
    # tag name/attrs — junk-markup class, content text unaffected
    if _re.search(r"</?[a-zA-Z][^>]*<", s):
        return True
    stripped = _re.sub(r"=\s*('[^']*'|\"[^\"]*\")", "=V", s)
    return bool(_re.search(r"<[a-zA-Z][^>]*['\"]", stripped))


@given(HTMLISH)
@settings(max_examples=300, deadline=None)
def test_e15_fast_flatten_matches_reference(s):
    """Fast tokenizer == html.parser event stream, except the pinned
    unterminated-markup-at-EOF divergence (consumed silently vs
    flushed as text)."""
    from v2_ocr_spark.kernels.htmlx import flatten_html, flatten_html_ref

    if _divergent_markup(s):
        return
    assert flatten_html(s) == flatten_html_ref(s)


@given(HTMLISH)
@settings(max_examples=300, deadline=None)
def test_e15_node_counters_consistent(s):
    from v2_ocr_spark.kernels.htmlx import flatten_html

    for nd in flatten_html(s):
        assert nd["n_chars"] == len(nd["text"])
        assert 0 <= nd["link_chars"] <= nd["n_chars"]
        assert nd["n_inline"] >= 0 and nd["depth"] >= 0
        assert nd["text"] == nd["text"].strip()


# ---------------------------------------------------------------------------
# E16 PDF layout kernel properties
# ---------------------------------------------------------------------------

BOX = st.fixed_dictionaries(
    {
        "x0": st.integers(0, 500),
        "y0": st.integers(0, 700),
        "w": st.integers(1, 100),
        "h": st.integers(1, 40),
        "text": st.text(alphabet="ab c\t", max_size=8),
    }
).map(
    lambda d: {
        "x0": d["x0"], "y0": d["y0"],
        "x1": d["x0"] + d["w"], "y1": d["y0"] + d["h"],
        "text": d["text"],
    }
)


@given(st.lists(BOX, max_size=12))
@settings(max_examples=200, deadline=None)
def test_e16_box_multiset_preserved_and_ordered(boxes):
    """Every non-blank box's text appears in the output; spans tile."""
    from v2_ocr_spark.kernels.pdflayout import _collapse, layout_text

    payload = json.dumps({"page": {"w": 612, "h": 792}, "boxes": boxes})
    text, spans = layout_text(payload)
    words = sorted(
        w for b in boxes for w in _collapse(b["text"]).split() if w
    )
    assert sorted(text.split()) == words
    pos = 0
    for start, end, kind in spans:
        assert start == pos and kind == "pdf_block"
        pos = end + 2
    if spans:
        assert spans[-1][1] == len(text)


@given(st.lists(BOX, max_size=10))
@settings(max_examples=200, deadline=None)
def test_e16_input_order_invariant(boxes):
    from v2_ocr_spark.kernels.pdflayout import layout_text

    a = json.dumps({"page": {"w": 612}, "boxes": boxes})
    b = json.dumps({"page": {"w": 612}, "boxes": boxes[::-1]})
    assert layout_text(a) == layout_text(b)
