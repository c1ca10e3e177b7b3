"""Extraction kernels — pure, vectorized pandas functions.

Each kernel is a plain ``pandas.Series -> (pandas.Series, pandas.Series)``
(text, spans) transform so the same code runs (a) inside Spark's
``mapInPandas`` over Arrow batches and (b) driver-side as the pure-pandas
reference implementation used to build golden expected outputs.
"""

from v2_ocr_spark.kernels.markdown import JS_WS, clean_markdown_series, js_trim
from v2_ocr_spark.kernels.blocks import reassemble_blocks_series, RTL_LANGUAGES
from v2_ocr_spark.kernels.plain import passthrough_series
from v2_ocr_spark.kernels.htmlx import extract_html_series
from v2_ocr_spark.kernels.pdflayout import layout_text_series

KERNELS = {
    "markdown": clean_markdown_series,
    "blocks_rtl": reassemble_blocks_series,
    "plain": passthrough_series,
    "html": extract_html_series,
    "pdf_layout": layout_text_series,
}

__all__ = [
    "JS_WS",
    "KERNELS",
    "RTL_LANGUAGES",
    "clean_markdown_series",
    "extract_html_series",
    "js_trim",
    "layout_text_series",
    "passthrough_series",
    "reassemble_blocks_series",
]
