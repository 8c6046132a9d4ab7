"""Deterministic HTML -> text extraction as an Arrow-vectorized pandas UDF.

North-star requirement (BASELINE.json input_hint): text extraction from
``html:binary`` uses vectorized pandas/Arrow UDFs only — no per-row Python
in the hot path — and the extracted ``text`` must be byte-identical per url
across replays. The extractor is therefore a pure, version-pinned function
of the html bytes: no locale, no wall clock, no dependence on Arrow batch
boundaries or partitioning.

The reference's analog is its per-row enrichment loop
(/root/reference/src/how_long_to_beat.py:68-122) — exactly the pattern this
module replaces with whole-column pandas string ops.

Spec (EXTRACTOR_VERSION = 1):
1. decode UTF-8 (errors -> U+FFFD)
2. drop <script>...</script> and <style>...</style> blocks (case-insensitive)
3. strip all remaining tags
4. decode the fixed entity set  &amp; &lt; &gt; &quot; &#39; &nbsp;
5. collapse all whitespace runs to single spaces; strip ends
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = 1

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so "&amp;lt;" -> "&lt;" (single-pass spec)
]


# single alternation pass == the 3-pass spec: at any position the regex
# engine prefers the earlier alternative, so a well-formed script/style
# block is consumed whole before the generic tag rule can eat its open tag,
# and an unterminated block degrades to plain tag-stripping — byte-identical
# to applying the three passes in order (verified against the 3-pass
# reference in tests).
_STRIP_RE = r"(?is)<script\b.*?</script\s*>|<style\b.*?</style\s*>|<[^>]*>"


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extractor over a pandas Series of html bytes (or None)."""
    s = html.str.decode("utf-8", errors="replace")
    s = s.str.replace(_STRIP_RE, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()
    return s


def extract_text_series_3pass(html: pd.Series) -> pd.Series:
    """The literal 3-pass spec (EXTRACTOR_VERSION 1); kept as the reference
    implementation the fast path is tested byte-identical against."""
    s = html.str.decode("utf-8", errors="replace")
    s = s.str.replace(r"(?is)<script\b.*?</script\s*>", " ", regex=True)
    s = s.str.replace(r"(?is)<style\b.*?</style\s*>", " ", regex=True)
    s = s.str.replace(r"(?s)<[^>]*>", " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()
    return s


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)


def extract_text_one(html: bytes | None) -> str | None:
    """Scalar reference implementation (tests compare UDF output to this)."""
    if html is None:
        return None
    return extract_text_series(pd.Series([html])).iloc[0]
