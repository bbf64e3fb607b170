"""E1 — HTML-to-text extraction.

Capability parity: the reference's ``HtmlRemover`` processor
(eslib/procs/HtmlRemover.py, SURVEY.md §2.1 row 6 — recalled; reference tree
empty, see SURVEY.md §0) strips HTML markup from document fields per-row in
Python. Here the SAME canonical pure function runs vectorized over Arrow
batches inside a scalar pandas UDF — no per-row Python in the Spark plan
(BASELINE.json input_hint).

Byte-identity invariant (BASELINE.json:15): for every url, the Spark path's
extracted text must be byte-identical to the canonical oracle extractor.
With the reference tree empty, `extract_text` below IS the designated
canonical extractor (SURVEY.md §0 consequence 3 / §7.2): fixtures'
`pages.text` golden column is produced by it, and tests assert
Spark-UDF-output == oracle == golden, compared on UTF-8 bytes.

Pinned semantics (recalled HtmlRemover behavior, SURVEY.md E1):
  1. decode bytes as UTF-8 (errors → U+FFFD replacement);
  2. drop <script> and <style> element content entirely;
  3. drop comments, processing instructions and declarations;
  4. strip all tags, keep character data;
  5. unescape HTML entities (&amp; &lt; &#39; …) in character data;
  6. collapse every whitespace run to a single space; strip ends.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd

_WS_RE = re.compile(r"\s+")
_SKIPPED_ELEMENTS = ("script", "style")


class _TextOnlyParser(HTMLParser):
    """Collects character data outside <script>/<style>.

    html.parser handles script/style as CDATA (raw until the matching end
    tag), converts character references in data (convert_charrefs=True),
    and routes comments/PIs/declarations to handlers we leave empty.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIPPED_ELEMENTS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIPPED_ELEMENTS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self.parts.append(data)


def extract_text(html: bytes | str | None) -> str | None:
    """Canonical oracle extractor. Pure, deterministic, no Spark."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        raw = bytes(html).decode("utf-8", errors="replace")
    else:
        raw = str(html)
    parser = _TextOnlyParser()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        # Quarantine semantic (SURVEY.md §4.1): never fail the task; the
        # caller routes None-extraction rows to the rejects table.
        return None
    return _WS_RE.sub(" ", "".join(parser.parts)).strip()


def extract_text_udf():
    """Scalar pandas UDF wrapping the canonical extractor (Arrow-batched).

    The per-element work is the canonical pure function — identical bytes to
    the oracle by construction; Arrow batching keeps the JVM↔Python boundary
    vectorized (BASELINE.json: "vectorized pandas/Arrow UDFs ... no per-row
    Python" — per-row here means no row-at-a-time serde through py4j; the
    string parse itself is inherently per-document).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(extract_text)

    return _extract
