"""HTML element extraction (SURVEY.md §2.6 F8 / §2.8 D3).

The reference extracts one element by id from a scraped page with
BeautifulSoup (reference lambda/collect-data.py:83-89). Spark has no HTML
builtin, so this is the one legitimately-Python scalar op in the engine:
an Arrow-batched pandas_udf wrapping the stdlib HTMLParser (no external
dependency). Per-batch cost amortizes parser construction; at 100 TB this
runs where the payloads already are — after the fetch, before the text
pipeline — one narrow projection, no shuffle.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


#: HTML void elements never produce an end tag — counting their start tags
#: toward nesting depth makes the extractor capture past the target
#: element's close on any real page (every scraped page has <br>/<img>).
VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


class _IdTextExtractor(HTMLParser):
    """Collects the text content of the first element whose id matches."""

    def __init__(self, target_id: str):
        super().__init__()
        self.target_id = target_id
        self.depth = 0
        self.capturing = False
        self.done = False
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if self.done:
            return
        if self.capturing:
            if tag not in VOID_ELEMENTS:
                self.depth += 1
        elif dict(attrs).get("id") == self.target_id:
            if tag in VOID_ELEMENTS:
                # a void target (<img id=...>) has no text content
                self.done = True
            else:
                self.capturing = True
                self.depth = 1

    def handle_endtag(self, tag):
        # void end tags (invalid but seen in the wild, and synthesized by
        # handle_startendtag's default start+end dispatch for <br/>) must
        # not decrement: their start tag never incremented
        if self.capturing and tag not in VOID_ELEMENTS:
            self.depth -= 1
            if self.depth == 0:
                self.capturing = False
                self.done = True

    def handle_data(self, data):
        if self.capturing:
            self.parts.append(data)


def extract_text_by_id(html_col: Column | str, element_id: str) -> Column:
    """Text of the element with the given id, or NULL when absent."""

    @pandas_udf("string")
    def run(html: pd.Series) -> pd.Series:
        def one(doc):
            if doc is None:
                return None
            p = _IdTextExtractor(element_id)
            p.feed(doc)
            return "".join(p.parts) if p.done or p.capturing else None

        return html.map(one)

    return run(F.col(html_col) if isinstance(html_col, str) else html_col)
