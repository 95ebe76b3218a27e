"""Dimension-table sources (SURVEY §2.A4-A5): HTML-table parse and
literal in-memory source.

The reference scrapes the S&P 500 constituents table from Wikipedia
(`scripts/config.py:7-32`) with requests+bs4 and normalizes tickers
(``"." → "-"``, `scripts/config.py:24`). Networkless here: the parser
takes HTML text (driver-side, tiny — a ~503-row dimension), the fetch
step is a clearly-marked stub. Parsing is stdlib-only so it runs in any
container.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession, types as T

SP500_SCHEMA = T.StructType(
    [
        T.StructField("ticker_symbol", T.StringType()),
        T.StructField("security_name", T.StringType()),
        T.StructField("gics_sector", T.StringType()),
        T.StructField("gics_sub_industry", T.StringType()),
    ]
)

#: a representative constituents-table extract for tests/queries
SAMPLE_HTML = """
<table id="constituents">
<tr><th>Symbol</th><th>Security</th><th>GICS Sector</th><th>GICS Sub-Industry</th></tr>
<tr><td>AAPL</td><td>Apple Inc.</td><td>Information Technology</td><td>Technology Hardware</td></tr>
<tr><td>BRK.B</td><td>Berkshire Hathaway</td><td>Financials</td><td>Multi-Sector Holdings</td></tr>
<tr><td> MSFT </td><td>Microsoft</td><td>Information Technology</td><td>Systems Software</td></tr>
<tr><td>JNJ</td><td>Johnson &amp; Johnson</td><td>Health Care</td><td>Pharmaceuticals</td></tr>
</table>
"""


class _TableParser(HTMLParser):
    def __init__(self):
        super().__init__()
        self.rows: list[list[str]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "tr":
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._cell is not None:
            self._row.append("".join(self._cell).strip())
            self._cell = None
        elif tag == "tr" and self._row is not None:
            if self._row:
                self.rows.append(self._row)
            self._row = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def normalize_ticker(raw: str) -> str:
    """Reference ticker normalization: strip + ``"." → "-"``
    (`scripts/config.py:24-27`)."""
    return raw.strip().replace(".", "-")


def parse_constituents(html: str) -> list[tuple[str, str, str, str]]:
    """Parse the first 4+ column HTML table into dimension rows,
    skipping the header row (A4, `scripts/config.py:7-32`)."""
    p = _TableParser()
    p.feed(html)
    out = []
    for row in p.rows:
        if len(row) < 4 or row[0] in ("Symbol", ""):
            continue
        out.append(
            (normalize_ticker(row[0]), row[1].strip(), row[2].strip(), row[3].strip())
        )
    return out


def fetch_constituents_html(url: str) -> str:
    """Network fetch step. STUB: no network access in this container —
    a deployment wires requests/httpx here (reference
    `scripts/config.py:10`)."""
    raise NotImplementedError("network access is not available here")


def sp500_companies(
    spark: SparkSession, html: str = SAMPLE_HTML
) -> DataFrame:
    """A4 end-to-end: HTML → parsed rows → DataFrame with declared
    schema (`spark.createDataFrame(rows, schema)`)."""
    return spark.createDataFrame(parse_constituents(html), SP500_SCHEMA)


def literal_dimension(
    spark: SparkSession, rows: list[tuple], schema: T.StructType = SP500_SCHEMA
) -> DataFrame:
    """A5: literal/in-memory source with declared schema (reference
    `scripts/ingest_backfill_sp500.py:29-32`)."""
    return spark.createDataFrame(rows, schema)
