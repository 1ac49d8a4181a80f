"""Raw-HTML link extraction — the pandas-UDF twin of the reference's
LxmlParserLinkExtractor (/root/reference/examples/lxmlhtml.py:33-81):
iterate <a>/<area> elements in document order, take @href, resolve
against a base URL, collect anchor text and the rel=nofollow flag.

The synthetic page graph carries links as spans (operators/
linkextract.py consumes those JVM-side); this module is the ingest
path for REAL html payloads. stdlib html.parser (lxml is not in the
sandbox image); vectorized at the Arrow-batch level — one Python call
per batch, not per row.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("nofollow", T.BooleanType()),
        ]
    )
)


class _AnchorParser(HTMLParser):
    """Collects (href, anchor-text, nofollow) for a/area elements in
    document order (lxmlhtml.py:38-52 semantics)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, list[str], bool]] = []
        self._collecting = False

    def handle_starttag(self, tag, attrs):
        if tag not in ("a", "area"):
            return
        d = dict(attrs)
        href = d.get("href")
        if href is not None:
            rel = (d.get("rel") or "").lower()
            self.links.append((href, [], "nofollow" in rel))
            # <area> is a void element — it has no anchor text
            self._collecting = tag == "a"
        elif tag == "a":
            self._collecting = False  # href-less anchor opens a dead scope

    def handle_endtag(self, tag):
        if tag == "a":
            self._collecting = False

    def handle_data(self, data):
        if self._collecting and self.links:
            self.links[-1][1].append(data)


def extract_links_py(html_text: str, base_url: str | None) -> list[tuple]:
    if not html_text:
        return []
    p = _AnchorParser()
    try:
        p.feed(html_text)
    except Exception:
        return []
    out = []
    for href, texts, nofollow in p.links:
        url = urljoin(base_url, href) if base_url else href
        out.append((url, "".join(texts).strip(), nofollow))
    return out


@F.pandas_udf(LINK_SCHEMA)
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links_py(h, b) for h, b in zip(html, base_url)], dtype="object"
    )


def links_from_html(df, html_col: str = "body", base_col: str = "url"):
    """df(+html, +base) → one row per anchor in document order:
    (… , link_url, anchor_text, nofollow, anchor_offset)."""
    other = [c for c in df.columns if c not in (html_col,)]
    exploded = df.select(
        *other,
        F.posexplode(extract_links_udf(F.col(html_col), F.col(base_col))).alias(
            "anchor_offset", "link"
        ),
    )
    return exploded.select(
        *other,
        F.col("link.url").alias("link_url"),
        F.col("link.text").alias("anchor_text"),
        F.col("link.nofollow").alias("nofollow"),
        "anchor_offset",
    )
