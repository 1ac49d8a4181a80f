"""URL kernel unit tests (SURVEY.md §2.8 C1/C2/C13, §2.2 F8)."""

from pyspark.sql import functions as F

from openslack_crawler_spark.functions.url import (
    _canonicalize_one,
    fixup_url,
    with_url_columns,
)


def test_canonicalize_pure():
    # entity decode + sorted query + fragment drop + default port + case
    assert (
        _canonicalize_one(" HTTP://Example.COM:80/a/b?z=2&amp;a=1#frag ", None)
        == "http://example.com/a/b?a=1&z=2"
    )
    # empty path normalized, scheme added
    assert _canonicalize_one("example.com", None) == "http://example.com/"
    # base resolution (lxmlhtml.py:53-62 urljoin semantics)
    assert (
        _canonicalize_one("../x", "http://example.com/a/b/c")
        == "http://example.com/a/x"
    )
    # non-default port kept
    assert _canonicalize_one("http://h:8080/p", None) == "http://h:8080/p"


def test_fixup_and_hash_columns(spark):
    df = spark.createDataFrame(
        [("www.istresearch.com",), ("http://ok.example/p",)], ["url"]
    )
    out = with_url_columns(df, canonicalize=True).collect()
    by_url = {r["url"]: r for r in out}
    # scheduler.py:150-156 semantics: scheme-less gets http://
    assert "http://www.istresearch.com/" in by_url
    assert by_url["http://ok.example/p"]["host"] == "ok.example"
    hashes = {r["url_hash"] for r in out}
    assert len(hashes) == 2 and all(isinstance(h, int) for h in hashes)


def test_fixup_expression(spark):
    df = spark.createDataFrame([("istresearch.com",), ("https://x.y/z",)], ["url"])
    got = [r[0] for r in df.select(fixup_url(F.col("url"))).collect()]
    assert got == ["http://istresearch.com", "https://x.y/z"]
