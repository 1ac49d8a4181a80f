"""Link-extraction predicate semantics — the golden-count filter cases
of the reference suite (tests/offline.py:166-239), replicated on a
synthetic span fixture (FIXTURES.md §8): same six filter dimensions,
deterministic expected counts."""

import pytest

from openslack_crawler_spark.operators.linkextract import (
    apply_link_predicates,
    extract_link_spans,
    first_per_page,
)

LINKS = [
    "http://www.foxnews.com/us/index.html",
    "http://www.foxnews.com/shock/story.html",
    "http://cnn.com/a.html",
    "http://cnn.com/b.pdf",
    "http://sub.foxnews.com/c.html",
    "http://example.org/shock-value",
    "http://example.org/d.zip",
    "http://cnn.com/a.html",  # duplicate within page → unique_list drops it
]


@pytest.fixture(scope="module")
def links(spark):
    spans = [("text", "intro", "", 0)] + [
        ("link", u, "", i + 1) for i, u in enumerate(LINKS)
    ] + [("image", "", "img-1", len(LINKS) + 1)]
    doc = spark.createDataFrame(
        [("doc-1", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    return first_per_page(extract_link_spans(doc)).cache()


def test_no_filter_keeps_unique_links(links):
    # unique_list per page (lxmlhtml.py:67-68): 8 anchors, 7 unique
    assert links.count() == 7


def test_allowed_domains(links):
    # offline.py:214-218 analogue: domain + subdomains
    got = apply_link_predicates(links, allowed_domains=["foxnews.com"])
    assert got.count() == 3


def test_allow_regex(links):
    got = apply_link_predicates(links, allow_regex=".*shock.*")
    assert got.count() == 2


def test_deny_regex(links):
    got = apply_link_predicates(links, deny_regex=".*cnn.com.*")
    assert got.count() == 5


def test_deny_extensions(links):
    got = apply_link_predicates(links, deny_extensions=["pdf", "zip"])
    assert got.count() == 5


def test_combined(links):
    got = apply_link_predicates(
        links, allowed_domains=["cnn.com"], deny_extensions=["pdf"]
    )
    assert got.count() == 1


def test_first_occurrence_offset(links):
    r = links.filter("link_url = 'http://cnn.com/a.html'").collect()[0]
    assert r.anchor_offset == 3  # first occurrence, not the later duplicate
