"""Property-based tests (hypothesis) for the pure kernels — laws the
reference's example-based suite never pinned (SURVEY.md §5 notes
property tests are absent there).

These run WITHOUT Spark (pure-Python twins shared with the engine), so
hypothesis can afford hundreds of cases.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from openslack_crawler_spark.functions.url import _canonicalize_one
from openslack_crawler_spark.functions.html import extract_links_py
from openslack_crawler_spark.oracle import CrawlOracle
from openslack_crawler_spark.synthetic import py_outlinks, py_spans

url_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           whitelist_characters="./-_?&=#: "),
    min_size=1, max_size=80,
)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(url_text)
def test_canonicalize_idempotent(raw):
    """canonicalize(canonicalize(x)) == canonicalize(x) — the fixed-point
    property the fast-path regex relies on."""
    once = _canonicalize_one(raw, None)
    assert _canonicalize_one(once, None) == once


@settings(max_examples=300, deadline=None, derandomize=True)
@given(url_text)
def test_canonicalize_always_absolute(raw):
    assert "://" in _canonicalize_one(raw, None)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=2, max_value=500))
def test_page_graph_wellformed(page, hosts):
    """Every generated outlink parses back into the same graph domain,
    and spans are dense/ordered (the input_hint invariant)."""
    url = f"http://host-1.example/p/{page}"
    links = py_outlinks(url, hosts)
    assert len(links) <= 9
    for link in links:
        assert link.startswith("http://host-")
        assert _canonicalize_one(link, None) == link  # graph emits canonical URLs
    spans = py_spans(url, hosts)
    assert [s[3] for s in spans] == list(range(len(spans)))  # dense offsets
    assert spans[0][0] == "text"
    assert [s[1] for s in spans if s[0] == "link"] == links  # order preserved


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 100)),  # (page, priority)
        min_size=1, max_size=60,
    )
)
def test_oracle_invariants(seed_pairs):
    """Scheduler laws on random seed lists: no URL fetched twice, the
    seen set covers every fetched and frontier URL, per-host per-round
    budget respected."""
    seeds = [
        (f"http://host-{(p % 5) + 1}.example/p/{p}", pr, i)
        for i, (p, pr) in enumerate(seed_pairs)
    ]
    k = 3
    o = CrawlOracle({}, n_hosts=5, k_per_host=k, maxdepth=1)
    o.bootstrap(seeds)
    o.run(3)
    fetched = [e["url"] for e in o.fetch_log]
    assert len(fetched) == len(set(fetched))  # never fetch a URL twice
    assert set(fetched) <= o.seen
    assert {r.url for r in o.frontier} <= o.seen
    from collections import Counter

    per_round_host = Counter(
        (e["round"], e["url"].split("/")[2]) for e in o.fetch_log
    )
    assert all(v <= k for v in per_round_host.values())  # politeness budget


@settings(max_examples=150, deadline=None, derandomize=True)
@given(st.text(max_size=300), url_text)
def test_html_extractor_never_crashes(html, base):
    out = extract_links_py(html, "http://" + base.replace(" ", ""))
    assert isinstance(out, list)
