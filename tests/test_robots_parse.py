"""robots.txt parsing → politeness table → enforced by the round's
robots filter."""

from openslack_crawler_spark.functions.robots import (
    parse_robots_txt,
    robots_table_from_payloads,
)
from openslack_crawler_spark.operators.politeness import robots_filter

ROBOTS = """
# comment
User-agent: evilbot
Disallow: /

User-agent: *
Crawl-delay: 2.5
Disallow: /private
Disallow: /tmp/
Disallow:
"""


def test_parse_pure():
    delay, disallow = parse_robots_txt(ROBOTS)
    assert delay == 2.5
    assert disallow == ["/private", "/tmp/"]
    # specific agent group
    delay_evil, dis_evil = parse_robots_txt(ROBOTS, agent="evilbot")
    assert dis_evil == ["/"]
    # empty/missing file → defaults
    assert parse_robots_txt("") == (1.0, [])
    assert parse_robots_txt("garbage without colons") == (1.0, [])


def test_consecutive_user_agent_lines_share_one_group():
    """Robots exclusion convention (scrapy/robotparser): consecutive
    User-agent lines form ONE group and the following rules apply to
    every listed agent (round-1 ADVICE fix)."""
    txt = """
User-agent: a
User-agent: *
Disallow: /x
Crawl-delay: 3

User-agent: b
Disallow: /y
"""
    assert parse_robots_txt(txt, agent="a") == (3.0, ["/x"])
    assert parse_robots_txt(txt, agent="*") == (3.0, ["/x"])
    assert parse_robots_txt(txt, agent="b") == (1.0, ["/y"])  # own group, default delay
    # a UA line AFTER rules starts a NEW group (b is not in the first)
    assert parse_robots_txt(txt, agent="c") == (3.0, ["/x"])  # falls back to *


def test_table_and_filter_integration(spark):
    payloads = spark.createDataFrame(
        [("h1.example", ROBOTS), ("h2.example", "")], ["host", "body"]
    )
    robots = robots_table_from_payloads(payloads)
    rows = {r.host: r for r in robots.collect()}
    assert rows["h1.example"].crawl_delay == 2.5
    assert list(rows["h1.example"].disallow) == ["/private", "/tmp/"]
    assert rows["h2.example"].disallow == []

    batch = spark.createDataFrame(
        [
            ("http://h1.example/private/x", "h1.example"),
            ("http://h1.example/ok", "h1.example"),
            ("http://h2.example/private/y", "h2.example"),
        ],
        ["url", "host"],
    )
    kept = {r.url for r in robots_filter(batch, robots).collect()}
    assert kept == {"http://h1.example/ok", "http://h2.example/private/y"}


def test_unhandled_rule_line_ends_ua_run():
    """Round-3 ADVICE: an Allow/Sitemap/unknown line between a group's
    rules and the next User-agent must end the UA run — otherwise the
    next agent merges into the previous group and later Disallows
    over-block both (robotparser treats any rule line as a separator)."""
    txt = (
        "User-agent: a\n"
        "Allow: /public\n"
        "User-agent: b\n"
        "Disallow: /only-b\n"
    )
    assert parse_robots_txt(txt, agent="a") == (1.0, [])
    assert parse_robots_txt(txt, agent="b") == (1.0, ["/only-b"])
