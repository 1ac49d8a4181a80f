"""robots.txt parsing → the politeness/robots table.

The reference obeys robots.txt via scrapy's middleware
(/root/reference/crawler/settings.py:138 ROBOTSTXT_OBEY); the rebuild
keeps robots rules as a TABLE (host, crawl_delay, max_parallel,
disallow) broadcast to executors (BASELINE.json north_star: "robots.txt
cache broadcast to executors"). This module is the ingest edge: raw
robots.txt payloads → rule rows, vectorized at the Arrow-batch level.

Parsing follows the original robots exclusion convention the scrapy
middleware implements: rules under `User-agent: *` (or a matching
agent), `Disallow:` path prefixes (empty = allow all), optional
`Crawl-delay:`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_CRAWL_DELAY = 1.0
DEFAULT_MAX_PARALLEL = 8

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("crawl_delay", T.DoubleType()),
        T.StructField("disallow", T.ArrayType(T.StringType())),
    ]
)


def parse_robots_txt(text: str, agent: str = "*") -> tuple[float, list[str]]:
    """One robots.txt body → (crawl_delay, disallow prefixes) for the
    given agent (falling back to the `*` group)."""
    groups: dict[str, dict] = {}
    current: list[str] = []
    prev_was_ua = False  # consecutive User-agent lines form ONE group
    if text:
        for raw_line in text.splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                # robots exclusion convention (as scrapy/robotparser do):
                # "User-agent: a\nUser-agent: *\nDisallow: /x" applies
                # /x to BOTH a and * — start a new group only when a UA
                # line follows rule lines
                if prev_was_ua:
                    current.append(val.lower())
                else:
                    current = [val.lower()]
                groups.setdefault(val.lower(), {"disallow": [], "delay": None})
                prev_was_ua = True
            elif key == "disallow" and current:
                prev_was_ua = False
                if val:
                    for a in current:
                        groups[a]["disallow"].append(val)
            elif key == "crawl-delay" and current:
                prev_was_ua = False
                try:
                    for a in current:
                        groups[a]["delay"] = float(val)
                except ValueError:
                    pass
            else:
                # ANY rule line (Allow, Sitemap, unknown keys) ends a UA
                # run — robotparser treats them as rule lines too;
                # otherwise the next User-agent would merge into this
                # group and later Disallows would over-block both agents
                prev_was_ua = False
    g = groups.get(agent.lower()) or groups.get("*") or {"disallow": [], "delay": None}
    return (
        g["delay"] if g["delay"] is not None else DEFAULT_CRAWL_DELAY,
        g["disallow"],
    )


@F.pandas_udf(PARSED_SCHEMA)
def parse_robots_udf(bodies: pd.Series) -> pd.DataFrame:
    rows = [parse_robots_txt(b) for b in bodies]
    return pd.DataFrame(
        {"crawl_delay": [r[0] for r in rows], "disallow": [r[1] for r in rows]}
    )


def robots_table_from_payloads(payloads: DataFrame) -> DataFrame:
    """payloads(host, body) → ROBOTS_SCHEMA rows ready to broadcast."""
    parsed = payloads.select(
        "host", parse_robots_udf(F.col("body")).alias("r")
    )
    return parsed.select(
        "host",
        F.col("r.crawl_delay").alias("crawl_delay"),
        F.lit(DEFAULT_MAX_PARALLEL).alias("max_parallel"),
        F.col("r.disallow").alias("disallow"),
    )
