"""robots.txt gate as a first-class registered query.

The reference obeys robots via scrapy's middleware
(/root/reference/crawler/settings.py:138 ROBOTSTXT_OBEY); the rebuild
keeps rules as a broadcast TABLE (functions/robots.py) and drops
disallowed URLs set-oriented (operators/politeness.py:robots_filter).
This query drives that exact operator over a deterministic frontier +
robots table derived from the `documents` sf table, with a DuckDB
oracle mirroring the prefix-match semantics — so the robots gate gets
its own rows+schema+hash check instead of riding only inside
crawl_e2e.

Scale shape: robots is one row per HOST — MBs against a 10^10-URL
frontier — so the join is a broadcast; the prefix test is a row-local
F.exists over a short disallow list. Zero frontier-side shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.politeness import robots_filter
from .queries_textdedup import _t

N_HOSTS = 7


def q_robots_gate(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("host-"), F.pmod("doc_id", F.lit(N_HOSTS)).cast("string"),
        F.lit(".example"),
    )
    # a third of paths land under /private — the disallowed subtree
    path = F.when(
        F.pmod("doc_id", F.lit(3)) == 0,
        F.concat(F.lit("/private/p/"), F.col("doc_id").cast("string")),
    ).otherwise(F.concat(F.lit("/a/"), F.col("doc_id").cast("string")))
    frontier = docs.select(
        "doc_id",
        F.concat(F.lit("http://"), host, path).alias("url"),
        host.alias("host"),
    )
    # robots: even hosts disallow /private; host-5 has no robots row at
    # all (missing robots == allow all, the left-join null branch)
    robots = (
        spark.range(N_HOSTS)
        .filter(F.col("id") != 5)
        .select(
            F.concat(F.lit("host-"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
            F.when(
                F.pmod("id", F.lit(2)) == 0, F.array(F.lit("/private"))
            ).otherwise(F.array().cast("array<string>")).alias("disallow"),
        )
    )
    return robots_filter(frontier, robots).select("doc_id", "url", "host")


SQL_ROBOTS_GATE = f"""
WITH frontier AS (
  SELECT doc_id,
         'host-' || (doc_id % {N_HOSTS}) || '.example' AS host,
         CASE WHEN doc_id % 3 = 0 THEN '/private/p/' || doc_id
              ELSE '/a/' || doc_id END AS path
  FROM documents
), robots AS (
  SELECT 'host-' || i || '.example' AS host,
         CASE WHEN i % 2 = 0 THEN ['/private'] ELSE [] END AS disallow
  FROM range({N_HOSTS}) t(i) WHERE i <> 5
)
SELECT f.doc_id, 'http://' || f.host || f.path AS url, f.host
FROM frontier f LEFT JOIN robots r ON f.host = r.host
WHERE r.host IS NULL
   OR len(list_filter(r.disallow, p -> starts_with(f.path, p))) = 0
"""


REGISTRY: dict[str, tuple] = {
    "robots_gate": (q_robots_gate, SQL_ROBOTS_GATE),
}
