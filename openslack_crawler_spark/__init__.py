"""openslack_crawler_spark — a PySpark-native crawl-scheduling engine.

Brand-new implementation (NOT a port) with the query/data-processing
capabilities of rochteam/openslack-crawler: a URL frontier with
priority-queue semantics, exact URL-seen dedup fronted by a partitioned
bloom prefilter, per-host politeness scheduling, robots filtering, link
extraction over interleaved text+media document spans, monitor queries,
and snapshot-checkpointed scheduling rounds — all expressed as
DataFrame/SQL plans so Catalyst picks physical strategies, with
vectorized pandas/Arrow UDFs on the few paths built-ins cannot express.

Reference semantics are cited per-module as /root/reference file:line.
"""

__version__ = "0.1.0"
