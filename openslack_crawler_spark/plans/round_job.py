"""The scheduling round job — the flagship plan (SURVEY.md §3.1).

One crawl round is ONE DataFrame job committed as ONE snapshot:

  frontier dequeue (per-host top-k, salted)            [S4/W1, O4]
   → robots filter + politeness slot assignment         [W2]
   → simulated fetch → documents with interleaved spans [P5]
   → link extraction + predicates                       [P1/P2, F6-F8]
   → candidate build (depth+1, priority-10)             [W4]
   → enqueue filters (expiry, blacklist)                [F4/F5]
   → intra-round first-wins dedup                       [F1]
   → seen anti-join (exact; bloom prefilter optional)   [J1/F3]
   → dense enqueue_seq assignment (pop-order)           [§7 step 4]
   → frontier append + seen append + counters           [S5, A1]

This replaces the reference's record-at-a-time Twisted loop
(/root/reference/crawler/schedulers/kafka/scheduler.py:124-190 +
examples/link_spider.py:24-89): scheduling decisions become
set-oriented, which is the entire scale win (reference pacing is ≥1
decision/sec/consumer — scheduler.py:132-138).

Fetching is simulated against the deterministic page graph
(synthetic.py) — the sandbox has no network; the fetch stage is the
seam where a real downloader (an async HTTP pandas-UDF over
mapInPandas) would plug in.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import synthetic
from ..operators import frontier as fr
from ..operators import politeness as po
from ..operators.linkextract import (
    apply_link_predicates,
    extract_link_spans,
    first_per_page,
    links_to_candidates,
)
from ..operators.components import _ckpt
from ..operators.seen_filter import (
    PartitionedBloom,
    choose_unseen_path,
    filter_unseen,
    first_wins_dedup,
)


from ..operators.sequence import with_dense_seq
from ..sources.table_format import SnapshotParquetFormat
from ..functions.url import with_url_columns


def _bloom_enabled(cfg) -> bool:
    """Resolve CrawlConfig.use_bloom: explicit True/False wins; "auto"
    asks the calibrated gate (exact beats bloom whenever the snapshot
    store's seen table is scannable — which, here, it always is)."""
    if cfg.use_bloom == "auto":
        return choose_unseen_path(seen_scannable=True) == "bloom"
    return bool(cfg.use_bloom)


def fetch_order():
    """Deterministic total order of fetches within a round."""
    return [
        F.col("fetch_at").asc(),
        F.col("score").desc(),
        F.col("enqueue_seq").asc(),
    ]


@dataclass
class CrawlConfig:
    n_hosts: int = 100
    k_per_host: int = 8          # per-host batch budget per round
    maxdepth: int = 2            # scraper_schema.json:22-26 caps at 3
    salt_buckets: int = 16
    # URL-seen path: False = exact anti-join (the measured winner at
    # every scannable operating point — seen_filter.choose_unseen_path),
    # True = maintain + use the bloom prefilter (only for deployments
    # whose seen side is not scannable at join time), "auto" = let the
    # gate decide (resolves to exact here: the crawl store's seen table
    # is always a local parquet snapshot)
    use_bloom: bool | str = "auto"
    deny_extensions: list | None = None
    allowed_domains: list | None = None
    allow_regex: str | None = None
    deny_regex: str | None = None
    # simulated fetch failures (ST6): a fetch of page p at retry r fails
    # when (p + r*7919) % failure_mod == 3; 0 disables. Failed requests
    # re-enqueue with priority-10, retry_times+1, dont_filter=True
    # (redis_retry.py:9-22) until retry_max (RETRY_TIMES settings.py:166)
    failure_mod: int = 0
    retry_max: int = 3
    # reliable checkpoint dir for mid-round lineage cuts (cluster path:
    # localCheckpoint blocks die with their executor; an HDFS/S3 dir
    # here makes every cut survive executor loss). None = in-memory.
    checkpoint_dir: str | None = None
    # snapshot retention: expire snapshots (keep this many) on the same
    # 16-round maintenance cadence as compaction; None = keep all
    # (storage then grows O(history) — set this for long crawls)
    expire_keep_last: int | None = None


def spans_expr(url_col, n_hosts: int):
    """Interleaved text+media spans of a fetched page — Spark twin of
    synthetic.py_spans (the span-sequence-equality invariant)."""
    p = synthetic.page_id_of(url_col)
    h = synthetic.host_id_of(url_col)
    links = synthetic.outlink_exprs(p, h, n_hosts)
    text_span = F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit("page "), p.cast("string"), F.lit(" text")).alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    link_spans = F.transform(
        links,
        lambda l: F.struct(
            F.lit("link").alias("kind"),
            l["url"].alias("text"),
            F.lit("").alias("media_ref"),
            l["offset"].alias("offset"),
        ),
    )
    img_span = F.when(
        p % 3 == 0,
        F.array(
            F.struct(
                F.lit("image").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("img-"), p.cast("string")).alias("media_ref"),
                (F.size(links) + 1).cast("int").alias("offset"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))
    return F.concat(text_span, link_spans, img_span)


def _partition_counts(df: DataFrame, metric: str, round_id: int) -> DataFrame:
    """Per-partition lineage counters (north_rule) — stats.py:46-55
    rebuilt as a tiny aggregate instead of hincrby round-trips."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.lit(round_id).alias("round_id"),
            F.col("partition_id"),
            F.lit(metric).alias("metric"),
            F.col("value").cast("long"),
        )
    )


def bootstrap(
    fmt: SnapshotParquetFormat,
    seeds: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig,
) -> int:
    """Round 0: seeds → canonicalize/hash → first-wins dedup → frontier;
    seed hashes become the initial seen set (the reference fingerprints
    every enqueued request, dupefilter.py:39-44)."""
    c = with_url_columns(seeds, "url", canonicalize=True)
    c = (
        c.withColumn("depth", F.lit(0))
        .withColumn("maxdepth", F.lit(cfg.maxdepth))
        .withColumn("spiderid", F.lit("link"))
        .withColumn("retry_times", F.lit(0))
        .withColumn("expires", F.lit(None).cast("timestamp"))
        .withColumn("dont_filter", F.lit(False))
        .withColumn("score", fr.score_expr())
        .withColumn("attrs", F.create_map().cast("map<string,string>"))
    )
    c = first_wins_dedup(c, "enqueue_seq")
    c = fr.with_salt(c, cfg.salt_buckets)
    frontier0 = c.select(
        "url", "url_hash", "host", "host_hash", "depth", "maxdepth", "priority",
        "score", "appid", "crawlid", "spiderid", "retry_times", "expires",
        "dont_filter", "enqueue_seq", "salt", "attrs",
    )
    seen0 = frontier0.select(
        "url_hash", "crawlid", F.col("enqueue_seq").alias("added_seq")
    )
    next_seq = (frontier0.agg(F.max("enqueue_seq")).collect()[0][0] or 0) + 1
    updates = {"frontier": frontier0, "seen": seen0, "robots": robots}
    if _bloom_enabled(cfg):
        bloom = PartitionedBloom()
        updates["bloom"] = bloom.build(seen0)
    return fmt.commit(updates, meta={"round": 0, "next_seq": int(next_seq)})


def run_round(fmt: SnapshotParquetFormat, cfg: CrawlConfig) -> dict:
    """Execute one scheduling round against the current snapshot and
    commit the next snapshot. Returns round stats."""
    spark = fmt.spark
    meta = fmt.meta()
    round_id = meta["round"] + 1
    next_seq = meta["next_seq"]

    frontier = fmt.read("frontier")
    seen = fmt.read("seen")
    robots = fmt.read("robots")
    blacklist = fmt.read("blacklist")

    # 1. dequeue per-host top-k (salted two-phase rank). The popped rows
    # leave the frontier permanently — including ones the robots filter
    # then discards (a robots-dropped request is consumed, not requeued:
    # scrapy RobotsTxtMiddleware semantics, settings.py:138)
    popped = fr.dequeue_top_k_per_host(frontier, cfg.k_per_host, salted=True)
    popped = _ckpt(popped, cfg.checkpoint_dir)
    # 2. robots + politeness virtual-clock slots
    batch = po.robots_filter(popped, robots)
    batch = po.assign_fetch_slots(batch, robots, round_start=F.lit(0.0))
    batch = _ckpt(batch, cfg.checkpoint_dir)  # cut lineage; batch reused 4×

    n_fetched = batch.count()
    if n_fetched == 0:
        # still consume any popped-but-disallowed rows
        fmt.commit(
            {"frontier": fr.remove_dequeued(frontier, popped)},
            meta={"round": round_id, "next_seq": next_seq, "done": True},
        )
        return {"round": round_id, "fetched": 0, "enqueued": 0}

    # 3. simulated fetch → spans. Failed attempts (ST6) consumed their
    # politeness slot but yield no document and no expansion; they
    # re-enqueue below with decayed priority.
    if cfg.failure_mod:
        pid = synthetic.page_id_of(F.col("url"))
        fail_cond = (
            F.pmod(pid + F.col("retry_times") * 7919, F.lit(cfg.failure_mod)) == 3
        )
        failed = batch.filter(fail_cond)
        ok = batch.filter(~fail_cond)
    else:
        failed = None
        ok = batch
    fetched = ok.withColumn("spans", spans_expr(F.col("url"), cfg.n_hosts))

    documents = fetched.select(
        F.concat(F.lit("doc-"), F.col("url_hash").cast("string")).alias("doc_id"),
        "url", "url_hash", "crawlid",
        F.lit(round_id).alias("fetched_round"),
        "spans",
    )

    # 4. fetch log — the crawl-ordering record (parity artifact)
    fetch_log = fetched.select(
        F.lit(round_id).alias("round_id"), "url", "url_hash", "host",
        "score", "enqueue_seq", "fetch_at", "fetch_rank", "depth",
    )

    # 5. link extraction from pages still allowed to expand (F6)
    expandable = fetched.filter(F.col("depth") < F.col("maxdepth")).select(
        F.concat(F.lit("doc-"), F.col("url_hash").cast("string")).alias("doc_id"),
        F.col("depth").alias("parent_depth"),
        "maxdepth",
        F.col("priority").alias("parent_priority"),
        "appid", "crawlid", "spiderid", "expires", "attrs",
        F.col("score").alias("parent_score"),
        F.col("enqueue_seq").alias("parent_seq"),
        "spans",
    )
    links = extract_link_spans(expandable)
    links = first_per_page(links)
    links = apply_link_predicates(
        links,
        allowed_domains=cfg.allowed_domains,
        allow_regex=cfg.allow_regex,
        deny_regex=cfg.deny_regex,
        deny_extensions=cfg.deny_extensions,
    )
    cands = links_to_candidates(links)
    # depth guard happens at extraction time in the reference
    # (link_spider.py:50-56) — BEFORE fingerprinting
    cands = cands.filter(F.col("depth") <= F.col("maxdepth"))

    # 6. dedup FIRST (reference order: the dupefilter is check-AND-insert
    # and runs before blacklist/expiry — scheduler.py:87-103 — so even
    # candidates later dropped by those filters enter the seen set):
    # intra-round first-wins in pop order, then exact anti-join
    pop_order = [
        F.col("parent_score").desc(),
        F.col("parent_seq").asc(),
        F.col("anchor_offset").asc(),
    ]
    cands = with_dense_seq(
        cands, pop_order, start=0, col_name="_cand_rank",
        checkpoint_dir=cfg.checkpoint_dir,
    )
    cands = first_wins_dedup(cands, "_cand_rank")
    if _bloom_enabled(cfg) and fmt.read("bloom") is not None:
        bloom = PartitionedBloom()
        fingerprinted = bloom.prefiltered_unseen(cands, seen, fmt.read("bloom"))
    else:
        fingerprinted = filter_unseen(cands, seen)
    fingerprinted = _ckpt(fingerprinted, cfg.checkpoint_dir)

    # 7. enqueue filters (blacklist, expiry) — reference order, applied
    # AFTER fingerprinting; dropped rows stay in the seen set (marked,
    # not filtered, so their fingerprints keep a NULL added_seq below)
    flagged = fr.mark_enqueue_filters(fingerprinted, blacklist)
    accepted = flagged.filter(F.col("_enqueue_ok")).drop("_enqueue_ok")

    # 8. dense enqueue_seq continuing the global sequence
    accepted = with_dense_seq(
        accepted, [F.col("_cand_rank").asc()], start=next_seq, col_name="enqueue_seq",
        checkpoint_dir=cfg.checkpoint_dir,
    ).drop("_cand_rank", "parent_score", "parent_seq", "anchor_offset")
    accepted = fr.with_salt(accepted, cfg.salt_buckets)
    new_rows = accepted.select(*[c for c in frontier.columns])
    new_rows = _ckpt(new_rows, cfg.checkpoint_dir)
    n_enqueued = new_rows.count()
    # accepted fingerprints carry their enqueue_seq into the seen table
    # (added_seq powers fingerprint-TTL expiry / the deletable cuckoo
    # path); blacklist/expiry-dropped fingerprints keep NULL
    accepted_seen = new_rows.select(
        "url_hash", "crawlid", F.col("enqueue_seq").alias("added_seq")
    )
    dropped_seen = flagged.filter(~F.col("_enqueue_ok")).select(
        "url_hash", "crawlid", F.lit(None).cast("long").alias("added_seq")
    )

    # 8b. retry re-enqueue (ST6/W3): failed fetches with budget left go
    # back to the frontier with priority-10, retry_times+1,
    # dont_filter=True — sequenced AFTER this round's children, in pop
    # order (the parity oracle applies the same rule)
    n_retries = 0
    if failed is not None:
        retry_rows = fr.decay_for_retry(
            failed.filter(F.col("retry_times") < cfg.retry_max)
        )
        retry_rows = with_dense_seq(
            retry_rows,
            [F.col("score").desc(), F.col("enqueue_seq").asc()],
            start=next_seq + n_enqueued,
            col_name="_new_seq",
            checkpoint_dir=cfg.checkpoint_dir,
        )
        retry_rows = _ckpt(
            retry_rows.drop("enqueue_seq")
            .withColumnRenamed("_new_seq", "enqueue_seq")
            .select(*[c for c in frontier.columns]),
            cfg.checkpoint_dir,
        )
        n_retries = retry_rows.count()
        new_rows = new_rows.unionByName(retry_rows)

    # 9. next frontier state + seen append + counters, one atomic commit
    remaining = fr.remove_dequeued(frontier, popped)
    next_frontier = remaining.unionByName(new_rows)
    # seen gets EVERY fingerprinted candidate (incl. blacklist/expiry
    # drops), not just frontier appends — dupefilter.py check-and-insert
    new_seen = accepted_seen.unionByName(dropped_seen)
    counters = _partition_counts(batch, "scheduler/dequeued", round_id).unionByName(
        _partition_counts(new_rows, "scheduler/enqueued", round_id)
    )
    # frontier is replaced (dequeues remove rows); seen / documents /
    # fetch_log / counters are append-only deltas — O(round) write work,
    # never O(history) (a 10^10-row seen table is only ever appended to)
    updates = {"frontier": next_frontier}
    appends = {
        "seen": new_seen,
        "counters": counters,
        "fetch_log": fetch_log,
        "documents": documents,
    }
    if _bloom_enabled(cfg) and fmt.read("bloom") is not None:
        updates["bloom"] = PartitionedBloom().merge(fmt.read("bloom"), new_seen)
    fmt.commit(
        updates,
        appends=appends,
        meta={"round": round_id, "next_seq": int(next_seq + n_enqueued + n_retries)},
    )
    return {
        "round": round_id,
        "fetched": n_fetched,
        "enqueued": n_enqueued,
        "retried": n_retries,
    }


def run_crawl(
    spark: SparkSession,
    root: str,
    seeds: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig,
    rounds: int,
    resume: bool = False,
) -> SnapshotParquetFormat:
    """Bootstrap (unless resuming) + N rounds. A killed run resumes from
    the last committed snapshot with no duplicated or lost work (ST5).
    The table format is resolved through the seam: IcebergFormat when a
    `crawler` catalog is configured (cluster), else the parquet twin."""
    from ..sources.table_format import make_table_format

    fmt = make_table_format(root, spark)
    if not resume or fmt.current_snapshot_id() is None:
        bootstrap(fmt, seeds, robots, cfg)
    done_rounds = fmt.meta()["round"]
    for i in range(done_rounds, rounds):
        stats = run_round(fmt, cfg)
        if stats["fetched"] == 0:
            break
        # fold the seen table's delta list periodically so reads don't
        # accumulate unbounded file lists (Iceberg rewrite_data_files)
        if (i + 1) % 16 == 0:
            fmt.compact("seen")
            if cfg.expire_keep_last:
                fmt.expire_snapshots(keep_last=cfg.expire_keep_last)
    return fmt


def crawl_order(fmt: SnapshotParquetFormat) -> DataFrame:
    """The crawl ordering (north_rule parity artifact): fetches in
    (round, fetch_at, score desc, enqueue_seq) order."""
    log = fmt.read("fetch_log")
    return log.orderBy(F.col("round_id").asc(), *fetch_order())
