"""Pretraining-corpus assembly ops over `documents`: the stages that sit
BETWEEN cleaning/dedup (queries_textdedup) and the training job —
data mixing, shard building, benchmark decontamination, PII scanning.

Reference scope note: the reference crawler ends at "items in a store"
(pipelines.py, es_load.py); these queries are the forward path a 100 TB
crawl corpus actually feeds. All are first-class `queries()` entries
with DuckDB oracles.

100 TB shapes (why each plan survives a 1000-executor cluster):
- stratified sampling  : pure narrow filter — a hash threshold per row,
  zero shuffles, predicate evaluated inside the parquet scan stage.
- mixing weights       : one partial-aggregated groupBy over ~10^1-10^3
  sources → rows the driver could hold; integer micro-unit arithmetic
  so the weights are bit-identical across engines/retries.
- shard packing        : window cumsum PARTITIONED BY a hash bucket —
  2^k independent packers (one writer task each), never a global sort.
  A real shard writer packs per-writer exactly like this; doc order
  inside a bucket is deterministic (doc_id).
- decontamination      : the benchmark n-gram set is tiny (MBs) next to
  the corpus → broadcast it; the corpus side stays map-side (explode +
  hash probe) with one partial-agg shuffle keyed by doc_id.
- PII scan             : pure per-row regexp map, whole-stage codegen,
  no Python.

Cross-engine determinism: integer math only (ratios as floor(x*1e6)
micro-units), the shared h60 portable hash, and sqrt (IEEE-exact in
both engines) as the only floating-point op.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.components import ckpt_auto

from openslack_crawler_spark.queries_textdedup import (
    SQL_WORDS,
    _t,
    h60,
    words_col,
)

SAMPLE_RATE_MIN_PPM = 200000  # every source keeps >= 20% ...
SAMPLE_RATE_SPAN_PPM = 600001  # ... and < 80.0001%
SHARD_TOKEN_BUDGET = 512  # tokens per training shard (sandbox-sized)
SHARD_BUCKETS = 8  # parallel packers; 2^k writer tasks on a fleet
DECON_NGRAM = 5  # word n-gram length for overlap screening
BENCH_MOD = 11  # pmod(h60(doc_id), 11) == 0 -> held-out benchmark doc


# --- deterministic stratified sampling (data mixing, row level) -----------
def q_corpus_sample_stratified(spark, sf_dir):
    """Per-source hash-threshold sampling: source s keeps a doc iff
    pmod(h60(doc_id:source), 1e6) < rate_ppm(s). Deterministic (re-runs
    and retries keep the same rows — no rand()), stratified (each
    source meets its own rate), and a pure narrow filter: at 100 TB
    this is predicate work inside the scan stage, zero shuffles.
    Rates here derive from h60(source) to exercise many strata; a
    production mix passes a {source: rate} table instead."""
    docs = _t(spark, sf_dir, "documents")
    rate_ppm = F.lit(SAMPLE_RATE_MIN_PPM) + F.pmod(
        h60(F.col("source")), F.lit(SAMPLE_RATE_SPAN_PPM)
    )
    ticket = F.pmod(
        h60(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))),
        F.lit(1000000),
    )
    return (
        docs.withColumn("rate_ppm", rate_ppm.cast("long"))
        .filter(ticket < F.col("rate_ppm"))
        .select("doc_id", "source", "rate_ppm")
    )


SQL_CORPUS_SAMPLE_STRATIFIED = """
SELECT doc_id, source,
       200000 + (('0x' || substr(md5(source), 1, 15))::bigint % 600001) AS rate_ppm
FROM documents
WHERE ('0x' || substr(md5(doc_id::varchar || ':' || source), 1, 15))::bigint % 1000000
      < 200000 + (('0x' || substr(md5(source), 1, 15))::bigint % 600001)
"""


# --- temperature-weighted mixture weights (corpus level) -------------------
def q_mix_weights_temperature(spark, sf_dir):
    """Temperature-sampling weights per source, alpha = 0.5:
    w_s = sqrt(tokens_s) / sum_t sqrt(tokens_t), emitted as ppm.
    Up-weights small sources relative to proportional sampling — the
    standard multi-source pretraining mix. Integer micro-units end to
    end: sqrt is the single FP op (IEEE-exact in Spark and DuckDB),
    floored to micro-units before the cross-source sum so the total is
    integer and the division is reproducible."""
    docs = _t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(words_col(F.col("text")))).alias("n_tokens"),
    )
    s_micro = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast(
        "long"
    )
    w = per_src.withColumn("s_micro", s_micro).withColumn(
        "total_micro", F.sum("s_micro").over(Window.partitionBy())
    )
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(F.col("s_micro") * 1000000 / F.col("total_micro"))
        .cast("long")
        .alias("weight_ppm"),
    )


SQL_MIX_WEIGHTS_TEMPERATURE = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(len({SQL_WORDS.format(t='text')})) AS bigint) AS n_tokens
  FROM documents GROUP BY source
), scaled AS (
  SELECT *, cast(floor(sqrt(n_tokens::double) * 1000000) AS bigint) AS s_micro
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       cast(floor(s_micro * 1000000 / sum(s_micro) OVER ()) AS bigint) AS weight_ppm
FROM scaled
"""


# --- epochs per source for a target token budget ---------------------------
TARGET_TOKENS = 10_000_000  # training-run token budget (sandbox-sized)


def q_mix_epochs(spark, sf_dir):
    """Turn the temperature mix into a concrete sampling plan: source s
    contributes TARGET_TOKENS * weight of the training stream, which
    means epochs(s) = budget_s / tokens_s passes over the source —
    small sources get >1 epoch (upsampling), big ones a fraction. All
    integer arithmetic (exact DIV), emitted in milli-epochs; the plan
    is the post-agg table of ~#sources rows, driver-scale by
    construction."""
    w = q_mix_weights_temperature(spark, sf_dir)
    return w.select(
        "source",
        "n_tokens",
        "weight_ppm",
        F.expr(
            f"({TARGET_TOKENS} * weight_ppm) DIV 1000000"
        ).alias("budget_tokens"),
        F.expr(
            f"({TARGET_TOKENS} * weight_ppm * 1000) DIV (1000000 * n_tokens)"
        ).alias("epochs_milli"),
    )


SQL_MIX_EPOCHS = f"""
WITH mix AS ({{mix_sql}})
SELECT source, n_tokens, weight_ppm,
       ({TARGET_TOKENS} * weight_ppm) // 1000000 AS budget_tokens,
       ({TARGET_TOKENS} * weight_ppm * 1000) // (1000000 * n_tokens) AS epochs_milli
FROM mix
"""


# --- token-budget shard packing --------------------------------------------
def q_corpus_shard_pack(spark, sf_dir):
    """Greedy token-budget packing of docs into training shards.
    Bucket-parallel: docs hash into SHARD_BUCKETS independent packers;
    within a bucket a running token cumsum (ordered by doc_id) assigns
    shard_seq = floor(start_offset / budget) — a doc lands in the shard
    where its first token falls, exactly how a per-writer shard builder
    behaves. The window partitions by bucket, so at 100 TB this is 2^k
    parallel sorted groups (k sized to the writer fleet), never a
    single global sort."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.pmod(h60(F.col("doc_id").cast("string")), F.lit(SHARD_BUCKETS)).alias(
            "bucket"
        ),
        F.size(words_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "shard_seq",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(SHARD_TOKEN_BUDGET)),
    )
    return packed.groupBy("bucket", "shard_seq").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


SQL_CORPUS_SHARD_PACK = f"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint % {SHARD_BUCKETS} AS bucket,
         cast(len({SQL_WORDS.format(t='text')}) AS bigint) AS n_tokens
  FROM documents
), packed AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM toks
)
SELECT bucket, cast(floor((cum - n_tokens) / {SHARD_TOKEN_BUDGET}) AS bigint) AS shard_seq,
       count(*) AS n_docs, cast(sum(n_tokens) AS bigint) AS sum_tokens,
       min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM packed
GROUP BY bucket, shard_seq
"""


# --- benchmark decontamination (n-gram overlap screen) ----------------------
def q_decontaminate_overlap(spark, sf_dir):
    """Test-set contamination screen: flag training docs sharing word
    {DECON_NGRAM}-grams with a held-out benchmark (here: the pseudo-
    random h60(doc_id)%11==0 slice stands in for MMLU/GSM-style eval
    files). The benchmark's distinct n-gram hashes are broadcast — at
    100 TB the eval suites are MBs against a PB corpus, so the corpus
    side never shuffles its text: explode n-grams, probe the broadcast
    set map-side, partial-agg the hit counts by doc_id."""
    docs = _t(spark, sf_dir, "documents")
    is_bench = F.pmod(h60(F.col("doc_id").cast("string")), F.lit(BENCH_MOD)) == 0
    # tokenize behind a CollapseProject fence — inlined into the n-gram
    # lambda below, the regexp tokenize re-ran PER WINDOW: O(words^2)
    # per doc (PLANS.md round-5 "lambda collapse")
    tok = docs.select(
        "doc_id",
        is_bench.alias("is_bench"),
        words_col(F.col("text")).alias("w"),
        F.monotonically_increasing_id().alias("_nocollapse"),
    )
    w = F.col("w")
    grams = F.when(
        F.size(w) >= DECON_NGRAM,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (DECON_NGRAM - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, DECON_NGRAM)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # materialize the gram arrays BEFORE any explode: Generate re-runs
    # an interpreted-HOF generator expression per OUTPUT element, which
    # made the corpus explode O(grams^2) per doc — 19.8s vs 0.24s at
    # sf0.1 (PLANS.md round-5 "lambda collapse", rule 3). At 100 TB this
    # checkpoint is the standard materialized gram-index the probe
    # pipeline reads.
    base = ckpt_auto(tok.select(
        "doc_id", "is_bench", grams.alias("grams")
    ))
    bench_grams = (
        base.filter("is_bench")
        .select(F.explode("grams").alias("g"))
        .select(h60(F.col("g")).alias("gh"))
        .distinct()
    )
    # ONE corpus pass: n_grams rides every exploded row (constant per
    # doc) so the hit-count groupBy recovers it with first() — no second
    # corpus scan, no per-doc join-back. (The previous shape consumed
    # `base` three ways and re-evaluated the gram build per consumer:
    # 25s -> ~3s at sf0.1.)
    return (
        base.filter(~F.col("is_bench"))
        .select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.explode("grams").alias("g"),
        )
        .select("doc_id", "n_grams", h60(F.col("g")).alias("gh"))
        .join(F.broadcast(bench_grams), "gh")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.count("*").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            F.floor(F.col("n_hits") * 1000000 / F.col("n_grams"))
            .cast("long")
            .alias("overlap_ppm"),
        )
    )


SQL_DECONTAMINATE_OVERLAP = f"""
WITH base AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint % {BENCH_MOD} = 0 AS is_bench,
         {SQL_WORDS.format(t='text')} AS w
  FROM documents
), grams AS (
  SELECT doc_id, is_bench,
         CASE WHEN len(w) >= {DECON_NGRAM}
              THEN list_distinct([array_to_string(w[i:i+{DECON_NGRAM - 1}], ' ')
                                 for i in range(1, len(w) - {DECON_NGRAM - 2})])
              ELSE [] END AS gs
  FROM base
), bench_set AS (
  SELECT DISTINCT ('0x' || substr(md5(g.g), 1, 15))::bigint AS gh
  FROM grams, unnest(gs) AS g(g) WHERE is_bench
), corpus AS (
  SELECT doc_id, len(gs) AS n_grams, gs FROM grams WHERE NOT is_bench
), hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM (SELECT c.doc_id, ('0x' || substr(md5(g.g), 1, 15))::bigint AS gh
        FROM corpus c, unnest(gs) AS g(g)) e
  JOIN bench_set USING (gh)
  GROUP BY doc_id
)
SELECT c.doc_id, cast(c.n_grams AS int) AS n_grams, h.n_hits,
       cast(floor(h.n_hits * 1000000 / c.n_grams) AS bigint) AS overlap_ppm
FROM corpus c JOIN hits h USING (doc_id)
"""


# --- PII scan / redaction accounting ----------------------------------------
PII_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PII_PHONE_RE = "\\+[0-9]-[0-9]{3}-[0-9]{4}"


def q_pii_scan(spark, sf_dir):
    """PII detection + redaction accounting: count emails/phones per
    doc and the post-redaction length. The sandbox corpus is synthetic
    word salad with no PII, so a deterministic doc_id-derived contact
    block is appended to every 5th doc FIRST (both engines apply the
    identical augmentation) — the operator under test is the regexp
    scan/redact, which is pure per-row JVM codegen at any scale."""
    docs = _t(spark, sf_dir, "documents")
    contact = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    )
    aug = F.when(
        F.pmod(F.col("doc_id"), F.lit(5)) == 0, F.concat(F.col("text"), contact)
    ).otherwise(F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(aug, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        F.length(aug).cast("long").alias("n_chars_raw"),
        F.length(redacted).cast("long").alias("n_chars_redacted"),
    )


SQL_PII_SCAN = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || doc_id::varchar ||
                   '@example.com or +1-555-' || lpad((doc_id % 10000)::varchar, 4, '0')
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       cast(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS bigint) AS n_emails,
       cast(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS bigint) AS n_phones,
       cast(length(t) AS bigint) AS n_chars_raw,
       cast(length(regexp_replace(regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{PII_PHONE_RE}', '<PHONE>', 'g')) AS bigint)
         AS n_chars_redacted
FROM aug
"""


REGISTRY: dict[str, tuple] = {
    "corpus_sample_stratified": (
        q_corpus_sample_stratified,
        SQL_CORPUS_SAMPLE_STRATIFIED,
    ),
    "mix_weights_temperature": (
        q_mix_weights_temperature,
        SQL_MIX_WEIGHTS_TEMPERATURE,
    ),
    "corpus_shard_pack": (q_corpus_shard_pack, SQL_CORPUS_SHARD_PACK),
    "mix_epochs": (
        q_mix_epochs,
        SQL_MIX_EPOCHS.format(mix_sql=SQL_MIX_WEIGHTS_TEMPERATURE),
    ),
    "decontaminate_overlap": (q_decontaminate_overlap, SQL_DECONTAMINATE_OVERLAP),
    "pii_scan": (q_pii_scan, SQL_PII_SCAN),
}
