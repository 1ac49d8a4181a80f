"""Substring-level dedup + document fingerprinting + source-level
quality priors — the three corpus-hygiene operators that sit between
chunk dedup (aligned blocks, queries_quality.py) and MinHash fuzzy
dedup (whole-doc, queries_textdedup.py) in a pretraining pipeline:

- `substring_dup_spans`: exact duplicated-substring spans, the
  operator class of Lee et al., "Deduplicating Training Data Makes
  Language Models Better" (ACL 2022). Their single-node tool is a
  suffix array; the distributed re-expression is positional K-word
  windows → one hash groupBy to find windows occurring >= 2 times in
  the corpus → per-doc gaps-and-islands merge of overlapping duplicated
  windows into MAXIMAL spans. Reference analogue: the crawler dedups
  whole items by URL/content hash (crawler/utils/dupefilter.py:21-60);
  this is the intra-document generalization a training pipeline needs.
- `winnow_fingerprints` / `winnow_shared_pairs`: MOSS winnowing
  (Schleimer/Wilkerson/Aiken, SIGMOD 2003): k-gram hash sequence, a
  sliding window of W hashes, keep each window's minimum — guarantees
  any shared run of >= W+K-1 words shares a fingerprint, at ~2/(W+1)
  the density of full shingling. The selection runs as a codegen
  explode + sliding window-min over (doc, pos) — a row-local
  higher-order-function version exists (_fps_col) but interpreted
  lambdas evaluate an md5 per element with no CSE and measured 6-20x
  slower (PLANS.md round-5 "lambda collapse"); pairs reuse the capped
  posting-list join shape of ngram_jaccard_pairs over the
  once-materialized fingerprint index.
- `source_quality_prior`: FineWeb/RefinedWeb-style source-level prior:
  per-doc quality proxies (length, duplicate-word fraction, language)
  aggregated per source, combined into an integer prior score and a
  keep/drop decision for the whole source. One groupBy over ~#sources
  groups with partial aggregation; the decision table is broadcast-size
  by construction.

Scale shapes (the 100 TB contract):
- dup-span detection is NEVER all-pairs: one (window-hash) groupBy with
  partial aggregation + one hash join back, then per-doc windows over
  tiny per-doc position lists. Same family as exact/chunk dedup.
- winnowing shuffles only 8-byte gram hashes (window on doc_id,
  distinct on (doc_id, fp)) — the k-gram TEXT never leaves its scan
  task; the posting-list join is bounded by the df<=20 cap exactly
  like ngram_jaccard_pairs.
- the source prior aggregates 100 TB of docs into ~#sources rows; the
  keep-set join back to docs (when used as a filter) is a broadcast.

Determinism: the portable 60-bit md5 hash (h60) everywhere; ratios are
integer micro-units via exact DIV (Spark `DIV` == DuckDB `//`); no
doubles anywhere in an output column.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.components import ckpt_auto
from .queries_textdedup import _t, fan_out, h60, words_col, SQL_WORDS

SPAN_K = 8        # duplicated-substring window, in words
WINNOW_K = 4      # winnowing k-gram size, in words
WINNOW_W = 4      # winnowing window, in k-gram hashes
FP_DF_CAP = 20    # posting-list cap (shared with ngram_jaccard_pairs)
MIN_SHARED_FP = 2
PRIOR_KEEP_MICRO = 500000

_SQL_H60 = "('0x' || substr(md5({x}),1,15))::bigint"


def _kgram_hashes(w, k: int):
    """Array of h60 hashes of the overlapping k-word grams of `w`
    (empty below k words) — row-local, no Exchange."""
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: h60(F.concat_ws(" ", F.slice(w, i, k))),
        ),
    ).otherwise(F.array().cast("array<long>"))


def _sql_kgram_hashes(k: int) -> str:
    h = _SQL_H60.format(x=f"array_to_string(w[i:i+{k - 1}], ' ')")
    return (
        f"CASE WHEN len(w) >= {k} THEN "
        f"[{h} for i in range(1, len(w) - {k - 2})] "
        "ELSE [] END"
    )


# (the round-5 `_tokenized_barrier` CollapseProject fence was dead code —
# every query here builds docs via fan_out(...).select directly; removed
# per advisor r5, measurement note preserved in PLANS.md)


# --- duplicated-substring spans (Lee et al. operator, distributed) -----------
def q_substring_dup_spans(spark, sf_dir):
    """Maximal spans of each document whose every SPAN_K-word window
    occurs >= 2 times corpus-wide (including within-doc repeats — Lee
    et al. count any recurrence). Windows carry their 1-based word
    position; duplicated positions merge into islands when consecutive
    marks are <= SPAN_K apart (i.e. the windows overlap or adjoin)."""
    docs = fan_out(_t(spark, sf_dir, "documents")).select(
        "doc_id", words_col(F.col("text")).alias("w")
    )
    # explode POSITIONS through the Generate, build the window string +
    # hash top-level: the Generate evaluates the tokenizer once per doc
    # and the per-window work runs in whole-stage codegen. (Building
    # windows inside a transform() lambda was 23x slower: higher-order
    # lambdas are interpreted, and CollapseProject inlines the
    # tokenizer into the lambda so EVERY element re-tokenized the doc —
    # see PLANS.md round-5 "lambda collapse" note.)
    pos_arr = F.when(
        F.size("w") >= SPAN_K,
        F.sequence(F.lit(1), F.size("w") - (SPAN_K - 1)),
    ).otherwise(F.array().cast("array<int>"))
    # materialize the window table once — TWO consumers (the occ>=2
    # hash census and the position marking join) would otherwise each
    # re-run the explode+hash pass; Lee et al. persist exactly this
    # table (their suffix-array dup ranges) as an artifact, so the
    # checkpoint is the sf-scale stand-in for that materialization.
    # Measured at sf0.1: 2.46s -> 1.54s warm, 7.5s -> 2.7s cold.
    wins = ckpt_auto(docs.select(
        "doc_id", "w", F.explode(pos_arr).alias("pos")
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        h60(F.concat_ws(" ", F.slice("w", F.col("pos"), SPAN_K))).alias("h"),
    ))
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
        .select("h")
    )
    marked = wins.join(dup, "h").select("doc_id", "pos")
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    isl = marked.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w_ord) > SPAN_K, 1).otherwise(0),
    ).withColumn("island", F.sum("brk").over(w_ord))
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (SPAN_K - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_words"),
            "n_windows",
        )
    )


SQL_SUBSTRING_DUP_SPANS = f"""
WITH words AS (
  SELECT doc_id, {SQL_WORDS.format(t='text')} AS w FROM documents
), wins AS (
  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
    SELECT doc_id,
      unnest(CASE WHEN len(w) >= {SPAN_K} THEN
        [{{'pos': CAST(i AS BIGINT),
           'h': {_SQL_H60.format(x=f"array_to_string(w[i:i+{SPAN_K - 1}], ' ')")}}}
         for i in range(1, len(w) - {SPAN_K - 2})]
      ELSE [] END) AS u
    FROM words)
), dup AS (
  SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
), marked AS (
  SELECT wins.doc_id, wins.pos FROM wins JOIN dup USING (h)
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > {SPAN_K} THEN 1 ELSE 0 END AS brk
  FROM marked
), isl2 AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {SPAN_K - 1} AS span_end,
       max(pos) + {SPAN_K - 1} - min(pos) + 1 AS span_words,
       count(*) AS n_windows
FROM isl2
GROUP BY doc_id, island
"""


# --- MOSS winnowing fingerprints ---------------------------------------------
def _fps_col():
    """Distinct window-min fingerprints as a row-local ARRAY expression
    (transform + slice + array_min). Kept as the semantic REFERENCE and
    for tests; the registered queries use _winnow_fps_df instead — this
    expression evaluates inside interpreted higher-order lambdas at
    ~1.3ms/doc (md5 per element, no codegen, no CSE), measured 6-20x
    slower than the exploded window-min plan below."""
    hs = _kgram_hashes(F.col("w"), WINNOW_K)
    wins = F.when(
        F.size(hs) >= WINNOW_W,
        F.transform(
            F.sequence(F.lit(1), F.size(hs) - (WINNOW_W - 1)),
            lambda j: F.array_min(F.slice(hs, j, WINNOW_W)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return hs, F.array_distinct(wins)


def _winnow_fps_df(spark, sf_dir):
    """(doc_id, fp) distinct winnowing fingerprints — the codegen plan:
    explode k-gram POSITIONS through the Generate (tokenizer runs once
    per doc), hash each gram top-level (whole-stage codegen, same shape
    as substring_dup_spans), then the window-of-W minimum as a sliding
    window function over (doc, pos) and a distinct. Bit-identical to
    exploding _fps_col()'s array (checksum-asserted in
    tests/test_substring_ops.py) at 1/6th the cost — the lambda version
    interprets an md5 per element with zero subexpression reuse.

    Scale shape: one Exchange on doc_id (window) + one on (doc_id, fp)
    (distinct) of 8-byte-hash rows — the standard fingerprint-index
    build; the k-gram text itself never shuffles."""
    docs = fan_out(_t(spark, sf_dir, "documents")).select(
        "doc_id", words_col(F.col("text")).alias("w")
    )
    pos_arr = F.when(
        F.size("w") >= WINNOW_K,
        F.sequence(F.lit(1), F.size("w") - (WINNOW_K - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = docs.select(
        "doc_id", F.size("w").alias("nw"), "w", F.explode(pos_arr).alias("pos")
    ).select(
        "doc_id", "nw", "pos",
        h60(F.concat_ws(" ", F.slice("w", F.col("pos"), WINNOW_K))).alias("h"),
    )
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    return (
        grams.withColumn("fp", F.min("h").over(wmin))
        # only FULL W-wide windows select a fingerprint (MOSS contract)
        .filter(F.col("pos") <= F.col("nw") - WINNOW_K + 1 - (WINNOW_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )


def q_winnow_fingerprints(spark, sf_dir):
    """Per-document winnowing summary: k-gram count, selected
    fingerprint count (the ~2/(W+1) density guarantee shows up as
    n_fp << n_kgrams), and the fingerprint range."""
    docs = fan_out(_t(spark, sf_dir, "documents")).select(
        "doc_id", words_col(F.col("text")).alias("w")
    )
    base = docs.select(
        "doc_id",
        F.when(F.size("w") >= WINNOW_K, F.size("w") - (WINNOW_K - 1))
        .otherwise(F.lit(0)).cast("long").alias("n_kgrams"),
    )
    per_doc = (
        _winnow_fps_df(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_kgrams",
        F.coalesce(F.col("n_fp"), F.lit(0)).cast("long").alias("n_fp"),
        "min_fp",
        "max_fp",
    )


_SQL_WINNOW_FPS = f"""
WITH words AS (
  SELECT doc_id, {SQL_WORDS.format(t='text')} AS w FROM documents
), hs AS (
  SELECT doc_id, {_sql_kgram_hashes(WINNOW_K)} AS h FROM words
), wn AS (
  SELECT doc_id, len(h) AS n_kgrams,
         CASE WHEN len(h) >= {WINNOW_W} THEN
           [list_min(h[j:j+{WINNOW_W - 1}]) for j in range(1, len(h) - {WINNOW_W - 2})]
         ELSE [] END AS wins
  FROM hs
), fp AS (
  SELECT doc_id, n_kgrams, list_distinct(wins) AS fps FROM wn
)
"""

SQL_WINNOW_FINGERPRINTS = (
    _SQL_WINNOW_FPS
    + """
SELECT doc_id,
       CAST(n_kgrams AS BIGINT) AS n_kgrams,
       CAST(len(fps) AS BIGINT) AS n_fp,
       list_min(fps) AS min_fp,
       list_max(fps) AS max_fp
FROM fp
"""
)


def q_winnow_shared_pairs(spark, sf_dir):
    """Document pairs sharing >= MIN_SHARED_FP winnowing fingerprints —
    the MOSS match step as a capped posting-list equi-join (same bound
    as ngram_jaccard_pairs: fingerprints held by > FP_DF_CAP docs carry
    no pair signal and would blow up quadratically)."""
    # materialize the fingerprint index ONCE (MOSS stores exactly this
    # index); the plan below consumes it three ways (df counts, probe,
    # both join sides) and would otherwise recompute the selection per
    # branch — measured 17-21s vs 6.6s at sf0.1
    post = ckpt_auto(_winnow_fps_df(spark, sf_dir))
    rare = post.join(
        post.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= FP_DF_CAP),
        "fp",
    )
    a = rare.select(F.col("doc_id").alias("doc_a"), "fp")
    b = rare.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED_FP)
    )


SQL_WINNOW_SHARED_PAIRS = (
    _SQL_WINNOW_FPS
    + f"""
, post AS (
  SELECT doc_id, unnest(fps) AS fp FROM fp
), rare AS (
  SELECT post.doc_id, post.fp FROM post
  JOIN (SELECT fp, count(*) AS df FROM post GROUP BY fp
        HAVING count(*) <= {FP_DF_CAP}) f
    ON post.fp = f.fp
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {MIN_SHARED_FP}
"""
)


# --- source-level quality prior ----------------------------------------------
def q_source_quality_prior(spark, sf_dir):
    """Source-level keep/drop prior from per-doc quality proxies:
    mean length, mean duplicate-word fraction, English fraction.
    prior = en_frac - 2*dup_frac + length-band bonus (micro-units,
    exact integer arithmetic); a source is kept when the prior clears
    PRIOR_KEEP_MICRO. The output is ~#sources rows — at 100 TB this
    table broadcasts back onto docs as the actual filter."""
    docs = _t(spark, sf_dir, "documents").select(
        "source",
        "lang",
        words_col(F.col("text")).alias("w"),
    )
    per_doc = docs.select(
        "source",
        F.size("w").cast("long").alias("n_words"),
        F.expr(
            "(CAST(size(w) - size(array_distinct(w)) AS BIGINT) * 1000000)"
            " DIV GREATEST(size(w), 1)"
        ).alias("dup_micro"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("is_en"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("sum_words"),
        F.sum("dup_micro").alias("sum_dup"),
        F.sum("is_en").alias("n_en"),
    )
    mean_words = F.expr("sum_words DIV n_docs")
    dup_mean = F.expr("sum_dup DIV n_docs")
    en_frac = F.expr("(n_en * 1000000) DIV n_docs")
    prior = (
        en_frac
        - 2 * dup_mean
        + F.when(mean_words.between(50, 5000), 100000).otherwise(0)
    )
    return agg.select(
        "source",
        "n_docs",
        mean_words.alias("mean_words"),
        dup_mean.alias("dup_micro_mean"),
        en_frac.alias("en_frac_micro"),
        prior.cast("long").alias("prior_micro"),
        (prior >= PRIOR_KEEP_MICRO).cast("long").alias("keep_src"),
    )


SQL_SOURCE_QUALITY_PRIOR = f"""
WITH per_doc AS (
  SELECT source,
         CAST(len(w) AS BIGINT) AS n_words,
         (CAST(len(w) - len(list_distinct(w)) AS BIGINT) * 1000000)
           // GREATEST(len(w), 1) AS dup_micro,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
  FROM (SELECT source, lang, {SQL_WORDS.format(t='text')} AS w FROM documents)
), agg AS (
  SELECT source,
         count(*) AS n_docs,
         sum(n_words) AS sum_words,
         sum(dup_micro) AS sum_dup,
         sum(is_en) AS n_en
  FROM per_doc GROUP BY source
), scored AS (
  SELECT source, n_docs,
         sum_words // n_docs AS mean_words,
         sum_dup // n_docs AS dup_micro_mean,
         (n_en * 1000000) // n_docs AS en_frac_micro
  FROM agg
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(mean_words AS BIGINT) AS mean_words,
       CAST(dup_micro_mean AS BIGINT) AS dup_micro_mean,
       CAST(en_frac_micro AS BIGINT) AS en_frac_micro,
       CAST(en_frac_micro - 2 * dup_micro_mean
            + CASE WHEN mean_words BETWEEN 50 AND 5000 THEN 100000 ELSE 0 END
            AS BIGINT) AS prior_micro,
       CAST(CASE WHEN en_frac_micro - 2 * dup_micro_mean
                      + CASE WHEN mean_words BETWEEN 50 AND 5000
                             THEN 100000 ELSE 0 END
                 >= {PRIOR_KEEP_MICRO} THEN 1 ELSE 0 END AS BIGINT) AS keep_src
FROM scored
"""


REGISTRY: dict[str, tuple] = {
    "substring_dup_spans": (q_substring_dup_spans, SQL_SUBSTRING_DUP_SPANS),
    "winnow_fingerprints": (q_winnow_fingerprints, SQL_WINNOW_FINGERPRINTS),
    "winnow_shared_pairs": (q_winnow_shared_pairs, SQL_WINNOW_SHARED_PAIRS),
    "source_quality_prior": (q_source_quality_prior, SQL_SOURCE_QUALITY_PRIOR),
}
