"""Corpus repetition analysis — the Gopher/C4 repetition filters and
cross-document chunk-level dedup that sit between exact-doc dedup and
MinHash fuzzy dedup in a pretraining pipeline (docs that merely SHARE
boilerplate chunks aren't near-dups, but the shared chunks inflate
token counts and leak templates).

The chunker here is aligned fixed-size word blocks (CHUNK_WORDS): the
synthetic documents carry no sentence punctuation, so a sentence
splitter degenerates to one chunk per doc (verified: zero shared
sentences at sf0.01, but 135 shared 8-word blocks). In production the
chunker is pluggable — swap `chunks_col` for a sentence/paragraph
splitter; every downstream shape is unchanged.

Scale shapes (the 100 TB contract):
- chunk dedup: narrow chunking → portable hash → ONE groupBy on the
  hash (count distinct docs, min doc). Never all-pairs; the same shape
  as exact-doc dedup.
- repetition ratios: duplicate-word fraction is a pure narrow map
  (array_distinct inside the row); the top-bigram fraction adds one
  (doc_id, bigram) hash groupBy with partial aggregation and a per-doc
  max — no windows over raw text, no global sorts.

Determinism: ratios are floor(x * 1e6) micro-ints; chunk identity is
the portable 60-bit md5 hash (h60); DuckDB list slices (1-based,
inclusive end) mirror Spark's slice(start, length) exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_textdedup import _t, fan_out, h60, words_col, SQL_WORDS

MIN_SHARED_DOCS = 2
CHUNK_WORDS = 8


def chunks_col(w):
    """Aligned CHUNK_WORDS-word blocks of the word array (the trailing
    partial block is dropped — standard fixed-size chunking)."""
    n_blocks = F.floor(F.size(w) / CHUNK_WORDS).cast("int")
    return F.when(
        F.size(w) >= CHUNK_WORDS,
        F.transform(
            F.sequence(F.lit(1), n_blocks),
            lambda i: F.concat_ws(
                " ", F.slice(w, (i - 1) * CHUNK_WORDS + 1, CHUNK_WORDS)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


_SQL_CHUNKS = (
    f"CASE WHEN len(w) >= {CHUNK_WORDS} THEN "
    f"[array_to_string(w[(i-1)*{CHUNK_WORDS}+1:i*{CHUNK_WORDS}], ' ') "
    f"for i in range(1, len(w)//{CHUNK_WORDS} + 1)] "
    "ELSE [] END"
)


# --- cross-doc chunk dedup ----------------------------------------------------
def q_chunk_dedup(spark, sf_dir):
    """Chunks shared by >= MIN_SHARED_DOCS distinct docs:
    (chunk_hash, n_docs, first_doc). The boilerplate-detection pass of
    C4-style cleaning — the kept copy is the min doc_id, every other
    occurrence is removable without touching doc-level dedup."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    # explode chunk POSITIONS through the Generate and build the chunk
    # string + hash top-level in codegen: exploding an interpreted-HOF
    # array re-evaluates the generator per OUTPUT element (O(chunks^2)
    # per doc — PLANS.md round-5 "lambda collapse"), and this shape also
    # keeps the chunk TEXT inside its scan task: only (doc_id,
    # chunk_hash) rows ever shuffle. The distinct replaces the old
    # row-level array_distinct (within-doc chunk dedup), after which
    # count(*) per chunk IS the distinct-doc count.
    n_blocks = F.floor(F.size("w") / CHUNK_WORDS).cast("int")
    pos_arr = F.when(
        F.size("w") >= CHUNK_WORDS, F.sequence(F.lit(1), n_blocks)
    ).otherwise(F.array().cast("array<int>"))
    chunks = (
        docs.select("doc_id", words_col(F.col("text")).alias("w"))
        .select("doc_id", "w", F.explode(pos_arr).alias("i"))
        .select(
            "doc_id",
            h60(
                F.concat_ws(
                    " ",
                    F.slice(
                        "w", (F.col("i") - 1) * CHUNK_WORDS + 1, CHUNK_WORDS
                    ),
                )
            ).alias("chunk_hash"),
        )
        .distinct()
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= MIN_SHARED_DOCS)
    )


SQL_CHUNK_DEDUP = f"""
WITH words AS (
  SELECT doc_id, {SQL_WORDS.format(t='text')} AS w FROM documents
), chunks AS (
  SELECT doc_id,
         ('0x' || substr(md5(c), 1, 15))::bigint AS chunk_hash
  FROM (SELECT doc_id, unnest({_SQL_CHUNKS}) AS c FROM words)
)
SELECT chunk_hash,
       cast(count(DISTINCT doc_id) AS bigint) AS n_docs,
       min(doc_id) AS first_doc
FROM chunks
GROUP BY chunk_hash
HAVING count(DISTINCT doc_id) >= {MIN_SHARED_DOCS}
"""


# --- Gopher repetition ratios -------------------------------------------------
def q_repetition_ratio(spark, sf_dir):
    """Per-doc repetition signals (the Gopher-rule analogues for
    unpunctuated text):
    - dup_word_micro: 1 - distinct_words/words, in micro-units (narrow
      map — array_distinct inside the row);
    - top_bigram_micro: occurrences of the most frequent word bigram /
      total bigrams (one (doc_id, bigram) hash groupBy + per-doc max).
    Docs with no words/bigrams report 0 (kept, not dropped — the
    downstream gate decides)."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    # _nocollapse fences the tokenizer out of the bigram lambda below —
    # inlined, the lambda re-tokenized the doc PER BIGRAM: O(words^2)
    # regexp work per document (PLANS.md round-5 "lambda collapse")
    per_doc = docs.select(
        "doc_id", words_col(F.col("text")).alias("w"),
        F.monotonically_increasing_id().alias("_nocollapse"),
    ).select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.when(
            F.size("w") > 0,
            F.floor(
                # cast BEFORE the multiply: F.size is int32 and so is the
                # literal — >~2147 duplicate words would overflow and wrap
                # silently (non-ANSI) while the DuckDB oracle computes the
                # same product in BIGINT
                (F.size("w") - F.size(F.array_distinct("w"))).cast("long")
                * 1000000
                / F.size("w")
            ),
        )
        .otherwise(0)
        .cast("long")
        .alias("dup_word_micro"),
        F.col("w"),
    )
    # explode bigram POSITIONS, build the bigram top-level: exploding a
    # transform()-built array re-evaluates the generator per OUTPUT
    # element — O(words^2) per doc (PLANS.md round-5 "lambda collapse")
    bigrams = per_doc.filter(F.size("w") >= 2).select(
        "doc_id",
        "w",
        (F.size("w") - 1).alias("n_bi"),
        F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i"),
    ).select(
        "doc_id",
        F.concat_ws(
            " ", F.element_at("w", F.col("i")), F.element_at("w", F.col("i") + 1)
        ).alias("bg"),
        "n_bi",
    )
    top_bg = (
        bigrams.groupBy("doc_id", "bg", "n_bi")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_bi")
        .agg(F.max("c").alias("top_c"))
        .select(
            "doc_id",
            F.floor(F.col("top_c") * 1000000 / F.col("n_bi"))
            .cast("long")
            .alias("top_bigram_micro"),
        )
    )
    return (
        per_doc.select("doc_id", "n_words", "dup_word_micro")
        .join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "dup_word_micro",
            F.coalesce(F.col("top_bigram_micro"), F.lit(0))
            .cast("long")
            .alias("top_bigram_micro"),
        )
    )


SQL_REPETITION_RATIO = f"""
WITH per_doc AS (
  SELECT doc_id,
         cast(len(w) AS int) AS n_words,
         CASE WHEN len(w) > 0
              THEN cast(floor((len(w) - len(list_distinct(w))) * 1000000 / len(w)) AS bigint)
              ELSE 0 END AS dup_word_micro,
         w
  FROM (SELECT doc_id, {SQL_WORDS.format(t='text')} AS w FROM documents)
), bigrams AS (
  SELECT doc_id,
         unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg,
         len(w) - 1 AS n_bi
  FROM per_doc
  WHERE len(w) >= 2
), counts AS (
  SELECT doc_id, bg, n_bi, count(*) AS c FROM bigrams GROUP BY doc_id, bg, n_bi
), top_bg AS (
  SELECT doc_id, cast(floor(max(c) * 1000000 / n_bi) AS bigint) AS top_bigram_micro
  FROM counts GROUP BY doc_id, n_bi
)
SELECT p.doc_id, p.n_words, p.dup_word_micro,
       coalesce(t.top_bigram_micro, 0) AS top_bigram_micro
FROM per_doc p LEFT JOIN top_bg t ON p.doc_id = t.doc_id
"""


REGISTRY: dict[str, tuple] = {
    "chunk_dedup": (q_chunk_dedup, SQL_CHUNK_DEDUP),
    "repetition_ratio": (q_repetition_ratio, SQL_REPETITION_RATIO),
}
