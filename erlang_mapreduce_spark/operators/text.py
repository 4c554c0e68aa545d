"""Text operators — the reference's own domain, generalized.

The reference computes overlapping character-bigram counts + probabilities
over a pre-tokenized word list (mapreduce.erl:40-55 single-process,
:58-127 distributed). Canonical semantics here are DISTRIBUTED mode
(SURVEY.md §2.3 Q4): words not starting with [a-z] or shorter than 2 chars
are dropped (mapreduce.erl:176-181), and the `totalCount` pseudo-row is
excluded from results and the probability denominator (mapreduce.erl:222-224).

The bigram extraction is the declarative equivalent of the `countCombos`
state machine (mapreduce.erl:260-295): emit every overlapping adjacent pair,
keep those matching ^[a-z]{2}$. SURVEY.md §2.3 Q1 proves this EXACTLY
equivalent to the asymmetric skip rule (exhaustive + fuzz + full-dataset
verification), so no parity UDF is needed in the hot path.

Scale notes (100 TB): the whole pipeline is narrow until one hash-agg
shuffle keyed on the full bigram (NOT first letter — the reference's 26-way
first-letter routing at mapreduce.erl:226 is a skew object lesson; English
letter frequencies vary ~40×). Partial aggregation (the map-side ETS combine
at mapreduce.erl:275-282) is Spark's built-in partial/final HashAggregate,
so shuffle volume is O(distinct bigrams × partitions) ≤ 676 × P, independent
of corpus size. The global total for probabilities is a partition-less
window over the already-aggregated counts — bounded at 26² rows by the
alphabet, so the one-partition hop is O(1) data and the corpus is scanned
exactly once (a scalar-subquery crossJoin would recompute the whole
aggregation branch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, scan_parallel

# exact declarative transcription of countCombos (mapreduce.erl:260-295), Q1
_BIGRAM_EXPR = (
    "filter(transform(sequence(1, length(word) - 1),"
    " i -> substring(word, i, 2)), b -> b rlike '^[a-z]{2}$')"
)


def read_reference_wordlist(spark: SparkSession, path: str) -> DataFrame:
    """Read a word list with the reference's exact file semantics: split on
    '\\n' and drop the LAST split element unconditionally
    (`tl(lists:reverse(Lines))`, mapreduce.erl:44) — which drops the empty
    trailing element for \\n-terminated files but drops a REAL word when the
    file lacks a trailing newline (test.ngl, short.txt both do).

    The reference itself reads the whole file into memory
    (file:read_file, mapreduce.erl:41), so this small-file parity helper does
    the same; the engine's scale path is scan_text (spark.read.text), which
    has the sane semantics (no phantom/dropped lines).
    """
    with open(path, "rb") as f:
        lines = f.read().decode("utf-8", errors="replace").split("\n")[:-1]
    return spark.createDataFrame([(w,) for w in lines], ["word"])


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """text → one word per row (the pre-step the reference's .ngl input skips).
    Parallelism is restored before the explode: the fan-out (~100 words/doc)
    happens after the scan, so scan splits alone under-provision it."""
    return scan_parallel(df).select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)


def dist_mode_filter(words: DataFrame) -> DataFrame:
    """Canonical word filters: first char in [a-z] (mapreduce.erl:174-179),
    length >= 2 (mapreduce.erl:180-181)."""
    return words.filter(
        F.col("word").rlike("^[a-z]") & (F.length("word") >= 2)
    )


def bigrams(words: DataFrame) -> DataFrame:
    """word → overlapping char bigrams (mapreduce.erl:260-295, exact per Q1)."""
    return words.select(F.explode(F.expr(_BIGRAM_EXPR)).alias("bigram"))


def bigram_freq(words: DataFrame) -> DataFrame:
    """The full reference computation over a `word` column:
    filter → flatMap bigrams → count (partial+final hash agg,
    mapreduce.erl:275-282 + :236-255) → probability = cnt / Σcnt
    (mapreduce.erl:130-141) → sort by bigram (mapreduce.erl:49)."""
    from pyspark.sql import Window

    counts = bigrams(dist_mode_filter(words)).groupBy("bigram").agg(
        F.count("*").alias("cnt")
    )
    # global total as a partition-less window over the AGGREGATED counts:
    # post-agg cardinality is bounded by the alphabet (≤ 26² = 676 rows
    # whatever the corpus size), so the single-partition hop moves O(1)
    # data — while a scalar-subquery crossJoin(broadcast(counts.agg(...)))
    # would RECOMPUTE the whole scan→tokenize→explode→agg branch
    # (ReuseExchange does not fire across the two consumers; verified via
    # .explain — the corpus was scanned twice).
    return (
        counts.withColumn(
            "prob", F.col("cnt") / F.sum("cnt").over(Window.partitionBy())
        )
        .select("bigram", "cnt", "prob")
        .orderBy("bigram")
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry(): the reference workload over the documents corpus."""
    return bigram_freq(tokenize(load(spark, sf_dir, "documents")))


_BIGRAM_CTES = """
WITH words AS (
    SELECT w AS word
    FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM documents)
    WHERE length(w) > 0
),
kept AS (
    SELECT word FROM words
    WHERE regexp_matches(word, '^[a-z]') AND length(word) >= 2
),
bg AS (
    SELECT substring(word, CAST(i AS INTEGER), 2) AS bigram
    FROM (SELECT word, unnest(range(1, length(word))) AS i FROM kept)
    WHERE regexp_matches(substring(word, CAST(i AS INTEGER), 2), '^[a-z]{2}$')
),
counts AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram)
"""


@query(
    "text_tokenize",
    oracle="""
WITH words AS (
    SELECT w AS word
    FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM documents)
    WHERE length(w) > 0
)
SELECT word, count(*) AS cnt FROM words GROUP BY word
""",
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer as a standalone op: word frequencies over the corpus."""
    return (
        tokenize(load(spark, sf_dir, "documents"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "text_bigram_freq",
    oracle=f"""
{_BIGRAM_CTES.strip()}
SELECT bigram, cnt,
       CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE) AS prob
FROM counts
""",
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship: bigram counts + probabilities (dist mode)."""
    return bigram_freq(tokenize(load(spark, sf_dir, "documents")))


@query(
    "text_normalize",
    oracle="""
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
               AS norm_text
    FROM documents
)
SELECT doc_id, norm_text,
       CASE WHEN norm_text = '' THEN 0
            ELSE len(string_split(norm_text, ' ')) END AS n_tokens
FROM n
""",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — the first stage of every training-data
    pipeline: casefold, squash every non-alphanumeric run to a single space,
    trim, and count the resulting tokens. Entirely narrow (per-row regex in
    whole-stage codegen, no shuffle, no Python), so at 100 TB it streams at
    scan speed and fuses with whatever filter/dedup stage follows."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    ).alias("norm_text")
    out = d.select("doc_id", norm)
    return out.select(
        "doc_id",
        "norm_text",
        F.when(F.col("norm_text") == "", F.lit(0))
        .otherwise(F.size(F.split("norm_text", " ")))
        .alias("n_tokens"),
    )


# Sentence boundary: one-or-more terminal punctuation marks followed by
# whitespace. Lookbehind-free on purpose — Java regex (Spark) supports it
# but RE2 (DuckDB) does not, and a plain character-class pattern is
# bit-identical in both dialects (the test_unicode_parity lesson). The
# whitespace class is explicit, not \s: Java's \s includes \x0B, RE2's
# does not.
SENT_SPLIT_RE = r"[.!?]+[ \t\n\r\f]+"


@query(
    "text_sentence_split",
    oracle=r"""
WITH s AS (
    SELECT doc_id, string_split_regex(text, '[.!?]+[ \t\n\r\f]+') AS arr
    FROM documents WHERE text IS NOT NULL
),
idx AS (
    SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS gs FROM s
)
SELECT doc_id, CAST(gs AS INTEGER) AS sent_idx, trim(arr[gs]) AS sentence,
       length(trim(arr[gs])) AS n_chars
FROM idx
WHERE trim(arr[gs]) <> ''
""",
)
def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation — the preprocessing stage between raw text
    and chunking/packing: split on terminal-punctuation + whitespace
    boundaries, keep each sentence with its 1-based in-document index and
    character count. Chunkers that respect sentence boundaries
    (`text_chunk_overlap` slices on tokens; RAG-style chunkers slice
    here) and per-sentence quality filters both start from this table.

    Plan shape: one narrow split + posexplode over the scan — zero
    shuffles at any scale; output grows with sentence count, which is the
    op's job (same output-linearity class as text_chunk_overlap).
    sent_idx counts RAW split slots (1-based) on both engines, so indices
    agree even when empty slots are filtered; terminal punctuation is
    consumed by the boundary, which is the documented split contract
    (sentence TEXT, not spans). The fixture corpus carries no sentence
    punctuation (each doc segments whole); the punctuated-path evidence
    lives in tests/test_operators.py and the hostile-content suite."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ex = d.select(
        "doc_id",
        F.posexplode(F.split("text", SENT_SPLIT_RE)).alias("pos", "raw"),
    )
    s = F.trim("raw")
    return ex.select(
        "doc_id",
        (F.col("pos") + 1).cast("int").alias("sent_idx"),
        s.alias("sentence"),
        F.length(s).alias("n_chars"),
    ).filter(s != "")
