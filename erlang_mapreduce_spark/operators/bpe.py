"""Real BPE tokenization — GPT-2-style merge-table application.

Replaces the "BPE-ish" regex heuristic (analysis.py `text_token_count`)
with the actual byte-pair-encoding algorithm every production corpus
pipeline budgets on: start from characters, repeatedly merge the
best-ranked adjacent pair until no merge from the table applies
(Sennrich et al. 2016; GPT-2 ships exactly such a merge table as
``merges.txt``). The merge TABLE here is a fixed English demo table —
in production it is configuration, swapped for the model tokenizer's
published merges; the ALGORITHM and the Spark plan shape are what this
module pins.

Equivalence note for the oracle: we apply ONE merge per step — the
leftmost occurrence of the lowest-ranked (earliest-learned) pair present.
This is output-identical to the textbook "merge all occurrences of the
best pair left-to-right" formulation: BPE learns a merge only after its
component tokens exist, so any pair CREATED by applying merge ``p`` has a
strictly higher rank than ``p`` — after one application the remaining
occurrences of ``p`` are still the best-ranked pair, and repeated
leftmost application replays the left-to-right pass exactly. One-at-a-time
is what a recursive SQL CTE can express, so the DuckDB oracle runs the
identical algorithm and the whole tokenization is hash-checked
cross-engine (not sampled, not rows-only).

Scale shape (the reason this beats tokenizing documents directly): the
Python merge loop runs per DISTINCT word, never per occurrence — docs
explode to (doc_id, pos, word), words deduplicate, the Arrow-batched
pandas UDF encodes the vocabulary once, and an equi-join fans results
back out. At 100 TB the corpus has ~10^7 distinct words versus ~10^13
word occurrences: the imperative cost is six orders of magnitude below
the corpus, everything corpus-sized stays JVM-side (regexp split,
explode, join, aggregate), and AQE broadcasts the vocabulary map when it
fits / shuffle-joins when it does not. The reference analog is the word
split + per-word countCombos pass at mapreduce.erl:260-295, generalized
from bigram emission to merge-table encoding.
"""

from __future__ import annotations

import string

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load

# Pre-tokenizer (shared: analysis.text_token_count counts these same
# segments as pretok_count): letter runs / digit runs / single non-alnum
# chars — lowercased, ASCII word chars, so
# multi-char pre-tokens are pure [a-z]+ or [0-9]+ and char indexing is
# unicode-safe in both engines. Runs longer than PRETOK_MAX chars split
# into PRETOK_MAX-sized chunks (greedy leftmost bounded repetition —
# identical chunking in Java regex and DuckDB RE2): the DuckDB oracle's
# recursive CTE accumulates O(len^2) state per distinct word, so an
# unbounded run (a pathological fuzz doc with one long unbroken
# letter/digit run) must be impossible BY CONSTRUCTION in both engines,
# not just absent from today's fixtures. GPT-2's pre-tokenizer makes the
# same move for the same reason (long runs are pathological, not
# linguistic).
PRETOK_MAX = 24
PRETOK_RE = f"[a-z]{{1,{PRETOK_MAX}}}|[0-9]{{1,{PRETOK_MAX}}}|[^a-z0-9\\s]"

# Base vocabulary: ids are positions in this fixed list. Characters
# outside it (unicode letters, exotic symbols) tokenize as themselves
# with id -1 (<unk>-style) — deterministic in both engines.
BASE_CHARS: tuple[str, ...] = tuple(
    "abcdefghijklmnopqrstuvwxyz0123456789" + string.punctuation
)
N_BASE = len(BASE_CHARS)  # merge product k gets id N_BASE + k

# The merge table, in learned (rank) order. Well-formedness is asserted at
# import: every component must be a base char or an earlier product, and
# products must be unique and multi-char. ~tier structure mirrors how BPE
# training actually proceeds (char pairs first, then compounds).
MERGES: tuple[tuple[str, str], ...] = (
    # tier 1: char+char (the 50 highest-frequency English letter pairs)
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("o", "f"),
    ("e", "d"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("t", "o"), ("n", "t"), ("n", "g"), ("s", "e"),
    ("h", "a"), ("a", "s"), ("o", "u"), ("i", "o"), ("l", "e"),
    ("v", "e"), ("c", "o"), ("m", "e"), ("d", "e"), ("h", "i"),
    ("r", "i"), ("r", "o"), ("i", "c"), ("n", "e"), ("e", "a"),
    ("r", "a"), ("c", "e"), ("l", "i"), ("c", "h"), ("l", "l"),
    ("b", "e"), ("m", "a"), ("s", "i"), ("o", "m"), ("u", "r"),
    # tier 2: compounds over tier-1 products + remaining useful char pairs
    ("th", "e"), ("in", "g"), ("an", "d"), ("io", "n"), ("en", "t"),
    ("t", "er"), ("a", "ti"), ("f", "or"), ("th", "at"), ("w", "it"),
    ("al", "l"), ("th", "i"), ("t", "ed"), ("e", "st"), ("er", "e"),
    ("ou", "r"), ("c", "on"), ("p", "ro"), ("co", "m"), ("e", "x"),
    ("it", "y"), ("m", "ent"), ("b", "le"), ("a", "ble"), ("w", "h"),
    ("wh", "i"), ("whi", "ch"), ("h", "er"), ("w", "as"), ("y", "ou"),
    ("f", "ro"), ("fro", "m"), ("th", "is"), ("wit", "h"), ("o", "t"),
    ("n", "ot"), ("a", "re"), ("u", "t"), ("b", "ut"), ("ha", "ve"),
    ("the", "y"), ("on", "e"),
    # tier 3: longer compounds
    ("ati", "on"), ("t", "ion"), ("er", "s"), ("in", "e"),
    ("v", "er"), ("o", "ver"), ("u", "n"), ("d", "er"), ("un", "der"),
    ("re", "s"), ("t", "a"), ("s", "ta"), ("e", "ver"), ("g", "e"),
    ("a", "ge"), ("an", "ce"), ("en", "ce"), ("l", "d"), ("ou", "ld"),
    ("w", "ould"), ("c", "ould"), ("s", "he"), ("p", "er"), ("p", "re"),
    ("in", "ter"), ("q", "u"), ("s", "o"), ("d", "o"), ("i", "f"),
    ("u", "s"), ("w", "e"), ("b", "y"), ("m", "y"), ("u", "p"),
    ("g", "o"), ("n", "o"), ("l", "o"), ("lo", "w"),
)


def _validate() -> dict[str, int]:
    """Assert the merge table is well-formed; return token → id."""
    vocab: dict[str, int] = {c: i for i, c in enumerate(BASE_CHARS)}
    for k, (a, b) in enumerate(MERGES):
        assert a in vocab, f"merge {k} ({a!r},{b!r}): left component unknown"
        assert b in vocab, f"merge {k} ({a!r},{b!r}): right component unknown"
        prod = a + b
        assert len(prod) >= 2 and prod not in vocab, (
            f"merge {k}: duplicate/colliding product {prod!r}"
        )
        vocab[prod] = N_BASE + k
    return vocab


VOCAB_ID: dict[str, int] = _validate()
_MERGE_RANK: dict[tuple[str, str], int] = {p: r for r, p in enumerate(MERGES)}


def encode(word: str) -> list[int]:
    """BPE-encode one pre-token → token ids (repeated leftmost-best-rank
    merge; see module docstring for the equivalence argument)."""
    toks = list(word)
    while len(toks) > 1:
        best_rank = best_i = -1
        for i in range(len(toks) - 1):
            r = _MERGE_RANK.get((toks[i], toks[i + 1]), -1)
            if r >= 0 and (best_rank < 0 or r < best_rank):
                best_rank, best_i = r, i
        if best_rank < 0:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return [VOCAB_ID.get(t, -1) for t in toks]


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def _bpe_ids_udf(words: pd.Series) -> pd.Series:
    # Arrow-batched; input is the DISTINCT word table, so the per-word
    # memo only helps across batch boundaries — kept because it is free.
    memo: dict[str, list[int]] = {}

    def enc(w: str) -> list[int]:
        ids = memo.get(w)
        if ids is None:
            ids = memo[w] = encode(w)
        return ids

    return words.apply(enc)


def doc_word_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, word) — pre-tokenized word occurrences in document
    order. NULL/empty texts produce no rows (rejoined later)."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(PRETOK_RE), 0)
        ).alias("pos", "word"),
    )


def word_ids(dw: DataFrame) -> DataFrame:
    """(word, ids) — the BPE vocabulary map, one Python encode per
    DISTINCT word. No hint on the later join: AQE broadcasts this map
    while it is small and falls back to shuffle when the vocabulary
    outgrows the broadcast threshold at scale."""
    return dw.select("word").distinct().select(
        "word", _bpe_ids_udf("word").alias("ids")
    )


def doc_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) for EVERY document (0 for wordless/NULL texts) —
    the training-token budget `pipeline_seq_pack` packs on."""
    dw = doc_word_rows(docs)
    per_doc = (
        dw.join(word_ids(dw), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.size("ids")).alias("n_tokens"))
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id", F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins — built from the SAME constants, so the merge table
# cannot drift between engines.


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_MERGES_VALUES = ", ".join(
    f"({_q(a)}, {_q(b)}, {r})" for r, (a, b) in enumerate(MERGES)
)
_VOCAB_VALUES = ", ".join(
    f"({_q(t)}, {i})" for t, i in sorted(VOCAB_ID.items(), key=lambda kv: kv[1])
)

# Shared WITH-clause body: word occurrences → distinct words → recursive
# merge application → final token list per word. Embed after
# ``WITH RECURSIVE`` in an oracle. Each recursion step applies the
# leftmost occurrence of the best-ranked applicable pair (ORDER BY rnk, i)
# to each still-active word; words with no applicable merge drop out and
# ``arg_max(toks, it)`` recovers each word's final state.
ORACLE_WORD_CTES = f"""
merges(a, b, rnk) AS (VALUES {_MERGES_VALUES}),
dw AS (
    SELECT doc_id, i AS pos, words[i] AS word
    FROM (SELECT doc_id,
                 regexp_extract_all(lower(text), '{PRETOK_RE}') AS words
          FROM documents),
         unnest(range(1, len(words)+1)) AS t(i)
),
uw(word) AS (SELECT DISTINCT word FROM dw),
base AS (
    SELECT word,
           list_transform(range(1, len(word)+1), i -> word[i]) AS toks,
           0 AS it
    FROM uw
),
bpe AS (
    SELECT * FROM base
    UNION ALL
    SELECT word,
           list_slice(toks, 1, i-1)
             || [toks[i] || toks[i+1]]
             || list_slice(toks, i+2, len(toks)) AS toks,
           it + 1
    FROM (
        SELECT b.word, b.toks, b.it, p.i,
               row_number() OVER (PARTITION BY b.word ORDER BY p.rnk, p.i)
                   AS rn
        FROM bpe b
        JOIN LATERAL (
            SELECT i, m.rnk
            FROM unnest(range(1, len(b.toks))) AS t(i)
            JOIN merges m ON m.a = b.toks[i] AND m.b = b.toks[i+1]
        ) p ON true
    ) WHERE rn = 1
),
wtoks AS (SELECT word, arg_max(toks, it) AS toks FROM bpe GROUP BY word)
"""

# (doc_id, n_tokens) twin of ``doc_token_counts`` — every document, 0 for
# wordless. Reused by the pipeline_seq_pack oracle.
ORACLE_DOC_TOKENS_CTES = f"""{ORACLE_WORD_CTES},
dt AS (
    SELECT dw.doc_id, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
    FROM dw JOIN wtoks USING (word)
    GROUP BY dw.doc_id
),
doc_tokens AS (
    SELECT d.doc_id, coalesce(dt.n_tokens, 0) AS n_tokens
    FROM documents d LEFT JOIN dt USING (doc_id)
)
"""

PREVIEW_K = 24  # leading token ids echoed per doc (bounded output width)


@query(
    "text_bpe_tokenize",
    oracle=f"""
WITH RECURSIVE {ORACLE_WORD_CTES},
vocab(tok, tid) AS (VALUES {_VOCAB_VALUES}),
wids AS (
    SELECT u.word, list(coalesce(v.tid, -1) ORDER BY u.i) AS ids
    FROM (SELECT word, i, toks[i] AS tok
          FROM wtoks, unnest(range(1, len(toks)+1)) AS t(i)) u
    LEFT JOIN vocab v ON v.tok = u.tok
    GROUP BY u.word
),
ds AS (
    SELECT dw.doc_id,
           CAST(sum(len(ids)) AS BIGINT) AS n_tokens,
           CAST(sum(len(list_filter(ids, x -> x >= {N_BASE}))) AS BIGINT)
               AS n_merged,
           CAST(sum(list_sum(ids)) AS BIGINT) AS id_checksum,
           array_to_string(
               list_slice(flatten(list(ids ORDER BY dw.pos)), 1, {PREVIEW_K}),
               ',') AS preview_ids
    FROM dw JOIN wids USING (word)
    GROUP BY dw.doc_id
)
SELECT d.doc_id,
       coalesce(n_tokens, 0) AS n_tokens,
       coalesce(n_merged, 0) AS n_merged,
       coalesce(id_checksum, 0) AS id_checksum,
       coalesce(preview_ids, '') AS preview_ids
FROM documents d LEFT JOIN ds USING (doc_id)
""",
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE tokenization over the fixed merge table: token
    count, merged-token count (tokens produced by ≥1 merge, i.e. id ≥
    N_BASE), an id checksum (Σ token ids — pins the exact id sequence
    modulo permutation), and the first {PREVIEW_K} token ids verbatim
    (pins order). Together the columns hash-pin the full tokenization;
    emitting every id per doc would only bloat the comparison payload.

    Plan: TWO column-pruned scans of the text column — the vocabulary
    branch (explode → distinct → Arrow-UDF encode, per DISTINCT word, NOT
    per occurrence) and the fan-out branch (posexplode → equi-join on
    word) — plus a doc_id-only scan to rejoin wordless docs. The corpus
    is deliberately rescanned rather than materialized: the exploded
    frame is corpus-sized, so persisting/checkpointing it at 100 TB costs
    more than a second columnar parquet scan + regex pass, and both
    branches prune to exactly the columns they read (pinned in
    tests/test_plans.py). Shuffles: the distinct, the fan-out join
    (broadcast under AQE while the vocab map is small), and the doc agg —
    all keyed, no driver collect, no cartesian."""
    docs = load(spark, sf_dir, "documents")
    dw = doc_word_rows(docs)
    joined = dw.join(word_ids(dw), "word")
    ordered_ids = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "ids"))),
            lambda s: s["ids"],
        )
    )
    ds = joined.groupBy("doc_id").agg(
        F.sum(F.size("ids")).alias("n_tokens"),
        F.sum(F.size(F.filter("ids", lambda x: x >= F.lit(N_BASE)))).alias(
            "n_merged"
        ),
        F.sum(
            F.aggregate("ids", F.lit(0).cast("long"), lambda acc, x: acc + x)
        ).alias("id_checksum"),
        F.array_join(
            F.transform(
                F.slice(ordered_ids, 1, PREVIEW_K), lambda x: x.cast("string")
            ),
            ",",
        ).alias("preview_ids"),
    )
    return docs.select("doc_id").join(ds, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_merged", F.lit(0)).alias("n_merged"),
        F.coalesce("id_checksum", F.lit(0)).alias("id_checksum"),
        F.coalesce("preview_ids", F.lit("")).alias("preview_ids"),
    )
