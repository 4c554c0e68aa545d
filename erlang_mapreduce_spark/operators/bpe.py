"""Real BPE tokenization — GPT-2-style merge-table application.

Replaces the "BPE-ish" regex heuristic (analysis.py `text_token_count`)
with the actual byte-pair-encoding algorithm every production corpus
pipeline budgets on: start from characters, repeatedly merge the
best-ranked adjacent pair until no merge from the table applies
(Sennrich et al. 2016; GPT-2 ships exactly such a merge table as
``merges.txt``). The merge TABLE here is a fixed English demo table —
in production it is configuration, swapped for the model tokenizer's
published merges; the ALGORITHM and the Spark plan shape are what this
module pins. Two families share that machinery: the CHAR-level demo
(readable tokens, [a-z0-9]+punct base) and the BYTE-level production
design (`text_bpe_tokenize_bytes` / `doc_token_counts` — UTF-8 bytes as
the base vocabulary, so every script budgets to real ids; see the
BYTE-LEVEL section below).

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

import os
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


# ---------------------------------------------------------------------------
# BYTE-LEVEL BPE — the production design (GPT-2's actual base vocabulary):
# every pre-token decomposes into its UTF-8 BYTES, so the base vocabulary
# is the 256 byte values and NO input is ever unbudgetable — a Cyrillic or
# CJK document tokenizes to real ids (multi-byte letters as 2-4 byte
# tokens, compressed by learned byte merges), never to <unk>. This is the
# budget `doc_token_counts` feeds to pipeline_seq_pack / downstream
# mixing: the char-level family above stays as the readable demo surface
# (and keeps its oracle history), but anything that BUDGETS text uses
# bytes, because a budget that returns "500 unknowns" for a Russian doc
# is semantically wrong, not approximate.
#
# Representation: a byte token is its 2-char uppercase hex image ("74",
# "C3"), a merged token the concatenation of its parts ("7468" = "th").
# Hex is the one byte encoding BOTH engines can produce verbatim —
# Python's b"%02X", Spark never sees the tokens (the Arrow UDF works from
# the raw word), and DuckDB's hex(encode(word)) — so the recursive-CTE
# merge machinery below runs unchanged on byte tokens, and the oracle
# stays exact on any input, ASCII or not.
#
# Pre-tokenizer: unicode letter runs / digit runs / single other chars,
# CASE-SENSITIVE (byte-level tokenizers do not casefold — and skipping
# lower() also sidesteps the three documented Java-vs-DuckDB casefold
# divergences in tests/test_unicode_parity.py). Whitespace is spelled as
# an explicit char class instead of \s because Java counts U+000B in \s
# and RE2 does not (the same parity test pins that divergence); \p{L} is
# the Unicode letter category in BOTH regex dialects (parity pinned in
# test_unicode_parity.py over mixed-script fixtures).
PRETOK_BYTES_RE = (
    f"[\\p{{L}}]{{1,{PRETOK_MAX}}}|[0-9]{{1,{PRETOK_MAX}}}"
    "|[^\\p{L}0-9\\t\\n\\x0B\\f\\r ]"
)

N_BYTES = 256  # byte value b has id b; merge product k gets id 256 + k


def word_byte_tokens(word: str) -> list[str]:
    """A word's base token list: the 2-char hex image of each UTF-8
    byte."""
    return [f"{b:02X}" for b in word.encode("utf-8")]


def _ascii_hex(s: str) -> str:
    return "".join(f"{ord(c):02X}" for c in s)


# Scripts whose letters get dedicated byte merges in the demo table: the
# highest-frequency lowercase letters of several 2-byte-UTF-8 scripts plus
# common 3-byte CJK/kana. Like MERGES this is demo-scale CONFIGURATION (a
# production table ships tens of thousands of learned byte merges); the
# point it pins is structural — multi-byte letters of covered scripts
# collapse to ONE real token id each, and UNcovered scripts still budget
# honestly as per-byte tokens, never <unk>.
_NONLATIN_CHARS = (
    "абвгдежзийклмнопрстуфхцчшщъыьэюя"  # Cyrillic (Russian lowercase)
    "αβγδεζηθικλμνξοπρσςτυφχψω"         # Greek lowercase
    "ابتثجحخدذرزسشصضطظعغفقكلمنهوي"      # Arabic base letters
    "äöüßéèêëàâçîïñíóúãõø"              # Latin-1/2 accents
    "一二三人日月年时的是不了在有中文世界国大小上下"  # frequent CJK
    "のにはをがとでたしてい"             # frequent hiragana
)


def _gen_byte_merges() -> tuple[tuple[str, str], ...]:
    """The byte-level demo merge table: (a) the hex image of every
    char-level merge — on pure-ASCII lowercase text byte-level
    tokenization is then isomorphic to the char-level demo — plus (b)
    lead+continuation merges so each _NONLATIN_CHARS letter becomes a
    single token (for 3-byte chars: two chained merges, the second
    consuming the first's product). Deterministic, duplicate-products
    skipped, and every component is a base byte or an earlier product —
    the well-formedness invariant the oracle equivalence argument needs
    (re-asserted by _validate_bytes at import)."""
    merges: list[tuple[str, str]] = [
        (_ascii_hex(a), _ascii_hex(b)) for a, b in MERGES
    ]
    known = {f"{i:02X}" for i in range(N_BYTES)}
    known.update(a + b for a, b in merges)
    for ch in _NONLATIN_CHARS:
        toks = word_byte_tokens(ch)
        while len(toks) > 1:
            prod = toks[0] + toks[1]
            if prod not in known:
                merges.append((toks[0], toks[1]))
                known.add(prod)
            toks = [prod] + toks[2:]
    return tuple(merges)


BYTE_MERGES: tuple[tuple[str, str], ...] = _gen_byte_merges()


def _validate_bytes() -> dict[str, int]:
    """Same well-formedness assertions as _validate, over the byte table."""
    vocab: dict[str, int] = {f"{i:02X}": i for i in range(N_BYTES)}
    for k, (a, b) in enumerate(BYTE_MERGES):
        assert a in vocab and b in vocab, f"byte merge {k}: unknown component"
        prod = a + b
        assert prod not in vocab, f"byte merge {k}: duplicate product {prod}"
        vocab[prod] = N_BYTES + k
    return vocab


BYTE_VOCAB_ID: dict[str, int] = _validate_bytes()
_BYTE_MERGE_RANK: dict[tuple[str, str], int] = {
    p: r for r, p in enumerate(BYTE_MERGES)
}


def encode_bytes(word: str) -> list[int]:
    """Byte-level encode under the shipped byte table. TOTAL: every hex
    pair is in the base vocabulary, so unlike char-level `encode` this
    can never produce -1 — the property the whole family exists for."""
    return [
        BYTE_VOCAB_ID[t]
        for t in _merge_tokens(word_byte_tokens(word), _BYTE_MERGE_RANK)
    ]


def _merge_tokens(
    toks: list[str], rank: dict[tuple[str, str], int]
) -> list[str]:
    """Repeated leftmost-best-rank merge over an arbitrary token list —
    the BPE application loop, shared by the char-level and byte-level
    encoders (the representation of a base token — one char vs one hex
    byte — is the callers' concern; the merge algebra is identical)."""
    while len(toks) > 1:
        best_rank = best_i = -1
        for i in range(len(toks) - 1):
            r = rank.get((toks[i], toks[i + 1]), -1)
            if r >= 0 and (best_rank < 0 or r < best_rank):
                best_rank, best_i = r, i
        if best_rank < 0:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def encode_with(
    word: str,
    rank: dict[tuple[str, str], int],
    vocab: dict[str, int],
) -> list[int]:
    """BPE-encode one pre-token under an arbitrary well-formed merge
    table → token ids (repeated leftmost-best-rank merge; see module
    docstring for the equivalence argument — it holds for ANY table whose
    merge components are base chars or earlier products, which both the
    shipped table (asserted at import) and `train_merges` output (by
    construction: a pair involving a later product has count 0 when the
    earlier merge is learned) satisfy)."""
    return [vocab.get(t, -1) for t in _merge_tokens(list(word), rank)]


def encode(word: str) -> list[int]:
    """`encode_with` under the shipped demo table."""
    return encode_with(word, _MERGE_RANK, VOCAB_ID)


def _make_ids_udf(
    rank: dict[tuple[str, str], int],
    vocab: dict[str, int],
    to_tokens=list,
):
    """Arrow-batched word → token-ids UDF over the given merge table.
    The closure ships the table to executors (bounded: the shipped demo
    table or a BPE_TRAIN_MERGES-row trained one, never data-sized).
    ``to_tokens`` turns a word into its base token list — ``list`` for
    char-level, ``word_byte_tokens`` for byte-level."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def ids_udf(words: pd.Series) -> pd.Series:
        # input is the DISTINCT word table, so the per-word memo only
        # helps across batch boundaries — kept because it is free.
        memo: dict[str, list[int]] = {}

        def enc(w: str) -> list[int]:
            ids = memo.get(w)
            if ids is None:
                ids = memo[w] = [
                    vocab.get(t, -1)
                    for t in _merge_tokens(to_tokens(w), rank)
                ]
            return ids

        return words.apply(enc)

    return ids_udf


_bpe_ids_udf = _make_ids_udf(_MERGE_RANK, VOCAB_ID)
_byte_ids_udf = _make_ids_udf(
    _BYTE_MERGE_RANK, BYTE_VOCAB_ID, to_tokens=word_byte_tokens
)


def doc_word_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, word) — pre-tokenized word occurrences in document
    order. NULL/empty texts produce no rows (rejoined later)."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(PRETOK_RE), 0)
        ).alias("pos", "word"),
    )


def doc_word_rows_bytes(docs: DataFrame) -> DataFrame:
    """Byte-level twin of `doc_word_rows`: unicode-aware pre-tokenizer,
    case-preserving (no lower() — see PRETOK_BYTES_RE). Same narrow
    posexplode shape; the byte decomposition happens later, per DISTINCT
    word, inside the Arrow UDF."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all("text", F.lit(PRETOK_BYTES_RE), 0)
        ).alias("pos", "word"),
    )


def word_ids(dw: DataFrame, ids_udf=None) -> DataFrame:
    """(word, ids) — the BPE vocabulary map, one Python encode per
    DISTINCT word (under `ids_udf`, default = shipped table). No hint on
    the later join: AQE broadcasts this map while it is small and falls
    back to shuffle when the vocabulary outgrows the broadcast threshold
    at scale."""
    return dw.select("word").distinct().select(
        "word", (ids_udf or _bpe_ids_udf)("word").alias("ids")
    )


def doc_token_counts_pre_rejoin(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) for every document WITH AT LEAST ONE WORD — the
    per-doc aggregate BEFORE the wordless-doc rejoin. The ONE byte-level
    tokenizer definition (r16 ADVICE item 3): `doc_token_counts` adds the
    docs-LEFT-join that restores wordless/NULL texts as 0, and
    streaming's per-batch token-budget delta (streams.py) rides its own
    columns through that same LEFT join instead — both consume THIS
    aggregate, so a tokenizer change lands in both paths by construction."""
    dw = doc_word_rows_bytes(docs)
    return (
        dw.join(word_ids(dw, _byte_ids_udf), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.size("ids")).alias("n_tokens"))
    )


def doc_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) for EVERY document (0 for wordless/NULL texts) —
    the training-token budget `pipeline_seq_pack` packs on. BYTE-LEVEL
    since round 12: the char-level count budgeted a non-Latin document as
    a pile of <unk> characters (semantically wrong, not approximate), so
    anything consuming budgets uses the byte table — every id is real on
    any input."""
    per_doc = doc_token_counts_pre_rejoin(docs)
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
_BASE_VALUES = ", ".join(f"({_q(c)}, {i})" for i, c in enumerate(BASE_CHARS))

# byte-table twins — hex tokens are pure ASCII, so the embedded SQL stays
# ASCII whatever scripts the table covers.
_BYTE_MERGES_VALUES = ", ".join(
    f"({_q(a)}, {_q(b)}, {r})" for r, (a, b) in enumerate(BYTE_MERGES)
)
_BYTE_VOCAB_VALUES = ", ".join(
    f"({_q(t)}, {i})"
    for t, i in sorted(BYTE_VOCAB_ID.items(), key=lambda kv: kv[1])
)

# (doc_id, pos, word) — pre-tokenized word occurrences, the shared root
# of every oracle in this module (tokenize, train, trained-tokenize).
_DW_CTE = f"""
dw AS (
    SELECT doc_id, i AS pos, words[i] AS word
    FROM (SELECT doc_id,
                 regexp_extract_all(lower(text), '{PRETOK_RE}') AS words
          FROM documents),
         unnest(range(1, len(words)+1)) AS t(i)
)"""

# byte-level twin: unicode pre-tokenizer, case-preserving (no lower()).
_DWB_CTE = f"""
dw AS (
    SELECT doc_id, i AS pos, words[i] AS word
    FROM (SELECT doc_id,
                 regexp_extract_all(text, '{PRETOK_BYTES_RE}') AS words
          FROM documents),
         unnest(range(1, len(words)+1)) AS t(i)
)"""


_CHAR_BASE_CTE = """
base AS (
    SELECT word,
           list_transform(range(1, len(word)+1), i -> word[i]) AS toks,
           0 AS it
    FROM uw
)"""

# byte-level base: each word's UTF-8 bytes as 2-char hex tokens — DuckDB's
# hex(encode(word)) is uppercase, matching Python's "%02X" images.
_BYTE_BASE_CTE = """
base AS (
    SELECT word,
           list_transform(range(1, len(h)//2 + 1),
                          i -> substr(h, 2*i-1, 2)) AS toks,
           0 AS it
    FROM (SELECT word, hex(encode(word)) AS h FROM uw)
)"""


def _word_ctes_after_dw(merges_body: str, base_cte: str = _CHAR_BASE_CTE) -> str:
    """distinct words → recursive merge application → final token list
    per word, under an arbitrary ``merges(a, b, rnk)`` CTE body (the
    fixed VALUES table, or a projection of the trained one) and an
    arbitrary ``base(word, toks, it)`` seed (chars or hex bytes — the
    merge recursion is representation-agnostic). Each
    recursion step applies the leftmost occurrence of the best-ranked
    applicable pair (ORDER BY rnk, i) to each still-active word; words
    with no applicable merge drop out and ``arg_max(toks, it)`` recovers
    each word's final state."""
    return f"""
merges(a, b, rnk) AS ({merges_body}),
uw(word) AS (SELECT DISTINCT word FROM dw),
{base_cte},
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


# Fixed-table instance: word occurrences + recursive tokenization under
# the shipped MERGES. Embed after ``WITH RECURSIVE`` in an oracle.
ORACLE_WORD_CTES = (
    _DW_CTE + "," + _word_ctes_after_dw(f"VALUES {_MERGES_VALUES}")
)

# Byte-table instance: unicode pre-tokens, hex-byte seeds, BYTE_MERGES.
ORACLE_WORD_CTES_BYTES = (
    _DWB_CTE
    + ","
    + _word_ctes_after_dw(
        f"VALUES {_BYTE_MERGES_VALUES}", base_cte=_BYTE_BASE_CTE
    )
)

# (doc_id, n_tokens) twin of ``doc_token_counts`` — every document, 0 for
# wordless; BYTE-LEVEL, like the function (see its docstring). Reused by
# the pipeline_seq_pack oracle.
ORACLE_DOC_TOKENS_CTES = f"""{ORACLE_WORD_CTES_BYTES},
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

# wtoks + vocab → per-doc aggregates: shared tail of the fixed-table,
# trained-table, and byte-table tokenize oracles (expects ``wtoks`` and
# ``vocab(tok, tid)`` CTEs in scope; ``n_base`` is the first merged-token
# id — N_BASE for char tables, N_BYTES for byte tables).
def _tokenize_tail(n_base: int) -> str:
    return f"""
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
           CAST(sum(len(list_filter(ids, x -> x >= {n_base}))) AS BIGINT)
               AS n_merged,
           CAST(sum(list_sum(ids)) AS BIGINT) AS id_checksum,
           array_to_string(
               list_slice(
                   flatten(list(ids ORDER BY dw.pos)
                           FILTER (WHERE dw.pos <= {PREVIEW_K})),
                   1, {PREVIEW_K}),
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
"""


_TOKENIZE_TAIL = _tokenize_tail(N_BASE)


def _tokenize_docs(
    docs: DataFrame,
    ids_udf=None,
    word_rows=doc_word_rows,
    n_base: int = N_BASE,
) -> DataFrame:
    """The shared tokenize plan (see `text_bpe_tokenize` docstring) under
    an arbitrary word → ids UDF (default = shipped table), pre-tokenizer
    (char-level `doc_word_rows` or byte-level `doc_word_rows_bytes`), and
    first-merged-id boundary (N_BASE / N_BYTES). The preview
    collect is bounded BEFORE aggregation: the first PREVIEW_K token ids
    can only come from the first PREVIEW_K words (every word is ≥ 1
    token), so only rows with pos < PREVIEW_K enter the collect_list —
    per-doc aggregation state is O(PREVIEW_K), never O(doc tokens) (a
    book-length document would otherwise materialize its entire id
    sequence inside the ObjectHashAggregate just to be sliced to 24).
    The sums stream with no per-row state either way."""
    dw = word_rows(docs)
    joined = dw.join(word_ids(dw, ids_udf), "word")
    ordered_ids = F.flatten(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("pos") < PREVIEW_K, F.struct("pos", "ids")
                    )
                )
            ),
            lambda s: s["ids"],
        )
    )
    ds = joined.groupBy("doc_id").agg(
        F.sum(F.size("ids")).alias("n_tokens"),
        F.sum(F.size(F.filter("ids", lambda x: x >= F.lit(n_base)))).alias(
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


@query(
    "text_bpe_tokenize",
    oracle=f"""
WITH RECURSIVE {ORACLE_WORD_CTES},
vocab(tok, tid) AS (VALUES {_VOCAB_VALUES}),
{_TOKENIZE_TAIL}
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
    return _tokenize_docs(load(spark, sf_dir, "documents"))


@query(
    "text_bpe_tokenize_bytes",
    oracle=f"""
WITH RECURSIVE {ORACLE_WORD_CTES_BYTES},
vocab(tok, tid) AS (VALUES {_BYTE_VOCAB_VALUES}),
{_tokenize_tail(N_BYTES)}
""",
)
def text_bpe_tokenize_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-level BPE tokenization — the production tokenizer design
    (GPT-2's byte-level base vocabulary): pre-tokens decompose into UTF-8
    bytes (ids 0-255) compressed by learned byte merges (ids 256+), so
    EVERY document in EVERY script gets a real token budget — a Cyrillic
    or CJK doc tokenizes to genuine ids, never the char-level family's
    <unk>/-1. Case-preserving, unicode-letter-run pre-tokenizer (see
    PRETOK_BYTES_RE). Output mirrors `text_bpe_tokenize` (n_tokens /
    n_merged / id_checksum / first-{PREVIEW_K} preview), pinning the full
    tokenization cross-engine: the oracle rebuilds the identical byte
    merges over hex-byte seeds (hex(encode(word))) in a recursive CTE.

    Plan: identical to `text_bpe_tokenize` — per-DISTINCT-word Arrow UDF,
    corpus-sized work all JVM-side, AQE-broadcast vocab join with a
    pinned SortMergeJoin fallback (tests/test_plans.py) — byte-level only
    changes what the UDF computes per word, not the Spark plan shape.
    Reference analog: the per-word encode pass of mapreduce.erl:260-295,
    generalized from bigram emission to byte-merge encoding."""
    return _tokenize_docs(
        load(spark, sf_dir, "documents"),
        _byte_ids_udf,
        word_rows=doc_word_rows_bytes,
        n_base=N_BYTES,
    )


# ---------------------------------------------------------------------------
# BPE TRAINING — learn the merge table from the corpus, the same
# trained-artifact pattern as similarity.ivf_centroids / pq_codebooks:
# a DETERMINISTIC bounded sample collects to the driver, pure-Python
# training replays bit-identically in the DuckDB oracle (integer pair
# counts, total-order tie-breaks), and the learned structure comes back
# as a small DataFrame a production pipeline would persist and ship.

# Rounds to learn. Each round picks argmax-count adjacent pair (ties →
# lexicographically smallest pair — UTF-8 byte order, identical in
# Python tuple compare, Spark UTF8String, and DuckDB VARCHAR ORDER BY)
# and merges all its occurrences leftmost-greedy. Demo-scale
# configuration, like IVF_K/IVF_ITERS (similarity.py): a production
# tokenizer trains 10k+ merges, and the cost model holds — each round is
# one pass over the ≤ BPE_TRAIN_CAP sample regardless of corpus size,
# and the oracle's unrolled CTE chain grows linearly in rounds.
BPE_TRAIN_MERGES = 12
# Training reads the TOP-N distinct words by (count DESC, word): the
# driver-side collect is bounded by design at any corpus size (the
# IVF_TRAIN_CAP move, similarity.py) — at 100 TB the head of the word
# frequency distribution carries almost all pair mass, which is why
# production BPE trainers also train on frequency-truncated word lists.
BPE_TRAIN_CAP = 50_000


def _apply_pair(toks: list[str], a: str, b: str) -> list[str]:
    """Merge all occurrences of (a, b) in one leftmost-greedy pass —
    overlaps consume left-first: 'aaa' + (a,a) → [aa, a]."""
    out: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def train_merges(
    word_counts: list[tuple[str, int]],
    to_tokens=list,
) -> list[tuple[str, str, int]]:
    """Classic BPE training (Sennrich et al. 2016) over (word, count)
    rows: per round, count adjacent token pairs weighted by word count
    (all positions — overlapping occurrences each count, the standard
    formulation), take the argmax (ties → smallest pair), merge its
    occurrences everywhere, repeat. Returns [(lhs, rhs, pair_count)] in
    learned order; stops early when no adjacent pairs remain. Every
    component of merge k is a base token or an earlier product (a pair
    involving a later product has count 0 when k is learned), so the
    output always satisfies the well-formedness invariant
    `encode_with`'s equivalence argument needs. ``to_tokens`` seeds each
    word — ``list`` (chars) or ``word_byte_tokens`` (hex bytes); the
    round algebra is representation-agnostic, and tie-breaks stay
    consistent because hex images are ASCII ([0-9A-F]), ordered the same
    by Python tuple compare, UTF8String, and DuckDB VARCHAR."""
    seqs: list[tuple[list[str], int]] = [
        (to_tokens(w), int(c)) for w, c in word_counts
    ]
    out: list[tuple[str, str, int]] = []
    for _ in range(BPE_TRAIN_MERGES):
        counts: dict[tuple[str, str], int] = {}
        for toks, c in seqs:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((a, b, pc))
        seqs = [
            ((_apply_pair(toks, a, b) if len(toks) > 1 else toks), c)
            for toks, c in seqs
        ]
    return out


# (applicationId, abspath, corpus fingerprint) -> trained merge list.
# Train ONCE per (session, corpus): bench passes and the driver's
# run-twice compare would otherwise re-collect and re-train per
# invocation. The value is the driver-side artifact itself (≤
# BPE_TRAIN_MERGES tuples, not Spark blocks), so entries are bytes-cheap
# and carry no lease; the corpus fingerprint invalidates on in-place
# rewrites, and a None fingerprint (missing/unreadable corpus) is
# UNCACHEABLE — same policy as dedup._shared_materialize.
_TRAINED_CACHE: dict = {}


def _trained_table(spark: SparkSession, sf_dir: str, byte_level: bool = False):
    """Collect the capped training sample and train. The collect is the
    only driver-side materialization: ≤ BPE_TRAIN_CAP (word, count) rows,
    picked by TakeOrderedAndProject (no global sort materializes).
    ``byte_level`` trains over the byte family's pre-tokens and hex-byte
    seeds instead of lowercased char seeds."""
    from .dedup import _corpus_fingerprint

    fp = _corpus_fingerprint(sf_dir)
    key = None
    if fp is not None:
        key = (
            spark.sparkContext.applicationId,
            os.path.abspath(sf_dir),
            fp,
            byte_level,
        )
        hit = _TRAINED_CACHE.get(key)
        if hit is not None:
            return hit
    docs = load(spark, sf_dir, "documents")
    word_rows = doc_word_rows_bytes if byte_level else doc_word_rows
    rows = (
        word_rows(docs)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(BPE_TRAIN_CAP)
        .collect()
    )
    trained = train_merges(
        [(r.word, r.cnt) for r in rows],
        to_tokens=word_byte_tokens if byte_level else list,
    )
    if key is not None:
        _TRAINED_CACHE[key] = trained
    return trained


def _apply_round(src: str, pair: str, dst: str, tag: str) -> str:
    """One unrolled merge-application round as chained CTEs: rewrite
    every word in ``src(word, cnt, toks)`` by merging all occurrences of
    the single pair in ``{pair}(a, b, ...)`` into ``dst``. This is the
    window-function form of the leftmost-greedy single pass
    (`_apply_pair`): flag matching positions against the ORIGINAL token
    list, group consecutive matches into islands (consecutive flags only
    arise when lhs = rhs), merge at even island offsets, drop each
    merge's consumed right neighbor (lag()), rebuild the list in position
    order. Equivalence to `_apply_pair` is pinned property-wise in
    tests/test_bpe.py. All CTEs MATERIALIZED: inlining would re-expand
    the whole upstream round chain at every reference (exponential), and
    none of this sits inside a recursive CTE (where DuckDB 1.0 serves
    materialized CTEs incompletely — the reason the trained tokenizer
    unrolls rounds instead of reusing the recursive fixed-table CTE)."""
    return f"""
m{tag} AS MATERIALIZED (
    SELECT word, cnt, i, toks[i] AS tok,
           coalesce(toks[i] = (SELECT a FROM {pair})
                    AND i < len(toks)
                    AND toks[i+1] = (SELECT b FROM {pair}), false) AS m
    FROM {src}, unnest(range(1, len(toks)+1)) AS t(i)
),
g{tag} AS MATERIALIZED (
    SELECT *, CASE WHEN m THEN i - row_number()
                   OVER (PARTITION BY word, m ORDER BY i) END AS isl
    FROM m{tag}
),
e{tag} AS MATERIALIZED (
    SELECT *, m AND ((i - min(i) OVER (PARTITION BY word, isl)) % 2 = 0)
              AS mg
    FROM g{tag}
),
{dst} AS MATERIALIZED (
    SELECT word, cnt,
           list(CASE WHEN mg THEN tok || (SELECT b FROM {pair})
                     ELSE tok END ORDER BY i) AS toks
    FROM (SELECT *,
                 coalesce(lag(mg) OVER (PARTITION BY word ORDER BY i),
                          false) AS skip
          FROM e{tag})
    WHERE NOT skip
    GROUP BY word, cnt
)"""


# char vs byte seed expressions for the training / trained-tokenize
# unrolls: chars index the word directly; bytes split hex(encode(word))
# into 2-char images (DuckDB hex is uppercase, matching Python "%02X").
_CHAR_SEED = "list_transform(range(1, len(word)+1), i -> word[i])"
_BYTE_SEED = (
    "list_transform(range(1, len(hex(encode(word)))//2 + 1), "
    "i -> substr(hex(encode(word)), 2*i-1, 2))"
)


def _train_ctes(byte_level: bool = False) -> str:
    """DuckDB twin of `train_merges`, BPE_TRAIN_MERGES rounds unrolled as
    chained (non-recursive) CTEs — the ivf_centroids construction.
    Per round k: p{k} counts adjacent pairs weighted by word count; b{k}
    picks the argmax with a sentinel ('','', -1) union so a pair-less
    round degrades to a no-op instead of an empty join; `_apply_round`
    merges the picked pair everywhere. Ends at ``trained(merge_rank,
    lhs, rhs, pair_count)`` (sentinel rounds — always a suffix —
    filtered out). Expects ``dw`` in scope (the char or byte
    pre-tokenizer's, matching ``byte_level``)."""
    seed = _BYTE_SEED if byte_level else _CHAR_SEED
    parts = [f"""
wc AS MATERIALIZED (
    SELECT word, cnt FROM (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM dw GROUP BY word
    ) ORDER BY cnt DESC, word LIMIT {BPE_TRAIN_CAP}
),
w0 AS MATERIALIZED (
    SELECT word, cnt,
           {seed} AS toks
    FROM wc
)"""]
    for k in range(BPE_TRAIN_MERGES):
        parts.append(f"""
p{k} AS MATERIALIZED (
    SELECT toks[i] AS a, toks[i+1] AS b, sum(cnt) AS pc
    FROM w{k}, unnest(range(1, len(toks))) AS t(i)
    GROUP BY 1, 2
),
b{k} AS MATERIALIZED (
    SELECT a, b, pc FROM (
        SELECT a, b, pc FROM p{k}
        UNION ALL SELECT '', '', -1
    ) ORDER BY pc DESC, a, b LIMIT 1
),{_apply_round(f"w{k}", f"b{k}", f"w{k + 1}", f"t{k}")}""")
    ranks = "\n        UNION ALL ".join(
        f"SELECT {k} AS merge_rank, a AS lhs, b AS rhs, "
        f"CAST(pc AS BIGINT) AS pair_count FROM b{k}"
        for k in range(BPE_TRAIN_MERGES)
    )
    parts.append(f"""
trained AS MATERIALIZED (
    SELECT * FROM (
        {ranks}
    ) WHERE lhs <> ''
)""")
    return ",".join(parts)


def _trained_tokenize_ctes(byte_level: bool = False) -> str:
    """Tokenize ALL distinct corpus words under the trained table —
    WITHOUT recursion: with only BPE_TRAIN_MERGES merges, applying them
    in RANK ORDER (one all-occurrences pass each, `_apply_round`) is
    output-identical to the engine's iterative best-rank application,
    because any pair created by applying merge p has rank > p (the module
    docstring's invariant, which trained tables satisfy by construction)
    — so no pass can re-enable an earlier rank. Pinned property-wise in
    tests/test_bpe.py. The non-recursive form matters: DuckDB 1.0 serves
    MATERIALIZED CTEs (here: the b{{k}} best-pair rows) incompletely
    inside a recursive CTE's recursion step, which silently dropped all
    but the first merge when this oracle reused the fixed-table recursive
    CTE. Ends at ``wtoks(word, toks)``; expects ``dw`` and the training
    chain in scope."""
    seed = _BYTE_SEED if byte_level else _CHAR_SEED
    parts = [f"""
v0 AS MATERIALIZED (
    SELECT word, CAST(0 AS BIGINT) AS cnt,
           {seed} AS toks
    FROM (SELECT DISTINCT word FROM dw)
)"""]
    for k in range(BPE_TRAIN_MERGES):
        parts.append(
            _apply_round(f"v{k}", f"b{k}", f"v{k + 1}", f"v{k}")
        )
    parts.append(f"""
wtoks AS (SELECT word, toks FROM v{BPE_TRAIN_MERGES})""")
    return ",".join(parts)


@query(
    "bpe_train",
    oracle=f"""
WITH {_DW_CTE},
{_train_ctes()}
SELECT merge_rank, lhs, rhs, pair_count FROM trained
""",
)
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table as a DataFrame — (merge_rank, lhs, rhs,
    pair_count) in learned order. Completes the tokenizer family the way
    ivf_centroids completes the ANN family: the index/tokenizer STRUCTURE
    is itself a queryable, oracle-checked table, trained deterministically
    (integer counts, total-order tie-breaks) so the DuckDB twin re-derives
    it bit-for-bit by unrolling the same rounds in SQL. Reference analog:
    the corpus-statistics pass of mapreduce.erl:260-295, generalized from
    bigram counting to iterative best-pair extraction."""
    trained = _trained_table(spark, sf_dir)
    return spark.createDataFrame(
        [(r, a, b, int(pc)) for r, (a, b, pc) in enumerate(trained)],
        "merge_rank int, lhs string, rhs string, pair_count bigint",
    )


@query(
    "text_bpe_tokenize_trained",
    oracle=f"""
WITH {_DW_CTE},
{_train_ctes()},
{_trained_tokenize_ctes()},
vocab(tok, tid) AS (
    SELECT tok, min(tid) FROM (
        SELECT * FROM (VALUES {_BASE_VALUES}) b(tok, tid)
        UNION ALL
        SELECT lhs || rhs, {N_BASE} + merge_rank FROM trained
    ) GROUP BY tok
),
{_TOKENIZE_TAIL}
""",
)
def text_bpe_tokenize_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`text_bpe_tokenize` with the TRAINED merge table in place of the
    shipped demo constants — the end-to-end production shape: learn the
    tokenizer from the corpus (`bpe_train`), then budget the same corpus
    with it. Same plan as text_bpe_tokenize plus the bounded training
    collect; token ids are BASE_CHARS then merge products by rank (two
    pairs can yield one product string — ('a','bc') and ('ab','c') —
    so the vocab keeps the FIRST rank's id; the oracle's min(tid)
    mirrors that)."""
    docs = load(spark, sf_dir, "documents")
    trained = _trained_table(spark, sf_dir)
    rank = {(a, b): r for r, (a, b, _) in enumerate(trained)}
    vocab = {c: i for i, c in enumerate(BASE_CHARS)}
    for r, (a, b, _) in enumerate(trained):
        vocab.setdefault(a + b, N_BASE + r)
    return _tokenize_docs(docs, _make_ids_udf(rank, vocab))


_BYTE_BASE_VALUES = ", ".join(f"('{i:02X}', {i})" for i in range(N_BYTES))


@query(
    "bpe_train_bytes",
    oracle=f"""
WITH {_DWB_CTE},
{_train_ctes(byte_level=True)}
SELECT merge_rank, lhs, rhs, pair_count FROM trained
""",
)
def bpe_train_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bpe_train` over the BYTE family: learn byte merges from the
    corpus (hex-byte seeds, case-preserving unicode pre-tokens), the
    production training shape — GPT-2's merges.txt IS a learned byte
    merge table. Same bounded-sample plan (TakeOrderedAndProject top-cap
    collect, pure-Python rounds) and the same unrolled-CTE oracle, with
    byte seeds; hex images are ASCII so the argmax tie-break order is
    identical in Python, Spark, and DuckDB. Output (merge_rank, lhs,
    rhs, pair_count) — lhs/rhs are hex-byte-image tokens."""
    trained = _trained_table(spark, sf_dir, byte_level=True)
    return spark.createDataFrame(
        [(r, a, b, int(pc)) for r, (a, b, pc) in enumerate(trained)],
        "merge_rank int, lhs string, rhs string, pair_count bigint",
    )


@query(
    "text_bpe_tokenize_trained_bytes",
    oracle=f"""
WITH {_DWB_CTE},
{_train_ctes(byte_level=True)},
{_trained_tokenize_ctes(byte_level=True)},
vocab(tok, tid) AS (
    SELECT tok, min(tid) FROM (
        SELECT * FROM (VALUES {_BYTE_BASE_VALUES}) b(tok, tid)
        UNION ALL
        SELECT lhs || rhs, {N_BYTES} + merge_rank FROM trained
    ) GROUP BY tok
),
{_tokenize_tail(N_BYTES)}
""",
)
def text_bpe_tokenize_trained_bytes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FULL production tokenizer path: learn BYTE merges from the
    corpus (`bpe_train_bytes`), then budget the same corpus with them —
    train-then-tokenize where both halves are byte-level, so every
    script gets real ids from a corpus-fitted table. Plan = the
    text_bpe_tokenize_bytes tokenize plan + the bounded training
    collect; ids are the 256 byte values then merge products by rank
    (first rank wins on duplicate product strings, mirrored by the
    oracle's min(tid))."""
    docs = load(spark, sf_dir, "documents")
    trained = _trained_table(spark, sf_dir, byte_level=True)
    rank = {(a, b): r for r, (a, b, _) in enumerate(trained)}
    vocab = {f"{i:02X}": i for i in range(N_BYTES)}
    for r, (a, b, _) in enumerate(trained):
        vocab.setdefault(a + b, N_BYTES + r)
    return _tokenize_docs(
        docs,
        _make_ids_udf(rank, vocab, to_tokens=word_byte_tokens),
        word_rows=doc_word_rows_bytes,
        n_base=N_BYTES,
    )
