"""BPE tokenizer pins — the merge-application algorithm itself.

The oracle hash-match (test_correctness) proves Spark ≡ DuckDB; these
tests prove both equal REAL byte-pair encoding: the one-merge-per-step
leftmost-best-rank formulation (what a recursive CTE can express) is
property-tested against an independent textbook implementation that
merges ALL occurrences of the best-ranked pair left-to-right per step
(the GPT-2 ``merges.txt`` semantics). The equivalence argument
(bpe.py module docstring) holds because a pair created by applying
merge p always has rank > p; hypothesis hunts for counterexamples over
random words AND random well-formed merge tables.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from erlang_mapreduce_spark.operators import bpe


def _textbook_bpe(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Reference semantics: repeatedly pick the best-RANKED pair present
    anywhere in the token list, then merge ALL its occurrences in one
    left-to-right pass (overlaps consume greedily: 'aaa' + (a,a) → [aa,a])."""
    toks = list(word)
    while len(toks) > 1:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        ranked = [(rank[p], p) for p in pairs if p in rank]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def _leftmost_bpe(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """The engine/oracle semantics: one merge per step, leftmost
    occurrence of the lowest-ranked applicable pair (mirrors bpe.encode
    but parameterized by merge table for the property test)."""
    toks = list(word)
    while len(toks) > 1:
        best = None
        for i in range(len(toks) - 1):
            r = rank.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        i = best[1]
        toks[i : i + 2] = [toks[i] + toks[i + 1]]
    return toks


@st.composite
def _merge_tables(draw):
    """Random WELL-FORMED merge tables over a 4-letter alphabet: each
    merge's components are base chars or earlier products (the invariant
    real BPE training guarantees and bpe._validate() asserts)."""
    alphabet = "abcd"
    vocab = list(alphabet)
    merges: list[tuple[str, str]] = []
    products = set()
    n = draw(st.integers(min_value=1, max_value=12))
    for _ in range(n):
        a = draw(st.sampled_from(vocab))
        b = draw(st.sampled_from(vocab))
        if a + b in products or len(a + b) > 8:
            continue
        merges.append((a, b))
        products.add(a + b)
        vocab.append(a + b)
    return merges


@settings(max_examples=400, deadline=None)
@given(
    word=st.text(alphabet="abcd", min_size=0, max_size=16),
    merges=_merge_tables(),
)
def test_leftmost_equals_textbook_on_random_tables(word, merges):
    rank = {p: r for r, p in enumerate(merges)}
    assert _leftmost_bpe(word, rank) == _textbook_bpe(word, rank)


@settings(max_examples=300, deadline=None)
@given(word=st.text(alphabet="etaonrishd ,.", min_size=0, max_size=24))
def test_engine_encode_equals_textbook_on_shipped_table(word):
    """bpe.encode (ids) vs textbook strings under the SHIPPED table."""
    toks = _textbook_bpe(word, bpe._MERGE_RANK)
    assert bpe.encode(word) == [bpe.VOCAB_ID.get(t, -1) for t in toks]


def test_known_encodings():
    inv = {v: k for k, v in bpe.VOCAB_ID.items()}

    def dec(word):
        return [inv.get(i, "<unk>") for i in bpe.encode(word)]

    assert dec("the") == ["the"]
    assert dec("anthem") == ["an", "the", "m"]  # leftmost-best: an|the|m
    assert dec("understanding") == ["u", "nd", "er", "st", "and", "ing"]
    assert dec("zzz") == ["z", "z", "z"]  # no applicable merges
    assert bpe.encode("é") == [-1]  # OOV char → unk id, still 1 token
    assert bpe.encode("") == []


def test_merge_table_well_formed():
    # products strictly after components; ids dense over base + merges
    assert len(bpe.VOCAB_ID) == bpe.N_BASE + len(bpe.MERGES)
    assert sorted(bpe.VOCAB_ID.values()) == list(range(len(bpe.VOCAB_ID)))
    for r, (a, b) in enumerate(bpe.MERGES):
        assert bpe.VOCAB_ID[a] < bpe.N_BASE + r
        assert bpe.VOCAB_ID[b] < bpe.N_BASE + r
        # the invariant the oracle-equivalence proof rests on: a merge's
        # product never participates in an EARLIER merge
        assert bpe.VOCAB_ID[a + b] == bpe.N_BASE + r


def test_doc_token_counts_keeps_wordless_docs(spark):
    df = spark.createDataFrame(
        [(1, "the cat"), (2, None), (3, ""), (4, "   ")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.n_tokens for r in
           bpe.doc_token_counts(df).collect()}
    # 'the' → [the] (1), 'cat' → [c, at] (2); NULL/empty/whitespace → 0
    assert got == {1: 3, 2: 0, 3: 0, 4: 0}
