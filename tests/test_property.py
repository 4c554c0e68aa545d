"""Property-based re-proof of SURVEY.md §2.3 Q1: the countCombos skip-rule
state machine (mapreduce.erl:260-295) is output-equivalent to the naive
"all overlapping adjacent pairs, keep ^[a-z]{2}$" extraction.

The survey proved this by exhaustive enumeration + fuzz + full-dataset
identity; this test keeps the proof alive against regressions in the Python
port (the declarative Spark expression is a direct transcription of the
naive form, so equivalence here covers the hot path too). Pure Python on
both sides — no Spark session needed, so hypothesis can run thousands of
examples in milliseconds.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from erlang_mapreduce_spark.functions.udfs import bigram_state_machine

_PAIR = re.compile(r"^[a-z]{2}$")


def naive_pairs(word: str) -> list[str]:
    return [
        word[i : i + 2]
        for i in range(len(word) - 1)
        if _PAIR.match(word[i : i + 2])
    ]


# the alphabet the reference's data actually exercises: letters, the
# apostrophe (contractions in test.ngl), digits, '&', and some unicode
WORD_ALPHABET = "abcz'19&é "


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet=WORD_ALPHABET, max_size=12))
def test_skip_rule_equals_naive(word: str):
    assert bigram_state_machine(word) == naive_pairs(word)


@given(st.text(max_size=24))
@settings(max_examples=500, deadline=None)
def test_skip_rule_equals_naive_any_unicode(word: str):
    assert bigram_state_machine(word) == naive_pairs(word)


def test_known_edge_cases():
    assert bigram_state_machine("doesn't") == ["do", "oe", "es", "sn"]
    assert bigram_state_machine("a") == []
    assert bigram_state_machine("") == []
    assert bigram_state_machine("1st") == ["st"]
    assert bigram_state_machine("a'b") == []  # skip-2 drops the (b-less) window


# ---------------------------------------------------------------------------
# Misra-Gries sketch pass of heavy_hitters: pure-pandas generator, fuzzed
# without a Spark session. For ANY stream, ANY batch boundaries, ANY
# partition split, and ANY (k, vocab_cap), the merged candidate set must
# contain every key with global count > total/k (no false negatives — the
# exact recount then removes false positives), and each partition must emit
# at most k candidate rows plus exactly one NULL total-sentinel row.
# ---------------------------------------------------------------------------


@st.composite
def _mg_case(draw):
    vocab = draw(st.integers(min_value=1, max_value=40))
    words = draw(
        st.lists(
            st.integers(min_value=0, max_value=vocab - 1),
            min_size=0,
            max_size=300,
        )
    )
    k = draw(st.integers(min_value=2, max_value=16))
    vocab_cap = draw(st.integers(min_value=k + 1, max_value=48))
    n_parts = draw(st.integers(min_value=1, max_value=4))
    batch = draw(st.integers(min_value=1, max_value=50))
    return [f"w{w}" for w in words], k, vocab_cap, n_parts, batch


@settings(max_examples=300, deadline=None)
@given(_mg_case())
def test_mg_sketch_no_false_negatives(case):
    import pandas as pd

    from erlang_mapreduce_spark.operators.curation import mg_sketch_partition

    words, k, vocab_cap, n_parts, batch = case
    total = len(words)
    from collections import Counter

    truth = {w for w, c in Counter(words).items() if c > total / k}

    candidates: set = set()
    for p in range(n_parts):
        part = words[p::n_parts]  # deterministic round-robin split
        batches = [
            pd.DataFrame({"word": part[i : i + batch]})
            for i in range(0, len(part), batch)
        ] or [pd.DataFrame({"word": pd.Series([], dtype="object")})]
        out = pd.concat(list(mg_sketch_partition(k, vocab_cap)(iter(batches))))
        sentinel = out[out["word"].isnull()]
        emitted = out[out["word"].notnull()]
        assert len(sentinel) == 1 and int(sentinel["c"].iloc[0]) == len(part)
        assert len(emitted) <= k, "per-partition emission exceeds k"
        candidates |= set(emitted["word"])
    missing = truth - candidates
    assert not missing, (missing, total, k)


@st.composite
def _gram_hash_case(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    bits60 = st.integers(min_value=0, max_value=(1 << 60) - 1)
    return (
        draw(st.lists(bits60, min_size=n, max_size=n)),
        draw(st.lists(bits60, min_size=n, max_size=n)),
    )


@settings(max_examples=200, deadline=None)
@given(_gram_hash_case())
def test_minhash_signature_matches_pure_python(case):
    """The vectorized numpy signature (the op's hot path) must agree
    element-for-element with a direct pure-Python transcription of the
    DuckDB oracle's SQL — (h1%p + i*((h2%(p-1))+1)) % p, min over grams —
    on arbitrary 60-bit hash inputs. Guards the int64 broadcast arithmetic
    (overflow, precedence, axis) that the sf-fixture oracle comparison
    only exercises on realistic gram profiles."""
    from erlang_mapreduce_spark.operators.dedup import (
        MERSENNE_P as p,
        N_HASH,
        minhash_signature,
    )

    ghs, gh2s = case
    expect = [
        min(
            ((h1 % p) + i * ((h2 % (p - 1)) + 1)) % p
            for h1, h2 in zip(ghs, gh2s)
        )
        for i in range(N_HASH)
    ]
    assert list(minhash_signature(ghs, gh2s)) == expect


# --- sort_zorder_layout: the Morton interleave is a bijection with the
# box-bound property the layout op's value rests on ---

from erlang_mapreduce_spark.operators.maintenance import (  # noqa: E402
    ZORDER_BITS,
    _z_interleave_sql,
)


def _py_interleave(x: int, y: int) -> int:
    z = 0
    for i in range(ZORDER_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _py_deinterleave(z: int) -> tuple[int, int]:
    x = y = 0
    for i in range(ZORDER_BITS):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@settings(max_examples=2000, deadline=None)
@given(
    st.integers(0, 2**ZORDER_BITS - 1), st.integers(0, 2**ZORDER_BITS - 1)
)
def test_zorder_interleave_bijective(x: int, y: int):
    assert _py_deinterleave(_py_interleave(x, y)) == (x, y)


@settings(max_examples=500, deadline=None)
@given(
    st.integers(0, 2**ZORDER_BITS - 1),
    st.integers(0, 2**ZORDER_BITS - 1),
    st.integers(0, 2**ZORDER_BITS - 1),
    st.integers(0, 2**ZORDER_BITS - 1),
    st.integers(0, ZORDER_BITS),
)
def test_zorder_bucket_bounds_both_dims(x1, y1, x2, y2, k):
    """Dropping 2k z-bits ⟹ each dimension agrees above its low k bits —
    the bounding-box guarantee test_maintenance pins on real data."""
    if _py_interleave(x1, y1) >> (2 * k) == _py_interleave(x2, y2) >> (2 * k):
        assert x1 >> k == x2 >> k
        assert y1 >> k == y2 >> k


def test_zorder_sql_formula_matches_python():
    """The ONE formula string shared by the Spark projection and the DuckDB
    oracle computes the same interleave as the reference bit loop."""
    import random

    import duckdb

    rng = random.Random(42)
    pairs = [
        (rng.randrange(2**ZORDER_BITS), rng.randrange(2**ZORDER_BITS))
        for _ in range(200)
    ] + [(0, 0), (2**ZORDER_BITS - 1, 2**ZORDER_BITS - 1)]
    values = ", ".join(f"({x}, {y})" for x, y in pairs)
    # operands must be 64-bit: with INT32 inputs DuckDB's checked
    # arithmetic overflows on the `<< 31` term. The real oracle is safe
    # because l_partkey/l_suppkey are BIGINT in the fixture schema.
    got = duckdb.sql(
        f"SELECT {_z_interleave_sql('x', 'y')} FROM ("
        f"  SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y"
        f"  FROM (VALUES {values}) s(x, y))"
    ).fetchall()
    assert [g[0] for g in got] == [_py_interleave(x, y) for x, y in pairs]


# --- analytics_pattern_match: the regexes mean what the docstring says ---


def _exists_v_then_p_no_c(s: str) -> bool:
    for i, a in enumerate(s):
        if a != "v":
            continue
        for j in range(i + 1, len(s)):
            if s[j] == "c":
                break
            if s[j] == "p":
                return True
    return False


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet="vcpse", max_size=20))
def test_pattern_direct_purchase_semantics(s: str):
    assert bool(re.search(r"v[^c]*p", s)) == _exists_v_then_p_no_c(s)


# ---------------------------------------------------------------------------
# kmv_sketch_partition (relational.py) — the per-partition KMV fold is pure
# pandas, property-testable without Spark. Mergeability contract: for ANY
# (grp, h) stream, ANY batch boundaries, and ANY k, the fold must emit
# exactly the k smallest DISTINCT hashes per group (NULL group included,
# NULL hashes dropped) — independent of how rows are batched, which is the
# property that makes the streaming twin (stream_kmv_distinct) provably
# equal the one-shot batch sketch.
# ---------------------------------------------------------------------------


@st.composite
def _kmv_case(draw):
    n = draw(st.integers(min_value=0, max_value=200))
    grps = draw(st.lists(
        st.sampled_from(["a", "b", "c", None]), min_size=n, max_size=n))
    hs = draw(st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
        min_size=n, max_size=n))
    k = draw(st.integers(min_value=1, max_value=12))
    batch = draw(st.integers(min_value=1, max_value=40))
    return grps, hs, k, batch


@settings(max_examples=300, deadline=None)
@given(_kmv_case())
def test_kmv_fold_is_batch_invariant(case):
    import pandas as pd

    from erlang_mapreduce_spark.operators.relational import (
        kmv_sketch_partition,
    )

    grps, hs, k, batch = case
    df = pd.DataFrame({"grp": grps, "h": pd.array(hs, dtype="Int64")})
    batches = [df.iloc[i:i + batch] for i in range(0, max(len(df), 1), batch)]
    (out,) = list(kmv_sketch_partition(k)(iter(batches)))
    got = {}
    for g, h in zip(out["grp"], out["h"]):
        key = None if pd.isna(g) else g
        got.setdefault(key, []).append(int(h))
    want = {}
    for g, h in zip(grps, hs):
        if h is not None:
            want.setdefault(g, set()).add(h)
    want = {g: sorted(s)[:k] for g, s in want.items()}
    assert {g: sorted(v) for g, v in got.items()} == want


# --- round-9 identities -----------------------------------------------------
# Both re-proved here in pure Python against brute force, independent of
# Spark AND DuckDB: the oracle hash-check would miss a bug both engines'
# formulations share; a third, direct implementation cannot.


@st.composite
def _blowup_case(draw):
    """A rep-level similarity graph with group sizes and eligibility: k
    verbatim groups, sizes 1-4, random rep edges; any group with an edge
    is forced eligible (in the engine an edge implies a nonempty gram
    set)."""
    k = draw(st.integers(2, 6))
    sizes = [draw(st.integers(1, 4)) for _ in range(k)]
    elig = [draw(st.booleans()) for _ in range(k)]
    edges = set()
    for a in range(k):
        for b in range(a + 1, k):
            if draw(st.booleans()):
                edges.add((a, b))
                elig[a] = elig[b] = True
    return sizes, elig, sorted(edges)


@settings(max_examples=300, deadline=None)
@given(_blowup_case())
def test_triangle_blowup_identity(case):
    """graph_triangle_count's clique blow-up identity (operators/graph.py):
    per-member triangle counts over the expanded graph equal
    [elig]*C(n-1,2) + (n-1)*S1 + S2 + W computed at rep level."""
    sizes, elig, edges = case
    k = len(sizes)
    # brute force on the expanded member graph
    nodes = [(g, i) for g in range(k) for i in range(sizes[g])]
    adj = {n: set() for n in nodes}

    def connect(x, y):
        adj[x].add(y)
        adj[y].add(x)

    for g in range(k):
        if elig[g]:
            for i in range(sizes[g]):
                for j in range(i + 1, sizes[g]):
                    connect((g, i), (g, j))
    for a, b in edges:
        for i in range(sizes[a]):
            for j in range(sizes[b]):
                connect((a, i), (b, j))
    brute = {}
    for n in nodes:
        nb = sorted(adj[n])
        brute[n] = sum(
            1
            for x in range(len(nb))
            for y in range(x + 1, len(nb))
            if nb[y] in adj[nb[x]]
        )
    # the formula, computed at rep level
    nbrs = {g: set() for g in range(k)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    tri_rep = [
        (a, b, c)
        for a in range(k)
        for b in range(a + 1, k)
        for c in range(b + 1, k)
        if (a, b) in edges and (a, c) in edges and (b, c) in edges
    ]
    for g in range(k):
        n = sizes[g]
        t = (
            (elig[g] and (n - 1) * (n - 2) // 2 or 0)
            + (n - 1) * sum(sizes[b] for b in nbrs[g])
            + sum(sizes[b] * (sizes[b] - 1) // 2 for b in nbrs[g])
            + sum(
                sizes[x] * sizes[y]
                for (a, b, c) in tri_rep
                for (own, x, y) in ((a, b, c), (b, a, c), (c, a, b))
                if own == g
            )
        )
        for i in range(sizes[g]):
            assert brute[(g, i)] == t, (case, g, i, brute[(g, i)], t)


@st.composite
def _token_pair_case(draw):
    """Two token sequences over a tiny alphabet (forces real overlaps)."""
    alpha = ("a", "b", "c")
    A = draw(st.lists(st.sampled_from(alpha), min_size=0, max_size=25))
    B = draw(st.lists(st.sampled_from(alpha), min_size=0, max_size=25))
    return A, B


@settings(max_examples=500, deadline=None)
@given(_token_pair_case())
def test_substring_anchor_run_identity(case):
    """dedup_substring's gaps-and-islands identity (operators/dedup.py):
    the longest common contiguous token run of length >= K between two
    docs equals the longest maximal run of positionally-consecutive
    shared K-gram anchors on a (pos_a - pos_b) diagonal."""
    A, B = case
    K = 3
    # brute force: longest common contiguous run via DP
    best = 0
    dp = [[0] * (len(B) + 1) for _ in range(len(A) + 1)]
    for i in range(1, len(A) + 1):
        for j in range(1, len(B) + 1):
            if A[i - 1] == B[j - 1]:
                dp[i][j] = dp[i - 1][j - 1] + 1
                best = max(best, dp[i][j])
    # anchor-run construction (the operator's shape)
    anchors = [
        (i, j)
        for i in range(len(A) - K + 1)
        for j in range(len(B) - K + 1)
        if A[i : i + K] == B[j : j + K]
    ]
    by_diag: dict = {}
    for i, j in anchors:
        by_diag.setdefault(i - j, set()).add(i)
    runs = 0
    for d, pos in by_diag.items():
        for i in pos:
            if i - 1 not in pos:  # run start
                m = i
                while m + 1 in pos:
                    m += 1
                runs = max(runs, m - i + K)
    if best >= K:
        assert runs == best, (A, B, runs, best)
    else:
        assert runs == 0, (A, B, runs, best)
