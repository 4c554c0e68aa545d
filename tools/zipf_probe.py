"""Zipf-skew probe — the one untested 100 TB risk in the text family
(r13 VERDICT task 4).

The fixture corpus has a near-uniform vocabulary, so the window-keyed
text ops (`text_lm_perplexity`'s corpus-count windows partition by `w1`;
`text_unigram_logprob` and `text_tfidf` key aggregates/windows by word or
gram) never face the Zipf head real text has — on English web text the
`the` partition holds ~5% of all bigram-type rows, and a hot WINDOW
partition serializes where a hot JOIN key can be split by AQE.

This probe synthesizes the hazard and measures it:

- **Zipf documents**: docs drawn from a Zipf(s) unigram distribution over
  a fixed vocabulary, seeded numpy — the head word carries ~8-15% of all
  tokens (printed as measured). Probed at 1x (sf0.1-sized: 5,000 docs)
  and 10x (50,000 docs).
- **Skewed lineitem**: ~30% of lineitem rows re-keyed to ONE hot
  l_orderkey (existing key, so join semantics hold); 10x replicates the
  fact side only, so the hot key grows 10x in absolute rows against a
  constant orders build side — the pathological shape join_skew_salted's
  salting exists for.

alpha = log10(t10x/t1x). For a window over a Zipf-keyed relation the
failure signature is alpha drifting ABOVE the op's plain-corpus alpha
(the hot partition's single task becomes the critical path). Results +
a keep-windows/salt decision per op are written into SCALING.md between
the zipf-probe markers (tools/scaling_probe.py preserves that block when
it regenerates the file).

Run on an otherwise idle machine:
    python tools/zipf_probe.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from erlang_mapreduce_spark.ckpt import release_transient_storage  # noqa: E402
from erlang_mapreduce_spark.registry import QUERIES  # noqa: E402
from erlang_mapreduce_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_zipf"
MARK_START = "<!-- zipf-probe:start -->"
MARK_END = "<!-- zipf-probe:end -->"

VOCAB = 10_000
ZIPF_S = 1.2  # exponent; head word ≈ 10% of tokens at this vocab size
DOC_WORDS = 50  # ≈ the fixture's ~300-char docs
N_DOCS_1X = 5_000  # sf0.1 documents row count
HOT_FRACTION = 3  # ~1/3 of lineitem rows re-keyed to the hot order

TEXT_OPS = ("text_lm_perplexity", "text_unigram_logprob", "text_tfidf",
            # r15 additions: the hashed-ngram scorers (a Zipf head word
            # lands ALL its tf in one bucket — does the bucket-keyed agg
            # care?) and the zero-shuffle rule battery (control)
            "sample_dsir", "quality_classifier_score", "text_gopher_rules")
JOIN_OPS = ("join_skew_salted",)


def _zipf_words(rng: np.random.RandomState, n: int) -> np.ndarray:
    """n word indices from a truncated Zipf(ZIPF_S) over VOCAB ranks."""
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = ranks**-ZIPF_S
    p /= p.sum()
    return rng.choice(VOCAB, size=n, p=p)


def build_zipf_docs(path: str, n_docs: int, seed: int) -> float:
    """Write a Zipf documents.parquet; returns the head word's measured
    share of all tokens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    idx = _zipf_words(rng, n_docs * DOC_WORDS).reshape(n_docs, DOC_WORDS)
    head_share = float((idx == 0).mean())
    words = np.array([f"w{i:05d}" for i in range(VOCAB)])
    texts = [" ".join(words[row]) for row in idx]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array(
                [f"src{(i % 5)}" for i in range(n_docs)]
            ),
            "n_chars": pa.array(
                [len(t) for t in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, path)
    return head_share


def build_skewed_lineitem(dst_dir: str, reps: int) -> None:
    """lineitem with ~1/3 of rows re-keyed to one hot existing o_orderkey,
    replicated ``reps``x WITHOUT key offsets (the hot key grows in
    absolute rows); orders copies once (constant build side)."""
    con = duckdb.connect()
    hot = con.execute(
        f"SELECT o_orderkey FROM '{SRC}/orders.parquet' "
        "ORDER BY o_orderkey LIMIT 1"
    ).fetchone()[0]
    parts = []
    for r in range(reps):
        parts.append(f"""
SELECT * REPLACE (
    CASE WHEN hash(l_orderkey * 7 + l_linenumber + {r}) % {HOT_FRACTION} = 0
         THEN {hot} ELSE l_orderkey END AS l_orderkey)
FROM '{SRC}/lineitem.parquet'""")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO "
        f"'{dst_dir}/lineitem.parquet' (FORMAT PARQUET)"
    )
    con.close()
    import shutil

    shutil.copyfile(f"{SRC}/orders.parquet", f"{dst_dir}/orders.parquet")


def main() -> None:
    os.makedirs(os.path.join(ROOT, "x1"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, "x10"), exist_ok=True)
    shares = {}
    for name, n, seed in (("x1", N_DOCS_1X, 7), ("x10", N_DOCS_1X * 10, 7)):
        p = os.path.join(ROOT, name, "documents.parquet")
        if not os.path.exists(p):
            shares[name] = build_zipf_docs(p, n, seed)
        else:
            # cached fixture: MEASURE the head share from the parquet
            # instead of a hardcoded fallback (r14 ADVICE — re-runs were
            # silently documenting 10.0% regardless of the corpus)
            shares[name] = float(
                duckdb.sql(
                    "SELECT sum(CASE WHEN w = 'w00000' THEN 1 ELSE 0 END)"
                    " / count(*) FROM (SELECT unnest(string_split(text,"
                    f" ' ')) AS w FROM '{p}')"
                ).fetchone()[0]
            )
        if not os.path.exists(os.path.join(ROOT, name, "lineitem.parquet")):
            build_skewed_lineitem(
                os.path.join(ROOT, name), 1 if name == "x1" else 10
            )
    spark = get_spark("zipf-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    ops = TEXT_OPS + JOIN_OPS
    for op in ops:  # warmup: JVM + codegen outside the timed region
        force(QUERIES[op](spark, "/root/testdata/sf0.001"))
        release_transient_storage()

    cells: dict[str, dict[str, float]] = {op: {} for op in ops}
    for sname in ("x1", "x10"):
        d = os.path.join(ROOT, sname)
        for op in ops:
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                force(QUERIES[op](spark, d))
                ts.append(time.perf_counter() - t0)
                release_transient_storage()
            cells[op][sname] = round(min(ts), 3)

    lines = [
        MARK_START,
        "",
        "## Zipf-skew probe — window-keyed + bucket-keyed text ops on a hot-head corpus",
        "",
        "Generated by `tools/zipf_probe.py` (r13 VERDICT task 4): documents",
        f"drawn from Zipf(s={ZIPF_S}) over {VOCAB:,} words (head word ≈",
        f"{100 * shares.get('x1', 0.1):.1f}% of ALL tokens — the `the`",
        "regime real text has and the fixture lacks), probed at 1x",
        f"({N_DOCS_1X:,} docs) and 10x; plus a skew-keyed lineitem (~1/3 of",
        "fact rows on ONE o_orderkey, fact replicated 10x against constant",
        "orders) for join_skew_salted. best-of-2 per cell, local[32].",
        "alpha = log10(t10/t1): the failure signature for a window over a",
        "Zipf key is alpha pushing past the op's plain-corpus alpha as the",
        "hot partition's single task becomes the critical path.",
        "",
        "| op | zipf 1x (s) | zipf 10x (s) | alpha | decision |",
        "|---|---|---|---|---|",
    ]
    decisions = {}
    for op in ops:
        t1, t10 = cells[op]["x1"], cells[op]["x10"]
        alpha = math.log(t10 / t1) / math.log(10)
        decisions[op] = alpha
        verdict = "keep" if alpha <= 1.1 else "INVESTIGATE (salt the hot key)"
        lines.append(
            f"| {op} | {t1:.3f} | {t10:.3f} | {alpha:.2f} | {verdict} |"
        )
    lines += [
        "",
        "Reading the table: alpha ≤ ~1.0 means the op is scan/volume-bound",
        "even with the head word holding ~10% of every per-word partition —",
        "on local[32] at these sizes the hot `w1` window partition is one",
        "task among 32, and it finishes inside the other stages' shadow.",
        "The decision column records keep-the-windows vs salt-the-hot-key",
        "per op; the window ops' residual exposure is the single-partition",
        "ceiling (a window partition cannot be split by AQE), which binds",
        "when ONE key's rows exceed one task's share of the stage — at 10%",
        "head share that needs >~3 executors-worth of skewed rows per",
        "stage, i.e. a corpus orders of magnitude past this probe. The",
        "mitigation, if a production corpus hits it, is the two-level",
        "aggregate: groupBy(w1) pre-sum (map-side combinable, splittable)",
        "broadcast-joined back — same arithmetic, no window. For",
        "join_skew_salted the salt is the mitigation under test: the hot",
        "key's rows spread over N_SALT=8 partitions by construction, so",
        "its alpha tracks fact-volume, not key skew.",
        "",
        MARK_END,
    ]
    block = "\n".join(lines)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    with open(path) as f:
        doc = f.read()
    if MARK_START in doc:
        pre = doc[: doc.index(MARK_START)]
        post = doc[doc.index(MARK_END) + len(MARK_END):]
        doc = pre + block + post
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(doc)
    print(block)


if __name__ == "__main__":
    main()
