"""Text analysis + multimodal-column ops — LLM-training-pipeline operators
(BASELINE.json north_star). All JVM-side except the decode stub, which
demonstrates the mapInPandas plumbing for binary media columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, scan_parallel
from . import bpe

_STOPWORDS = ("the", "a", "is", "and", "of", "to")
_SW_ARR = ", ".join(f"'{w}'" for w in _STOPWORDS)


@query(
    "text_lang_id",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, lang,
           string_split_regex(lower(text), '\\s+') AS ws
    FROM documents
)
SELECT doc_id, lang AS lang_declared,
       CASE WHEN CAST(len(list_filter(ws, w -> list_contains([{_SW_ARR}], w)))
                      AS DOUBLE) / len(ws) >= 0.05
            THEN 'en' ELSE 'other' END AS lang_pred
FROM toks
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-density heuristic (an n-gram/lexicon scorer —
    the only deterministic option without model weights). Declared vs
    predicted lang both returned so downstream can measure agreement."""
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), r"\s+")
    sw = F.size(
        F.filter(ws, lambda w: w.isin(*_STOPWORDS))
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        F.when(sw.cast("double") / F.size(ws) >= 0.05, "en")
        .otherwise("other")
        .alias("lang_pred"),
    )


@query(
    "text_quality_score",
    oracle="""
WITH t AS (
    SELECT doc_id,
           length(text) AS n_chars_m,
           len(string_split_regex(lower(text), '\\s+')) AS n_words,
           length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct
    FROM documents
)
SELECT doc_id, n_chars_m, n_words,
       CAST(n_punct AS DOUBLE) / n_chars_m AS punct_ratio,
       CAST(n_chars_m AS DOUBLE) / n_words AS avg_word_len,
       CASE WHEN n_words BETWEEN 5 AND 100000
             AND CAST(n_punct AS DOUBLE) / n_chars_m < 0.2
            THEN 1 ELSE 0 END AS keep
FROM t
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gates: length bounds, punctuation ratio, mean word length —
    the cheap pre-filters a 100 TB corpus pass runs before anything
    expensive (pure narrow map, no shuffle). Ratios use try_divide: an
    EMPTY-string document has n_chars = 0, where ANSI `/` would abort the
    whole job and DuckDB yields NULL — try_divide matches the oracle's
    NULL (and the keep gate's CASE treats NULL as 0 on both engines).
    Caught by the adversarial-content sweep; the zero-ROW sweep can't see
    it because no row ever evaluates the division there."""
    d = load(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_words = F.size(F.split(F.lower("text"), r"\s+"))
    n_punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
    punct_ratio = F.try_divide(n_punct.cast("double"), n_chars)
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        F.try_divide(n_chars.cast("double"), n_words).alias("avg_word_len"),
        F.when(n_words.between(5, 100000) & (punct_ratio < 0.2), 1)
        .otherwise(0)
        .alias("keep"),
    )


@query(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{bpe.PRETOK_RE}')) AS pretok_count
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + the REAL tokenizer's
    pre-token count (bpe.PRETOK_RE — letter/digit runs capped at
    PRETOK_MAX chars, single other chars). ``pretok_count`` is a cheap
    single-scan UPPER BOUND on the char-level BPE token count (merges
    only shrink a pre-token, never split it); the exact budget is
    ``bpe.doc_token_counts`` (BYTE-level since r12 — real ids for every
    script), which is what ``pipeline_seq_pack`` packs on. Named
    pretok_count (r11, was bpe_ish_tokens) so no consumer mistakes the
    estimate for the budget."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(bpe.PRETOK_RE), 0)
        ).alias("pretok_count"),
    )


@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           string_split_regex(lower(text), '\\s+'))), ' ')) AS fingerprint,
       count(*) OVER (PARTITION BY md5(array_to_string(list_sort(list_distinct(
           string_split_regex(lower(text), '\\s+'))), ' '))) AS cluster_size
FROM documents
WHERE text IS NOT NULL
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set
    (order/multiplicity-insensitive content signature — catches shuffled
    copies exact dedup misses). cluster_size > 1 marks fingerprint dups.
    md5 is identical across engines, so this is fully oracle-checked.
    NULL-text docs have no fingerprint and are dropped on both sides
    (without the filter Spark's concat_ws would fingerprint them as ''
    while DuckDB's array_to_string yields NULL — a latent divergence)."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split(F.lower("text"), r"\s+")))
        )
    )
    from pyspark.sql import Window

    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.count("*").over(Window.partitionBy(fp)).alias("cluster_size"),
    )


@query(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS digest,
       CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
            WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type
FROM documents
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal columns modeled as opaque binary + typed metadata: the
    documents' utf-8 bytes stand in for media payloads (the container has
    no codec libs — TESTDATA ships no real media). Byte length, sha256
    content digest, and a deterministic type tag — the metadata layer every
    media pipeline needs before any decode."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    n_bytes = F.octet_length(payload)
    return d.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
        F.when(n_bytes % 3 == 0, "image")
        .when(n_bytes % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
    )


_DECODE_BYTE = "CAST('0x' || substr(hx, {pos}, 2) AS INT)"
_DECODE_FEAT = ", ".join(
    f"printf('%.6f', {_DECODE_BYTE.format(pos=2 * i + 1)} / 255.0)"
    for i in range(3, 11)
)


@query(
    "multimodal_decode",
    oracle=f"""
WITH d AS (SELECT doc_id, sha256(text) AS hx FROM documents
           WHERE text IS NOT NULL)
SELECT doc_id,
       CAST(64 + {_DECODE_BYTE.format(pos=1)} % 192 AS INTEGER) AS width,
       CAST(64 + {_DECODE_BYTE.format(pos=3)} % 192 AS INTEGER) AS height,
       CAST(1 + {_DECODE_BYTE.format(pos=5)} % 30 AS INTEGER) AS n_frames,
       concat_ws(',', {_DECODE_FEAT}) AS feature
FROM d
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode / feature-extract plumbing over mapInPandas: Arrow
    batches of (doc_id, payload binary) → (doc_id, width, height, n_frames,
    feature). The DECODE itself is a deterministic fake (codec libs aren't
    in this container — a real deployment swaps `_fake_decode` for
    PIL/ffmpeg); the Spark-side contract — schema, binary transport,
    batching, partition parallelism — is real and tested. The feature
    vector is emitted as a comma-joined '%.6f' STRING, not array<double>:
    the driver canonicalizer cannot hash list cells, and fixed decimal
    formatting of the same IEEE double is engine-independent — which also
    lets the sha256-derived fake be checked by a full DuckDB oracle
    (byte i of the digest = CAST('0x'||hex-pair AS INT))."""
    import hashlib

    import pandas as pd

    # a NULL payload is undecodable — dropped identically on both sides
    # (and the Arrow batch otherwise hands the UDF a None it would crash on)
    d = scan_parallel(load(spark, sf_dir, "documents")).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    ).filter(F.col("payload").isNotNull())

    def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
        # stand-in for PIL.Image.open / av.open: deterministic pseudo-
        # metadata from the content digest
        h = hashlib.sha256(payload).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        n_frames = 1 + h[2] % 30
        feat = ",".join(f"{b / 255.0:.6f}" for b in h[3:11])
        return width, height, n_frames, feat

    def decode_batches(batches):
        for pdf in batches:
            decoded = pdf["payload"].apply(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.apply(lambda t: t[0]),
                    "height": decoded.apply(lambda t: t[1]),
                    "n_frames": decoded.apply(lambda t: t[2]),
                    "feature": decoded.apply(lambda t: t[3]),
                }
            )

    return d.mapInPandas(
        decode_batches,
        "doc_id long, width int, height int, n_frames int, feature string",
    )


FRAME_STEP = 5


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH v AS (
    SELECT doc_id, octet_length(encode(text)) AS n_bytes
    FROM documents
    WHERE octet_length(encode(text)) % 3 = 2   -- media_type = 'video'
),
f AS (
    SELECT doc_id, n_bytes,
           1 + n_bytes % 30 AS n_frames,
           unnest(range(0, 1 + n_bytes % 30, {FRAME_STEP})) AS frame_idx
    FROM v
)
SELECT doc_id, CAST(n_frames AS INTEGER) AS n_frames,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(doc_id || ':' || frame_idx) AS frame_sig
FROM f
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads: every {FRAME_STEP}-th frame index
    of each 'video' document (frame count derived deterministically from the
    payload bytes, standing in for the container's stream header). The
    explode is a NARROW op — sampling never shuffles; at 100 TB each task
    expands its own payloads and the sampled-frame rows flow straight into
    the decode UDF (multimodal_decode) without a repartition. md5 frame
    signature is cross-engine, so unlike the decode stub this op is fully
    oracle-checked."""
    d = load(spark, sf_dir, "documents")
    n_bytes = F.octet_length(F.encode("text", "utf-8"))
    n_frames = (F.col("n_bytes") % 30 + 1).cast("int")
    return (
        d.select("doc_id", n_bytes.alias("n_bytes"))
        .filter(F.col("n_bytes") % 3 == 2)
        .select(
            "doc_id",
            n_frames.alias("n_frames"),
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_STEP))
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            F.md5(F.concat_ws(":", "doc_id", "frame_idx")).alias("frame_sig"),
        )
    )


TARGET_EDGE = 224


@query(
    "multimodal_resize",
    oracle=f"""
WITH d AS (SELECT doc_id, sha256(text) AS hx FROM documents
           WHERE text IS NOT NULL),
dims AS (
    SELECT doc_id,
           64 + CAST('0x' || substr(hx, 1, 2) AS INT) % 192 AS w,
           64 + CAST('0x' || substr(hx, 3, 2) AS INT) % 192 AS h
    FROM d
),
s AS (
    SELECT doc_id, w, h,
           least({TARGET_EDGE}.0 / w, {TARGET_EDGE}.0 / h, 1.0) AS sc
    FROM dims
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(floor(w * sc + 0.5) AS INTEGER) AS out_w,
       CAST(floor(h * sc + 0.5) AS INTEGER) AS out_h,
       floor(sc * 1000000 + 0.5) / 1000000 AS scale
FROM s
""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing over mapInPandas: Arrow batches of
    (doc_id, payload) → (doc_id, width, height, out_w, out_h, scale) with
    aspect-ratio-preserving fit into 224×224. The pixel work is a
    deterministic fake (no codec libs in this container — a real deployment
    decodes with PIL and emits the resized bytes in an output binary
    column); the batch shape, schema, and partition parallelism are the
    real contract. Because the fake derives from the sha256 digest, the
    whole op is DuckDB-oracle-checkable (same trick as multimodal_decode);
    rounding is explicit half-up (floor(x + 0.5)) on BOTH sides — Python's
    banker's round and DuckDB's half-away-from-zero would disagree on
    ties. Narrow op: resize never shuffles, and output size is bounded by
    TARGET_EDGE² per row regardless of input payload size — the property
    that makes a 100 TB image corpus tractable downstream."""
    import hashlib
    import math

    import pandas as pd

    # NULL payload = nothing to resize; dropped on both sides (see
    # multimodal_decode)
    d = scan_parallel(load(spark, sf_dir, "documents")).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    ).filter(F.col("payload").isNotNull())

    def resize_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = hashlib.sha256(bytes(payload)).digest()
                w, ht = 64 + h[0] % 192, 64 + h[1] % 192
                scale = min(TARGET_EDGE / w, TARGET_EDGE / ht, 1.0)
                rows.append(
                    (
                        doc_id,
                        w,
                        ht,
                        math.floor(w * scale + 0.5),
                        math.floor(ht * scale + 0.5),
                        math.floor(scale * 1_000_000 + 0.5) / 1_000_000,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_w", "out_h", "scale"],
            )

    return d.mapInPandas(
        resize_batches,
        "doc_id long, width int, height int, out_w int, out_h int, scale double",
    )


_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_LONGNUM_RE = "[0-9]{6,}"


@query(
    "text_pii_scrub",
    oracle=f"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_LONGNUM_RE}', '<NUM>', 'g') AS scrubbed,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS n_longnums
FROM documents
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: replace email addresses and long digit runs with
    typed placeholder tokens, and count what was redacted (the audit trail a
    compliance pipeline needs). Pure narrow map — scales linearly, no
    shuffle; patterns restricted to syntax shared by Java regex and RE2 so
    the oracle runs the identical expressions."""
    d = load(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
        _LONGNUM_RE,
        "<NUM>",
    )
    return d.select(
        "doc_id",
        scrub.alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_LONGNUM_RE), 0)).alias(
            "n_longnums"
        ),
    )


TFIDF_TOP_K = 5


@query(
    "text_tfidf",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
    FROM documents
),
tf AS (
    SELECT doc_id, word, count(*) AS tf
    FROM toks WHERE length(word) > 0
    GROUP BY 1, 2
),
docfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.word,
           round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
    FROM tf JOIN docfreq USING (word) CROSS JOIN n
)
SELECT doc_id, word, tfidf, CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, word) AS rn
      FROM scored)
WHERE rn <= {TFIDF_TOP_K}
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-5 terms per document with smoothed
    idf = ln((N+1)/(df+1)). The pipeline every corpus-curation stack runs
    to summarize/cluster documents. Shape at scale: term-frequency groupBy
    shuffles O(doc × distinct-word) rows AFTER map-side partial agg (a
    doc's words sit in one input row, so most combining is local);
    document frequency is a COUNT window over the tf relation partitioned
    by word — one extra exchange, but the corpus is tokenized exactly ONCE
    (a separate docfreq aggregate + join recomputes the entire tf branch:
    ReuseExchange does not fire across the differently-keyed aggregations,
    verified via .explain); the corpus size N rides along as a broadcast
    scalar, never a repartition-to-one. idf is transcendental → rounded to
    6 on both engines BEFORE ranking (registry convention), with `word` as
    the total tie-break."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = scan_parallel(d).select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "word", "tfidf", "rank")
    )


@query(
    "text_unigram_logprob",
    oracle="""
WITH t AS (
    SELECT doc_id, tok
    FROM (SELECT doc_id,
                 unnest(string_split_regex(lower(text), '\\s+')) AS tok
          FROM documents)
    WHERE length(tok) > 0
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
vocab AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM t),
scored AS (
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(tf.tf * round(ln(CAST(cnt AS DOUBLE) / n_total), 6)
                         AS DECIMAL(29,6))) AS DOUBLE)
               / sum(tf.tf) AS alp
    FROM tf JOIN vocab USING (tok) CROSS JOIN tot
    GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens, round(alp, 6) AS avg_logprob
FROM scored
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: mean ln p(token) per document under the
    corpus's own unigram distribution — the cheap perplexity proxy every
    training-data pipeline runs before a real LM scorer (documents full of
    rare tokens score low; boilerplate scores high). MLE probabilities
    need no OOV smoothing because the vocabulary comes from the same
    corpus (every token has count ≥ 1).

    Shape at scale: tokenize once, per-doc term frequency via hash agg
    (map-side combine — a doc's tokens sit in one input row), corpus
    count per token as a SUM window over the tf relation partitioned by
    tok (one extra exchange; same single-tokenize trick as text_tfidf),
    total token count as a broadcast scalar aggregated from the tf branch
    (ReuseExchange collapses the identical sub-plan), weighted per-doc
    mean as one more hash agg. Never a join against a separate vocab
    table — the window IS the vocab lookup, co-partitioned for free.

    Hash-safety: ln is transcendental → rounded to 6 before the weighted
    sum; the sum runs through DECIMAL (order-independent, exact.py); the
    mean divides in double and rounds to 6 (registry convention)."""
    from pyspark.sql import Window

    from ..exact import _DEC

    d = load(spark, sf_dir, "documents")
    toks = scan_parallel(d).select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    n = tf.agg(F.sum("tf").alias("n_total"))
    scored = (
        tf.withColumn("cnt", F.sum("tf").over(Window.partitionBy("tok")))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tf",
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("n_total")), 6
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum((F.col("tf") * F.col("lp")).cast(_DEC)).cast("double")
                / F.sum("tf")
            ).alias("alp"),
        )
        .select("doc_id", "n_tokens", F.round("alp", 6).alias("avg_logprob"))
    )


@query(
    "text_ngram_novelty",
    oracle="""
WITH toks AS (
    SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
    FROM documents
),
grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(ws[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)],
                           ' ') AS gram
    FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM toks)
),
df AS (
    SELECT gram, count(*) AS dfreq, min(doc_id) AS owner FROM grams
    GROUP BY gram
),
uniq AS (
    SELECT owner AS doc_id, count(*) AS n_unique FROM df
    WHERE dfreq = 1 GROUP BY owner
),
tot AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id)
SELECT t.doc_id,
       t.n_grams,
       coalesce(u.n_unique, 0) AS n_unique,
       CAST(coalesce(u.n_unique, 0) AS DOUBLE) / t.n_grams AS novelty
FROM tot t LEFT JOIN uniq u ON u.doc_id = t.doc_id
""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the fraction of a doc's distinct
    trigrams that exist in NO other document (corpus document-frequency
    1). High novelty marks original content; near-zero novelty marks
    boilerplate/templated text — a standard pretraining quality signal
    complementary to the repetition score (intra-doc) and decontamination
    (cross-corpus) ops.

    Plan — verbatim-collapsed (the pair ops' `_verbatim_reps` device,
    dedup.py): gram sets are built once per DISTINCT text over the shared
    rep-doc table (`_shared_gram_sets` — narrow
    array_distinct(transform(...)) with xxhash64 longs, 8 bytes/gram,
    materialized so `InferFiltersFromGenerate` can't sink the gram-build
    lambda below the scan exchange), then ONE hash agg over the exploded
    rep grams computes each gram's rep-GROUP count and min-rep owner
    together. A gram is corpus-unique iff exactly ONE text group contains
    it AND that group has exactly one member — group multiplicity comes
    from a tiny O(docs)→O(reps) count over the shared member map, applied
    AFTER the gram agg (never joined into the gram stream), so the only
    gram-sized shuffle carries 16-byte (gh, rep_id) pairs over DISTINCT
    texts with map-side combine. `rep_id` is min(doc_id) of its group
    (`_verbatim_reps`), so for a unique gram the owner rep IS the owning
    doc — matching the oracle's min-doc_id owner exactly. Member docs
    then pick up their rep's (n_grams, n_unique) through one O(docs) ⋈
    O(reps) join; mult>1 groups get n_unique 0 by construction (every
    gram they hold has dfreq ≥ 2).

    Scale: corpus-wide document frequency is irreducibly linear in
    DISTINCT text volume, but web-scale pretraining corpora are 30-50 %
    verbatim duplicates — the collapse removes exactly that factor (the
    10× replicated probe drops from alpha ~1.0 to near-flat), and the
    shared tables amortize across the whole dedup/curation family.
    Novelty divides two exact ints — bit-identical in both engines.
    In-engine grams are xxhash64 longs while the oracle joins raw gram
    strings: the usual 2^-64 collision class (dedup_ngram_jaccard's
    argument). Docs with no trigram (<3 tokens or NULL text) drop — the
    curation-family convention."""
    from ..ckpt import guard_result, release_transient_storage
    from .dedup import _shared_gram_sets, _shared_members

    release_transient_storage()  # free the previous invocation's blocks
    members = _shared_members(spark, sf_dir)  # (doc_id, rep_id)
    sets_ = _shared_gram_sets(spark, sf_dir)  # (doc_id=rep, ghs) per rep
    mult = members.groupBy("rep_id").agg(F.count("*").alias("mult"))
    per_rep = sets_.filter(F.size("ghs") > 0).select(
        F.col("doc_id").alias("rep_id"),
        F.size("ghs").cast("bigint").alias("n_grams"),
        "ghs",
    )
    grams = per_rep.select("rep_id", F.explode("ghs").alias("gh"))
    grp_owner = grams.groupBy("gh").agg(
        F.count("*").alias("gcnt"), F.min("rep_id").alias("owner")
    )
    uniq = (
        grp_owner.filter(F.col("gcnt") == 1)
        .groupBy(F.col("owner").alias("rep_id"))
        .agg(F.count("*").alias("n_unique"))
    )
    rep_stats = (
        per_rep.drop("ghs")
        .join(mult, "rep_id")
        .join(uniq, "rep_id", "left")
        .select(
            "rep_id",
            "n_grams",
            F.when(
                F.col("mult") == 1, F.coalesce("n_unique", F.lit(0))
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n_unique"),
        )
    )
    return guard_result(
        members.join(rep_stats, "rep_id")
        .select(
            "doc_id",
            "n_grams",
            "n_unique",
            (F.col("n_unique").cast("double") / F.col("n_grams")).alias(
                "novelty"
            ),
        )
    )


# Count-min sketch geometry: depth × width cells, each depth row an
# independent double-hash permutation (Kirsch-Mitzenmacher, same device as
# dedup_minhash). Error bound: est(g) - df(g) <= e/width · Σdf with
# probability 1 - e^-depth per query — at 100 TB, width scales with the
# distinct-gram budget while the SKETCH stays depth·width rows, which is
# the whole point (SCALING.md names this the sublinear swap for
# text_ngram_novelty's exact corpus-wide DF).
CM_DEPTH = 4
CM_WIDTH = 1024
_CM_P = 2147483647  # 2^31 - 1 — dedup.MERSENNE_P, kept literal for the SQL


@query(
    "agg_ngram_df_sketch",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
    FROM documents
),
grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(ws[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)],
                           ' ') AS gram
    FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM toks)
),
h AS (
    SELECT ('0x' || substr(md5(gram), 1, 15))::BIGINT % {_CM_P} AS a,
           (('0x' || substr(md5(gram), 16, 15))::BIGINT % {_CM_P - 1}) + 1
               AS b
    FROM grams
)
SELECT CAST(d.d AS INTEGER) AS depth,
       CAST(((a + d.d * b) % {_CM_P}) % {CM_WIDTH} AS INTEGER) AS cell,
       count(*) AS cnt
FROM h CROSS JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS d) d
GROUP BY 1, 2
""",
)
def agg_ngram_df_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of trigram DOCUMENT frequencies — the mergeable
    summary a 100 TB pipeline persists instead of the exact corpus-wide
    gram-DF table (text_ngram_novelty's statistic): est(g) =
    min over depths of cnt[depth][h_depth(g)] upper-bounds the true DF
    within e/width · total-instances, and sketches from corpus shards
    merge by cell-wise addition. The op returns the sketch AS DATA —
    (depth, cell, cnt) for every non-empty cell, ≤ depth·width rows.

    Plan: the shared md5 gram-set table (`_shared_gram_sets_md5` — the
    cross-engine-exact double-hash arrays dedup_minhash uses) joined once
    with the verbatim-group multiplicities (DF counts every DOC, so a
    group's reps count mult times), then a NARROW transform/explode to
    (depth, cell) pairs and ONE hash agg whose map-side combine caps
    every partition's shuffle contribution at depth·width rows — the
    shuffle is O(cells), not O(gram instances), no matter the corpus
    size. Hash arithmetic is the minhash permutation device ((a + d·b)
    mod p mod width on md5-half-derived a, b < 2^31 — every intermediate
    fits a long bit-identically in both engines), so the oracle matches
    hash-exactly despite the 'sketch' name: determinism comes from the
    hash family, approximation only enters when a QUERY reads a cell as
    a DF estimate. tests/test_operators.py pins the CM guarantee
    (est ≥ exact DF, bounded mean overestimate) against exact counts."""
    from ..ckpt import guard_result, release_transient_storage
    from .dedup import _shared_gram_sets_md5, _shared_members

    release_transient_storage()
    members = _shared_members(spark, sf_dir)
    sets_ = _shared_gram_sets_md5(spark, sf_dir)  # (doc_id=rep, ghs, gh2s)
    mult = members.groupBy(F.col("rep_id")).agg(F.count("*").alias("mult"))
    pairs = (
        sets_.select(
            F.col("doc_id").alias("rep_id"),
            F.arrays_zip("ghs", "gh2s").alias("gs"),
        )
        .join(mult, "rep_id")
        .select("mult", F.explode("gs").alias("g"))
    )
    a = F.col("g.ghs") % F.lit(_CM_P)
    b = (F.col("g.gh2s") % F.lit(_CM_P - 1)) + F.lit(1)
    darr = F.transform(
        F.sequence(F.lit(0), F.lit(CM_DEPTH - 1)),
        lambda d: F.struct(
            d.cast("int").alias("depth"),
            ((a + d.cast("bigint") * b) % _CM_P % CM_WIDTH)
            .cast("int")
            .alias("cell"),
        ),
    )
    cells = pairs.select("mult", F.explode(darr).alias("dc"))
    return guard_result(
        cells.groupBy(
            F.col("dc.depth").alias("depth"), F.col("dc.cell").alias("cell")
        ).agg(F.sum("mult").alias("cnt"))
    )


@query(
    "text_novelty_sketch",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
    FROM documents
),
grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(ws[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)],
                           ' ') AS gram
    FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM toks)
),
h AS (
    SELECT doc_id, gram,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT % {_CM_P} AS a,
           (('0x' || substr(md5(gram), 16, 15))::BIGINT % {_CM_P - 1}) + 1
               AS b
    FROM grams
),
cells AS (
    SELECT doc_id, gram, d.d AS depth,
           ((a + d.d * b) % {_CM_P}) % {CM_WIDTH} AS cell
    FROM h CROSS JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS d) d
),
sketch AS (
    SELECT depth, cell, count(*) AS cnt FROM cells GROUP BY depth, cell
),
est AS (
    SELECT c.doc_id, c.gram, min(s.cnt) AS est
    FROM cells c JOIN sketch s USING (depth, cell)
    GROUP BY c.doc_id, c.gram
)
SELECT doc_id,
       count(*) AS n_grams,
       count(*) FILTER (WHERE est = 1) AS n_unique_est,
       CAST(count(*) FILTER (WHERE est = 1) AS DOUBLE) / count(*)
           AS novelty_est
FROM est
GROUP BY doc_id
""",
)
def text_novelty_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_ngram_novelty answered FROM the count-min sketch — the query
    path a 100 TB deployment actually runs: est(g) = min over depths of
    the sketch cell counts upper-bounds g's document frequency, so
    est(g) = 1 PROVES df(g) = 1 (no false uniques, ever); collisions can
    only hide true uniques, making novelty_est a deterministic LOWER
    bound of the exact novelty (tests/test_operators.py pins both
    properties against text_ngram_novelty). The whole statistic needs
    only the depth·width-row sketch — mergeable across corpus shards and
    broadcastable — instead of the O(distinct grams) exact DF table.

    Plan: the sketch (agg_ngram_df_sketch — one O(cells) shuffle) is
    BROADCAST to the rep-gram cell stream (4 narrow rows per distinct
    rep gram), one hash agg takes min-over-depths per gram, a second
    rolls per-rep totals, and the member map expands reps to docs —
    verbatim-collapsed end to end like the exact op, zero additional
    full-data shuffles beyond the gram agg itself. The md5 double-hash
    arithmetic is engine-identical, so even this 'approximate' op is
    hash-checked exactly: the approximation is a fixed deterministic
    function, not randomness."""
    from ..ckpt import guard_result
    from .dedup import _shared_gram_sets_md5, _shared_members

    sketch = agg_ngram_df_sketch(spark, sf_dir)  # entry releases pool
    members = _shared_members(spark, sf_dir)
    sets_ = _shared_gram_sets_md5(spark, sf_dir)
    gs = sets_.select(
        F.col("doc_id").alias("rep_id"),
        F.explode(F.arrays_zip("ghs", "gh2s")).alias("g"),
    )
    a = F.col("g.ghs") % F.lit(_CM_P)
    b = (F.col("g.gh2s") % F.lit(_CM_P - 1)) + F.lit(1)
    darr = F.transform(
        F.sequence(F.lit(0), F.lit(CM_DEPTH - 1)),
        lambda d: F.struct(
            d.cast("int").alias("depth"),
            ((a + d.cast("bigint") * b) % _CM_P % CM_WIDTH)
            .cast("int")
            .alias("cell"),
        ),
    )
    cells = gs.select(
        "rep_id", "g", F.explode(darr).alias("dc")
    ).select("rep_id", "g", F.col("dc.depth").alias("depth"),
             F.col("dc.cell").alias("cell"))
    est = (
        cells.join(F.broadcast(sketch), ["depth", "cell"])
        .groupBy("rep_id", "g")
        .agg(F.min("cnt").alias("est"))
    )
    rep_stats = est.groupBy("rep_id").agg(
        F.count("*").alias("n_grams"),
        F.sum((F.col("est") == 1).cast("bigint")).alias("n_unique_est"),
    )
    return guard_result(
        members.join(rep_stats, "rep_id").select(
            "doc_id",
            "n_grams",
            "n_unique_est",
            (
                F.col("n_unique_est").cast("double") / F.col("n_grams")
            ).alias("novelty_est"),
        )
    )


@query(
    "text_lm_perplexity",
    oracle=r"""
WITH tc AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '') AS ws
    FROM documents WHERE text IS NOT NULL
),
tok AS (SELECT doc_id, unnest(ws) AS tok FROM tc),
v AS (SELECT count(DISTINCT tok) AS vsz FROM tok),
bg AS (
    SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
    FROM (SELECT doc_id, ws,
                 unnest(generate_series(1, len(ws) - 1)) AS i
          FROM tc WHERE len(ws) >= 2)
),
btf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
cb AS (SELECT w1, w2, sum(tf) AS cb FROM btf GROUP BY 1, 2),
cw AS (SELECT w1, sum(tf) AS cw FROM btf GROUP BY 1),
scored AS (
    SELECT btf.doc_id,
           CAST(sum(btf.tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(btf.tf * round(
                    ln((CAST(cb AS DOUBLE) + 1) / (CAST(cw AS DOUBLE) + vsz)),
                    6) AS DECIMAL(29,6))) AS DOUBLE)
               / sum(btf.tf) AS alp
    FROM btf JOIN cb USING (w1, w2) JOIN cw USING (w1) CROSS JOIN v
    GROUP BY btf.doc_id
)
SELECT doc_id, n_bigrams, round(alp, 6) AS avg_logprob,
       round(exp(-alp), 6) AS perplexity
FROM scored
""",
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity per document — the CCNet-style quality filter
    real pretraining pipelines run: score each document under an n-gram
    language model and gate on perplexity (fluent text scores low;
    gibberish, boilerplate soup, and OCR noise score high). The LM here
    is add-one-smoothed bigrams trained on the corpus itself
    (p(w2|w1) = (c(w1,w2)+1)/(c(w1,·)+V)); production swaps the count
    relations for ones aggregated over a clean reference corpus
    (CCNet uses Wikipedia) — the scoring plan below is unchanged.

    Shape at scale: ONE tokenize; per-doc bigram term frequency via hash
    agg (map-side combine — a doc's bigrams sit in one input row); corpus
    bigram and first-word counts as SUM windows over the tf relation
    (co-partitioned lookups, never a join against separate count tables
    — text_unigram_logprob's device, one key deeper); vocabulary size as
    one broadcast scalar. Bigram adjacency is taken over the
    EMPTY-FILTERED token array (filter-then-pair — pairing first would
    put phantom boundary tokens inside bigrams).

    Hash-safety: ln/exp are transcendental → each bigram logprob rounds
    to 6dp before the DECIMAL-exact weighted sum (order-free); the mean
    divides in double on identical operands; avg and perplexity round to
    6 on both engines. Counts and V are integers — bit-identical.
    Documents with fewer than two tokens have no bigrams and are absent
    by contract (perplexity of a one-token document is undefined)."""
    from pyspark.sql import Window

    from ..exact import _DEC

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tc = scan_parallel(d).select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), r"\s+"), lambda x: x != ""
        ).alias("ws"),
    )
    toks = tc.select("doc_id", F.explode("ws").alias("tok"))
    v = toks.agg(F.count_distinct("tok").alias("vsz"))
    bg = tc.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    btf = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    scored = (
        btf.withColumn(
            "cb", F.sum("tf").over(Window.partitionBy("w1", "w2"))
        )
        .withColumn("cw", F.sum("tf").over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "tf",
            F.round(
                F.log(
                    (F.col("cb").cast("double") + 1)
                    / (F.col("cw").cast("double") + F.col("vsz"))
                ),
                6,
            ).alias("lp"),
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        (
            F.sum((F.col("tf") * F.col("lp")).cast(_DEC)).cast("double")
            / F.sum("tf")
        ).alias("alp"),
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("alp", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("alp")), 6).alias("perplexity"),
    )


# --- Gopher rule-based quality filter --------------------------------------

GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GSTOP_ARR = ", ".join(f"'{w}'" for w in GOPHER_STOPS)
# Rule thresholds (Rae et al. 2021 use 50..100k words and mean word length
# 3..10 on web text; the word floor and length band are fixture-scaled
# dials here — the RULES are the algorithm)
G_MIN_WORDS, G_MAX_WORDS = 5, 100_000
G_MWL_LO, G_MWL_HI = 1.0, 12.0
G_SYM_MAX, G_BULLET_MAX, G_ELLIP_MAX = 0.1, 0.9, 0.3
G_ALPHA_MIN, G_STOP_MIN = 0.8, 2

# Explicit whitespace class, identical on Java regex AND DuckDB's RE2 by
# construction (r15 ADVICE item 5: \s differs — \x0B is whitespace in Java
# but not RE2, so a vertical-tab document would diverge cross-engine under
# a bare \s+; this class removes the corpus-discipline dependency).
_G_WS_CLASS = "[ \\t\\n\\f\\r]+"


def _gopher_ctes(src: str = "documents", col: str = "text", p: str = "") -> str:
    """The rule-battery CTE chain (t → m → r) over any (doc_id, {col})
    relation — shared by the standalone oracle and the capstone's gopher
    stage; ``p`` prefixes CTE names for composition."""
    return f"""{p}t AS (
    SELECT doc_id,
           list_filter(string_split_regex({col}, '{_G_WS_CLASS}'),
                       w -> length(w) > 0) AS ws,
           list_filter(list_transform(string_split_regex({col}, '\\n'),
                                      l -> trim(l)),
                       l -> length(l) > 0) AS ls,
           length({col}) - length(replace({col}, '#', '')) AS n_hash,
           CAST((length({col}) - length(replace({col}, '...', ''))) / 3
                AS BIGINT) AS n_ell
    FROM {src}
),
{p}m AS (
    SELECT doc_id,
           len(ws) AS n_words,
           list_sum(list_transform(ws, w -> length(w))) AS n_chars_w,
           len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
               AS n_alpha,
           len(list_filter(ws, w -> list_contains([{_GSTOP_ARR}], lower(w))))
               AS n_stop,
           len(ls) AS n_lines,
           len(list_filter(ls, l -> substring(l, 1, 1) IN ('-', '*', '•')))
               AS n_bullet,
           len(list_filter(ls, l -> right(l, 3) = '...' OR right(l, 1) = '…'))
               AS n_ellend,
           n_hash + n_ell AS n_sym
    FROM {p}t
),
{p}r AS (
    SELECT doc_id, n_words, n_stop,
           CAST(n_chars_w AS DOUBLE) / nullif(n_words, 0) AS mean_word_len,
           CAST(n_sym AS DOUBLE) / nullif(n_words, 0) AS symbol_ratio,
           CAST(n_bullet AS DOUBLE) / nullif(n_lines, 0) AS bullet_frac,
           CAST(n_ellend AS DOUBLE) / nullif(n_lines, 0) AS ellipsis_frac,
           CAST(n_alpha AS DOUBLE) / nullif(n_words, 0) AS alpha_frac
    FROM {p}m
)"""


# the keep predicate over an r-shaped relation — shared verbatim by the
# standalone CASE and the capstone's stage-4 WHERE
_G_KEEP_SQL = f"""n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}
             AND mean_word_len BETWEEN {G_MWL_LO} AND {G_MWL_HI}
             AND symbol_ratio < {G_SYM_MAX}
             AND coalesce(bullet_frac < {G_BULLET_MAX}, TRUE)
             AND coalesce(ellipsis_frac < {G_ELLIP_MAX}, TRUE)
             AND alpha_frac > {G_ALPHA_MIN}
             AND n_stop >= {G_STOP_MIN}"""


def _gopher_arrays(col: Column) -> tuple[Column, Column, Column]:
    """(ws, ls, n_sym) projection columns of the rule battery over any
    text column — the Spark twin of `_gopher_ctes`'s {p}t, shared by the
    standalone op and pipeline_pretrain_e2e's gopher stage."""
    ws = F.filter(F.split(col, _G_WS_CLASS), lambda w: F.length(w) > 0)
    ls = F.filter(
        F.transform(F.split(col, "\n"), F.trim),
        lambda x: F.length(x) > 0,
    )
    n_hash = F.length(col) - F.length(F.replace(col, F.lit("#")))
    n_ell = (
        (F.length(col) - F.length(F.replace(col, F.lit("...")))) / F.lit(3)
    ).cast("long")
    return ws, ls, n_hash + n_ell


def _gopher_metrics(
    ws: Column, ls: Column, n_sym: Column
) -> dict[str, Column]:
    """The per-doc rule metrics from the array columns — the Spark twin of
    `_gopher_ctes`'s {p}m/{p}r."""
    n_words = F.size(ws)
    n_lines = F.size(ls)
    n_chars_w = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(F.filter(ws, lambda w: F.lower(w).isin(*GOPHER_STOPS)))
    n_bullet = F.size(
        F.filter(ls, lambda x: F.substring(x, 1, 1).isin("-", "*", "•"))
    )
    n_ellend = F.size(
        F.filter(
            ls,
            lambda x: (F.substring(x, -3, 3) == "...")
            | (F.substring(x, -1, 1) == "…"),
        )
    )
    return {
        "n_words": n_words,
        "n_stop": n_stop,
        "mean_word_len": F.try_divide(n_chars_w.cast("double"), n_words),
        "symbol_ratio": F.try_divide(n_sym.cast("double"), n_words),
        "bullet_frac": F.try_divide(n_bullet.cast("double"), n_lines),
        "ellipsis_frac": F.try_divide(n_ellend.cast("double"), n_lines),
        "alpha_frac": F.try_divide(n_alpha.cast("double"), n_words),
    }


def _gopher_keep(m: dict[str, Column]) -> Column:
    """The keep predicate over `_gopher_metrics` — the Spark twin of
    `_G_KEEP_SQL`."""
    return (
        m["n_words"].between(G_MIN_WORDS, G_MAX_WORDS)
        & m["mean_word_len"].between(G_MWL_LO, G_MWL_HI)
        & (m["symbol_ratio"] < G_SYM_MAX)
        & F.coalesce(m["bullet_frac"] < G_BULLET_MAX, F.lit(True))
        & F.coalesce(m["ellipsis_frac"] < G_ELLIP_MAX, F.lit(True))
        & (m["alpha_frac"] > G_ALPHA_MIN)
        & (m["n_stop"] >= G_STOP_MIN)
    )


@query(
    "text_gopher_rules",
    oracle=f"""
WITH {_gopher_ctes()}
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       ellipsis_frac, alpha_frac, n_stop,
       CASE WHEN {_G_KEEP_SQL}
            THEN TRUE ELSE FALSE END AS keep
FROM r
""",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filtering (Rae et al. 2021, Appendix
    A1.1 — the rule set MassiveWeb/Gopher and its descendants run before
    any model-based gate): word-count bounds, mean word length band,
    symbol-to-word ratio (# and ...), bullet-start and ellipsis-end line
    fractions, minimum fraction of words containing an alphabetic
    character, and a minimum stop-word count. Complements
    text_quality_score (cheap char-level gates) and
    quality_classifier_score (model-based): together they are the
    standard three-stage quality battery of a pretraining pipeline.

    Spark-first: ONE narrow projection over the corpus scan — every rule
    is integer counting over split arrays (higher-order functions,
    JVM-side, zero shuffle, zero UDF). Cross-engine exactness: all counts
    are integers; each ratio is a single IEEE divide of exact integers
    (bit-identical on both engines — the text_quality_score precedent);
    NULL ratios (zero denominators) fail the CASE on both engines; the
    tokenizer splits on the explicit `_G_WS_CLASS` character class, so
    Java regex and RE2 agree by construction (not by corpus discipline —
    bare \\s differs on \\x0B between them).
    Reference scope: beyond mapreduce.erl (no reference counterpart);
    included per the LLM-pipeline brief."""
    d = load(spark, sf_dir, "documents")
    ws, ls, n_sym = _gopher_arrays(F.col("text"))
    t = scan_parallel(d).select(
        "doc_id",
        ws.alias("ws"),
        ls.alias("ls"),
        n_sym.alias("n_sym"),
    )
    m = _gopher_metrics(F.col("ws"), F.col("ls"), F.col("n_sym"))
    keep = _gopher_keep(m)
    return t.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["symbol_ratio"].alias("symbol_ratio"),
        m["bullet_frac"].alias("bullet_frac"),
        m["ellipsis_frac"].alias("ellipsis_frac"),
        m["alpha_frac"].alias("alpha_frac"),
        m["n_stop"].alias("n_stop"),
        F.when(keep, True).otherwise(False).alias("keep"),
    )
