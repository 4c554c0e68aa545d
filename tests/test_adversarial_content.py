"""Adversarial-content sweep: engine and oracle must agree on text that
tries to break the string machinery — regex metacharacters in document
content, quotes/backslashes, HTML soup, kilobyte-long single tokens,
pathological repetition, PII-lookalikes, and mixed scripts (excluding
the three documented divergence classes pinned by
tests/test_unicode_parity.py).

Content never reaches either engine as SQL text (both read parquet), so
this is a semantics check, not an injection check: does Java's regex /
casefold / md5 pipeline produce the same tokens, grams, fingerprints,
redactions, and scores as DuckDB's RE2-based twin on hostile content?
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import run_compare

_DOCS = [
    (0, r"a.b a.b (a|b)* [x-z]+ \d+ \\s+ $^ {2,3} a?b", "en", "srcA"),
    (1, 'quotes "double" \'single\' `back` and -- sql; comments /* */',
     "en", "srcA"),
    (2, "<div class='x'>html &amp; entities &#65; <br/> soup</div>",
     "en", "srcA"),
    (3, "tok" * 800 + " short " + "y" * 2000, "en", "srcB"),
    (4, ("spam " * 400).strip(), "en", "srcB"),
    (5, "email-ish a@b.co x@y.zz 12345678901 999999 +1-555-0100",
     "en", "srcB"),
    (6, "mixed Ascii кирилица 汉字 عربى हिन्दी ascii tail", "mixed", "srcC"),
    (7, "tab\tsep and nbsp and trailing spaces   ", "en", "srcC"),
    (8, "dup doc body shared exactly", "en", "srcC"),
    (9, "dup doc body shared exactly", "en", "srcC"),
    (10, "", "en", "srcC"),
    (11, ".", "en", "srcC"),
    # HTML-hostile rows (r12 VERDICT task 3): malformed tags, nested
    # CDATA/comments, entity bombs — text_html_extract wraps each in a
    # page, so these land INSIDE the html the extractor must survive.
    (12, "<p>unclosed <div malformed <a href='x' dangling words keep "
         "coming here", "en", "srcD"),
    (13, "<![CDATA[ raw <b>bold</b> ]]> nested <!-- outer <!-- inner --> "
         "tail --> end of cdata soup", "en", "srcD"),
    (14, "&amp;amp; &amp;lt;script&amp;gt; " + "&amp;" * 200
         + " entity bomb with filler words to pass the gate", "en", "srcD"),
    # multi-script payload rows (r12 VERDICT task 6): RTL + combining
    # marks, emoji-ZWJ sequences, astral-plane text — through the
    # byte-BPE family, chunking, and packing
    (15, "النَّصُّ الْعَرَبِيُّ مَعَ حَرَكَات and עִבְרִית עִם נִקּוּד mixed "
         "with ascii tail words", "mixed", "srcE"),
    (16, "families 👨‍👩‍👧‍👦 👩‍👩‍👦 and flags 🏳️‍🌈 🇺🇳 🇯🇵 zwj "
         "sequences between plain words", "mixed", "srcE"),
    (17, "astral 𝒽𝑒𝓁𝓁𝑜 𝔀𝓸𝓻𝓭𝓼 gothic 𐍈𐌰𐌹𐌷𐍄𐍃 cuneiform 𒀀𒀁𒀂 "
         "four byte utf8 everywhere", "mixed", "srcE"),
    # punctuation torture for sentence segmentation: abbreviation dots,
    # ellipses, runs of mixed terminators, terminator at EOS (no trailing
    # whitespace — must NOT split), interior punctuation with no space
    (18, "Dr. Smith went... to the U.S.A.! Then what?? A no.split case "
         "stays whole. Trailing terminator.", "en", "srcF"),
]

_OPS = (
    "text_fingerprint",
    "text_normalize",
    "text_pii_scrub",
    "text_quality_score",
    "text_token_count",
    "text_bpe_tokenize",  # PRETOK_MAX chunks the kilobyte runs in doc 3
    "bpe_train",                 # trained on the hostile vocabulary
    "text_bpe_tokenize_trained",
    "text_bpe_tokenize_bytes",   # doc 6's mixed scripts get real ids
    "bpe_train_bytes",           # byte merges learned FROM hostile text
    "text_bpe_tokenize_trained_bytes",
    "text_lang_id",
    "text_tfidf",
    "text_unigram_logprob",
    "text_lm_perplexity",
    "text_repetition_score",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "multimodal_meta",
    "multimodal_decode",
    "agg_ngram_counts",
    "text_html_extract",  # rows 12-14 are its malformed-input suite
    "text_chunk_overlap",  # rows 15-17: multi-script chunk boundaries
    "pipeline_seq_pack",   # rows 15-17: byte budgets on RTL/ZWJ/astral
    "text_sentence_split",  # row 18: abbreviation/ellipsis/EOS boundaries
)


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory, sf_dir):
    d = str(tmp_path_factory.mktemp("adversarial_fixture"))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?, ?, ?)",
        [(i, t, lg, s, len(t)) for i, t, lg, s in _DOCS],
    )
    con.execute(f"COPY docs TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    import os

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", _OPS)
def test_text_op_matches_oracle_on_hostile_content(
    spark, adversarial_dir, name
):
    run_compare(spark, name, adversarial_dir)
