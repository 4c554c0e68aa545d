"""Raw-web ingestion front door: main-content extraction from HTML.

A real 100 TB pretraining pipeline starts from crawled HTML (WARC), not
extracted text — every downstream corpus op (quality gate, dedup, BPE)
assumes the extraction already happened. ``text_html_extract`` is that
missing first stage: drop comments / script / style, segment the page on
block-level closers, keep segments that pass a word-count + link-density
boilerplate gate (the Boilerpipe/jusText heuristic family), strip tags,
decode entities, normalize whitespace.

The reference's corpus arrives pre-extracted — one word per line
(mapreduce.erl:41-42) — so this op has no reference analog; it covers the
step a reference user runs OUTSIDE the engine today.

Because the test corpus is plain text (no HTML column exists in the
fixtures), the op first synthesizes a DETERMINISTIC page around each
document — template keyed by doc_id, boilerplate nav/footer, head
title/style/script, an HTML comment, and an entity-laden tail sentence —
with the identical string algebra in Spark and DuckDB, so the oracle
hash-checks the EXTRACTION chain end-to-end (the wrapper is shared; any
divergence left is the extractor's). In production the wrapper stage is
replaced by `scan_text`/`scan_binary_files` over the crawl, and the
extraction projection below runs unchanged.

Scale shape: the whole op is ONE narrow projection over the scan — no
shuffle, no UDF, no explode; every regex runs inside whole-stage codegen
and the per-segment work is higher-order ``transform``/``filter`` over an
array that lives and dies in the row. At 100 TB this is the cheapest
possible shape: cost is strictly per-byte-scanned, trivially partitionable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Boilerplate gate: a segment survives if it has at least MIN_WORDS words
# after tag-strip AND its anchor count stays under 1 link per
# LINK_DENSITY_WORDS words — nav/footer/menus fail one or both.
MIN_WORDS = 5
LINK_DENSITY_WORDS = 3

# Block-level closers that end a text segment. Non-capturing group: Java
# split and DuckDB string_split_regex agree on full-match splitting.
_BLOCK_SPLIT_RE = r"(?i)</(?:p|div|nav|footer|article|section|h[1-6])>"
_ANCHOR_RE = r"(?i)<a "  # every anchor here is written with attributes
_TAG_RE = "<[^>]*>"
# Explicit class, not \s: Java \s includes \x0B, RE2's does not — the
# explicit class is identical in both engines (test_unicode_parity's
# lesson applied to whitespace).
_WS_RE = "[ \\t\\n\\r\\f]+"

# Entity decode map, applied in this order — &amp; LAST, or double-encoded
# entities ("&amp;lt;") would decode twice. Plain replace() is
# replace-all in both engines.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# The deterministic page wrapper, keyed by doc_id % 3. {id} and {text}
# are the per-doc fields; everything else is shared boilerplate the
# extractor must remove. The entity tail proves decode order; the comment
# and head script/style prove block dropping; nav/footer prove the
# link-density gate.
_HEAD = (
    "<html><head><title>Doc {id}</title>"
    "<style>body { color: #000; }</style>"
    "<script>var a = 1 &amp;&amp; 2;</script></head><body>"
)
_NAV = (
    '<nav><a href="/">Home</a> <a href="/about">About</a>'
    ' <a href="/contact">Contact</a></nav>'
)
_COMMENT = "<!-- render id {id} <p>not content</p> -->"
_ENTITY_TAIL = (
    "Tom &amp; Jerry say &quot;hi&quot; &lt;now&gt;"
    " it&#39;s a&nbsp;test of entities"
)
_FOOTER = (
    '<footer><a href="/tos">Terms</a> <a href="/privacy">Privacy</a>'
    " &copy; 2026</footer></body></html>"
)
_TEMPLATES = [
    _HEAD + _NAV + _COMMENT
    + '<div class="main"><p>{text} ' + _ENTITY_TAIL + "</p></div>" + _FOOTER,
    _HEAD + _NAV + _COMMENT
    + "<article><p>{text} " + _ENTITY_TAIL + "</p>"
    + "<script>trackPageView();</script></article>" + _FOOTER,
    _HEAD + _COMMENT
    + '<section id="c"><h1>Doc {id}</h1><p>{text} ' + _ENTITY_TAIL
    + "</p></section>" + _NAV + _FOOTER,
]


def _wrap_html(doc_id: Column, text: Column) -> Column:
    """The synthetic page for one document — NULL text yields NULL html
    (F.concat NULL semantics; the oracle's `||` chain matches), which the
    extractor passes through as a NULL page."""
    variant = (doc_id % len(_TEMPLATES)).cast("int")
    built = []
    for tpl in _TEMPLATES:
        parts: list[Column] = []
        for piece in tpl.replace("{id}", "\x00id\x00").split("\x00"):
            if piece == "id":
                parts.append(doc_id.cast("string"))
            elif "{text}" in piece:
                pre, post = piece.split("{text}")
                if pre:
                    parts.append(F.lit(pre))
                parts.append(text)
                if post:
                    parts.append(F.lit(post))
            elif piece:
                parts.append(F.lit(piece))
        built.append(F.concat(*parts))
    expr = F.when(variant == 0, built[0])
    for i in range(1, len(_TEMPLATES)):
        expr = expr.when(variant == i, built[i])
    return expr


def _wrap_html_sql(id_expr: str, text_expr: str) -> str:
    """DuckDB twin of `_wrap_html`: the same templates as a CASE over
    `||` chains (NULL-propagating, unlike DuckDB's concat())."""

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    cases = []
    for i, tpl in enumerate(_TEMPLATES):
        parts = []
        for piece in tpl.replace("{id}", "\x00id\x00").split("\x00"):
            if piece == "id":
                parts.append(f"CAST({id_expr} AS VARCHAR)")
            elif "{text}" in piece:
                pre, post = piece.split("{text}")
                if pre:
                    parts.append(lit(pre))
                parts.append(text_expr)
                if post:
                    parts.append(lit(post))
            elif piece:
                parts.append(lit(piece))
        cases.append(f"WHEN {i} THEN " + " || ".join(parts))
    return (
        f"CASE CAST({id_expr} % {len(_TEMPLATES)} AS INTEGER) "
        + " ".join(cases)
        + " END"
    )


def extract_main_text(html: Column) -> Column:
    """html → main content text. Comments and script/style blocks drop
    first (they may span segment boundaries), the page splits on
    block-level closers, each segment is gated on word count and link
    density, survivors are tag-stripped, entity-decoded,
    whitespace-collapsed, and rejoined in page order. Pure built-ins —
    the whole thing is one codegen'd projection."""
    c = F.regexp_replace(html, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style>", " ")
    segs = F.split(c, _BLOCK_SPLIT_RE)

    def seg_text(s: Column) -> Column:
        t = F.regexp_replace(s, _TAG_RE, " ")
        for ent, rep in _ENTITIES:
            t = F.replace(t, F.lit(ent), F.lit(rep))
        return F.trim(F.regexp_replace(t, _WS_RE, " "))

    cand = F.transform(
        segs,
        lambda s: F.struct(
            seg_text(s).alias("txt"),
            (F.size(F.split(s, _ANCHOR_RE)) - 1).alias("links"),
        ),
    )
    n_words = lambda x: F.size(F.split(x["txt"], " "))  # noqa: E731
    kept = F.filter(
        cand,
        lambda x: (x["txt"] != "")
        & (n_words(x) >= MIN_WORDS)
        & (x["links"] * LINK_DENSITY_WORDS < n_words(x)),
    )
    return F.array_join(F.transform(kept, lambda x: x["txt"]), " ")


def _extract_sql(html_expr: str) -> str:
    """DuckDB twin of `extract_main_text` — identical chain, RE2 flags
    embedded in the patterns, 'g' passed as the option (DuckDB
    regexp_replace is first-match-only by default; Spark's is global)."""
    ent_chain = "regexp_replace(s, '{}', ' ', 'g')".format(_TAG_RE)
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        ent_chain = f"replace({ent_chain}, '{ent}', '{rep_sql}')"
    seg_txt = f"trim(regexp_replace({ent_chain}, '{_WS_RE}', ' ', 'g'))"
    return f"""
list_transform(
  list_filter(
    list_transform(
      string_split_regex(
        regexp_replace(
          regexp_replace(
            regexp_replace({html_expr}, '(?s)<!--.*?-->', ' ', 'g'),
            '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
          '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
        '{_BLOCK_SPLIT_RE}'),
      s -> struct_pack(
             txt := {seg_txt},
             links := len(string_split_regex(s, '{_ANCHOR_RE}')) - 1)),
    x -> x.txt <> ''
         AND len(string_split(x.txt, ' ')) >= {MIN_WORDS}
         AND x.links * {LINK_DENSITY_WORDS} < len(string_split(x.txt, ' '))),
  x -> x.txt)
"""


_ORACLE = f"""
WITH page AS (
    SELECT doc_id, {_wrap_html_sql("doc_id", "text")} AS html
    FROM documents
),
ext AS (
    SELECT doc_id,
           array_to_string({_extract_sql("html")}, ' ') AS main_text
    FROM page
)
SELECT doc_id,
       main_text,
       CAST(CASE WHEN main_text IS NULL OR main_text = '' THEN 0
                 ELSE len(string_split(main_text, ' ')) END AS BIGINT)
           AS n_words
FROM ext
"""


@query("text_html_extract", oracle=_ORACLE)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction over the synthetic page corpus (module
    docstring): (doc_id, main_text, n_words). main_text is the document's
    content paragraph(s) plus the decoded entity tail; nav / footer /
    head / comments / scripts never survive. NULL-text docs yield a NULL
    page and a NULL main_text with n_words 0."""
    d = load(spark, sf_dir, "documents")
    page = d.select(
        "doc_id", _wrap_html(F.col("doc_id"), F.col("text")).alias("html")
    )
    ext = page.select(
        "doc_id", extract_main_text(F.col("html")).alias("main_text")
    )
    return ext.select(
        "doc_id",
        "main_text",
        F.when(
            F.col("main_text").isNull() | (F.col("main_text") == ""),
            F.lit(0),
        )
        .otherwise(F.size(F.split("main_text", " ")))
        .cast("bigint")
        .alias("n_words"),
    )
