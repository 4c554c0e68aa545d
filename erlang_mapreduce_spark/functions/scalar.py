"""Scalar function families (SURVEY.md §2.B "Scalar functions") — one
oracle-checked query per family. Ref analogs: the char-code manipulation in
countCombos / firstLetter (mapreduce.erl:257-273) for strings, float
division in calcProb (mapreduce.erl:139) for math; date/array/map-json are
engine extensions.

All expressions stay JVM-side inside whole-stage codegen — no Python UDFs.
Engine-comparison notes inline: transcendentals rounded (libm last-ulp),
timestamps emitted as strings (UTC session tz), Spark LONG-returning
floor/ceil matched by explicit casts in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       length(p_name) AS name_len,
       upper(p_brand) AS brand_up,
       substring(p_type, 1, 5) AS type5,
       ascii(substring(p_name, 1, 1)) AS first_code,
       p_brand || ':' || p_type AS brand_type,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
       CASE WHEN regexp_matches(p_name, '^[a-z]{2}') THEN 1 ELSE 0 END
           AS starts_2alpha,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: length/upper/substring/ascii/concat/regexp/lpad —
    generalizes the reference's char-code ops (mapreduce.erl:257-273)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_up"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.ascii(F.substring("p_name", 1, 1)).alias("first_code"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.when(F.col("p_name").rlike("^[a-z]{2}"), 1)
        .otherwise(0)
        .alias("starts_2alpha"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS INTEGER) AS days_since,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: trunc/extract/diff/interval arithmetic. Timestamps are
    formatted to strings so the hash is transport-independent."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias(
            "days_since"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       abs(l_discount - 0.05) AS disc_dev,
       round(ln(l_extendedprice + 1), 6) AS log_price,
       CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END AS qty_sqrt,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(CAST(floor(l_quantity) AS BIGINT) % 7 AS BIGINT) AS qty_mod,
       l_extendedprice / (1.0 + l_tax) AS pre_tax
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/ln/sqrt/floor/ceil/mod/float-division (ref:
    calcProb's `/`, mapreduce.erl:139). ln rounded to 6 (libm ulp); sqrt is
    IEEE-correctly-rounded so it matches exactly — but only on a guarded
    domain: Spark yields NaN on a negative argument where DuckDB raises,
    so both sides CASE the negative rows to NULL. The mod quantizes with
    an explicit floor() (double→bigint casting truncates in Spark and
    rounds in DuckDB — both fuzz findings, tests/test_sql_fuzz.py)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")).alias(
            "qty_sqrt"
        ),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.floor("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        (F.col("l_extendedprice") / (F.lit(1.0) + F.col("l_tax"))).alias(
            "pre_tax"
        ),
    )


@query(
    "fn_array",
    oracle="""
WITH arr AS (
    SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents
)
SELECT doc_id,
       CAST(len(words) AS INTEGER) AS n_words,
       words[1] AS first_word,
       words[-1] AS last_word,
       CAST(list_contains(words, 'data') AS INTEGER) AS has_data,
       CAST(len(list_distinct(words)) AS INTEGER) AS n_distinct,
       array_to_string(words[1:3], '|') AS first3
FROM arr
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split/size/element_at/contains/distinct/slice/join —
    generalizes the bigram array expansion (mapreduce.erl:260-295)."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "data").cast("int").alias("has_data"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.array_join(F.slice(words, 1, 3), "|").alias("first3"),
    )


@query(
    "fn_map_json",
    oracle="""
SELECT event_id, event_type,
       CASE WHEN json_valid(props)
            THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
       END AS k,
       CASE WHEN json_valid(props)
            THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
       END % 10 AS k_bucket
FROM events
""",
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: extract a typed field from the events.props JSON blob.
    get_json_object avoids a full from_json schema parse when only one path
    is needed (cheaper at scale: no struct materialization). Malformed
    JSON yields NULL in Spark but a hard error in DuckDB's extractor —
    the oracle guards with json_valid so both sides degrade to NULL
    (fuzz-found; real corpora always carry some broken blobs)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        "event_type",
        k.alias("k"),
        (k % 10).alias("k_bucket"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_orderkey & 255 AS low_byte,
       l_orderkey | 15 AS or_mask,
       xor(l_orderkey, l_linenumber) AS xored,
       l_orderkey << 2 AS shl2,
       l_orderkey >> 3 AS shr3
FROM lineitem
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (and/or/xor/shifts) — exact integer ops, identical in
    every engine, used for key packing, bloom/bitmap probes and cheap
    feature hashing. Pure codegen'd projection, no shuffle."""
    li = load(spark, sf_dir, "lineitem")
    k, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(15)).alias("or_mask"),
        k.bitwiseXOR(ln.cast("bigint")).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
    )


@query(
    "fn_nested",
    oracle="""
SELECT l_orderkey,
       count(*) AS n_lines,
       string_agg(l_linenumber || ':' || coalesce(l_returnflag, ''), ','
                  ORDER BY l_linenumber, coalesce(l_returnflag, ''),
                           l_quantity)
           AS line_summary,
       CAST(coalesce(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS qty_cents
FROM lineitem
GROUP BY l_orderkey
""",
)
def fn_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested array-of-struct processing — the denormalized-layout pattern
    that replaces the orders⋈lineitem join at read time on 100 TB nested
    parquet: each order's lines are collected into a SORTED array<struct>,
    then every downstream answer is computed INSIDE the array with
    higher-order functions (size / transform+array_join / aggregate fold),
    all narrow JVM codegen after the one collect_list shuffle.

    Determinism & exactness: the struct sort key is (linenumber,
    returnflag, quantity) — a total order over the fixture's lines (ties
    beyond it are bit-identical rows, which contribute identical summary
    entries in any order), mirrored by the oracle's string_agg ORDER BY.
    The quantity fold accumulates integer CENTS (floor(q·100+0.5), the
    stream_custom_state micro-unit trick) so the array fold, Spark's
    partial aggregation, and DuckDB's sum are all order-free integer
    arithmetic. Arrays stay O(lines-per-order) — bounded fan-in, no
    skew surface beyond the parent groupBy."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    # NULL flags are coalesced to '' BEFORE the struct: otherwise the entry
    # concat nulls out (array_join skips it → '' while string_agg over an
    # all-NULL group returns NULL) and the sort key diverges (Spark sorts a
    # NULL struct field first, DuckDB's ORDER BY defaults nulls last)
    nested = li.withColumn(
        "l_returnflag", F.coalesce("l_returnflag", F.lit(""))
    ).groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct("l_linenumber", "l_returnflag", "l_quantity")
            )
        ).alias("lines")
    )
    return nested.select(
        "l_orderkey",
        F.size("lines").cast("bigint").alias("n_lines"),
        F.array_join(
            F.transform(
                "lines",
                lambda s: F.concat(
                    s["l_linenumber"].cast("string"),
                    F.lit(":"),
                    s["l_returnflag"],
                ),
            ),
            ",",
        ).alias("line_summary"),
        # per-element coalesce: a NULL quantity contributes 0 on both
        # sides (the fold would otherwise poison the whole sum to NULL
        # while the oracle's SUM silently skips NULLs — and an all-NULL
        # group must yield 0, not NULL, hence the oracle's outer coalesce)
        F.aggregate(
            "lines",
            F.lit(0).cast("bigint"),
            lambda acc, s: acc
            + F.coalesce(
                F.floor(s["l_quantity"] * 100 + 0.5).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
        ).alias("qty_cents"),
    )


@query(
    "fn_url",
    oracle="""
WITH u AS (
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' ||
               CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
    FROM documents
),
parsed AS (
    SELECT doc_id,
           regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path
    FROM u
)
SELECT host,
       count(*) AS n_urls,
       count(DISTINCT host || path) AS n_canonical
FROM parsed
GROUP BY host
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + canonicalization — the first step of every web-corpus
    pipeline: documents get a synthesized well-formed URL (so the oracle
    can rebuild it), `parse_url` splits host/path JVM-side, and the
    canonical form (host+path, query and fragment stripped — the classic
    tracking-parameter strip) feeds a per-host report of raw vs canonical
    URL counts — exactly the shape a crawl-dedup stage consumes. One
    narrow projection + one hash agg; the distinct count rides the same
    exchange.

    Cross-engine: Spark's `parse_url` (java.net.URI semantics) and the
    oracle's anchored regexes agree on this well-formed URL shape —
    host = authority, path = everything before '?' — and a NULL
    source/lang nulls the whole URL on both sides (string concat is
    NULL-strict in both engines), grouping under the NULL host."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
    )
    return parsed.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct(F.concat("host", "path")).alias("n_canonical"),
    )
