"""UDF surface (SURVEY.md §2.B "UDF surface").

UDFs are the engine's slow path — every op here exists either because the
semantics genuinely need imperative code (the countCombos state machine
showcase) or to demonstrate the sanctioned Python escape hatches at their
fastest (Arrow-batched pandas UDFs / applyInPandas / UDTF). Everything the
declarative operators can express stays JVM-side.

``bigram_state_machine`` is a faithful Python port of the reference's
countCombos skip rule (mapreduce.erl:260-295): in window [H1,H2|Rest], a
valid pair emits and advances 1 (overlapping); invalid H1 advances 1;
invalid H2 advances 2. SURVEY.md §2.3 Q1 proves this output-equivalent to
"all adjacent pairs filtered to ^[a-z]{2}$" — the oracle below exploits
exactly that equivalence, so the state machine is cross-checked against the
declarative SQL on every run.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load
from .. import operators  # noqa: F401  (text helpers)


def bigram_state_machine(word: str) -> list[str]:
    """Port of countCombos (mapreduce.erl:260-295), bigram emission only
    (the totalCount side-channel, :283-292, is mode-specific — dropped in
    canonical distributed semantics, SURVEY.md §2.3 Q2)."""
    out = []
    i = 0
    n = len(word)
    while i + 1 < n:
        v1 = "a" <= word[i] <= "z"
        v2 = "a" <= word[i + 1] <= "z"
        if v1 and v2:
            out.append(word[i : i + 2])
            i += 1
        elif not v1:
            i += 1  # invalid first char: advance 1 (mapreduce.erl:268-269)
        else:
            i += 2  # invalid second char: advance 2 (mapreduce.erl:270-271)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def _bigrams_udf(words: pd.Series) -> pd.Series:
    return words.apply(bigram_state_machine)


_WORDS_CTE = """
WITH words AS (
    SELECT w AS word
    FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM documents)
    WHERE length(w) > 0
),
kept AS (
    SELECT word FROM words
    WHERE regexp_matches(word, '^[a-z]') AND length(word) >= 2
)
"""


@query(
    "udf_scalar",
    oracle=f"""
{_WORDS_CTE.strip()},
bg AS (
    SELECT substring(word, CAST(i AS INTEGER), 2) AS bigram
    FROM (SELECT word, unnest(range(1, length(word))) AS i FROM kept)
    WHERE regexp_matches(substring(word, CAST(i AS INTEGER), 2), '^[a-z]{{2}}$')
)
SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram
""",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The countCombos state machine as an Arrow-batched pandas UDF. Its
    oracle is the DECLARATIVE pair extraction — each driver run re-proves
    the Q1 equivalence on real data."""
    from ..operators.text import dist_mode_filter, tokenize

    words = dist_mode_filter(tokenize(load(spark, sf_dir, "documents")))
    return (
        words.select(F.explode(_bigrams_udf("word")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "udf_grouped",
    oracle="""
WITH stats AS (
    SELECT user_id, avg(value) AS mu,
           CASE WHEN count(*) > 1 THEN stddev_samp(value) END AS sd
    FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       CASE WHEN s.sd IS NOT NULL AND s.sd <> 0
            THEN round((e.value - s.mu) / s.sd, 4) END AS znorm
FROM events e JOIN stats s USING (user_id)
""",
)
def udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: z-normalize event values per user (the
    SNIPPETS.md normalize pattern). Each user's rows arrive as one pandas
    frame via Arrow; at scale this shuffles once on user_id and the Python
    work parallelizes per group. round(4) absorbs pandas-vs-SQL float
    summation order in the mean/std."""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std()  # ddof=1 == stddev_samp
        mu = pdf["value"].mean()
        if pd.isna(sd) or sd == 0:
            z = pd.Series([None] * len(pdf), dtype="float64")
        else:
            z = ((pdf["value"] - mu) / sd).round(4)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "znorm": z}
        )

    return e.groupBy("user_id").applyInPandas(
        normalize, "event_id long, user_id long, znorm double"
    )


@query(
    "udaf",
    oracle="""
SELECT event_type,
       round(exp(avg(ln(value))), 6) AS geo_mean,
       count(*) AS cnt
FROM events
WHERE value > 0
GROUP BY event_type
""",
)
def udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregation via GROUPED_AGG pandas UDF: geometric mean —
    not a Spark built-in. Arrow ships each group's column once; round(6)
    absorbs libm/summation ulps."""
    import numpy as np

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # GROUPED_AGG pandas UDFs cannot mix with built-in aggregates in one
    # agg() — the companion count is a second pandas UDF
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    e = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    return e.groupBy("event_type").agg(
        F.round(geo_mean("value"), 6).alias("geo_mean"),
        n_rows("value").alias("cnt"),
    )


@query(
    "udtf",
    oracle=f"""
{_WORDS_CTE.strip()},
dw AS (SELECT DISTINCT word FROM kept),
bg AS (
    SELECT word, substring(word, CAST(i AS INTEGER), 2) AS bigram
    FROM (SELECT word, unnest(range(1, length(word))) AS i FROM dw)
    WHERE regexp_matches(substring(word, CAST(i AS INTEGER), 2), '^[a-z]{{2}}$')
)
SELECT word, count(*) AS n_bigrams FROM bg GROUP BY word
""",
)
def udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python table function (Spark UDTF): word → one row per bigram, via
    the state machine; aggregated to bigrams-per-word. Lateral-joined in
    SQL — the row-generating UDF shape (vs udf_scalar's array-return).
    useArrow=True: the default pickle path plans as row-at-a-time
    BatchEvalPythonUDTF; Arrow batches the transfer like every other
    sanctioned Python boundary (pinned by the plan sweep in
    tests/test_plans.py)."""
    from pyspark.sql.functions import udtf as _udtf

    from ..operators.text import dist_mode_filter, tokenize

    @_udtf(returnType="word: string, bigram: string", useArrow=True)
    class BigramUDTF:
        def eval(self, word: str):
            for bg in bigram_state_machine(word):
                yield word, bg

    spark.udtf.register("bigram_udtf", BigramUDTF)
    words = (
        dist_mode_filter(tokenize(load(spark, sf_dir, "documents")))
        .distinct()
    )
    words.createOrReplaceTempView("_udtf_words")
    return spark.sql(
        """SELECT t.word, count(*) AS n_bigrams
           FROM _udtf_words w, LATERAL bigram_udtf(w.word) t
           GROUP BY t.word"""
    )
