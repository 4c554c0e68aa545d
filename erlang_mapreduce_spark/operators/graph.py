"""Graph analytics — iterative PageRank over the part↔supplier bipartite
graph induced by lineitem.

Complements dedup_cluster_cc (dedup.py): CC iterates to a data-dependent
fixed point, PageRank here runs a FIXED number of power-iteration rounds —
which is what makes it exactly oracle-checkable: the DuckDB twin unrolls the
same rounds as chained CTEs. The reference engine has no iterative
workloads at all (mapreduce.erl is one map+reduce pass); this extends the
declared surface per SURVEY.md §2.B.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ckpt import (
    guard_result,
    pooled_local_checkpoint,
    pooled_persist,
    release_transient_storage,
)
from ..registry import query
from ..session import scoped_conf
from ..tables import load

PR_ITERS = 3  # fixed power-iteration rounds (unrolled in the oracle)

# One oracle round: ranks flow over edges (per-edge contribution is integer
# micro-rank div out-degree), then damping in integer micros:
# new = 0.15 + 0.85 * sum(contrib), all times 1e6.
_ROUND_SQL = """
r{i} AS (
    SELECT ed.dst AS node,
           CAST(150000 + (85 * sum(r{p}.r // ed.d)) // 100 AS BIGINT) AS r
    FROM ed JOIN r{p} ON r{p}.node = ed.src
    GROUP BY 1
)"""


@query(
    "graph_pagerank",
    oracle=(
        """
WITH pairs AS (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
),
edges AS (
    SELECT CAST(2 * pk AS BIGINT) AS src,
           CAST(2 * sk + 1 AS BIGINT) AS dst FROM pairs
    UNION ALL
    SELECT CAST(2 * sk + 1 AS BIGINT), CAST(2 * pk AS BIGINT) FROM pairs
),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
ed AS (SELECT e.src, e.dst, deg.d FROM edges e JOIN deg USING (src)),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),"""
        + ",".join(
            _ROUND_SQL.format(i=i, p=i - 1) for i in range(1, PR_ITERS + 1)
        )
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'p' || CAST(node // 2 AS VARCHAR)
            ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
       r AS rank_micro
FROM r{PR_ITERS}
"""
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 power iterations) over the undirected
    bipartite graph part↔supplier: an edge per distinct (l_partkey,
    l_suppkey) sourcing relationship, symmetrized. Surfaces the
    most-connected parts/suppliers — the "hub detection" workload.

    Exactness across engines: ranks live as BIGINT MICRO-units, every
    division is integer division (`div` / `//` — identical floor on
    positives), and sums of integers are order-free — so three rounds of
    float-free arithmetic hash identically no matter how either engine
    parallelizes. (Same integer-micro trick as stream_custom_state's
    oracle; float PageRank would drift in the last ulp per round.) Every
    node has degree ≥ 1 and the graph is symmetric, so every node receives
    mass every round — no dangling-mass correction term needed and the
    node set is closed under iteration.

    Physical shape per round: ranks ⋈ edges on src (both sides arrive
    hash-partitioned on the SAME key from the previous round's agg, so
    AQE reuses the partitioning) then one hash agg on dst — the classic
    2-exchange-per-round message-passing plan. Nodes are PACKED LONGS
    (part → 2k, supplier → 2k+1), not 'p123'-style strings: every round
    shuffles the node key twice, and an 8-byte fixed key hashes,
    compares, and ships several times cheaper than a variable-length
    string — the human-readable form is restored in one narrow final
    projection. Edges+degrees are built once and cached (at 100 TB:
    persisted to durable storage — same remedy as dedup_cluster_cc's
    checkpoint_dir, dedup.py). Iteration count is FIXED, so the lineage
    stays 3 rounds deep — no unbounded plan growth, no checkpoint needed
    at this depth."""
    release_transient_storage()  # free the previous invocation's blocks
    # pooled: the edge list derives from pairs twice (deg build + ed's
    # edge side) and the ranks init re-reads deg — without this cache the
    # lineitem scan + distinct exchange runs twice per invocation
    pairs = pooled_persist(
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    pk2 = (F.col("l_partkey") * 2).cast("bigint")
    sk2 = (F.col("l_suppkey") * 2 + 1).cast("bigint")
    fwd = pairs.select(pk2.alias("src"), sk2.alias("dst"))
    rev = pairs.select(sk2.alias("src"), pk2.alias("dst"))
    edges = fwd.unionAll(rev)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # pooled: blocks are released at the next pooled-op invocation (and by
    # bench.py between passes) instead of occupying executor storage for
    # the life of the shared session; a consumer that outlives the release
    # just recomputes from lineage.
    ed = pooled_persist(edges.join(deg, "src"))

    def _damp(contrib: DataFrame) -> DataFrame:
        return contrib.groupBy("dst").agg(
            F.expr("CAST(150000 + (85 * sum(c)) div 100 AS BIGINT)").alias(
                "r"
            )
        ).select(F.col("dst").alias("node"), "r")

    # Round 1 is algebraic: the initial rank is the CONSTANT 1e6 on every
    # node, and `ed` already carries each src's out-degree — so the first
    # contribution is `1e6 div d` straight off the cached edge table, no
    # rank⋈edges join and no rank-init aggregate (guide §2.4: remove
    # shuffles outright). Plan: 2 exchanges fewer per invocation (the
    # deg-init agg and the round-1 join exchange); values are identical
    # (same integer expression the unrolled oracle computes for r1).
    ranks = _damp(ed.select("dst", F.expr("1000000 div d").alias("c")))
    for _ in range(PR_ITERS - 1):
        contrib = ed.join(ranks, ed.src == ranks.node).select(
            "dst", F.expr("r div d").alias("c")
        )
        ranks = _damp(contrib)
    out = ranks.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("p")).otherwise(F.lit("s")),
            F.expr("node div 2").cast("string"),
        ).alias("node"),
        F.col("r").alias("rank_micro"),
    )
    # Execute the rounds EAGERLY under a scoped AQE floor override: the
    # session-wide minPartitionSize=32k floor exists for CPU-heavy gram
    # shuffles, but pagerank's per-round exchanges are byte-light AND
    # cpu-light — the floor pinned each of the ~8 exchanges at ~32
    # near-empty tasks (measured 2.49 s → 4.75 s at sf0.1, stable across
    # passes). Restoring Spark's default 1m floor lets AQE coalesce them
    # to a handful of tasks; the conf only binds at execution start, so
    # the result (one row per node — tiny) is materialized inside the
    # scope via a pooled localCheckpoint and returned guarded.
    with scoped_conf(
        spark,
        {"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m"},
    ):
        return guard_result(pooled_local_checkpoint(out))


@query(
    "graph_triangle_count",
    oracle=None,  # composed at import below (reuses dedup's gram CTEs)
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts over the NEAR-DUPLICATE similarity
    graph (edges = exact-Jaccard ≥ JACCARD_T pairs, the dedup_ngram_jaccard
    output): the clustering-cohesion primitive — a document in many
    triangles sits inside a dense duplicate cluster (boilerplate family),
    one with edges but no triangles is a chain of pairwise-similar
    revisions; downweighting strategies treat the two very differently.
    The classic MapReduce graph benchmark, inexpressible in the
    reference's one-pass engine, and deliberately run on the similarity
    graph rather than a co-occurrence projection: TPC-H-ish co-supply
    projections of this fixture are near-complete (degenerate), while
    the similarity graph is sparse by construction at any corpus size —
    its edge count is bounded by the dedup pipeline's own candidate
    budget (GRAM_DF_CAP + verbatim collapse).

    Collapse (round 9): the member-level graph is a clique BLOW-UP of the
    representative-level jaccard graph — verbatim group members are
    pairwise connected iff the group's gram set is nonempty, and two
    groups' members are all-pairs connected iff their reps are — so
    per-member triangle counts follow from rep-level structure plus group
    sizes, with NO expanded graph anywhere:

        n_tri(d in A) = [A eligible]·C(nA−1, 2)          (all three in A)
                      + (nA−1)·Σ_{B∈N(A)} nB             (two in A)
                      + Σ_{B∈N(A)} C(nB, 2)              (two in one B)
                      + Σ_{rep-triangles (A,B,C)} nB·nC  (one in each)

    (groups with any rep edge are automatically eligible, so the within
    terms of rows 2-3 never reference a missing clique). Previously the
    wedge join ran on the member-expanded edge set, whose replica cliques
    carry C(R,2) edges each — the dominant term in the r8 10× probe.

    Wedge algorithm for the rep-triangle term: degree-ordered orientation
    (Cohen's MapReduce scheme): every edge points from its smaller
    (degree, node) endpoint — compared as a two-field STRUCT (d, node),
    the total order both engines define lexicographically, rather than a
    packed d·2^32+node long whose injectivity silently assumed
    0 ≤ doc_id < 2^32 (round-8 ADVICE) — so each triangle is generated
    exactly once as a wedge at its lowest-degree corner and closed by one
    equi-join on the struct keys. Out-degree under this orientation is
    O(sqrt(m)) regardless of hub size: wedge fan-out is Σ C(outdeg, 2) ≤
    m·√m, never hub-quadratic, with every join a shuffle-keyed equi-join
    (no cartesian, pinned by the blanket plan test). Docs with no
    qualifying edges report 0 through the coalesced terms; integer counts
    hash exactly (the oracle still computes at raw member level, so the
    hash match IS the blow-up identity)."""
    from .dedup import (
        _materialize,
        _nonempty_reps,
        _rep_jaccard_pairs,
        _shared_gram_sets,
        _shared_members,
    )

    release_transient_storage()  # free the previous invocation's blocks
    members = _shared_members(spark, sf_dir)
    doc_sets = _shared_gram_sets(spark, sf_dir)
    gsize = members.groupBy("rep_id").agg(F.count("*").alias("n"))
    # the edge list is referenced by a dozen downstream branches (degree,
    # neighbor sums, three orientation aliases, the weight joins) — each
    # would re-expand the whole pair-stream + verify lineage without this
    # one materialization of the (tiny, threshold-filtered) rep pairs
    e = _materialize(
        _rep_jaccard_pairs(spark, sf_dir).select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        ),
        "tri_rep_edges",
        sf_dir,
    )
    nbr = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # per-rep neighbor-size sums: S1 = Σ n(B), S2 = Σ C(n(B), 2)
    nsz = (
        nbr.join(gsize.select(F.col("rep_id").alias("v"), "n"), "v")
        .groupBy("u")
        .agg(
            F.sum("n").alias("s1"),
            F.sum(F.expr("(n * (n - 1)) div 2")).alias("s2"),
        )
    )
    deg = nbr.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    ek = (
        e.join(deg.alias("du"), F.col("u") == F.col("du.node"))
        .join(deg.alias("dv"), F.col("v") == F.col("dv.node"))
        .select(
            "u",
            "v",
            F.struct(
                F.col("du.d").alias("d"), F.col("u").alias("n")
            ).alias("ku"),
            F.struct(
                F.col("dv.d").alias("d"), F.col("v").alias("n")
            ).alias("kv"),
        )
    )
    lo = F.col("ku") < F.col("kv")
    # materialized like the edge list: three aliases consume the oriented
    # edges, and each would otherwise recompute the degree join
    o = _materialize(
        ek.select(
            F.when(lo, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lo, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lo, F.col("ku")).otherwise(F.col("kv")).alias("srck"),
            F.when(lo, F.col("kv")).otherwise(F.col("ku")).alias("dstk"),
        ),
        "tri_oriented",
        sf_dir,
    )
    wa, wb, wc = o.alias("wa"), o.alias("wb"), o.alias("wc")
    tri = (
        wa.join(
            wb,
            (F.col("wa.srck") == F.col("wb.srck"))
            & (F.col("wa.dstk") < F.col("wb.dstk")),
        )
        .join(
            wc,
            (F.col("wc.srck") == F.col("wa.dstk"))
            & (F.col("wc.dstk") == F.col("wb.dstk")),
        )
        .select(
            F.col("wa.src").alias("u"),
            F.col("wa.dst").alias("v"),
            F.col("wb.dst").alias("w"),
        )
    )
    # one-in-each term: every rep triangle (A,B,C) credits each corner
    # with the PRODUCT of the other two groups' sizes
    tw = (
        tri.join(gsize.select(F.col("rep_id").alias("u"),
                              F.col("n").alias("na")), "u")
        .join(gsize.select(F.col("rep_id").alias("v"),
                           F.col("n").alias("nb")), "v")
        .join(gsize.select(F.col("rep_id").alias("w"),
                           F.col("n").alias("nc")), "w")
    )
    wsum = (
        tw.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("node"),
                             (F.col("nb") * F.col("nc")).alias("pw")),
                    F.struct(F.col("v").alias("node"),
                             (F.col("na") * F.col("nc")).alias("pw")),
                    F.struct(F.col("w").alias("node"),
                             (F.col("na") * F.col("nb")).alias("pw")),
                )
            ).alias("x")
        )
        .select("x.node", "x.pw")
        .groupBy("node")
        .agg(F.sum("pw").alias("wt"))
    )
    per_rep = (
        gsize.join(
            _nonempty_reps(doc_sets).withColumn("e1", F.lit(1)),
            "rep_id",
            "left",
        )
        .join(nsz.withColumnRenamed("u", "rep_id"), "rep_id", "left")
        .join(wsum.withColumnRenamed("node", "rep_id"), "rep_id", "left")
        .select(
            "rep_id",
            (
                F.when(
                    F.col("e1").isNotNull(),
                    F.expr("((n - 1) * (n - 2)) div 2"),
                ).otherwise(F.lit(0))
                + F.coalesce((F.col("n") - 1) * F.col("s1"), F.lit(0))
                + F.coalesce(F.col("s2"), F.lit(0))
                + F.coalesce(F.col("wt"), F.lit(0))
            )
            .cast("long")
            .alias("n_triangles"),
        )
    )
    # every document belongs to exactly one verbatim group, so the member
    # map IS the full doc list — no separate documents scan needed
    return guard_result(
        members.join(per_rep, "rep_id").select("doc_id", "n_triangles")
    )


def _triangle_oracle() -> str:
    """The DuckDB twin, composed from dedup's gram CTEs so the edge set
    is definitionally dedup_ngram_jaccard's oracle output."""
    from .dedup import _GRAMS_CTE, JACCARD_T

    return f"""
{_GRAMS_CTE.strip()},
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ix
    FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
eg AS (
    SELECT doc_a AS u, doc_b AS v
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(ix AS DOUBLE) / (sa.sz + sb.sz - ix) >= {JACCARD_T}
),
deg AS (
    SELECT node, count(*) AS d
    FROM (SELECT u AS node FROM eg UNION ALL SELECT v AS node FROM eg)
    GROUP BY 1
),
o AS (
    SELECT CASE WHEN ku < kv THEN u ELSE v END AS src,
           CASE WHEN ku < kv THEN v ELSE u END AS dst,
           CASE WHEN ku < kv THEN ku ELSE kv END AS srck,
           CASE WHEN ku < kv THEN kv ELSE ku END AS dstk
    FROM (
        SELECT eg.u, eg.v,
               row(du.d, eg.u) AS ku,
               row(dv.d, eg.v) AS kv
        FROM eg JOIN deg du ON du.node = eg.u JOIN deg dv ON dv.node = eg.v
    )
),
tri AS (
    SELECT a.src AS u, a.dst AS v, b.dst AS w
    FROM o a
    JOIN o b ON a.srck = b.srck AND a.dstk < b.dstk
    JOIN o c ON c.srck = a.dstk AND c.dstk = b.dstk
),
pn AS (
    SELECT node, count(*) AS n
    FROM (SELECT u AS node FROM tri UNION ALL
          SELECT v AS node FROM tri UNION ALL
          SELECT w AS node FROM tri)
    GROUP BY 1
)
SELECT d.doc_id, CAST(coalesce(pn.n, 0) AS BIGINT) AS n_triangles
FROM documents d LEFT JOIN pn ON pn.node = d.doc_id
"""


from ..registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["graph_triangle_count"] = _triangle_oracle().strip()
