"""Maximal-marginal-relevance (MMR) diverse top-k selection.

The standard RAG/retrieval re-ranker: from a relevance-ranked candidate
pool, greedily pick items maximizing
``lambda * relevance - (1 - lambda) * max-similarity-to-selected`` —
relevant results that aren't near-duplicates of each other.

Spark-first split: candidate generation and the pairwise-similarity
table are distributed (the expensive part — at corpus scale the pool
comes from ANN search and the sim table is pool^2, both cluster jobs);
the greedy selection itself runs on the collected pool — BOUNDED at
``N_POOL`` rows by construction, the same driver-side contract as a
collected k-means codebook.  The selection arithmetic is plain IEEE
doubles over Spark-computed cosines, so the DuckDB oracle — which
replays each greedy round as generated SQL (the ``bpe_merges``
device) — matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as sqltypes

from ..functions import similarity as sim
from ..tables import load_table

N_POOL = 16  # relevance-ranked candidate pool size
K_SEL = 6  # diverse picks
LAM = 0.5  # relevance/diversity balance

_SCHEMA = sqltypes.StructType(
    [
        sqltypes.StructField("sel_rank", sqltypes.LongType()),
        sqltypes.StructField("vec_id", sqltypes.LongType()),
        sqltypes.StructField("relevance", sqltypes.DoubleType()),
        sqltypes.StructField("max_sim_selected", sqltypes.DoubleType()),
        sqltypes.StructField("mmr_score", sqltypes.DoubleType()),
    ]
)


def q_mmr_select(spark: SparkSession, sf: str) -> DataFrame:
    """MMR-select ``K_SEL`` of the top-``N_POOL`` neighbors of query
    vector 0: distributed relevance ranking + pairwise sims, bounded
    greedy selection."""
    e = load_table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    cand = sim.brute_force_topk(e, q, "vec_id", "embedding", k=N_POOL).select(
        F.col("neighbor_id").alias("cid"), F.col("cosine").alias("rel")
    )
    vecs = e.join(cand, e["vec_id"] == cand["cid"]).select(
        "cid", "rel", sim.as_double(F.col("embedding")).alias("v")
    )
    a = vecs.select(
        F.col("cid").alias("ca"), F.col("v").alias("va")
    )
    b = vecs.select(F.col("cid").alias("cb"), F.col("v").alias("vb"))
    sims = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("ca") != F.col("cb"))
        .select("ca", "cb", sim.cosine(F.col("va"), F.col("vb")).alias("s"))
    )
    pool = {r.cid: r.rel for r in vecs.select("cid", "rel").collect()}
    smat = {(r.ca, r.cb): r.s for r in sims.collect()}

    selected: list[tuple[int, int, float, float, float]] = []
    chosen: list[int] = []
    for rank in range(1, K_SEL + 1):
        best = None
        for cid in sorted(pool):
            if cid in chosen:
                continue
            ms = max((smat[(cid, s)] for s in chosen), default=0.0)
            score = LAM * pool[cid] - (1.0 - LAM) * ms
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, cid, pool[cid], ms, score)
        _, cid, rel, ms, score = best
        chosen.append(cid)
        selected.append((rank, cid, rel, ms, score))
    return spark.createDataFrame(selected, _SCHEMA)


def _round_sql(r: int) -> str:
    """Round r >= 1: score unselected candidates against sel{r-1}."""
    prev = f"sel{r - 1}"
    return f"""
scored{r} AS MATERIALIZED (
    SELECT c.cid, c.rel,
           coalesce((SELECT max(s.s) FROM sims s
                     WHERE s.ca = c.cid
                       AND s.cb IN (SELECT cid FROM {prev})), 0.0) AS ms
    FROM cand c
    WHERE c.cid NOT IN (SELECT cid FROM {prev})
),
pick{r} AS MATERIALIZED (
    SELECT cid, rel, ms, {LAM} * rel - {1.0 - LAM} * ms AS score
    FROM scored{r}
    ORDER BY {LAM} * rel - {1.0 - LAM} * ms DESC, cid
    LIMIT 1
),
sel{r} AS MATERIALIZED (
    SELECT cid FROM {prev} UNION ALL SELECT cid FROM pick{r}
)"""


def _oracle_mmr() -> str:
    rounds = ",\n".join(_round_sql(r) for r in range(1, K_SEL + 1))
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS sel_rank, cid AS vec_id, "
        f"rel AS relevance, ms AS max_sim_selected, score AS mmr_score "
        f"FROM pick{r}"
        for r in range(1, K_SEL + 1)
    )
    return f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
rel AS (
    SELECT e.vec_id AS cid,
           list_dot_product(e.v, q.qv)
             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))
               AS rel
    FROM e CROSS JOIN q WHERE e.vec_id <> 0
),
cand AS MATERIALIZED (
    SELECT cid, rel FROM (
        SELECT *, row_number() OVER (ORDER BY rel DESC, cid) AS rn FROM rel)
    WHERE rn <= {N_POOL}
),
sims AS MATERIALIZED (
    SELECT a.cid AS ca, b.cid AS cb,
           list_dot_product(ea.v, eb.v)
             / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
               AS s
    FROM cand a JOIN e ea ON a.cid = ea.vec_id
    CROSS JOIN cand b JOIN e eb ON b.cid = eb.vec_id
    WHERE a.cid <> b.cid
),
sel0 AS (SELECT CAST(NULL AS BIGINT) AS cid WHERE false),
{rounds}
{finals}
"""


ORACLE_MMR_SELECT = _oracle_mmr()
