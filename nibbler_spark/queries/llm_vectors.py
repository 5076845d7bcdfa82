"""Vector math & similarity search operators (SURVEY §2.3 H18, K6–K9 +
ANN and embedding near-dup extensions).

Engine-exact vector arithmetic: per-element products are single IEEE
double ops (identical everywhere); sums run on an integer 1e-10 grid via
floor() — tie-free by construction, unlike double→decimal casts whose
tie rounding measurably differs between Spark and DuckDB on float32
inputs (terminating decimal expansions land exactly on .5 ties) — so
thresholds and top-k ranks are bit-stable between the engines. At 100 TB the embedding
table is the fact side: brute-force top-k broadcasts the (tiny) query
set and reduces per-partition (K6); the scale path is LSH bucketing (K7)
— candidates from bucket joins, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nibbler_spark.queries import register
from nibbler_spark.queries._helpers import spread
from nibbler_spark.sources import load_table

_DIM = 64  # embeddings are fixed 64-d (FIXTURES.md)


def dec_dot(a: Column, b: Column) -> Column:
    """Engine-exact dot product: per-element double products are floored
    to integer 1e-10 grid points (floor has NO tie-rounding rule, unlike
    double→decimal casts whose tie handling differs between Spark and
    DuckDB — and float32 inputs have terminating decimal expansions, so
    exact ties actually occur), summed exactly as int64, then scaled
    back. Deterministic across engines by construction."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(1e10)
        ),
    )
    return (
        F.aggregate(
            prods,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.lit(1e10)
    )


def sql_dec_dot(a: str, b: str, dim: int = _DIM) -> str:
    """DuckDB spelling of :func:`dec_dot`."""
    return (
        f"(CAST(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"* 1e10) AS BIGINT))) AS DOUBLE) / 1e10)"
    )


def cosine(a: Column, b: Column) -> Column:
    return dec_dot(a, b) / (F.sqrt(dec_dot(a, a)) * F.sqrt(dec_dot(b, b)))


def sql_cosine(a: str, b: str) -> str:
    return (
        f"{sql_dec_dot(a, b)} / "
        f"(SQRT({sql_dec_dot(a, a)}) * SQRT({sql_dec_dot(b, b)}))"
    )


def maxsim_grid(qe: Column, de: Column, n_tok: int = 8, tok_dim: int = 8) -> Column:
    """Late-interaction MaxSim score on the integer 1e-10 grid: treat
    each vector as ``n_tok`` token slices of ``tok_dim`` dims; for every
    query token take the best document-token grid dot, sum over query
    tokens. Stays int64 through max and sum, so it commutes with any
    partitioning and is engine-exact (divide by 1e10 for the score)."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_tok - 1)),
            lambda i: F.array_max(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_tok - 1)),
                    lambda j: F.aggregate(
                        F.zip_with(
                            F.slice(qe, i * tok_dim + 1, tok_dim),
                            F.slice(de, j * tok_dim + 1, tok_dim),
                            lambda x, y: F.floor(
                                x.cast("double")
                                * y.cast("double")
                                * F.lit(1e10)
                            ).cast("bigint"),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x,
                    ),
                )
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def sql_maxsim_grid(qe: str, de: str, n_tok: int = 8, tok_dim: int = 8) -> str:
    """DuckDB spelling of :func:`maxsim_grid` (a BIGINT)."""
    return (
        f"CAST(list_sum(list_transform(generate_series(0, {n_tok - 1}), i -> "
        f"list_max(list_transform(generate_series(0, {n_tok - 1}), j -> "
        f"list_sum(list_transform(generate_series(1, {tok_dim}), k -> "
        f"CAST(FLOOR(CAST({qe}[i*{tok_dim}+k] AS DOUBLE) "
        f"* CAST({de}[j*{tok_dim}+k] AS DOUBLE) * 1e10) AS BIGINT)"
        f")))))) AS BIGINT)"
    )


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
            * F.lit(1e10)
        ),
    )
    return F.sqrt(
        F.aggregate(
            diffs, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).cast("double")
        / F.lit(1e10)
    )


def sql_l2_distance(a: str, b: str, dim: int = _DIM) -> str:
    return (
        f"SQRT(CAST(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST(FLOOR((CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* 1e10) AS BIGINT))) AS DOUBLE) / 1e10)"
    )


@register(
    "h18_vector_math",
    survey_id="H18",
    category="llm-vector",
    oracle=f"""
WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
     b AS (SELECT vec_id, embedding FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {sql_dec_dot('a.embedding', 'b.embedding')} AS dot,
       {sql_cosine('a.embedding', 'b.embedding')} AS cos_sim,
       {sql_l2_distance('a.embedding', 'b.embedding')} AS l2_dist
FROM a JOIN b ON b.vec_id = a.vec_id + 7
ORDER BY vec_a
""",
)
def h18_vector_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine / dot / L2 as native column expressions (zip_with +
    aggregate — no UDF, fully JVM-side)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") % 10 == 0).alias("a")
    b = e.alias("b")
    ea, eb = F.col("a.embedding"), F.col("b.embedding")
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 7)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            dec_dot(ea, eb).alias("dot"),
            cosine(ea, eb).alias("cos_sim"),
            l2_distance(ea, eb).alias("l2_dist"),
        )
        .orderBy("vec_a")
    )


@register(
    "k06_cosine_topk",
    survey_id="K6",
    category="llm-vector",
    oracle=f"""
WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       {sql_cosine('embedding', 'q')} AS cos_sim
FROM embeddings, qv
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 10
""",
)
def k06_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine search for a query vector (BENCH-B4): the
    single-row query side broadcasts; the scan computes similarity
    map-side and TakeOrdered reduces — no shuffle of the embedding table."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("q")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "k07_ann_topk",
    survey_id="K7",
    category="llm-vector",
    mode="bounded",
    oracle="SELECT TRUE AS recall_ok",
)
def k07_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane bucketed LSH (seeded) vs the exact
    L2 top-10; declared bound: recall@10 ≥ 0.3. The LSH path is the
    100 TB strategy — buckets prune the scan; brute force is the
    correctness baseline."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", array_to_vector("embedding").alias("vec")
    )
    e.cache()
    key_arr = e.where(F.col("vec_id") == 0)
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=2.0,
        numHashTables=3, seed=42,
    )
    model = lsh.fit(e)
    key_vec = key_arr.select("vec").head()[0]
    ann = model.approxNearestNeighbors(
        e.where(F.col("vec_id") != 0), key_vec, 10
    ).select("vec_id")
    ann_ids = {r["vec_id"] for r in ann.collect()}
    q = key_arr.select(F.col("embedding").alias("q"))
    exact = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", l2_distance(F.col("embedding"), F.col("q")).alias("d")
        )
        .orderBy(F.col("d").asc(), F.col("vec_id"))
        .limit(10)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    recall = len(ann_ids & exact_ids) / max(1, len(exact_ids))
    return spark.createDataFrame([(recall >= 0.3,)], "recall_ok boolean")


@register(
    "k08_label_centroids",
    survey_id="K8",
    category="llm-vector",
    oracle="""
WITH ex AS (
  SELECT label, i AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e10) AS BIGINT) AS v
  FROM embeddings, generate_series(1, 64) AS g(i)
),
avgs AS (
  SELECT label, pos, (CAST(SUM(v) AS DOUBLE) / 1e10) / COUNT(v) AS c
  FROM ex GROUP BY label, pos
)
SELECT label, LIST(c ORDER BY pos) AS centroid
FROM avgs GROUP BY label ORDER BY label
""",
)
def k08_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid: posexplode → exact decimal mean per dimension →
    re-assemble position-ordered. Two shuffles total (label×pos, then
    label) regardless of table size."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(1e10)).alias("v"),
    )
    avgs = ex.groupBy("label", "pos").agg(
        ((F.sum("v").cast("double") / F.lit(1e10)) / F.count("v")).alias("c")
    )
    return (
        avgs.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
        .orderBy("label")
    )


@register(
    "k09_vector_normalize",
    survey_id="K9",
    category="llm-vector",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding,
         SQRT({sql_dec_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings WHERE vec_id % 10 = 0
)
SELECT vec_id,
       list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS unit_vec,
       ROUND(nrm, 4) AS norm
FROM n ORDER BY vec_id
""",
)
def k09_vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization: exact-decimal norm, per-element double division
    (identical in both engines)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 10 == 0)
    nrm = F.sqrt(dec_dot(F.col("embedding"), F.col("embedding")))
    t = e.select("vec_id", "embedding", nrm.alias("nrm"))
    return t.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / F.col("nrm")
        ).alias("unit_vec"),
        F.round("nrm", 4).alias("norm"),
    ).orderBy("vec_id")


# Banded random-hyperplane LSH parameters for ext_embedding_neardup.
# 12 bands x 20 bits: a pair at cosine >= 0.9988 (the planted near-dup
# regime) agrees on one sign bit w.p. 1 - arccos(0.9988)/pi ~ 0.984, so
# a whole band matches w.p. 0.984^20 ~ 0.73 and the chance of missing
# ALL 12 bands is ~(0.27)^12 < 2e-7 — recall is 1 in practice, and the
# exact-all-pairs DuckDB oracle hash-checks it at every sf.  Band WIDTH
# is the scale lever: random (orthogonal) pairs collide on a band w.p.
# 0.5^20, so the random-collision candidate term is n^2 * bands / 2^21 —
# the r5 ladder's whole-query shuffle accounting caught the previous
# 12-bit setting saturating its 4096-value bucket space at 50k vectors
# (4.4M quadratic candidates, a 256 MB shuffle); at 20 bits the same
# corpus yields ~17k.  At even larger n, widen further (bits ~ 2 log2 n
# keeps random candidates ~ n) — recall per band falls only
# geometrically in bits while collisions fall by 2^-bits.
_ND_BANDS = 12
_ND_BITS = 20
_ND_SEED = 20240813
_ND_TAU = 0.9


def _neardup_hyperplanes():
    """Deterministic hyperplane tensor (bands, bits, dim) — PCG64 stream
    is platform-stable, so the banding (and therefore the candidate set)
    is reproducible across runs and machines."""
    import numpy as np

    rng = np.random.default_rng(_ND_SEED)
    return rng.standard_normal(
        (_ND_BANDS * _ND_BITS, _DIM)
    ).reshape(_ND_BANDS, _ND_BITS, _DIM).tolist()


@register(
    "ext_embedding_neardup",
    survey_id="EXT-EMB-NEARDUP",
    category="llm-dedup",
    oracle=f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
),
aug AS (
  SELECT vec_id, embedding FROM base
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(embedding,
                        x -> x + CAST(0.002 AS DOUBLE) * (1 + vec_id % 3))
  FROM base WHERE vec_id % 5 = 0
),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS ea, b.embedding AS eb
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.85
)
SELECT vec_a, vec_b, {sql_cosine('ea', 'eb')} AS cos_sim
FROM cand
WHERE {sql_cosine('ea', 'eb')} >= CAST({_ND_TAU} AS DOUBLE)
ORDER BY vec_a, vec_b
""",
)
def ext_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at 100 TB scale: banded
    random-hyperplane LSH generates candidates (pairs sharing >= 1 of 12
    sign-bit bands), then exact-decimal cosine verifies each candidate
    against tau=0.9 — never an all-pairs self-join (the r2 verdict's one
    scale-killer, now plan-tested in tests/test_plans.py).

    The fixture's organic cosine spectrum is continuous through any low
    threshold (max organic pair 0.60 at sf0.1, bulk near 0), which is
    exactly the regime where no sub-quadratic exact method can exist —
    so the query plants deterministic near-dup copies (every 5th vector,
    +c per-element shift with c in {{0.002,0.004,0.006}}; cosine to the
    source >= 0.9988) and detects them at a true near-dup threshold.
    The augmentation is replicated verbatim in the DuckDB oracle, which
    verifies via exact all-pairs (fine at oracle scale) — the same
    pipeline-replication trick as ext_ivf_ann. Both engines compute the
    identical floor-grid cosine, so the result hash-matches while the
    Spark plan stays candidate-based.

    Plan shape: corpus' is scanned once through a vectorized Arrow
    stage (one BLAS matmul per batch computes all 144 sign bits) to
    emit (vec_id, band_id, band_val) — 12 skinny rows per vector,
    embeddings do NOT ride the explode, and the signature table is
    localCheckpointed so the band self-join's two branches read it
    instead of recomputing; the self-join is an equi-join on
    (band_id, band_val); distinct candidate pairs then pull their two
    vectors back via vec_id equi-joins for the exact verify (whose
    cosine IS the oracle-replicated exact form — band sign boundaries
    only shape the candidate set, never the verified values)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    planted = (
        e.where(F.col("vec_id") % 5 == 0)
        .select(
            "vec_id",
            # NOTE: computed before the +1e6 rename — a same-select alias
            # would win lateral-column-alias resolution and shift c.
            F.transform(
                "embedding",
                lambda x: x
                + F.lit(0.002)
                * (F.lit(1) + F.col("vec_id") % 3).cast("double"),
            ).alias("embedding"),
        )
        .select(
            (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
        )
    )
    # materialized once: feeds the signature stage AND both exact-verify
    # joins (three consumers of the same 64-double vectors)
    aug = e.unionAll(planted).localCheckpoint()

    # Signatures via ONE Arrow-vectorized numpy stage: all 144
    # hyperplane dot products per vector are a single (n, dim) x
    # (dim, 144) BLAS matmul per batch — r4 replaced the Catalyst
    # higher-order fold, which evaluated 144 interpreted
    # aggregate-expressions per row AND ran on both sides of the
    # band self-join (measured 7.6 s -> see bench). Bit semantics are
    # identical: bit j of band b is sign(dot(embedding, H[b][j])),
    # weighted 2^j. localCheckpoint materializes the skinny
    # (vec_id, band_id, band_val) table once so neither self-join
    # branch recomputes it.
    def signatures(batches):
        import numpy as _np
        import pandas as _pd

        h = _np.asarray(_neardup_hyperplanes(), dtype=_np.float64).reshape(
            _ND_BANDS * _ND_BITS, _DIM
        )
        place = (1 << _np.arange(_ND_BITS, dtype=_np.int64))
        for pdf in batches:
            if not len(pdf):
                continue
            emb = _np.asarray(pdf["embedding"].tolist(), dtype=_np.float64)
            bits = (emb @ h.T) >= 0  # (n, bands*bits)
            vals = (
                bits.reshape(len(pdf), _ND_BANDS, _ND_BITS) * place
            ).sum(axis=2)  # (n, bands)
            vec_ids = pdf["vec_id"].to_numpy().repeat(_ND_BANDS)
            yield _pd.DataFrame(
                {
                    "vec_id": vec_ids,
                    "band_id": _np.tile(
                        _np.arange(_ND_BANDS, dtype=_np.int32), len(pdf)
                    ),
                    "band_val": vals.reshape(-1),
                }
            )

    sigs = aug.mapInPandas(
        signatures, "vec_id long, band_id int, band_val long"
    ).localCheckpoint()
    cand = (
        sigs.alias("sa")
        .join(
            sigs.alias("sb"),
            (F.col("sa.band_id") == F.col("sb.band_id"))
            & (F.col("sa.band_val") == F.col("sb.band_val"))
            & (F.col("sa.vec_id") < F.col("sb.vec_id")),
        )
        .select(
            F.col("sa.vec_id").alias("vec_a"),
            F.col("sb.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    cs = cosine(F.col("ea.embedding"), F.col("eb.embedding"))
    return (
        cand.join(
            aug.alias("ea"), F.col("vec_a") == F.col("ea.vec_id")
        )
        .join(aug.alias("eb"), F.col("vec_b") == F.col("eb.vec_id"))
        .select("vec_a", "vec_b", cs.alias("cos_sim"))
        .where(F.col("cos_sim") >= F.lit(_ND_TAU))
        .orderBy("vec_a", "vec_b")
    )


@register(
    "ext_ivf_ann",
    survey_id="EXT-IVF",
    category="llm-vector",
    oracle=f"""
WITH ex AS (
  SELECT label, i AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e10) AS BIGINT) AS v
  FROM embeddings, generate_series(1, 64) AS g(i)
),
centroids AS (
  SELECT label, LIST(c ORDER BY pos) AS centroid FROM (
    SELECT label, pos, (CAST(SUM(v) AS DOUBLE) / 1e10) / COUNT(v) AS c
    FROM ex GROUP BY label, pos
  ) GROUP BY label
),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
coarse AS (
  SELECT label, {sql_cosine('centroid', 'q')} AS csim
  FROM centroids, qv
  ORDER BY csim DESC, label LIMIT 2
)
SELECT e.vec_id, e.label, {sql_cosine('e.embedding', 'qv.q')} AS cos_sim
FROM embeddings e, qv
WHERE e.label IN (SELECT label FROM coarse) AND e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 10
""",
)
def ext_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: labels act as the coarse quantizer's cells (an
    externally-trained IVF list assignment); the query probes only the
    nprobe=2 nearest cells by centroid cosine, then brute-forces inside
    them. At 100 TB the probed cells are partition-pruned before IO.
    Exact floor-grid arithmetic end-to-end makes even the ANN result
    hash-checkable — the oracle replicates the same quantize→probe→
    search pipeline in SQL."""
    e = load_table(spark, sf_dir, "embeddings")
    # centroids per label (the coarse codebook) — exact grid means
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label", "pos",
        F.floor(F.col("val").cast("double") * F.lit(1e10)).alias("v"),
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(((F.sum("v").cast("double") / F.lit(1e10)) / F.count("v")).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    coarse = (
        cent.crossJoin(F.broadcast(qv))
        .select("label", cosine(F.col("centroid"), F.col("q")).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("label"))
        .limit(2)
        .select("label")
    )
    return (
        e.join(F.broadcast(coarse), "label")
        .where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", "label",
            cosine(F.col("embedding"), F.col("q")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


_PCA_ORACLE = """
WITH ex AS (
  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 64) AS g(i)
),
v0 AS (
  SELECT i AS pos, CAST(0.125 AS DOUBLE) AS v
  FROM generate_series(1, 64) AS g(i)
),
d1 AS (
  SELECT vec_id, CAST(SUM(CAST(x * v AS DECIMAL(38,20))) AS DOUBLE) AS dot
  FROM ex JOIN v0 USING (pos) GROUP BY vec_id
),
w1 AS (
  SELECT pos, CAST(SUM(CAST(x * dot AS DECIMAL(38,18))) AS DOUBLE) AS w
  FROM ex JOIN d1 USING (vec_id) GROUP BY pos
),
n1 AS (
  SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
  FROM w1
),
v1 AS (SELECT pos, w / (SELECT nrm FROM n1) AS v FROM w1),
d2 AS (
  SELECT vec_id, CAST(SUM(CAST(x * v AS DECIMAL(38,20))) AS DOUBLE) AS dot
  FROM ex JOIN v1 USING (pos) GROUP BY vec_id
),
w2 AS (
  SELECT pos, CAST(SUM(CAST(x * dot AS DECIMAL(38,18))) AS DOUBLE) AS w
  FROM ex JOIN d2 USING (vec_id) GROUP BY pos
),
n2 AS (
  SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
  FROM w2
),
v2 AS (SELECT pos, w / (SELECT nrm FROM n2) AS v FROM w2)
SELECT pos, CAST(CAST(v AS DECIMAL(18,12)) AS DOUBLE) AS weight
FROM v2 ORDER BY pos
"""


@register(
    "ext_power_iteration_pca",
    survey_id="EXT-PCA",
    category="llm-vector",
    oracle=_PCA_ORACLE,
)
def ext_power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding matrix by distributed
    power iteration (2 rounds): dot = Xv per row, w = X^T dot per
    dimension, v' = w/||w|| — each round is two keyed aggregations over
    the exploded (vec_id, pos, x) view, with the 64-row v broadcast back.
    Nothing driver-side except the 64-dim vector itself; at 100 TB each
    round is two partial-aggregated passes, the shape of every
    Krylov-style distributed solver. Determinism discipline (as
    EXT-PAGERANK): every sum accumulates exact decimals of
    double-identical products, norms included, so two full iterations
    hash-match the unrolled oracle bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    vdf = spark.createDataFrame(
        [(i, 0.125) for i in range(1, 65)], "pos int, v double"
    )
    for _ in range(2):
        dots = (
            ex.join(F.broadcast(vdf), "pos")
            .groupBy("vec_id")
            .agg(
                F.sum((F.col("x") * F.col("v")).cast("decimal(38,20)"))
                .cast("double")
                .alias("dot")
            )
        )
        w = (
            ex.join(dots, "vec_id")
            .groupBy("pos")
            .agg(
                F.sum((F.col("x") * F.col("dot")).cast("decimal(38,18)"))
                .cast("double")
                .alias("w")
            )
        )
        norm = w.agg(
            F.sqrt(
                F.sum((F.col("w") * F.col("w")).cast("decimal(38,18)")).cast(
                    "double"
                )
            ).alias("nrm")
        )
        vdf = (
            w.crossJoin(F.broadcast(norm))
            .select("pos", (F.col("w") / F.col("nrm")).alias("v"))
            .localCheckpoint()
        )
    return vdf.select(
        "pos", F.col("v").cast("decimal(18,12)").cast("double").alias("weight")
    ).orderBy("pos")


_KMEANS_ORACLE = """
WITH ex AS (
  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 64) AS g(i)
),
c0 AS (SELECT vec_id AS cid, pos, x AS c FROM ex WHERE vec_id < 4),
a1 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (
      SELECT e.vec_id, c.cid,
             CAST(SUM(CAST((e.x - c.c) * (e.x - c.c) AS DECIMAL(38,18)))
                  AS DOUBLE) AS dist
      FROM ex e JOIN c0 c ON e.pos = c.pos
      GROUP BY e.vec_id, c.cid
    )
  ) WHERE rn = 1
),
c1 AS (
  SELECT cid, pos,
         CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
  FROM ex JOIN a1 USING (vec_id) GROUP BY cid, pos
),
a2 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (
      SELECT e.vec_id, c.cid,
             CAST(SUM(CAST((e.x - c.c) * (e.x - c.c) AS DECIMAL(38,18)))
                  AS DOUBLE) AS dist
      FROM ex e JOIN c1 c ON e.pos = c.pos
      GROUP BY e.vec_id, c.cid
    )
  ) WHERE rn = 1
),
c2 AS (
  SELECT cid, pos,
         CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
  FROM ex JOIN a2 USING (vec_id) GROUP BY cid, pos
),
a3 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (
      SELECT e.vec_id, c.cid,
             CAST(SUM(CAST((e.x - c.c) * (e.x - c.c) AS DECIMAL(38,18)))
                  AS DOUBLE) AS dist
      FROM ex e JOIN c2 c ON e.pos = c.pos
      GROUP BY e.vec_id, c.cid
    )
  ) WHERE rn = 1
)
SELECT vec_id, cid AS cluster,
       CAST(CAST(dist AS DECIMAL(18,10)) AS DOUBLE) AS dist2
FROM a3 ORDER BY vec_id
"""


@register(
    "ext_kmeans_lloyd",
    survey_id="EXT-KMEANS",
    category="llm-vector",
    oracle=_KMEANS_ORACLE,
)
def ext_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, two assign/update rounds, deterministic
    init from the first four vectors — no RNG). Assignment is a
    broadcast of the k×64 codebook against the exploded matrix with an
    exact-decimal squared-distance sum and a (dist, cid)-ordered
    row_number argmin; the update is an exact per-(cluster, dim) mean.
    Complements EXT-IVF (which consumes a trained codebook) with the
    TRAINING side. At 100 TB: per round, one broadcast join + two keyed
    partial aggregations — centroids are the only state, and they are
    k×64 doubles. Every accumulation is decimal-exact, so two full
    Lloyd rounds plus the final assignment hash-match the unrolled
    oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = ex.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), "pos", F.col("x").alias("c")
    )

    def assign(cent_df):
        diff = F.col("x") - F.col("c")
        dists = (
            ex.join(F.broadcast(cent_df), "pos")
            .select(
                "vec_id",
                "cid",
                (diff * diff).cast("decimal(38,18)").alias("sq"),
            )
            .groupBy("vec_id", "cid")
            .agg(F.sum("sq").cast("double").alias("dist"))
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            dists.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid", "dist")
        )

    for _ in range(2):
        a = assign(cent)
        cent = (
            ex.join(a, "vec_id")
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                    / F.count("*")
                ).alias("c")
            )
            .localCheckpoint()
        )
    final = assign(cent)
    return final.select(
        "vec_id",
        F.col("cid").alias("cluster"),
        F.col("dist").cast("decimal(18,10)").cast("double").alias("dist2"),
    ).orderBy("vec_id")


@register(
    "ext_knn_join",
    survey_id="EXT-KNN-JOIN",
    category="llm-vector",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.q_id, e.vec_id AS nn_id,
         {sql_cosine('e.embedding', 'q.qv')} AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.q_id
           ORDER BY {sql_cosine('e.embedding', 'q.qv')} DESC, e.vec_id
         ) AS rn
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id >= 5
)
SELECT q_id, nn_id, cos_sim, CAST(rn AS INTEGER) AS rank
FROM scored WHERE rn <= 5 ORDER BY q_id, rank
""",
)
def ext_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched kNN join: top-5 cosine neighbors for EACH of 5 query
    vectors in one job — the serving shape for batch retrieval
    (dedup-against-index, RAG corpus lookup). The whole query set
    broadcasts (Q×d floats), the corpus partitions freely, similarity is
    computed map-side, and the per-query top-k comes from a window over
    the q_id key — total work O(|corpus|·Q/p) per task with no corpus
    shuffle. Grid-exact cosine (K6's discipline) keeps the oracle
    hash-strict."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    from pyspark.sql import Window

    scored = (
        e.where(F.col("vec_id") >= 5)
        .crossJoin(F.broadcast(q))
        .select(
            "q_id",
            F.col("vec_id").alias("nn_id"),
            cosine(F.col("embedding"), F.col("qv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("nn_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("q_id", "nn_id", "cos_sim", "rank")
        .orderBy("q_id", "rank")
    )


@register(
    "ext_knn_classify",
    survey_id="EXT-KNN-CLASSIFY",
    category="llm-vector",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv, label AS true_label
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT q.q_id, q.true_label, e.label AS nn_label,
         ROW_NUMBER() OVER (
           PARTITION BY q.q_id
           ORDER BY {sql_cosine('e.embedding', 'q.qv')} DESC, e.vec_id
         ) AS rn
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id >= 20
),
votes AS (
  SELECT q_id, true_label, nn_label, COUNT(*) AS v
  FROM scored WHERE rn <= 5 GROUP BY q_id, true_label, nn_label
),
pred AS (
  SELECT q_id, true_label, nn_label AS pred_label FROM (
    SELECT q_id, true_label, nn_label, v,
           ROW_NUMBER() OVER (
             PARTITION BY q_id ORDER BY v DESC, nn_label
           ) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT q_id, true_label, pred_label, true_label = pred_label AS correct
FROM pred ORDER BY q_id
""",
)
def ext_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification: each of 20 held-out vectors gets the majority
    label of its 5 nearest corpus neighbors (ties break to the lowest
    label — fully deterministic, so the whole classifier output is
    hash-checked, not bounded). The retrieval is EXT-KNN-JOIN's
    broadcast shape; the vote adds two tiny keyed aggregations. This is
    the eval loop for embedding-space label quality at corpus scale."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("true_label"),
    )
    scored = (
        e.where(F.col("vec_id") >= 20)
        .crossJoin(F.broadcast(q))
        .select(
            "q_id",
            "true_label",
            F.col("label").alias("nn_label"),
            cosine(F.col("embedding"), F.col("qv")).alias("cos_sim"),
            "vec_id",
        )
    )
    wk = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    votes = (
        scored.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= 5)
        .groupBy("q_id", "true_label", "nn_label")
        .agg(F.count("*").alias("v"))
    )
    wv = Window.partitionBy("q_id").orderBy(
        F.col("v").desc(), F.col("nn_label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == 1)
        .select(
            "q_id",
            "true_label",
            F.col("nn_label").alias("pred_label"),
            (F.col("true_label") == F.col("nn_label")).alias("correct"),
        )
        .orderBy("q_id")
    )


_PQ_ORACLE = """
WITH ex AS (
  SELECT vec_id, i AS pos, (i - 1) // 8 AS sub,
         CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 64) AS g(i)
),
c0 AS (
  SELECT sub, vec_id AS cid, pos, x AS c FROM ex WHERE vec_id < 4
),
a1 AS (
  SELECT vec_id, sub, cid FROM (
    SELECT e.vec_id, e.sub, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id, e.sub
             ORDER BY CAST(SUM(CAST((e.x - c.c) * (e.x - c.c)
                                    AS DECIMAL(38,18))) AS DOUBLE), c.cid
           ) AS rn
    FROM ex e JOIN c0 c ON c.sub = e.sub AND c.pos = e.pos
    GROUP BY e.vec_id, e.sub, c.cid
  ) WHERE rn = 1
),
c1 AS (
  SELECT a.sub, a.cid, e.pos,
         CAST(SUM(CAST(e.x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
  FROM ex e JOIN a1 a ON a.vec_id = e.vec_id AND a.sub = e.sub
  GROUP BY a.sub, a.cid, e.pos
),
codes AS (
  SELECT vec_id, sub, cid AS code FROM (
    SELECT e.vec_id, e.sub, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id, e.sub
             ORDER BY CAST(SUM(CAST((e.x - c.c) * (e.x - c.c)
                                    AS DECIMAL(38,18))) AS DOUBLE), c.cid
           ) AS rn
    FROM ex e JOIN c1 c ON c.sub = e.sub AND c.pos = e.pos
    WHERE e.vec_id >= 4
    GROUP BY e.vec_id, e.sub, c.cid
  ) WHERE rn = 1
),
qd AS (
  SELECT c.sub, c.cid,
         CAST(SUM(CAST((e.x - c.c) * (e.x - c.c) AS DECIMAL(38,18)))
              AS DOUBLE) AS d
  FROM ex e JOIN c1 c ON c.sub = e.sub AND c.pos = e.pos
  WHERE e.vec_id = 0
  GROUP BY c.sub, c.cid
)
SELECT k.vec_id,
       CAST(CAST(CAST(SUM(CAST(q.d AS DECIMAL(38,18))) AS DOUBLE)
            AS DECIMAL(18,10)) AS DOUBLE) AS est_dist2
FROM codes k JOIN qd q ON q.sub = k.sub AND q.cid = k.code
GROUP BY k.vec_id
ORDER BY est_dist2, vec_id
LIMIT 10
"""


@register(
    "ext_product_quantization",
    survey_id="EXT-PQ",
    category="llm-vector",
    oracle=_PQ_ORACLE,
)
def ext_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization ANN: 64 dims split into 8 subspaces, a
    4-entry codebook per subspace trained with one deterministic Lloyd
    round (init = vectors 0–3), every corpus vector encoded to 8
    one-byte codes, and the query answered by ASYMMETRIC DISTANCE — 32
    query-to-centroid distances computed once, then each vector's
    estimate is a sum of 8 table lookups instead of 64 float ops. The
    compression story IVF lacks: at 100 TB the encoded corpus is ~8
    bytes/vector (64x smaller), codes and lookup tables broadcast, and
    the scan never touches raw floats. Every distance and mean is
    decimal-exact (EXT-KMEANS discipline), so training + encoding +
    lookup all hash-match the oracle's CTE chain."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("pos0") / 8).cast("int").alias("sub"),
        F.col("xf").cast("double").alias("x"),
    ).localCheckpoint()
    c0 = ex.where(F.col("vec_id") < 4).select(
        "sub", F.col("vec_id").alias("cid"), "pos", F.col("x").alias("c")
    )

    def assign(cent, source):
        diff = F.col("x") - F.col("c")
        dists = (
            source.alias("e")
            .join(
                F.broadcast(cent).alias("cc"),
                (F.col("cc.sub") == F.col("e.sub"))
                & (F.col("cc.pos") == F.col("e.pos")),
            )
            .groupBy("e.vec_id", "e.sub", "cc.cid")
            .agg(
                F.sum(
                    (diff * diff).cast("decimal(38,18)")
                ).cast("double").alias("dist")
            )
        )
        w = Window.partitionBy("vec_id", "sub").orderBy("dist", "cid")
        return (
            dists.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "sub", "cid", "dist")
        )

    a1 = assign(c0, ex)
    c1 = (
        ex.alias("e")
        .join(
            a1.alias("a"),
            (F.col("a.vec_id") == F.col("e.vec_id"))
            & (F.col("a.sub") == F.col("e.sub")),
        )
        .groupBy("a.sub", "a.cid", "e.pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("c")
        )
        .localCheckpoint()
    )
    codes = assign(c1, ex.where(F.col("vec_id") >= 4)).select(
        "vec_id", "sub", F.col("cid").alias("code")
    )
    # The lookup table needs ALL 32 query-centroid distances (assign()
    # would keep only the argmin row).
    diff = F.col("x") - F.col("c")
    qd = (
        ex.where(F.col("vec_id") == 0)
        .alias("e")
        .join(
            F.broadcast(c1).alias("cc"),
            (F.col("cc.sub") == F.col("e.sub"))
            & (F.col("cc.pos") == F.col("e.pos")),
        )
        .groupBy("e.sub", "cc.cid")
        .agg(
            F.sum((diff * diff).cast("decimal(38,18)"))
            .cast("double")
            .alias("d")
        )
        .select(
            F.col("sub").alias("q_sub"), F.col("cid").alias("q_cid"), "d"
        )
    )
    return (
        codes.join(
            F.broadcast(qd),
            (F.col("q_sub") == F.col("sub"))
            & (F.col("q_cid") == F.col("code")),
        )
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("d").cast("decimal(38,18)"))
            .cast("double")
            .cast("decimal(18,10)")
            .cast("double")
            .alias("est_dist2")
        )
        .orderBy("est_dist2", "vec_id")
        .limit(10)
    )


@register(
    "ext_pq_recall",
    survey_id="EXT-PQ-RECALL",
    category="llm-vector",
    mode="bounded",
    oracle="SELECT true AS recall_at_10_ok",
)
def ext_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@10 of the PQ pipeline against the exact L2
    top-10 (same query vector, same corpus) — the quantified-quality
    check every ANN deployment needs next to its speed claim. With
    4-entry codebooks (2 bits/subspace) PQ is a deliberately coarse
    filter: measured recall is 0.3 at sf0.01 and 0.1 at sf0.001, so
    the declared bound is the regression floor 0.05, not a quality
    claim — production uses 256-entry codebooks and re-ranks PQ
    candidates with exact distances (compose with K6)."""
    pq_top = ext_product_quantization(spark, sf_dir).select("vec_id")
    pq_ids = {r["vec_id"] for r in pq_top.collect()}
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    exact = (
        e.where(F.col("vec_id") >= 4)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            l2_distance(F.col("embedding"), F.col("q")).alias("d"),
        )
        .orderBy(F.col("d").asc(), F.col("vec_id"))
        .limit(10)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    recall = len(pq_ids & exact_ids) / max(1, len(exact_ids))
    return spark.createDataFrame(
        [(recall >= 0.05,)], "recall_at_10_ok boolean"
    )


_IVFADC_ORACLE = """
WITH ex AS (
  SELECT e.vec_id, e.label, i AS pos, (i - 1) // 8 AS sub,
         CAST(e.embedding[i] AS DOUBLE) AS x
  FROM embeddings e, generate_series(1, 64) AS g(i)
),
cells AS (
  SELECT label, pos,
         (CAST(SUM(CAST(FLOOR(x * 1e10) AS BIGINT)) AS DOUBLE) / 1e10)
           / COUNT(*) AS c
  FROM ex GROUP BY label, pos
),
resid AS (
  SELECT e.vec_id, e.label, e.pos, e.sub, e.x - c.c AS r
  FROM ex e JOIN cells c ON c.label = e.label AND c.pos = e.pos
),
rc0 AS (
  SELECT sub, vec_id AS cid, pos, r AS c FROM resid WHERE vec_id < 4
),
ra1 AS (
  SELECT vec_id, sub, cid FROM (
    SELECT v.vec_id, v.sub, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, v.sub
             ORDER BY CAST(SUM(CAST((v.r - c.c) * (v.r - c.c)
                                    AS DECIMAL(38,18))) AS DOUBLE), c.cid
           ) AS rn
    FROM resid v JOIN rc0 c ON c.sub = v.sub AND c.pos = v.pos
    GROUP BY v.vec_id, v.sub, c.cid
  ) WHERE rn = 1
),
rc1 AS (
  SELECT a.sub, a.cid, v.pos,
         CAST(SUM(CAST(v.r AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
  FROM resid v JOIN ra1 a ON a.vec_id = v.vec_id AND a.sub = v.sub
  GROUP BY a.sub, a.cid, v.pos
),
codes AS (
  SELECT vec_id, label, sub, cid AS code FROM (
    SELECT v.vec_id, v.label, v.sub, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id, v.sub
             ORDER BY CAST(SUM(CAST((v.r - c.c) * (v.r - c.c)
                                    AS DECIMAL(38,18))) AS DOUBLE), c.cid
           ) AS rn
    FROM resid v JOIN rc1 c ON c.sub = v.sub AND c.pos = v.pos
    WHERE v.vec_id <> 0
    GROUP BY v.vec_id, v.label, v.sub, c.cid
  ) WHERE rn = 1
),
probes AS (
  SELECT label FROM (
    SELECT c.label,
           CAST(SUM(CAST((e.x - c.c) * (e.x - c.c) AS DECIMAL(38,18)))
                AS DOUBLE) AS d
    FROM ex e JOIN cells c ON c.pos = e.pos
    WHERE e.vec_id = 0
    GROUP BY c.label
  ) ORDER BY d, label LIMIT 2
),
qres AS (
  SELECT c.label, e.pos, e.sub, e.x - c.c AS qr
  FROM ex e
  JOIN cells c ON c.pos = e.pos
  WHERE e.vec_id = 0 AND c.label IN (SELECT label FROM probes)
),
qd AS (
  SELECT q.label, r.sub, r.cid,
         CAST(SUM(CAST((q.qr - r.c) * (q.qr - r.c) AS DECIMAL(38,18)))
              AS DOUBLE) AS d
  FROM qres q JOIN rc1 r ON r.sub = q.sub AND r.pos = q.pos
  GROUP BY q.label, r.sub, r.cid
)
SELECT k.vec_id,
       CAST(CAST(CAST(SUM(CAST(q.d AS DECIMAL(38,18))) AS DOUBLE)
            AS DECIMAL(18,10)) AS DOUBLE) AS est_dist2
FROM codes k
JOIN qd q ON q.label = k.label AND q.sub = k.sub AND q.cid = k.code
WHERE k.label IN (SELECT label FROM probes)
GROUP BY k.vec_id
ORDER BY est_dist2, vec_id
LIMIT 10
"""


@register(
    "ext_ivfadc",
    survey_id="EXT-IVFADC",
    category="llm-vector",
    oracle=_IVFADC_ORACLE,
)
def ext_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the canonical composed ANN index (Jégou et al.'s
    IVF + PQ-on-residuals): coarse cells are the per-label centroids,
    every vector stores only its cell id + 8 residual codes, and a
    query (1) probes its 2 nearest cells, (2) builds one per-cell
    lookup table from the CELL-RELATIVE query residual, (3) scores
    candidates by table lookups alone. Residual quantization beats raw
    PQ because residuals are smaller and better-centered than raw
    vectors. At 100 TB: cells are partition keys (probe = partition
    pruning, as ext_ivf_ann), codes are ~9 bytes/vector, and the two
    probed partitions are the only data touched. Same decimal-exact
    discipline as EXT-PQ/EXT-KMEANS throughout, so coarse means,
    codebook training, encoding, probing, and lookup all hash-match the
    oracle's CTE chain."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("pos0") / 8).cast("int").alias("sub"),
        F.col("xf").cast("double").alias("x"),
    ).localCheckpoint()
    cells = (
        ex.groupBy(F.col("label").alias("c_label"), F.col("pos").alias("c_pos"))
        .agg(
            (
                (
                    F.sum(F.floor(F.col("x") * 1e10).cast("bigint")).cast(
                        "double"
                    )
                    / F.lit(1e10)
                )
                / F.count("*")
            ).alias("c")
        )
        .localCheckpoint()
    )
    resid = (
        ex.join(
            cells,
            (F.col("c_label") == F.col("label"))
            & (F.col("c_pos") == F.col("pos")),
        )
        .select(
            "vec_id",
            "label",
            "pos",
            "sub",
            (F.col("x") - F.col("c")).alias("r"),
        )
        .localCheckpoint()
    )
    rc0 = resid.where(F.col("vec_id") < 4).select(
        "sub", F.col("vec_id").alias("cid"), "pos", F.col("r").alias("c")
    )

    def assign_res(cent, source):
        diff = F.col("r") - F.col("c")
        dists = (
            source.alias("v")
            .join(
                F.broadcast(cent).alias("cc"),
                (F.col("cc.sub") == F.col("v.sub"))
                & (F.col("cc.pos") == F.col("v.pos")),
            )
            .groupBy("v.vec_id", "v.label", "v.sub", "cc.cid")
            .agg(
                F.sum((diff * diff).cast("decimal(38,18)"))
                .cast("double")
                .alias("dist")
            )
        )
        w = Window.partitionBy("vec_id", "sub").orderBy("dist", "cid")
        return (
            dists.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "label", "sub", "cid")
        )

    ra1 = assign_res(rc0, resid)
    rc1 = (
        resid.alias("v")
        .join(
            ra1.alias("a"),
            (F.col("a.vec_id") == F.col("v.vec_id"))
            & (F.col("a.sub") == F.col("v.sub")),
        )
        .groupBy("a.sub", "a.cid", "v.pos")
        .agg(
            (
                F.sum(F.col("r").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("c")
        )
        .localCheckpoint()
    )
    codes = assign_res(rc1, resid.where(F.col("vec_id") != 0)).select(
        "vec_id", "label", "sub", F.col("cid").alias("code")
    )
    qx = ex.where(F.col("vec_id") == 0)
    probes = (
        qx.join(cells, F.col("c_pos") == F.col("pos"))
        .groupBy("c_label")
        .agg(
            F.sum(
                ((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).cast(
                    "decimal(38,18)"
                )
            )
            .cast("double")
            .alias("d")
        )
        .orderBy("d", "c_label")
        .limit(2)
        .select(F.col("c_label").alias("p_label"))
        .localCheckpoint()
    )
    qres = (
        qx.join(cells, F.col("c_pos") == F.col("pos"))
        .join(
            F.broadcast(probes), F.col("c_label") == F.col("p_label")
        )
        .select(
            F.col("c_label").alias("q_label"),
            "pos",
            "sub",
            (F.col("x") - F.col("c")).alias("qr"),
        )
    )
    qd = (
        qres.alias("q")
        .join(
            F.broadcast(rc1).alias("r"),
            (F.col("r.sub") == F.col("q.sub"))
            & (F.col("r.pos") == F.col("q.pos")),
        )
        .groupBy("q.q_label", "q.sub", "r.cid")
        .agg(
            F.sum(
                (
                    (F.col("qr") - F.col("c")) * (F.col("qr") - F.col("c"))
                ).cast("decimal(38,18)")
            )
            .cast("double")
            .alias("d")
        )
    )
    return (
        codes.join(
            F.broadcast(qd),
            (F.col("q_label") == F.col("label"))
            & (qd["sub"] == codes["sub"])
            & (qd["cid"] == codes["code"]),
        )
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("d").cast("decimal(38,18)"))
            .cast("double")
            .cast("decimal(18,10)")
            .cast("double")
            .alias("est_dist2")
        )
        .orderBy("est_dist2", "vec_id")
        .limit(10)
    )


@register(
    "ext_ivfadc_recall",
    survey_id="EXT-IVFADC-RECALL",
    category="llm-vector",
    mode="bounded",
    oracle="SELECT true AS adc_recall_within_cells_ok, true AS end_to_end_ok",
)
def ext_ivfadc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@10 of IVFADC, split into its two loss sources.
    (1) ADC loss: IVFADC's top-10 vs the EXACT top-10 within the probed
    cells — what the 4-entry residual codebooks blur (measured 0.4 at
    sf0.01; bound >= 0.3). (2) End-to-end vs the global exact top-10 —
    dominated here by the coarse probe, because the synthetic labels
    are orthogonal to geometry so any label-cell quantizer probes
    poorly (measured 0.1; bound >= 0.05 as a regression floor, not a
    quality claim — with k-means-trained cells, more probes, 256-entry
    codebooks and exact re-ranking this climbs toward 1)."""
    ivf_ids = {
        r["vec_id"]
        for r in ext_ivfadc(spark, sf_dir).select("vec_id").collect()
    }
    e = load_table(spark, sf_dir, "embeddings")
    probed = {
        r["label"]
        for r in e.where(F.col("vec_id").isin(*ivf_ids))
        .select("label")
        .distinct()
        .collect()
    }
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))

    def exact_top10(source):
        return {
            r["vec_id"]
            for r in source.crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                l2_distance(F.col("embedding"), F.col("q")).alias("d"),
            )
            .orderBy(F.col("d").asc(), F.col("vec_id"))
            .limit(10)
            .collect()
        }

    within_ids = exact_top10(
        e.where((F.col("vec_id") != 0) & F.col("label").isin(*probed))
    )
    global_ids = exact_top10(e.where(F.col("vec_id") != 0))
    adc_recall = len(ivf_ids & within_ids) / max(1, len(within_ids))
    e2e_recall = len(ivf_ids & global_ids) / max(1, len(global_ids))
    return spark.createDataFrame(
        [(adc_recall >= 0.3, e2e_recall >= 0.05)],
        "adc_recall_within_cells_ok boolean, end_to_end_ok boolean",
    )


@register(
    "ext_sq8_recall",
    survey_id="EXT-SQ8-RECALL",
    category="llm-vector",
    mode="bounded",
    oracle="SELECT true AS recall_at_10_ok",
)
def ext_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@10 of int8 scalar-quantized (SQ8) search against
    exact L2 top-10 for query vector 0 — the quality check that belongs
    next to EXT-SQ8's compression claim. Unlike the deliberately coarse
    2-bit PQ demo (recall floor 0.05), 8-bit-per-dimension quantization
    preserves ranking almost perfectly, so the declared regression
    floor is 0.7.

    Same scale shape as the quantizer itself: 64-row per-dim stats
    broadcast, codes assigned scan-local, distances accumulated by
    vec_id — the only corpus shuffle is the top-k reduction, and the
    collect()s touch just the two 10-id lists (bounded by construction).
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        F.col("i0").alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    st = ex.groupBy("i").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    scale = (F.col("mx") - F.col("mn")) / 255.0
    recon = (
        ex.join(F.broadcast(st), "i")
        .withColumn(
            "code",
            # Constant-dimension guard: code 0 (reconstruction mn) when
            # the per-dim range collapses, matching EXT-SQ8's CASE.
            F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                F.least(
                    F.floor((F.col("x") - F.col("mn")) / scale).cast("int"),
                    F.lit(255),
                )
            ),
        )
        .withColumn("rx", F.col("mn") + F.col("code") * scale)
    )
    q = ex.where(F.col("vec_id") == 0).select(
        F.col("i").alias("qi"), F.col("x").alias("qx")
    )
    approx = (
        recon.where(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("i") == F.col("qi"))
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("rx") - F.col("qx")) * (F.col("rx") - F.col("qx"))).alias("d")
        )
        .orderBy(F.col("d").asc(), F.col("vec_id"))
        .limit(10)
    )
    approx_ids = {r["vec_id"] for r in approx.collect()}
    qvec = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    exact = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            l2_distance(F.col("embedding"), F.col("q")).alias("d"),
        )
        .orderBy(F.col("d").asc(), F.col("vec_id"))
        .limit(10)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    recall = len(approx_ids & exact_ids) / max(1, len(exact_ids))
    return spark.createDataFrame(
        [(recall >= 0.7,)], "recall_at_10_ok boolean"
    )


@register(
    "ext_residual_quantization",
    survey_id="EXT-RQ",
    category="llm-vector",
    oracle="""
WITH ex AS (
  SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 64) AS g(i)
),
cent1 AS (
  SELECT label, pos,
         (CAST(SUM(CAST(FLOOR(x * 1e10) AS BIGINT)) AS DOUBLE) / 1e10)
           / COUNT(*) AS c1
  FROM ex GROUP BY label, pos
),
resid AS (
  SELECT ex.vec_id, ex.label, ex.pos, ex.x, ex.x - cent1.c1 AS r,
         cent1.c1
  FROM ex JOIN cent1 ON ex.label = cent1.label AND ex.pos = cent1.pos
),
cells AS (
  SELECT vec_id,
         4 * MAX(CASE WHEN pos = 1 AND r >= 0 THEN 1 ELSE 0 END)
         + 2 * MAX(CASE WHEN pos = 2 AND r >= 0 THEN 1 ELSE 0 END)
         + MAX(CASE WHEN pos = 3 AND r >= 0 THEN 1 ELSE 0 END) AS cell2
  FROM resid GROUP BY vec_id
),
cent2 AS (
  SELECT rs.label, c.cell2, rs.pos,
         (CAST(SUM(CAST(FLOOR(rs.r * 1e10) AS BIGINT)) AS DOUBLE) / 1e10)
           / COUNT(*) AS c2
  FROM resid rs JOIN cells c ON rs.vec_id = c.vec_id
  GROUP BY rs.label, c.cell2, rs.pos
),
errs AS (
  SELECT rs.vec_id, rs.label, c.cell2,
         rs.x - (rs.c1 + cent2.c2) AS e
  FROM resid rs
  JOIN cells c ON rs.vec_id = c.vec_id
  JOIN cent2 ON cent2.label = rs.label AND cent2.cell2 = c.cell2
            AND cent2.pos = rs.pos
)
SELECT vec_id, label, cell2,
       CAST(SUM(CAST(FLOOR(e * e * 1e10) AS BIGINT)) AS DOUBLE) / 1e10
         AS sq_err
FROM errs
WHERE vec_id % 5 = 0
GROUP BY vec_id, label, cell2 ORDER BY vec_id
""",
)
def ext_residual_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level RESIDUAL quantization — NOTES.md's declared next depth
    step past PQ/IVFADC: level 1 is the label-cell centroid (the coarse
    codebook the IVF family already uses); each vector's residual is
    then quantized by a second, data-dependent codebook — cells are the
    sign-octants of the first 3 residual dimensions (deterministic,
    engine-stable: both engines compute identical doubles so identical
    signs), codewords are the exact grid-mean of each octant's
    residuals. Reconstruction c1 + c2 is additive across levels — the
    defining property of RQ vs PQ's dimension-split — and per-vector
    squared error is reported on the floor grid.

    Scale shape: both codebooks are tiny keyed aggregates (label×pos,
    label×cell×pos — at most 10×8×64 rows) that BROADCAST back; the
    corpus itself is scanned, never self-joined, and the only
    corpus-volume shuffles are the two grid-mean aggregations, both
    map-side combined. The oracle replicates the full two-level
    pipeline in SQL (the ext_ivf_ann discipline)."""
    errs = _rq_errs(spark, sf_dir)
    return (
        errs.where(F.col("vec_id") % 5 == 0)
        .groupBy("vec_id", "label", "cell2")
        .agg(
            (
                F.sum(
                    F.floor(F.col("e") * F.col("e") * F.lit(1e10)).cast(
                        "bigint"
                    )
                ).cast("double")
                / F.lit(1e10)
            ).alias("sq_err")
        )
        .orderBy("vec_id")
    )


def _rq_errs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared RQ pipeline: per-(vec, pos) residual r (level-1 error) and
    two-level error e alongside label/cell2."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    gmean = (
        F.sum(F.floor(F.col("val") * F.lit(1e10)).cast("bigint")).cast(
            "double"
        )
        / F.lit(1e10)
        / F.count("*")
    )
    cent1 = (
        ex.withColumn("val", F.col("x"))
        .groupBy("label", "pos")
        .agg(gmean.alias("c1"))
    )
    resid = ex.join(F.broadcast(cent1), ["label", "pos"]).select(
        "vec_id", "label", "pos", "x", (F.col("x") - F.col("c1")).alias("r"),
        "c1",
    )
    resid = resid.localCheckpoint()
    cells = resid.groupBy("vec_id").agg(
        (
            4 * F.max(F.when((F.col("pos") == 1) & (F.col("r") >= 0), 1).otherwise(0))
            + 2 * F.max(F.when((F.col("pos") == 2) & (F.col("r") >= 0), 1).otherwise(0))
            + F.max(F.when((F.col("pos") == 3) & (F.col("r") >= 0), 1).otherwise(0))
        ).alias("cell2")
    )
    rc = resid.join(cells, "vec_id")
    cent2 = (
        rc.withColumn("val", F.col("r"))
        .groupBy("label", "cell2", "pos")
        .agg(gmean.alias("c2"))
    )
    return rc.join(F.broadcast(cent2), ["label", "cell2", "pos"]).select(
        "vec_id",
        "label",
        "cell2",
        "r",
        (F.col("x") - (F.col("c1") + F.col("c2"))).alias("e"),
    )


@register(
    "ext_rq_improvement",
    survey_id="EXT-RQ-GAIN",
    category="llm-vector",
    mode="bounded",
    oracle="SELECT TRUE AS second_level_improves",
)
def ext_rq_improvement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RQ quality bound: the second codebook level must STRICTLY reduce
    total squared reconstruction error vs coarse-only quantization
    (measured: −17% at sf0.01, −6% at sf0.1). Recon-space recall is
    deliberately NOT the bound here — the synthetic embeddings are
    quasi-orthogonal, so any 3-bit-per-vector second level leaves
    ranking near-random; reconstruction gain is the property RQ
    actually promises."""
    errs = _rq_errs(spark, sf_dir)
    tot = errs.agg(
        F.sum(F.col("e") * F.col("e")).alias("rq"),
        F.sum(F.col("r") * F.col("r")).alias("coarse"),
    ).head()
    return spark.createDataFrame(
        [(bool(tot["rq"] < tot["coarse"]),)], "second_level_improves boolean"
    )


_LOGREG_ORACLE = """
WITH ex AS (
  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 4) AS g(i)
  UNION ALL
  SELECT vec_id, 0 AS pos, 1.0 AS x FROM embeddings
),
y AS (
  SELECT vec_id, CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
  FROM embeddings
),
n AS (SELECT COUNT(*) AS n FROM embeddings),
r1 AS (
  SELECT vec_id, CAST(FLOOR((0.5 - y) * 1e10) AS BIGINT) AS rg FROM y
),
g1 AS (
  SELECT ex.pos,
         CAST(SUM(CAST(r1.rg * ex.x AS DECIMAL(38,18))) AS DOUBLE)
           / 1e10 / ANY_VALUE(n.n) AS grad
  FROM ex JOIN r1 USING (vec_id) CROSS JOIN n
  GROUP BY ex.pos
),
w1 AS (SELECT pos, 0.0 - 1.0 * grad AS w FROM g1),
m2 AS (
  SELECT ex.vec_id,
         CAST(SUM(CAST(ex.x * w1.w AS DECIMAL(38,18))) AS DOUBLE) AS margin
  FROM ex JOIN w1 USING (pos) GROUP BY ex.vec_id
),
r2 AS (
  SELECT m2.vec_id,
         CAST(FLOOR((1.0 / (1.0 + EXP(-m2.margin)) - y.y) * 1e10)
              AS BIGINT) AS rg
  FROM m2 JOIN y USING (vec_id)
),
g2 AS (
  SELECT ex.pos,
         CAST(SUM(CAST(r2.rg * ex.x AS DECIMAL(38,18))) AS DOUBLE)
           / 1e10 / ANY_VALUE(n.n) AS grad
  FROM ex JOIN r2 USING (vec_id) CROSS JOIN n
  GROUP BY ex.pos
),
w2 AS (SELECT pos, w - 1.0 * grad AS w FROM w1 JOIN g2 USING (pos))
SELECT pos, CAST(CAST(w AS DECIMAL(18,10)) AS DOUBLE) AS weight
FROM w2 ORDER BY pos
"""


@register(
    "ext_logreg_gd",
    survey_id="EXT-LOGREG",
    category="llm-vector",
    oracle=_LOGREG_ORACLE,
)
def ext_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression by full-batch gradient descent (two rounds,
    lr=1.0, w0=0): predict label==0 from the first 4 embedding
    dimensions + intercept — the distributed-iterative-ML template next
    to k-means/PCA/PageRank.

    Each round is one broadcast of the 5-weight vector against the
    exploded feature matrix and one feature-keyed reduction of the
    corpus — weights are the only state, so at 100 TB a round costs a
    scan + a 5-row shuffle, and rounds chain through localCheckpoint
    like the other iterative ops. Determinism across engines: round 1's
    sigmoid is EXACTLY 0.5 (w=0 ⇒ margin 0 — no transcendental), round
    2's sigmoid residual is floored to the 1e-10 grid before the
    decimal-exact per-feature sum (playbook #3), margins accumulate in
    decimal, and the final weights round through DECIMAL(18,10). The
    oracle unrolls both rounds as CTEs (EXT-KMEANS discipline).
    """
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    ex = (
        e.select(
            "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("p0", "xf")
        )
        .select(
            "vec_id",
            (F.col("p0") + 1).alias("pos"),
            F.col("xf").cast("double").alias("x"),
        )
        .union(
            e.select(
                "vec_id",
                F.lit(0).alias("pos"),
                F.lit(1.0).alias("x"),
            )
        )
    )
    yd = e.select(
        "vec_id",
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
    )

    def grad_of(resid):
        """resid: (vec_id, rg bigint) — per-feature mean gradient."""
        return (
            ex.join(resid, "vec_id")
            .select(
                "pos",
                (F.col("rg") * F.col("x"))
                .cast("decimal(38,18)")
                .alias("t"),
            )
            .groupBy("pos")
            .agg(
                (
                    F.sum("t").cast("double") / F.lit(1e10) / F.lit(n)
                ).alias("grad")
            )
        )

    # Round 1: w = 0 ⇒ sigmoid(0) = 0.5 exactly.
    r1 = yd.select(
        "vec_id",
        F.floor((F.lit(0.5) - F.col("y")) * 1e10).cast("bigint").alias("rg"),
    )
    w1 = grad_of(r1).select(
        "pos", (F.lit(0.0) - F.lit(1.0) * F.col("grad")).alias("w")
    ).localCheckpoint()
    # Round 2: margin under w1, gridded sigmoid residual.
    m2 = (
        ex.join(F.broadcast(w1), "pos")
        .select(
            "vec_id",
            (F.col("x") * F.col("w")).cast("decimal(38,18)").alias("t"),
        )
        .groupBy("vec_id")
        .agg(F.sum("t").cast("double").alias("margin"))
    )
    r2 = m2.join(yd, "vec_id").select(
        "vec_id",
        F.floor(
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
                - F.col("y")
            )
            * 1e10
        )
        .cast("bigint")
        .alias("rg"),
    )
    w2 = (
        w1.join(grad_of(r2), "pos")
        .select("pos", (F.col("w") - F.lit(1.0) * F.col("grad")).alias("w"))
    )
    return w2.select(
        "pos",
        F.col("w").cast("decimal(18,10)").cast("double").alias("weight"),
    ).orderBy("pos")


@register(
    "ext_ivf_persisted",
    survey_id="EXT-IVF-PERSIST",
    category="llm-vector",
    oracle=f"""
WITH ex AS (
  SELECT label, i AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e10) AS BIGINT) AS v
  FROM embeddings, generate_series(1, 64) AS g(i)
),
centroids AS (
  SELECT label, LIST(c ORDER BY pos) AS centroid FROM (
    SELECT label, pos, (CAST(SUM(v) AS DOUBLE) / 1e10) / COUNT(v) AS c
    FROM ex GROUP BY label, pos
  ) GROUP BY label
),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
coarse AS (
  SELECT label, {sql_cosine('centroid', 'q')} AS csim
  FROM centroids, qv
  ORDER BY csim DESC, label LIMIT 2
)
SELECT e.vec_id, e.label, {sql_cosine('e.embedding', 'qv.q')} AS cos_sim
FROM embeddings e, qv
WHERE e.label IN (SELECT label FROM coarse) AND e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 10
""",
)
def ext_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF index LIFECYCLE, not just the math: the build phase
    writes the corpus as label-PARTITIONED parquet (each coarse cell =
    one partition directory — the on-disk inverted lists) plus a
    centroid side table; the query phase reads ONLY the nprobe=2
    probed cells back via static partition pruning (the scan never
    touches other cells' files) and brute-forces inside them. Must
    return exactly what the inline EXT-IVF computes — same oracle —
    proving the persistence roundtrip is lossless (float arrays are
    bit-exact through parquet).

    The two probe labels cross the driver as a 2-element list — that is
    the real access pattern of a vector store issuing cell reads, and
    it is what makes the pruning STATIC (visible as PartitionFilters in
    the scan, asserted by the plan test) rather than a runtime filter.
    """
    import os as _os

    from nibbler_spark.sources.tables import cached_dir

    e = load_table(spark, sf_dir, "embeddings")

    def build(tmp: str) -> None:
        ex = e.select(
            "label", F.posexplode("embedding").alias("pos", "val")
        ).select(
            "label",
            "pos",
            F.floor(F.col("val").cast("double") * F.lit(1e10)).alias("v"),
        )
        cent = (
            ex.groupBy("label", "pos")
            .agg(
                (
                    (F.sum("v").cast("double") / F.lit(1e10)) / F.count("v")
                ).alias("c")
            )
            .groupBy("label")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("centroid")
            )
        )
        e.write.mode("overwrite").partitionBy("label").parquet(
            _os.path.join(tmp, "cells")
        )
        cent.write.mode("overwrite").parquet(_os.path.join(tmp, "centroids"))

    root = cached_dir(sf_dir, "embeddings", "ivf", build)
    corpus_dir = _os.path.join(root, "cells")
    cent_dir = _os.path.join(root, "centroids")
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    cent_t = spark.read.parquet(cent_dir)
    probes = [
        r["label"]
        for r in (
            cent_t.crossJoin(F.broadcast(qv))
            .select(
                "label", cosine(F.col("centroid"), F.col("q")).alias("csim")
            )
            .orderBy(F.col("csim").desc(), F.col("label"))
            .limit(2)
            .collect()
        )
    ]
    cells = spark.read.parquet(corpus_dir).where(
        F.col("label").isin(probes)
    )
    return (
        cells.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.col("label").cast("int").alias("label"),
            cosine(F.col("embedding"), F.col("q")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


# SemDeDup parameters: 64 centroid blocks, near-dup threshold 0.9.
_SD_K = 64
_SD_TAU = 0.9


@register(
    "ext_semantic_dedup",
    survey_id="EXT-SEMDEDUP",
    category="llm-dedup",
    oracle=f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
aug AS (
  SELECT vec_id, e FROM base
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(e, x -> x + CAST(0.002 AS DOUBLE) * (1 + vec_id % 3))
  FROM base WHERE vec_id % 7 = 3
),
cent AS (
  SELECT vec_id AS cid, e AS c,
         SQRT({sql_dec_dot('e', 'e')}) AS cnorm
  FROM base WHERE vec_id < {_SD_K}
),
scored AS (
  SELECT a.vec_id, cent.cid,
         {sql_dec_dot('a.e', 'cent.c')} / cent.cnorm AS score
  FROM aug a CROSS JOIN cent
),
pick AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, cid ASC) AS rn
  FROM scored
),
assigned AS (
  SELECT p.vec_id, CAST(p.cid AS BIGINT) AS cluster_id, aug.e,
         SQRT({sql_dec_dot('aug.e', 'aug.e')}) AS vnorm
  FROM pick p JOIN aug ON p.vec_id = aug.vec_id
  WHERE p.rn = 1
),
dropped AS (
  SELECT DISTINCT b.cluster_id, b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {sql_dec_dot('a.e', 'b.e')} / (a.vnorm * b.vnorm)
        >= CAST({_SD_TAU} AS DOUBLE)
)
SELECT a.cluster_id, COUNT(*) AS n_vectors,
       CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped
FROM assigned a
LEFT JOIN dropped d
  ON a.cluster_id = d.cluster_id AND a.vec_id = d.vec_id
GROUP BY a.cluster_id ORDER BY a.cluster_id
""",
)
def ext_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC dedup — the standard production recipe
    for pruning paraphrase-level duplicates a hash can't catch:
    (1) block the corpus into K=64 centroid clusters (centroids are
    the first 64 base vectors — deterministic, so both engines build
    the identical blocking); (2) ONLY within a cluster, compare pairs
    and drop every vector that has a lower-id neighbour at cosine >=
    0.9 (the one-step parallel relaxation of SemDeDup's greedy
    keep-first, applied identically in the oracle). Near-dups are
    planted (every 7th≡3 vector, +0.002·(1+id%3) shift) so the drop
    rule actually fires. Returns per-cluster (n_vectors, n_dropped),
    hash-exact: assignment argmax and pair cosines both ride the
    floor-grid dec_dot, with centroid and vector norms PRECOMPUTED
    once (one fold per vector-centroid score and per candidate pair,
    not three).

    Scale shape: assignment is a broadcast cross-join against K rows
    (map-side, no shuffle of the corpus); the quadratic stays inside
    clusters — cost Σ_cluster |c|², the knob production tunes via K —
    and the corpus NEVER self-joins unblocked."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    planted = (
        base.where(F.col("vec_id") % 7 == 3)
        .select(
            "vec_id",
            F.transform(
                "e",
                lambda x: x
                + F.lit(0.002)
                * (F.lit(1) + F.col("vec_id") % 3).cast("double"),
            ).alias("e"),
        )
        .select((F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "e")
    )
    # r11 perf (guide §2.5): spread before checkpointing — the K=64
    # broadcast assignment runs 64 fold expressions per vector on aug's
    # partitioning, which locally is the scan's 1-2 splits (no-op at
    # real scale).
    aug = (
        base.unionAll(planted)
        .transform(spread)
        .localCheckpoint()
    )

    cent = base.where(F.col("vec_id") < _SD_K).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("c"),
        F.sqrt(dec_dot(F.col("e"), F.col("e"))).alias("cnorm"),
    )
    from pyspark.sql.window import Window

    scored = aug.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        (dec_dot(F.col("e"), F.col("c")) / F.col("cnorm")).alias("score"),
    )
    pick = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("score").desc(), F.col("cid").asc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cid").cast("bigint").alias("cluster_id"))
    )
    assigned = (
        pick.join(aug, "vec_id")
        .select(
            "vec_id",
            "cluster_id",
            "e",
            F.sqrt(dec_dot(F.col("e"), F.col("e"))).alias("vnorm"),
        )
        .localCheckpoint()
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(
            dec_dot(F.col("a.e"), F.col("b.e"))
            / (F.col("a.vnorm") * F.col("b.vnorm"))
            >= F.lit(_SD_TAU)
        )
        .select(
            F.col("b.cluster_id").alias("cluster_id"),
            F.col("b.vec_id").alias("vec_id"),
        )
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("hit", F.lit(1)),
                      ["cluster_id", "vec_id"], "left")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.coalesce("hit", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


_HNM_SIG = "".join(
    f" + (CASE WHEN {{t}}.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(8)
)


@register(
    "ext_hard_negative_mining",
    survey_id="EXT-HARDNEG",
    category="llm-vector",
    oracle=f"""
WITH base AS (
  SELECT vec_id, label, embedding,
         CAST(SQRT({sql_dec_dot('embedding', 'embedding')}) AS DOUBLE)
           AS nrm,
         0{_HNM_SIG.format(t='embeddings')} AS bucket
  FROM embeddings
),
q AS (SELECT * FROM base WHERE vec_id % 10 = 0),
pairs AS (
  SELECT q.vec_id AS q_id, q.label AS q_label,
         c.vec_id AS c_id, c.label AS c_label,
         {sql_dec_dot('q.embedding', 'c.embedding')}
           / (q.nrm * c.nrm) AS cos
  FROM q JOIN base c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
pos AS (
  SELECT q_id, c_id AS pos_id, cos AS pos_cos FROM (
    SELECT q_id, c_id, cos, row_number() OVER (
      PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
    FROM pairs WHERE c_label = q_label
  ) WHERE rk = 1
),
neg AS (
  SELECT q_id, c_id AS neg_id, cos AS neg_cos FROM (
    SELECT q_id, c_id, cos, row_number() OVER (
      PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
    FROM pairs WHERE c_label <> q_label
  ) WHERE rk = 1
)
SELECT pos.q_id, pos.pos_id, pos.pos_cos, neg.neg_id, neg.neg_cos,
       neg.neg_cos > pos.pos_cos AS is_confusable
FROM pos JOIN neg ON pos.q_id = neg.q_id
ORDER BY pos.q_id
""",
)
def ext_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training — for every query
    vector (10% sample), the most similar SAME-label candidate (the
    positive) and the most similar OTHER-label candidate (the hard
    negative) among vectors sharing its 8-dim sign-prefix bucket, plus
    the confusability flag (negative outranks positive) that flags
    label noise. Candidates come from ONE equi-join on the sign bucket
    — the LSH-style blocking that keeps this sub-quadratic (an
    expected 1/256 of the corpus per query; at 100 TB widen the prefix
    or band multiple prefixes exactly like ext_embedding_neardup).
    Cosines are engine-exact: grid-floored integer dot products and
    IEEE sqrt (correctly rounded by spec — the one 'transcendental'
    that is deterministic), so the full ranking hash-matches with raw
    doubles, no rounding. Per-query argmax is a q_id-partitioned
    row_number."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        "embedding",
        F.sqrt(dec_dot(F.col("embedding"), F.col("embedding"))).alias(
            "nrm"
        ),
        sum(
            F.when(F.col("embedding")[i] >= 0, F.lit(1 << i)).otherwise(0)
            for i in range(8)
        ).alias("bucket"),
    ).localCheckpoint()
    q = base.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "bucket",
    )
    c = base.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        "bucket",
    )
    pairs = (
        q.join(c, "bucket")
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "q_label",
            "c_id",
            "c_label",
            (
                dec_dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm"))
            ).alias("cos"),
        )
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("q_id").orderBy(F.col("cos").desc(), "c_id")
    pos = (
        pairs.where(F.col("c_label") == F.col("q_label"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "q_id",
            F.col("c_id").alias("pos_id"),
            F.col("cos").alias("pos_cos"),
        )
    )
    neg = (
        pairs.where(F.col("c_label") != F.col("q_label"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "q_id",
            F.col("c_id").alias("neg_id"),
            F.col("cos").alias("neg_cos"),
        )
    )
    return (
        pos.join(neg, "q_id")
        .select(
            "q_id",
            "pos_id",
            "pos_cos",
            "neg_id",
            "neg_cos",
            (F.col("neg_cos") > F.col("pos_cos")).alias("is_confusable"),
        )
        .orderBy("q_id")
    )


@register(
    "ext_ivf_incremental_append",
    survey_id="EXT-IVF-INCR",
    category="llm-vector",
    oracle=f"""
WITH ex AS (
  SELECT label, i AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e10) AS BIGINT) AS v
  FROM embeddings, generate_series(1, 64) AS g(i)
),
centroids AS (
  SELECT label, LIST(c ORDER BY pos) AS centroid FROM (
    SELECT label, pos, (CAST(SUM(v) AS DOUBLE) / 1e10) / COUNT(v) AS c
    FROM ex GROUP BY label, pos
  ) GROUP BY label
),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
coarse AS (
  SELECT label, {sql_cosine('centroid', 'q')} AS csim
  FROM centroids, qv
  ORDER BY csim DESC, label LIMIT 2
)
SELECT e.vec_id, e.label, {sql_cosine('e.embedding', 'qv.q')} AS cos_sim
FROM embeddings e, qv
WHERE e.label IN (SELECT label FROM coarse) AND e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id LIMIT 10
""",
)
def ext_ivf_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL vector-index maintenance — the lakehouse x vector
    composite: the IVF inverted lists live as a SNAPSHOT TABLE with
    one value-pure file per cell (label), a later batch of vectors
    appends NEW per-cell files via carry-over commits (no list
    rewrite — list assignment is per-vector, so append IS the whole
    maintenance operation), the tiny centroid codebook refreshes from
    the updated table, and probes read only the 2 probed cells via
    manifest stat pruning (asserted). The query result must equal the
    from-scratch inline IVF over the full corpus — SAME oracle as
    EXT-IVF — proving incremental maintenance loses nothing. At
    100 TB: index updates are append-only commits + an O(cells)
    codebook refresh; a full rebuild never happens."""
    import shutil
    import tempfile

    from nibbler_spark.operators.snapshots import (
        read_snapshot,
        read_snapshot_pruned,
        snapshot_files,
        write_snapshot,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # r11 perf (guide §5): one materialization per batch — the per-cell
    # commit loop below filters the batch once PER LABEL, which used to
    # re-scan the embeddings parquet for every commit (2 batches x
    # |labels| scans); the commit sequence itself (the declared
    # append-only maintenance story) is unchanged.
    base = e.where(F.col("vec_id") % 5 != 0).localCheckpoint()
    new = e.where(F.col("vec_id") % 5 == 0).localCheckpoint()
    table = tempfile.mkdtemp(prefix="nibbler-ivfi-")
    shutil.rmtree(table)
    files: list[str] = []
    for batch in (base, new):
        labels = sorted(
            r["label"]
            for r in batch.select("label").distinct().collect()
        )
        for lab in labels:
            sid = write_snapshot(
                batch.where(F.col("label") == lab).coalesce(1),
                table,
                carry_over=files,
            )
            files = snapshot_files(table, sid)

    cur = read_snapshot(spark, table)
    ex = cur.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(1e10)).alias("v"),
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(
            (
                (F.sum("v").cast("double") / F.lit(1e10)) / F.count("v")
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    qv = cur.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    probes = [
        int(r["label"])
        for r in (
            cent.crossJoin(F.broadcast(qv))
            .select(
                "label",
                cosine(F.col("centroid"), F.col("q")).alias("csim"),
            )
            .orderBy(F.col("csim").desc(), F.col("label"))
            .limit(2)
            .collect()
        )
    ]
    cells = None
    for lab in probes:
        df, scanned, total = read_snapshot_pruned(
            spark, table, filters=[("label", "=", lab)]
        )
        assert scanned < total, (scanned, total)
        cells = df if cells is None else cells.unionAll(df)
    return (
        cells.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("q")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )

@register(
    "ext_embedding_column_profile",
    survey_id="EXT-EMB-PROFILE",
    category="llm-vector",
    oracle="""
WITH e AS (
  SELECT vec_id, UNNEST(embedding) AS v,
         UNNEST(generate_series(1, len(embedding))) AS dim
  FROM embeddings
),
g AS (
  SELECT dim - 1 AS dim,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e7) AS BIGINT)) AS sx,
         SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e7) AS BIGINT)
             * CAST(FLOOR(CAST(v AS DOUBLE) * 1e7) AS BIGINT)) AS sxx,
         MIN(CAST(v AS DOUBLE)) AS vmin,
         MAX(CAST(v AS DOUBLE)) AS vmax
  FROM e GROUP BY 1
)
SELECT dim, n,
       CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * 1e7) AS mean,
       CAST(n * sxx - sx * sx AS DOUBLE)
         / ((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) * 1e14)
         AS variance,
       vmin, vmax
FROM g ORDER BY dim
""",
)
def ext_embedding_column_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension profile of the embedding column — the feature-
    store health check run before any vector workload (dead dims,
    scale drift, outlier ranges): posexplode unpacks the
    array<float> into (dim, value) pairs and each of the 64
    dimensions aggregates n/mean/variance/min/max. Exactness AND
    overflow discipline: values quantize to a 1e-7 grid (float32 →
    double exact, floor engine-identical); the sufficient statistics
    are summed as DECIMAL(38,0) — at 100 TB a bigint Σx² times n
    blows through 2^63 (it already reaches 74% at sf0.1), while
    decimal38/HUGEINT never does — and the 64-row stats table is
    finished DRIVER-SIDE in arbitrary-precision Python integers, so
    n·Σx² − (Σx)² is exact at any corpus size and the only float ops
    are the final correctly-rounded int→double casts and one
    division, mirrored exactly by DuckDB's HUGEINT arithmetic.
    Scale: explode is map-side; the aggregate has 64 cells with full
    map-side combine; the driver touches 64 rows."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "v")
    )
    q = F.floor(F.col("v").cast("double") * 1e7).cast("bigint")
    g = (
        e.groupBy("dim")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(q.cast("decimal(38,0)")).alias("sx"),
            F.sum((q * q).cast("decimal(38,0)")).alias("sxx"),
            F.min(F.col("v").cast("double")).alias("vmin"),
            F.max(F.col("v").cast("double")).alias("vmax"),
        )
        .collect()
    )
    rows = []
    for r in g:
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        mean = float(sx) / (float(n) * 1e7)
        var = float(n * sxx - sx * sx) / (
            (float(n) * float(n - 1)) * 1e14
        )
        rows.append((r["dim"], n, mean, var, r["vmin"], r["vmax"]))
    return spark.createDataFrame(
        sorted(rows),
        "dim int, n bigint, mean double, variance double, "
        "vmin double, vmax double",
    )


def _ivf_sweep_oracle() -> str:
    cos_e = sql_cosine("e.embedding", "qv.q")
    blocks = []
    for n in (1, 2, 4, 10):
        blocks.append(f"""cand{n} AS (
  SELECT e.vec_id, {cos_e} AS cs
  FROM embeddings e, qv
  WHERE e.vec_id <> 0 AND e.label IN
        (SELECT label FROM ranked WHERE rk <= {n})
),
top{n} AS (SELECT vec_id FROM cand{n} ORDER BY cs DESC, vec_id LIMIT 10),
row{n} AS (
  SELECT CAST({n} AS BIGINT) AS nprobe,
         (SELECT COUNT(*) FROM cand{n}) AS n_candidates,
         (SELECT COUNT(*) FROM top{n} t JOIN exact10 x USING (vec_id))
           AS hits
)""")
    body = ",\n".join(blocks)
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM row{n}" for n in (1, 2, 4, 10)
    )
    return f"""
WITH ex AS (
  SELECT label, i AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e10) AS BIGINT) AS v
  FROM embeddings, generate_series(1, 64) AS g(i)
),
centroids AS (
  SELECT label, LIST(c ORDER BY pos) AS centroid FROM (
    SELECT label, pos, (CAST(SUM(v) AS DOUBLE) / 1e10) / COUNT(v) AS c
    FROM ex GROUP BY label, pos
  ) GROUP BY label
),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
ranked AS (
  SELECT label, ROW_NUMBER() OVER (
    ORDER BY {sql_cosine('centroid', 'q')} DESC, label) AS rk
  FROM centroids, qv
),
exact10 AS (
  SELECT e.vec_id FROM embeddings e, qv WHERE e.vec_id <> 0
  ORDER BY {cos_e} DESC, e.vec_id LIMIT 10
),
{body},
rows_all AS ({union}),
mono AS (
  SELECT BOOL_AND(ok) AS monotone_ok FROM (
    SELECT hits >= LAG(hits, 1, CAST(0 AS BIGINT))
                   OVER (ORDER BY nprobe) AS ok
    FROM rows_all
  )
),
full_ok AS (
  SELECT hits = 10 AS full_probe_exact FROM rows_all WHERE nprobe = 10
)
SELECT r.nprobe, r.n_candidates, r.hits,
       CAST(r.hits AS DOUBLE) / 10e0 AS recall_at_10,
       mono.monotone_ok, full_ok.full_probe_exact
FROM rows_all r, mono, full_ok
ORDER BY r.nprobe
"""


@register(
    "ext_ivf_nprobe_sweep",
    survey_id="EXT-IVF-SWEEP",
    category="llm-vector",
    mode="bounded",
    oracle=_ivf_sweep_oracle(),
)
def ext_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall/cost TRADE-OFF CURVE — the tuning sweep every
    vector-search deployment runs before picking nprobe: probe the
    top-1/2/4/10 coarse cells (10 = every cell, i.e. exact search)
    and report candidate volume and recall@10 against the exact
    brute-force top-10 at each depth. Two structural invariants are
    asserted rather than tolerance-checked: recall is MONOTONE in
    nprobe (probing a superset of cells can only add candidates), and
    the full-probe row recovers the exact result (hits = 10) — the
    consistency proof that the IVF path degrades gracefully to exact
    search. Same grid-exact centroid/cosine arithmetic as EXT-IVF, so
    every hit count (and therefore the whole curve) hash-matches the
    SQL replica. Scale: each probe depth scans only its cells
    (partition-pruned at 100 TB); the sweep shares one centroid table
    and one coarse ranking."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(1e10)).alias("v"),
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(
            (
                (F.sum("v").cast("double") / F.lit(1e10)) / F.count("v")
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    qv = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    ranked = [
        r["label"]
        for r in cent.crossJoin(F.broadcast(qv))
        .select(
            "label", cosine(F.col("centroid"), F.col("q")).alias("csim")
        )
        .orderBy(F.col("csim").desc(), "label")
        .collect()
    ]
    scored = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("q")).alias("cs"),
        )
    )
    exact10 = {
        r["vec_id"]
        for r in scored.orderBy(F.col("cs").desc(), "vec_id")
        .limit(10)
        .collect()
    }
    rows = []
    for n in (1, 2, 4, 10):
        cand = scored.where(F.col("label").isin(ranked[:n]))
        n_cand = cand.count()
        top = {
            r["vec_id"]
            for r in cand.orderBy(F.col("cs").desc(), "vec_id")
            .limit(10)
            .collect()
        }
        rows.append((n, n_cand, len(top & exact10)))
    monotone = all(
        rows[i][2] >= rows[i - 1][2] for i in range(1, len(rows))
    )
    full_exact = rows[-1][2] == 10
    return spark.createDataFrame(
        [
            (
                n,
                c,
                h,
                h / 10.0,
                bool(monotone),
                bool(full_exact),
            )
            for n, c, h in rows
        ],
        "nprobe bigint, n_candidates bigint, hits bigint, "
        "recall_at_10 double, monotone_ok boolean, "
        "full_probe_exact boolean",
    )


def _trunc_sweep_oracle() -> str:
    """Oracle for ext_dim_truncation_sweep: per-prefix-dim top-10 vs the
    full-dim top-10, recall aggregated over the query set."""
    legs = []
    for d in (8, 16, 32, 64):
        legs.append(
            f"""
SELECT q_id, cand_id, {d} AS d FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {sql_cosine('c.embedding', 'q.embedding').replace('generate_series(1, 64)', f'generate_series(1, {d})')} DESC,
                    c.vec_id
         ) AS rk
  FROM qs q, embeddings c WHERE c.vec_id % 200 <> 0
) WHERE rk <= 10"""
        )
    union = "\nUNION ALL\n".join(legs)
    return f"""
WITH qs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 200 = 0),
topk AS ({union}),
truth AS (SELECT q_id, cand_id FROM topk WHERE d = 64),
hits AS (
  SELECT t.d, COUNT(*) AS sum_overlap
  FROM topk t JOIN truth USING (q_id, cand_id)
  GROUP BY t.d
),
nq AS (SELECT COUNT(*) AS n_queries FROM qs)
SELECT CAST(h.d AS INT) AS d,
       CAST(h.sum_overlap AS BIGINT) AS sum_overlap,
       CAST(nq.n_queries AS BIGINT) AS n_queries,
       ROUND(CAST(h.sum_overlap AS DOUBLE)
             / (10e0 * nq.n_queries), 6) AS recall_at_10
FROM hits h, nq ORDER BY d
"""


@register(
    "ext_dim_truncation_sweep",
    survey_id="EXT-VEC-MRL",
    category="llm-vector",
    oracle=_trunc_sweep_oracle(),
)
def ext_dim_truncation_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation evaluation — the
    retrieval-quality / cost curve a platform measures before serving
    truncated embeddings: for prefix dimensions d ∈ {8, 16, 32, 64},
    rank all candidates per query by prefix-d cosine (grid-exact
    dec_dot over F.slice — one scan computes all four similarities,
    exploded, so the fact table is read once) and report recall@10
    against the full-dimension ranking. d=64 IS the ground truth, so
    its recall is 1.0 by construction — the exact-at-full anchor the
    nprobe sweep also pins; smaller d trades recall for a 2-8x dot
    product saving. Scale: the query set (vec_id % 200 = 0) is
    broadcast; per-query top-10 uses a window partitioned BY QUERY
    (never corpus-global); only (query, candidate, d, cos) tuples
    reach the rank exchange."""
    e = load_table(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )
    cands = e.where(F.col("vec_id") % 200 != 0).select(
        F.col("vec_id").alias("cand_id"), "embedding"
    )
    pairs = cands.crossJoin(F.broadcast(qs))
    per_d = pairs.select(
        "q_id",
        "cand_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            dec_dot(
                                F.slice("embedding", 1, d),
                                F.slice("q", 1, d),
                            )
                            / (
                                F.sqrt(
                                    dec_dot(
                                        F.slice("embedding", 1, d),
                                        F.slice("embedding", 1, d),
                                    )
                                )
                                * F.sqrt(
                                    dec_dot(
                                        F.slice("q", 1, d),
                                        F.slice("q", 1, d),
                                    )
                                )
                            )
                        ).alias("cos"),
                    )
                    for d in (8, 16, 32, 64)
                ]
            )
        ).alias("s"),
    ).select("q_id", "cand_id", "s.d", "s.cos")
    w = Window.partitionBy("q_id", "d").orderBy(
        F.desc("cos"), F.col("cand_id")
    )
    topk = (
        per_d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 10)
        .select("q_id", "cand_id", "d")
        .localCheckpoint()
    )
    truth = topk.where(F.col("d") == 64).select("q_id", "cand_id")
    hits = (
        topk.join(truth, ["q_id", "cand_id"])
        .groupBy(topk["d"])
        .agg(F.count("*").cast("bigint").alias("sum_overlap"))
    )
    nq = qs.agg(F.count("*").cast("bigint").alias("n_queries"))
    return (
        hits.crossJoin(F.broadcast(nq))
        .select(
            F.col("d").cast("int").alias("d"),
            "sum_overlap",
            "n_queries",
            F.round(
                F.col("sum_overlap").cast("double")
                / (F.lit(10.0) * F.col("n_queries")),
                6,
            ).alias("recall_at_10"),
        )
        .orderBy("d")
    )


@register(
    "ext_filtered_ann",
    survey_id="EXT-FILTERED-ANN",
    category="llm-vector",
    mode="bounded",
    oracle=f"""
WITH ex AS (
  SELECT label, i AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e10) AS BIGINT) AS v
  FROM embeddings, generate_series(1, 64) AS g(i)
),
centroids AS (
  SELECT label, LIST(c ORDER BY pos) AS centroid FROM (
    SELECT label, pos, (CAST(SUM(v) AS DOUBLE) / 1e10) / COUNT(v) AS c
    FROM ex GROUP BY label, pos
  ) GROUP BY label
),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
filt AS (
  SELECT e.vec_id, e.label, e.embedding
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
  WHERE d.lang = 'en' AND e.vec_id <> 0
),
exact AS (
  SELECT f.vec_id, {sql_cosine('f.embedding', 'qv.q')} AS cs
  FROM filt f, qv
  ORDER BY cs DESC, f.vec_id LIMIT 10
),
coarse AS (
  SELECT label, {sql_cosine('centroid', 'q')} AS csim
  FROM centroids, qv
  ORDER BY csim DESC, label LIMIT 4
),
ivf AS (
  SELECT f.vec_id, {sql_cosine('f.embedding', 'qv.q')} AS cs
  FROM filt f, qv
  WHERE f.label IN (SELECT label FROM coarse)
  ORDER BY cs DESC, f.vec_id LIMIT 10
),
rec AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS hits
  FROM ivf JOIN exact USING (vec_id)
)
SELECT * FROM (
  SELECT 'exact' AS strategy,
         CAST(COUNT(*) AS BIGINT) AS n_results,
         CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
         CAST(SUM(CAST(FLOOR(cs * 1e6) AS BIGINT)) AS BIGINT) AS sim_grid_sum,
         CAST(100 AS BIGINT) AS recall_pct
  FROM exact
  UNION ALL
  SELECT 'ivf_probe4',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(vec_id) AS BIGINT),
         CAST(SUM(CAST(FLOOR(cs * 1e6) AS BIGINT)) AS BIGINT),
         (SELECT hits * 100 // 10 FROM rec)
  FROM ivf
) ORDER BY strategy
""",
)
def ext_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search — the production ANN pattern every vector
    store wrestles with (metadata predicate + similarity top-k): the
    filter (documents.lang = 'en', joined on vec_id) is applied INSIDE
    the probed IVF lists (single-stage filtered search), not as a
    post-filter that silently returns < k results when the filter is
    selective. The query runs BOTH the filtered exact brute-force
    (ground truth) and the filtered IVF probe (nprobe=4 of 10
    label-cells over an index built on the UNFILTERED corpus — indexes
    are shared across predicates in real systems), and reports each
    strategy's result-set checksum plus the IVF recall against exact.
    Because all similarity math rides the 1e-10 floor grid, even the
    recall percentage is engine-exact — the whole filtered-ANN
    pipeline carries a full hash oracle (recall lands wherever the
    data puts it; the declared invariant is n_results = k for both
    strategies, i.e. in-list filtering never under-fills). On this
    fixture's isotropic random embeddings the label cells carry no
    locality, so IVF recall is expected ~= nprobe/ncells = 40% — the
    measured 20-40% across sfs is the honest behavior of a coarse
    quantizer on structureless data, and the point of the query is
    the filtered-search PLUMBING being hash-exact, not a recall
    claim (ext_ivf_nprobe_sweep carries the recall-curve invariants). Scale: the
    metadata filter is a co-partitioned equi-join on the vector id
    (bucketable), probed cells are partition-prunable as in
    ext_ivf_persisted, and both top-10s are TakeOrderedAndProject —
    no global sort, no all-pairs."""
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(1e10)).alias("v"),
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(
            ((F.sum("v").cast("double") / F.lit(1e10)) / F.count("v")).alias(
                "c"
            )
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    filt = (
        e.join(
            d.where(F.col("lang") == "en").select(
                F.col("doc_id").alias("vec_id")
            ),
            "vec_id",
        )
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", "embedding")
    )
    cs = cosine(F.col("embedding"), F.col("q"))
    exact = (
        filt.crossJoin(F.broadcast(qv))
        .select("vec_id", cs.alias("cs"))
        .orderBy(F.col("cs").desc(), F.col("vec_id"))
        .limit(10)
    )
    coarse = (
        cent.crossJoin(F.broadcast(qv))
        .select("label", cosine(F.col("centroid"), F.col("q")).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("label"))
        .limit(4)
        .select("label")
    )
    ivf = (
        filt.join(F.broadcast(coarse), "label")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", cs.alias("cs"))
        .orderBy(F.col("cs").desc(), F.col("vec_id"))
        .limit(10)
    )
    rec = ivf.join(exact.select("vec_id"), "vec_id").agg(
        F.count("*").cast("bigint").alias("hits")
    )

    out_exact = exact.agg(
        F.count("*").cast("bigint").alias("n_results"),
        F.sum("vec_id").cast("bigint").alias("id_checksum"),
        F.sum(F.floor(F.col("cs") * F.lit(1e6)).cast("bigint"))
        .cast("bigint")
        .alias("sim_grid_sum"),
    ).select(
        F.lit("exact").alias("strategy"),
        "n_results",
        "id_checksum",
        "sim_grid_sum",
        F.lit(100).cast("bigint").alias("recall_pct"),
    )
    out_ivf = (
        ivf.crossJoin(F.broadcast(rec))
        .agg(
            F.count("*").cast("bigint").alias("n_results"),
            F.sum("vec_id").cast("bigint").alias("id_checksum"),
            F.sum(F.floor(F.col("cs") * F.lit(1e6)).cast("bigint"))
            .cast("bigint")
            .alias("sim_grid_sum"),
            F.expr("max(hits) * 100 div 10").cast("bigint").alias(
                "recall_pct"
            ),
        )
        .select(
            F.lit("ivf_probe4").alias("strategy"),
            "n_results",
            "id_checksum",
            "sim_grid_sum",
            "recall_pct",
        )
    )
    return out_exact.unionByName(out_ivf).orderBy("strategy")


@register(
    "ext_colbert_maxsim",
    survey_id="EXT-COLBERT-MAXSIM",
    category="llm-retrieval",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 97 = 0
),
d AS (
  SELECT vec_id AS doc_id, embedding AS de FROM embeddings WHERE vec_id % 97 <> 0
),
scored AS (
  SELECT q.qid, d.doc_id,
         {sql_maxsim_grid('qe', 'de')} AS grid
  FROM q CROSS JOIN d
),
ranked AS (
  SELECT qid, doc_id, grid,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY grid DESC, doc_id) AS rnk
  FROM scored
)
SELECT qid, doc_id, rnk, CAST(grid AS DOUBLE) / 1e10 AS maxsim
FROM ranked WHERE rnk <= 5
ORDER BY qid, rnk
""",
)
def ext_colbert_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style) retrieval: each 64-dim vector
    is treated as 8 token vectors of 8 dims, and a query-document score
    is MaxSim — for every query token take the best-matching document
    token's dot product, then sum over the query's tokens.  This is the
    reranking stage of a late-interaction pipeline: finer-grained than
    one pooled dot, far cheaper than a cross-encoder.

    Exactness: per-slice dots are summed on the dec_dot integer 1e-10
    grid and KEPT as int64 through the max-over-j and sum-over-i
    reductions — max and integer sums commute with any partitioning, so
    the score is bit-identical across engines and the top-5 rank
    (doc_id tie-break) is total.  Scale: the query side is tiny and
    broadcast (a real system reranks an ANN candidate set, here the
    exact all-docs sweep IS the declared baseline — the IVF family
    provides the candidate-generation scale path); per-query ranking is
    a row_number over the broadcast-keyed partition that Spark executes
    as WindowGroupLimit top-k, never a global sort."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    # spread(): the embeddings parquet is one split locally, so the
    # interpreted per-pair MaxSim fold (64 slice-dots of higher-order
    # lambdas) would otherwise run inside a single scan task; at real
    # scale the scan is already wide and no exchange is added.
    d = spread(
        e.where(F.col("vec_id") % 97 != 0).select(
            F.col("vec_id").alias("doc_id"), F.col("embedding").alias("de")
        )
    )

    scored = d.crossJoin(F.broadcast(q)).select(
        "qid",
        "doc_id",
        maxsim_grid(F.col("qe"), F.col("de")).alias("grid"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("grid").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "qid",
            "doc_id",
            "rnk",
            (F.col("grid").cast("double") / F.lit(1e10)).alias("maxsim"),
        )
        .orderBy("qid", "rnk")
    )


@register(
    "ext_ann_rerank_pipeline",
    survey_id="EXT-ANN-RERANK",
    category="llm-retrieval",
    oracle=f"""
WITH ex AS (
  SELECT label, i AS pos,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e10) AS BIGINT) AS v
  FROM embeddings, generate_series(1, 64) AS g(i)
),
centroids AS (
  SELECT label, LIST(c ORDER BY pos) AS centroid FROM (
    SELECT label, pos, (CAST(SUM(v) AS DOUBLE) / 1e10) / COUNT(v) AS c
    FROM ex GROUP BY label, pos
  ) GROUP BY label
),
q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 97 = 0
),
probe AS (
  SELECT qid, label FROM (
    SELECT q.qid, c.label,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY {sql_cosine('c.centroid', 'q.qe')} DESC, c.label
           ) AS pr
    FROM centroids c CROSS JOIN q
  ) WHERE pr <= 2
),
coarse AS (
  SELECT qid, doc_id, de, coarse_cos, coarse_rank FROM (
    SELECT q.qid, e.vec_id AS doc_id, e.embedding AS de,
           {sql_cosine('e.embedding', 'q.qe')} AS coarse_cos,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY {sql_cosine('e.embedding', 'q.qe')} DESC, e.vec_id
           ) AS coarse_rank
    FROM embeddings e
    JOIN probe p ON e.label = p.label
    JOIN q ON q.qid = p.qid
    WHERE e.vec_id % 97 <> 0
  ) WHERE coarse_rank <= 20
),
reranked AS (
  SELECT c.qid, c.doc_id, c.coarse_rank,
         {sql_maxsim_grid('q.qe', 'c.de')} AS grid,
         ROW_NUMBER() OVER (
           PARTITION BY c.qid
           ORDER BY {sql_maxsim_grid('q.qe', 'c.de')} DESC, c.doc_id
         ) AS rnk
  FROM coarse c JOIN q ON q.qid = c.qid
)
SELECT qid, doc_id, rnk, coarse_rank,
       CAST(grid AS DOUBLE) / 1e10 AS maxsim
FROM reranked WHERE rnk <= 5
ORDER BY qid, rnk
""",
)
def ext_ann_rerank_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval capstone: IVF coarse probe (nprobe=2 label
    cells by centroid cosine, EXT-IVF's quantizer) -> pooled-cosine
    top-20 candidates per query -> late-interaction MaxSim rerank to a
    final top-5 — the coarse-to-fine funnel production retrieval
    actually runs (ANN recall stage, cheap dense score, expensive
    per-token rerank only on the shortlist).

    Every stage is engine-exact (grid dots, IEEE sqrt, int64 MaxSim)
    so the full funnel hash-matches the SQL replica, tie-broken on ids.
    Scale: centroids and queries are tiny broadcasts; candidate
    generation touches only probed cells (partition-prunable by label);
    both per-query rankings execute as WindowGroupLimit top-k over
    broadcast-keyed partitions; MaxSim cost is bounded by
    20 x n_queries, independent of corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label", "pos",
        F.floor(F.col("val").cast("double") * F.lit(1e10)).alias("v"),
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(
            ((F.sum("v").cast("double") / F.lit(1e10)) / F.count("v")).alias(
                "c"
            )
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    q = e.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    w_probe = Window.partitionBy("qid").orderBy(
        F.col("csim").desc(), F.col("label")
    )
    probe = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "label",
            cosine(F.col("centroid"), F.col("qe")).alias("csim"),
        )
        .withColumn("pr", F.row_number().over(w_probe))
        .where(F.col("pr") <= 2)
        .select("qid", "label")
    )
    cand = (
        e.where(F.col("vec_id") % 97 != 0)
        .select(F.col("vec_id").alias("doc_id"), "label",
                F.col("embedding").alias("de"))
        .join(F.broadcast(probe), "label")
        .join(F.broadcast(q), "qid")
    )
    w_coarse = Window.partitionBy("qid").orderBy(
        F.col("coarse_cos").desc(), F.col("doc_id")
    )

    # Coarse scoring vectorized (r10, the K8 precedent): dec_dot's
    # per-element floor((x*y)*1e10) -> int64 sum -> /1e10 is replicated
    # bit-for-bit in numpy float64 (same IEEE multiply order, exact
    # int64 sum, correctly-rounded sqrt), so one Arrow batch scores
    # thousands of candidates in three matmul-shaped passes instead of
    # interpreting three zip_with/aggregate lambdas per row — the
    # candidate stage is the funnel's only corpus-proportional cost.
    def _score(batches):
        import numpy as _np
        import pandas as _pd

        def ddot(A, B):
            p = _np.floor((A * B) * 1e10)
            return p.astype(_np.int64).sum(
                axis=1, dtype=_np.int64
            ).astype(_np.float64) / 1e10

        for pdf in batches:
            if len(pdf) == 0:
                continue
            D = _np.asarray(pdf["de"].tolist(), dtype=_np.float64)
            Q = _np.asarray(pdf["qe"].tolist(), dtype=_np.float64)
            cos = ddot(D, Q) / (
                _np.sqrt(ddot(D, D)) * _np.sqrt(ddot(Q, Q))
            )
            out = pdf[["doc_id", "label", "qid"]].copy()
            out["coarse_cos"] = cos
            yield out

    # Rank on the SCORES ONLY — the old plan shipped every candidate's
    # (de, qe) float pair through the top-20 window exchange (~128
    # floats per row at candidate volume); vectors re-join the
    # shortlist afterwards, crossing the wire 20-per-query times.
    scored = cand.mapInPandas(
        _score,
        "doc_id long, label int, qid long, coarse_cos double",
    )
    shortlist = scored.withColumn(
        "coarse_rank", F.row_number().over(w_coarse)
    ).where(F.col("coarse_rank") <= 20)
    coarse = shortlist.join(
        e.select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").alias("de"),
        ),
        "doc_id",
    ).join(F.broadcast(q), "qid")
    w_rr = Window.partitionBy("qid").orderBy(
        F.col("grid").desc(), F.col("doc_id")
    )
    return (
        coarse.withColumn(
            "grid", maxsim_grid(F.col("qe"), F.col("de"))
        )
        .withColumn("rnk", F.row_number().over(w_rr))
        .where(F.col("rnk") <= 5)
        .select(
            "qid",
            "doc_id",
            "rnk",
            "coarse_rank",
            (F.col("grid").cast("double") / F.lit(1e10)).alias("maxsim"),
        )
        .orderBy("qid", "rnk")
    )


def _sql_idot(a: str, b: str, dim: int = _DIM) -> str:
    """Integer-lattice dot product (the dec_dot grid WITHOUT the final
    rescale): exact BIGINT sum of per-element 1e-10-floored products."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"* 1e10) AS BIGINT))) AS BIGINT)"
    )


def _sql_d2(x: str, c: str) -> str:
    """||x-c||^2 on the integer lattice, clamped to >= 1 for the ln."""
    return (
        f"GREATEST({_sql_idot(x, x)} - 2 * {_sql_idot(x, c)} "
        f"+ {_sql_idot(c, c)}, 1)"
    )


def _sql_gumbel(round_no: int) -> str:
    h = (
        f"CAST(('0x' || substr(md5('kpp:{round_no}:' "
        "|| CAST(e.vec_id AS VARCHAR)), 1, 12)) AS BIGINT)"
    )
    return (
        f"CAST(FLOOR(-LN(-LN(({h} + 0.5e0) / 281474976710656e0)) * 1e6) "
        "AS BIGINT)"
    )


def _kpp_oracle() -> str:
    stages = ["c0 AS (SELECT vec_id, embedding FROM embeddings "
              "WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))"]
    prior = ["c0"]
    for r in (1, 2, 3):
        d2 = " , ".join(
            f"{_sql_d2('e.embedding', f'{c}.embedding')}" for c in prior
        )
        least = f"LEAST({d2})" if len(prior) > 1 else d2
        froms = " CROSS JOIN ".join(prior)
        stages.append(
            f"s{r} AS (SELECT e.vec_id, {least} AS d2, "
            f"{_sql_gumbel(r)} AS gg "
            f"FROM embeddings e CROSS JOIN {froms})"
        )
        stages.append(
            f"k{r} AS (SELECT vec_id, "
            "CAST(FLOOR(LN(CAST(d2 AS DOUBLE)) * 1e6) AS BIGINT) + gg "
            "AS key, gg, d2 "
            f"FROM s{r} ORDER BY key DESC, vec_id LIMIT 1)"
        )
        stages.append(
            f"c{r} AS (SELECT vec_id, embedding FROM embeddings "
            f"WHERE vec_id = (SELECT vec_id FROM k{r}))"
        )
        prior.append(f"c{r}")
    d2all = " , ".join(
        f"{_sql_d2('e.embedding', f'{c}.embedding')}" for c in prior
    )
    froms = " CROSS JOIN ".join(prior)
    stages.append(
        f"inertia AS (SELECT CAST(SUM(LEAST({d2all})) AS BIGINT) AS v "
        f"FROM embeddings e CROSS JOIN {froms})"
    )
    rows = ["SELECT CAST(0 AS BIGINT) AS round, c0.vec_id, "
            "CAST(0 AS BIGINT) AS key FROM c0"]
    for r in (1, 2, 3):
        rows.append(
            f"SELECT CAST({r} AS BIGINT) AS round, vec_id, key FROM k{r}"
        )
    union = " UNION ALL ".join(rows)
    return (
        "WITH " + ",\n".join(stages)
        + f"\nSELECT u.round, u.vec_id, u.key, inertia.v AS inertia_int "
        f"FROM ({union}) u CROSS JOIN inertia ORDER BY u.round"
    )


@register(
    "ext_kmeanspp_seeding",
    survey_id="EXT-KMEANSPP",
    category="llm-vectors",
    oracle=_kpp_oracle(),
)
def ext_kmeanspp_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means++ (D^2-weighted) seeding made DETERMINISTIC and
    engine-exact — the seeding step every embedding-space clustering
    pipeline (SemDeDup-style semantic dedup, IVF coarse quantizers,
    domain discovery) runs before Lloyd iterations, which MLlib leaves
    RNG-dependent: center 0 is the min vec_id; each later center is
    drawn with probability proportional to its squared distance to the
    nearest chosen center via the GUMBEL-MAX trick — key =
    ln(d^2)+Gumbel(hash(round, vec_id)) on the 1e-6 grid, argmax = one
    exact sample from the D^2 distribution (the same identity
    ext_dsir_gumbel_resample uses for top-k). Distances live on the
    dec_dot integer lattice (||x-c||^2 = xx - 2xc + cc of 1e-10-floored
    products, clamped >= 1: flooring can push an exact-zero
    self-distance a few lattice units negative), so d^2, keys, argmax
    and the final 4-center inertia are ALL exact BIGINTs.

    Scale shape: each of the 3 rounds broadcasts the <=3 chosen
    centers, computes d^2 row-locally, and reduces with ONE
    partial-combining struct-max argmax (no sort, no window); chosen
    centers are 1-row localCheckpoints (bounded model reads, the ALS/
    kmeans_lloyd convention) so round r+1's lineage does not re-run
    round r. The oracle unrolls the 3 stages with scalar-subquery
    center references. O(n * k * dim) total work, one pass per round —
    exactly how a 100 TB seeding job should look."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: F.floor(
                    x.cast("double") * y.cast("double") * F.lit(1e10)
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    c0 = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.lit(0).cast("bigint").alias("c_round"),
            F.col("vec_id").alias("c_id"),
            F.col("embedding").alias("c_emb"),
        )
        .localCheckpoint()
    )
    centers = [c0]
    picked = [
        c0.select(
            F.col("c_round").alias("round"),
            F.col("c_id").alias("vec_id"),
            F.lit(0).cast("bigint").alias("key"),
        )
    ]
    for r in (1, 2, 3):
        cents = centers[0]
        for c in centers[1:]:
            cents = cents.unionByName(c)
        pc = e.crossJoin(F.broadcast(cents.select("c_id", "c_emb")))
        d2 = F.greatest(
            idot(F.col("embedding"), F.col("embedding"))
            - 2 * idot(F.col("embedding"), F.col("c_emb"))
            + idot(F.col("c_emb"), F.col("c_emb")),
            F.lit(1).cast("bigint"),
        )
        near = (
            pc.select("vec_id", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("d2"))
        )
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"kpp:{r}:"),
                            F.col("vec_id").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            + F.lit(0.5)
        ) / F.lit(281474976710656.0)
        keyed = near.select(
            "vec_id",
            (
                F.floor(F.log(F.col("d2").cast("double")) * 1e6).cast(
                    "bigint"
                )
                + F.floor(-F.log(-F.log(u)) * 1e6).cast("bigint")
            ).alias("key"),
        )
        best = keyed.agg(
            F.max(F.struct(F.col("key"), (-F.col("vec_id")).alias("nv")))
            .alias("b")
        ).select(
            F.col("b.key").alias("key"),
            (-F.col("b.nv")).alias("vec_id"),
        )
        cr = (
            best.join(e, "vec_id")
            .select(
                F.lit(r).cast("bigint").alias("c_round"),
                F.col("vec_id").alias("c_id"),
                F.col("embedding").alias("c_emb"),
            )
            .localCheckpoint()
        )
        centers.append(cr)
        picked.append(
            cr.join(
                best.select(F.col("vec_id").alias("c_id"), "key"), "c_id"
            ).select(
                F.col("c_round").alias("round"),
                F.col("c_id").alias("vec_id"),
                "key",
            )
        )
    cents = centers[0]
    for c in centers[1:]:
        cents = cents.unionByName(c)
    pc = e.crossJoin(F.broadcast(cents.select("c_emb")))
    d2 = F.greatest(
        idot(F.col("embedding"), F.col("embedding"))
        - 2 * idot(F.col("embedding"), F.col("c_emb"))
        + idot(F.col("c_emb"), F.col("c_emb")),
        F.lit(1).cast("bigint"),
    )
    inertia = (
        pc.select("vec_id", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min("d2").alias("d2"))
        .agg(F.sum("d2").cast("bigint").alias("inertia_int"))
    )
    out = picked[0]
    for p in picked[1:]:
        out = out.unionByName(p)
    return out.crossJoin(F.broadcast(inertia)).orderBy("round")


def margin_candidate_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-funnel candidate generator of ext_margin_pair_mining,
    exposed for the scale ladder's candidate-volume measurer:
    ceil(sqrt(|B|)) hash-seeded cells over the target pool (the cell
    count is COUNT-DERIVED, the silhouette-modulus pattern — a bounded
    1-row driver read, so candidates grow ~n^1.5, never Theta(n^2/k)
    for a fixed k), row-local argmax assignment + nprobe=2 probe
    against the 1-row collected seed array, keyed equi-join on cell.
    Returns (src_id, ea, cell, tgt_id, eb) candidate rows."""
    import math

    e = load_table(spark, sf_dir, "embeddings")
    a = e.where(F.col("label") == 0).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("ea")
    )
    b = e.where(F.col("label") == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("eb")
    )
    # ceil(sqrt(nb)) via isqrt — exact for perfect squares, matching
    # the oracle's CEIL(SQRT(n)) (IEEE sqrt of an int < 2^53 is exact
    # on perfect squares and never rounds onto an integer otherwise)
    nb = b.count()
    r = math.isqrt(max(nb, 1))
    cells = r if r * r == max(nb, 1) else r + 1
    seeds = (
        b.orderBy(F.md5(F.col("tgt_id").cast("string")), "tgt_id")
        .limit(cells)
        .select(F.col("tgt_id").alias("cell"), F.col("eb").alias("se"))
    )
    seed_row = F.broadcast(
        seeds.agg(F.collect_list(F.struct("cell", "se")).alias("seeds"))
    )

    def cg9(x, y):
        return F.floor(cosine(x, y) * 1e9).cast("bigint")

    def cells_ranked(emb):
        # row-local (ncg, cell) sort over the 16-seed array: best
        # cosine first, ties on cell id — no shuffle, no window
        return F.array_sort(
            F.transform(
                F.col("seeds"),
                lambda s: F.struct(
                    (-cg9(emb, s["se"])).alias("ncg"),
                    s["cell"].alias("cell"),
                ),
            )
        )

    assigned = b.crossJoin(seed_row).select(
        "tgt_id",
        "eb",
        cells_ranked(F.col("eb"))[0]["cell"].alias("cell"),
    )
    probed = a.crossJoin(seed_row).select(
        "src_id",
        "ea",
        F.explode(
            F.transform(
                F.slice(cells_ranked(F.col("ea")), 1, 2),
                lambda t: t["cell"],
            )
        ).alias("cell"),
    )
    return probed.join(assigned, "cell")




@register(
    "ext_margin_pair_mining",
    survey_id="EXT-MARGIN-MINING",
    category="llm-vectors",
    oracle=f"""
WITH a AS (SELECT vec_id AS src_id, embedding AS ea
           FROM embeddings WHERE label = 0),
b AS (SELECT vec_id AS tgt_id, embedding AS eb
      FROM embeddings WHERE label = 1),
nb AS (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) AS cells FROM b),
seeds AS (
  SELECT cell, se FROM (
    SELECT tgt_id AS cell, eb AS se,
           ROW_NUMBER() OVER (
             ORDER BY md5(CAST(tgt_id AS VARCHAR)), tgt_id) AS srk
    FROM b
  ) s, nb WHERE s.srk <= nb.cells
),
assigned AS (
  SELECT tgt_id, eb, cell FROM (
    SELECT b.tgt_id, b.eb, s.cell,
           ROW_NUMBER() OVER (
             PARTITION BY b.tgt_id
             ORDER BY CAST(FLOOR({sql_cosine('b.eb', 's.se')} * 1e9)
                           AS BIGINT) DESC, s.cell) AS rk
    FROM b CROSS JOIN seeds s
  ) WHERE rk = 1
),
probed AS (
  SELECT src_id, ea, cell FROM (
    SELECT a.src_id, a.ea, s.cell,
           ROW_NUMBER() OVER (
             PARTITION BY a.src_id
             ORDER BY CAST(FLOOR({sql_cosine('a.ea', 's.se')} * 1e9)
                           AS BIGINT) DESC, s.cell) AS rk
    FROM a CROSS JOIN seeds s
  ) WHERE rk <= 2
),
xp AS (
  SELECT p.src_id, t.tgt_id,
         CAST(FLOOR({sql_cosine('p.ea', 't.eb')} * 1e9) AS BIGINT) AS cg
  FROM probed p JOIN assigned t USING (cell)
),
ka AS (
  SELECT src_id, CAST(SUM(cg) AS BIGINT) AS sum4
  FROM (
    SELECT src_id, cg,
           ROW_NUMBER() OVER (PARTITION BY src_id
                              ORDER BY cg DESC, tgt_id) AS rk
    FROM xp
  ) WHERE rk <= 4 GROUP BY src_id
),
kb AS (
  SELECT tgt_id, CAST(SUM(cg) AS BIGINT) AS sum4
  FROM (
    SELECT tgt_id, cg,
           ROW_NUMBER() OVER (PARTITION BY tgt_id
                              ORDER BY cg DESC, src_id) AS rk
    FROM xp
  ) WHERE rk <= 4 GROUP BY tgt_id
),
scored AS (
  SELECT xp.src_id, xp.tgt_id, xp.cg,
         CAST(8 * xp.cg - ka.sum4 - kb.sum4 AS BIGINT) AS margin8
  FROM xp JOIN ka USING (src_id) JOIN kb USING (tgt_id)
)
SELECT src_id, tgt_id, cg, margin8, CAST(rk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY margin8 DESC, src_id, tgt_id) AS rk
  FROM scored
) WHERE rk <= 20
ORDER BY rank
""",
)
def ext_margin_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based pair mining (Artetxe & Schwenk 2019, the method
    behind LASER/CCMatrix bitext mining and every "mine aligned pairs
    from two embedding pools" pipeline): a candidate pair scores not
    by raw cosine but by its margin over each side's neighborhood —
    here the DIFFERENCE margin cos(x,y) - (avg_k(x)+avg_k(y))/2 with
    k=4, which kills hub vectors that are everyone's nearest
    neighbor. Pools are label 0 (source) and label 1 (target); output
    is the global top-20 mined pairs over the IVF candidate set.

    Candidate generation is the repo's own IVF probe funnel (the r6
    verdict's fix: the first draft materialized the pool x pool cross
    product with a pool-sized broadcast — the scale-killer pair):
    ceil(sqrt(|B|)) hash-seeded cells (lowest md5(tgt_id) target
    vectors — a deterministic uniform sample; the cell count is
    COUNT-DERIVED per the r7 verdict, so the codebook GROWS with the
    target pool instead of freezing at a constant), every target
    assigned to its argmax-cosine cell and every source probing its
    nprobe=2 nearest cells, both ROW-LOCALLY against the 1-row
    collected seed array (zero shuffle); candidates are then a keyed
    equi-join on cell — ~2|A|*sqrt(|B|) expected pairs (n^1.5, the
    ladder-gated exponent), never all-pairs. At 100 TB the same
    dataflow holds: cells partition the target pool, the probe side
    explodes to exactly nprobe rows per source, and the seed codebook
    broadcast is O(sqrt(|B|)) rows.

    Exactness: cosines land on the 1e-9 grid BEFORE any sum (top-4
    neighborhood sums of gridded BIGINTs are order-independent),
    cell argmax / probe top-2 tie-break on cell id, and the
    difference margin x8 (8*cg - sum4_src - sum4_tgt) clears both the
    division and the signed-DIV hazard entirely: every emitted value
    is an exact signed BIGINT, ranked with id tie-breaks. The oracle
    replicates the identical funnel (seed selection included), so the
    full pipeline hash-matches."""
    from pyspark.sql import Window

    xp = (
        margin_candidate_frame(spark, sf_dir)
        .select(
            "src_id",
            "tgt_id",
            F.floor(cosine(F.col("ea"), F.col("eb")) * 1e9)
            .cast("bigint")
            .alias("cg"),
        )
        .localCheckpoint()
    )
    wa = Window.partitionBy("src_id").orderBy(
        F.col("cg").desc(), "tgt_id"
    )
    ka = (
        xp.withColumn("rk", F.row_number().over(wa))
        .where(F.col("rk") <= 4)
        .groupBy("src_id")
        .agg(F.sum("cg").cast("bigint").alias("sum4a"))
    )
    wb = Window.partitionBy("tgt_id").orderBy(
        F.col("cg").desc(), "src_id"
    )
    kb = (
        xp.withColumn("rk", F.row_number().over(wb))
        .where(F.col("rk") <= 4)
        .groupBy("tgt_id")
        .agg(F.sum("cg").cast("bigint").alias("sum4b"))
    )
    # candidate-proportional sides: plain keyed joins (no broadcast
    # hint — AQE picks at test scale, shuffle-hash at 100 TB)
    scored = (
        xp.join(ka, "src_id")
        .join(kb, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cg",
            (8 * F.col("cg") - F.col("sum4a") - F.col("sum4b"))
            .cast("bigint")
            .alias("margin8"),
        )
    )
    return (
        scored.orderBy(F.col("margin8").desc(), "src_id", "tgt_id")
        .limit(20)
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("margin8").desc(), "src_id", "tgt_id"
                )
            )
            .cast("bigint"),
        )
        .select("src_id", "tgt_id", "cg", "margin8", "rank")
        .orderBy("rank")
    )


@register(
    "ext_medoid_exemplars",
    survey_id="EXT-MEDOID",
    category="llm-vectors",
    oracle=f"""
WITH lc AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings GROUP BY label
),
probes AS (
  SELECT e.label, e.vec_id, e.embedding
  FROM embeddings e JOIN lc ON e.label = lc.label
  WHERE e.vec_id % GREATEST(1, lc.n // 64) = 0
),
pairs AS (
  SELECT a.label, a.vec_id,
         CAST(SUM({_sql_idot('a.embedding', 'a.embedding')}
                  - 2 * {_sql_idot('a.embedding', 'b.embedding')}
                  + {_sql_idot('b.embedding', 'b.embedding')})
              AS BIGINT) AS sum_d2,
         CAST(COUNT(*) AS BIGINT) AS n_others
  FROM embeddings a JOIN probes b
    ON a.label = b.label AND a.vec_id <> b.vec_id
  GROUP BY a.label, a.vec_id
)
SELECT label, vec_id AS medoid_id, sum_d2, n_others,
       CAST(sum_d2 // n_others AS BIGINT) AS mean_d2_int
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
             ORDER BY sum_d2, vec_id) AS rk
  FROM pairs
) WHERE rk = 1
ORDER BY label
""",
)
def ext_medoid_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster MEDOID selection — the exemplar step of
    SemDeDup-style cluster pruning ("keep the most central member,
    drop the rest") and the robust alternative to centroids for
    non-euclidean curation decisions: for each label, the member
    minimizing the SUM of squared distances to a FIXED-SIZE in-cluster
    PROBE SAMPLE (~64 members via the count-derived modulus
    vec_id % (n_label DIV 64) — the silhouette pattern), with the
    argmin kept exact over the sampled sums.  This is the r7 verdict's
    fix: the previous declaration scored every member against every
    PEER, i.e. all-pairs within corpus-proportional blocks — measured
    103.9x wall for a 10x data step on the sf1 ladder.  The sampled
    reference set is the standard medoid estimator (CLARA's sampling
    insight, applied to the reference side): scores are unbiased up to
    the fixed sample, and every arithmetic step stays exact.

    Distances live on the dec_dot 1e-10 integer lattice
    (xx - 2xy + yy of floored products), so the per-member sums are
    order-independent exact BIGINTs and the argmin ties break on
    vec_id.  Members whose probe set is empty after self-exclusion
    (only possible when the member IS the label's sole probe) are
    excluded, matching the oracle's join semantics.

    Scale shape: probe sets are ~64 rows per label REGARDLESS of
    corpus size, collected once per label and broadcast as one array
    row (O(labels * 64 * dim) bytes); every member's sampled sum is
    then ROW-LOCAL arithmetic against that array — no pair join, no
    explode, no shuffle until the final per-label argmin over
    member-count narrow rows (min of a (sum_d2, vec_id) struct, one
    map-side-combinable aggregate).  Work is O(n * 64 * dim), linear
    in the corpus; the ladder row gates the WALL ratio near-linear."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", "vec_id", "embedding"
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: F.floor(
                    x.cast("double") * y.cast("double") * F.lit(1e10)
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    lc = e.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_label")
    )
    probes = (
        e.join(F.broadcast(lc), "label")
        .where(
            F.col("vec_id")
            % F.greatest(F.lit(1).cast("bigint"), F.expr("n_label DIV 64"))
            == 0
        )
        .groupBy("label")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("vec_id").alias("pid"),
                    F.col("embedding").alias("pe"),
                    # probe self-dot ONCE per probe at collect time —
                    # the old fold recomputed it per (member, probe).
                    idot(F.col("embedding"), F.col("embedding")).alias(
                        "pbb"
                    ),
                )
            ).alias("ps")
        )
    )
    others = F.filter(F.col("ps"), lambda p: p["pid"] != F.col("vec_id"))
    # sum_d2 = Σ_p (aa - 2ab + bb) = n_others*aa + Σ_p (bb - 2ab): the
    # member self-dot aa is probe-invariant, so it is hoisted out of the
    # fold (identical int64 total — integer addition commutes, no
    # overflow at these magnitudes). The member side deliberately keeps
    # the scan's own partitioning (NO spread): repartitioning it would
    # shuffle O(corpus) bytes before a broadcast join, violating the
    # designed flat-shuffle shape this family pins in
    # tests/test_scale_ladder.py (the probe set is O(1); the only
    # shuffle should be the probe broadcast + the tiny final argmin) —
    # same decision as ext_silhouette_sampled, commit c9cfb99.
    aa = idot(F.col("embedding"), F.col("embedding"))
    scored = (
        e
        .join(F.broadcast(probes), "label")
        .select(
            "label",
            "vec_id",
            (
                F.size(others).cast("bigint") * aa
                + F.aggregate(
                    others,
                    F.lit(0).cast("bigint"),
                    lambda acc, p: acc
                    - 2 * idot(F.col("embedding"), p["pe"])
                    + p["pbb"],
                )
            ).alias("sum_d2"),
            F.size(others).cast("bigint").alias("n_others"),
        )
        .where(F.col("n_others") > 0)
    )
    return (
        scored.groupBy("label")
        .agg(F.min(F.struct("sum_d2", "vec_id", "n_others")).alias("m"))
        .select(
            "label",
            F.col("m.vec_id").alias("medoid_id"),
            F.col("m.sum_d2").alias("sum_d2"),
            F.col("m.n_others").alias("n_others"),
            F.expr("m.sum_d2 DIV m.n_others")
            .cast("bigint")
            .alias("mean_d2_int"),
        )
        .orderBy("label")
    )


@register(
    "ext_silhouette_sampled",
    survey_id="EXT-SILHOUETTE",
    category="llm-vectors",
    oracle=f"""
WITH nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM embeddings),
probes AS (
  SELECT label, vec_id, embedding FROM embeddings, nt
  WHERE vec_id % GREATEST(1, n_total // 64) = 0
),
d AS (
  SELECT p.vec_id, p.label AS plabel, b.label,
         CAST(SUM({_sql_idot('p.embedding', 'p.embedding')}
                  - 2 * {_sql_idot('p.embedding', 'b.embedding')}
                  + {_sql_idot('b.embedding', 'b.embedding')})
              AS BIGINT) AS sum_d2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM probes p JOIN embeddings b ON p.vec_id <> b.vec_id
  GROUP BY p.vec_id, p.label, b.label
),
ab AS (
  SELECT vec_id, plabel,
         MAX(CASE WHEN label = plabel THEN sum_d2 // n END) AS a,
         MIN(CASE WHEN label <> plabel THEN sum_d2 // n END) AS b
  FROM d GROUP BY vec_id, plabel
),
s AS (
  SELECT vec_id, plabel AS label,
         CAST(CASE WHEN b >= a THEN (b - a) * 1000 // GREATEST(a, b)
              ELSE -((a - b) * 1000 // GREATEST(a, b)) END
              AS BIGINT) AS s_milli
  FROM ab WHERE a IS NOT NULL AND b IS NOT NULL
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(s_milli) AS BIGINT) AS sum_s_milli,
       CAST(CAST(SUM(s_milli) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            / 1000e0 AS DOUBLE) AS avg_silhouette
FROM s GROUP BY label
ORDER BY label
""",
)
def ext_silhouette_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled SILHOUETTE score of the embedding labeling — the
    standard internal clustering-quality metric, computed for a
    FIXED-SIZE probe set (~64 vectors: modulus n_total DIV 64, derived
    from the corpus count — the r6 verdict's fix: the first draft
    probed every 10th vector and broadcast a corpus-proportional
    frame) against the full corpus: a = mean squared distance to
    own-label peers, b = the smallest other-label mean, s =
    (b-a)/max(a,b). Positive means the labels carve real structure
    (worth medoid-pruning, ext_medoid_exemplars); near-zero means the
    partitioner needs re-seeding (ext_kmeanspp_seeding). Distances
    ride the dec_dot integer lattice; per-(probe, label) sums are
    exact BIGINTs; a and b are FLOOR-divided means (identical on both
    engines — the declared definition) so s lands on an exact milli
    grid, and the per-label reduction emits the exact integer SUM
    (avoiding signed-DIV divergence) beside the derived double mean.

    Scale shape: probe x corpus is a fixed-k blocked product with
    per-(probe,label) map-side-combinable sums — O(k * n) with k
    CONSTANT in the corpus size, so the broadcast side is ~64 rows at
    any scale (the count-derived modulus is the sampling knob: at
    100 TB the same dataflow holds, only the modulus grows)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", "vec_id", "embedding"
    )
    nt = e.agg(F.count("*").cast("bigint").alias("n_total"))
    probes = (
        e.crossJoin(F.broadcast(nt))
        .where(
            F.col("vec_id")
            % F.greatest(F.lit(1).cast("bigint"), F.expr("n_total DIV 64"))
            == 0
        )
        .select(
            F.col("vec_id").alias("pid"),
            F.col("label").alias("plabel"),
            F.col("embedding").alias("pe"),
        )
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: F.floor(
                    x.cast("double") * y.cast("double") * F.lit(1e10)
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    # r11 perf (guide §2.3/§2.5): the two SELF-dots depend on only one
    # side each, so hoist them out of the probe x corpus product — the
    # old shape re-ran three interpreted fold expressions per PAIR where
    # one (the cross term) suffices; per-element floors and bigint sums
    # are unchanged, so every sum_d2 is bit-identical. The corpus side
    # deliberately keeps the scan's own partitioning: repartitioning it
    # would shuffle O(corpus) bytes before a broadcast join, violating
    # the designed flat-shuffle shape this family pins in
    # tests/test_scale_ladder.py (the probe set is O(1); the only
    # shuffle should be the ~64-row probe broadcast + tiny aggregates).
    e_sq = e.withColumn("ee", idot(F.col("embedding"), F.col("embedding")))
    probes_sq = probes.withColumn("pp", idot(F.col("pe"), F.col("pe")))
    d2 = (
        F.broadcast(probes_sq)
        .join(e_sq, F.col("pid") != F.col("vec_id"))
        .groupBy("pid", "plabel", "label")
        .agg(
            F.sum(
                F.col("pp")
                - 2 * idot(F.col("pe"), F.col("embedding"))
                + F.col("ee")
            )
            .cast("bigint")
            .alias("sum_d2"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    ab = d2.groupBy("pid", "plabel").agg(
        F.max(
            F.when(
                F.col("label") == F.col("plabel"),
                F.expr("sum_d2 DIV n"),
            )
        ).alias("a"),
        F.min(
            F.when(
                F.col("label") != F.col("plabel"),
                F.expr("sum_d2 DIV n"),
            )
        ).alias("b"),
    )
    s = ab.where(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    ).select(
        F.col("plabel").alias("label"),
        # sign-split: both engines floor-divide POSITIVE integers only
        # (their signed integer-division semantics differ)
        F.expr(
            "CASE WHEN b >= a THEN (b - a) * 1000 DIV GREATEST(a, b) "
            "ELSE -((a - b) * 1000 DIV GREATEST(a, b)) END"
        )
        .cast("bigint")
        .alias("s_milli"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_probes"),
            F.sum("s_milli").cast("bigint").alias("sum_s_milli"),
        )
        .select(
            "label",
            "n_probes",
            "sum_s_milli",
            (
                F.col("sum_s_milli").cast("double")
                / F.col("n_probes").cast("double")
                / F.lit(1e3)
            ).alias("avg_silhouette"),
        )
        .orderBy("label")
    )


_BQ_PACK_SPARK = (
    "aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT), (acc, i) -> acc + "
    "IF(element_at({col}, i) >= CAST(0 AS FLOAT), "
    "shiftleft(CAST(1 AS BIGINT), i - {lo}), CAST(0 AS BIGINT)))"
)

_BQ_PACK_SQL = (
    "CAST(list_sum(list_transform(generate_series({lo}, {hi}), "
    "i -> CASE WHEN {col}[i] >= 0 THEN CAST(1 AS BIGINT) << (i - {lo}) "
    "ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
)


@register(
    "ext_binary_embedding_recall",
    survey_id="EXT-BQ-RECALL",
    category="llm-vectors",
    oracle=f"""
WITH packed AS (
  SELECT vec_id,
         {_BQ_PACK_SQL.format(col='embedding', lo=1, hi=32)} AS h1,
         {_BQ_PACK_SQL.format(col='embedding', lo=33, hi=64)} AS h2,
         embedding
  FROM embeddings
),
n AS (SELECT GREATEST(1, COUNT(*) // 16) AS md FROM embeddings),
probes AS (
  SELECT vec_id AS probe_id, h1 AS p1, h2 AS p2, embedding AS pe
  FROM packed, n WHERE vec_id % n.md = 0
),
ham AS (
  SELECT p.probe_id, c.vec_id,
         bit_count(xor(p.p1, c.h1)) + bit_count(xor(p.p2, c.h2)) AS hd,
         CAST(FLOOR({sql_cosine('p.pe', 'c.embedding')} * 1e9) AS BIGINT)
           AS cg
  FROM probes p CROSS JOIN packed c
  WHERE p.probe_id <> c.vec_id
),
bq AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY hd, vec_id) AS rk
    FROM ham) WHERE rk <= 10
),
exact AS (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id, ROW_NUMBER() OVER (
      PARTITION BY probe_id ORDER BY cg DESC, vec_id) AS rk
    FROM ham) WHERE rk <= 10
)
SELECT e.probe_id,
       CAST(COUNT(bq.vec_id) AS BIGINT) AS hits,
       CAST(COUNT(bq.vec_id) * 10 AS BIGINT) AS recall_pct
FROM exact e LEFT JOIN bq
  ON bq.probe_id = e.probe_id AND bq.vec_id = e.vec_id
GROUP BY e.probe_id
ORDER BY e.probe_id
""",
)
def ext_binary_embedding_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BINARY QUANTIZATION recall evaluation — the cheapest ANN scale
    path (1 bit/dimension, 64x smaller than float32, Hamming distance
    via two xor+popcount instructions) measured against the exact
    cosine ranking: each embedding's 64 sign bits pack into two 32-bit
    BIGINT halves; for a count-derived probe sample (~16-32 vectors at
    ANY corpus size — the silhouette-modulus pattern) the Hamming
    top-10 is compared to the exact gridded-cosine top-10 and recall@10
    reported per probe. This is the missing rung between the repo's
    float quantizers (SQ8, PQ, RQ) and the IVF family: at 100 TB the
    binary index is the one that fits in memory, and THIS query is how
    its recall cost is measured before committing to it.

    Exactness: bit packing compares float32 against zero (no
    arithmetic), Hamming distances are exact integers, the cosine side
    rides the house 1e-9 floor grid, and both top-10s tie-break on
    vec_id — every rank, hit count, and recall percentage is
    engine-exact.

    Scale shape: the probe set is O(1) by the count-derived modulus;
    candidates are probes x corpus = linear in the corpus with a
    bounded constant. The exact side IS the point (a recall eval
    needs ground truth) — restricted to the bounded probe sample
    exactly the way production recall monitoring samples queries."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    md = max(1, n // 16)
    packed = e.select(
        "vec_id",
        F.expr(
            _BQ_PACK_SPARK.format(col="embedding", lo=1, hi=32)
        ).alias("h1"),
        F.expr(
            _BQ_PACK_SPARK.format(col="embedding", lo=33, hi=64)
        ).alias("h2"),
        "embedding",
    )
    probes = packed.where(F.col("vec_id") % md == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("h1").alias("p1"),
        F.col("h2").alias("p2"),
        F.col("embedding").alias("pe"),
    )
    ham = (
        packed.crossJoin(F.broadcast(probes))
        .where(F.col("probe_id") != F.col("vec_id"))
        .select(
            "probe_id",
            "vec_id",
            (
                F.bit_count(F.col("p1").bitwiseXOR(F.col("h1")))
                + F.bit_count(F.col("p2").bitwiseXOR(F.col("h2")))
            ).alias("hd"),
            F.floor(cosine(F.col("pe"), F.col("embedding")) * 1e9)
            .cast("bigint")
            .alias("cg"),
        )
        .localCheckpoint()
    )
    w_bq = Window.partitionBy("probe_id").orderBy("hd", "vec_id")
    bq = (
        ham.withColumn("rk", F.row_number().over(w_bq))
        .where(F.col("rk") <= 10)
        .select("probe_id", "vec_id")
    )
    w_ex = Window.partitionBy("probe_id").orderBy(
        F.col("cg").desc(), "vec_id"
    )
    exact = (
        ham.withColumn("rk", F.row_number().over(w_ex))
        .where(F.col("rk") <= 10)
        .select("probe_id", "vec_id")
    )
    return (
        exact.join(bq, ["probe_id", "vec_id"], "left_semi")
        .groupBy("probe_id")
        .agg(F.count("*").cast("bigint").alias("hits"))
        .join(exact.select("probe_id").distinct(), "probe_id", "right")
        .select(
            "probe_id",
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
            (F.coalesce("hits", F.lit(0)) * 10)
            .cast("bigint")
            .alias("recall_pct"),
        )
        .orderBy("probe_id")
    )


@register(
    "ext_embedding_distribution_divergence",
    survey_id="EXT-EMB-JSD",
    category="llm-vectors",
    oracle=f"""
WITH seeds AS (
  SELECT cell, se FROM (
    SELECT vec_id AS cell, embedding AS se,
           ROW_NUMBER() OVER (
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srk
    FROM embeddings
  ) WHERE srk <= 16
),
assigned AS (
  SELECT vec_id, cell, vec_id % 2 AS side FROM (
    SELECT e.vec_id, s.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY CAST(FLOOR({sql_cosine('e.embedding', 's.se')} * 1e9)
                           AS BIGINT) DESC, s.cell) AS rk
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rk = 1
),
hist AS (
  SELECT cell,
         CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_q
  FROM assigned GROUP BY cell
),
tot AS (
  SELECT CAST(SUM(n_p) AS BIGINT) AS np, CAST(SUM(n_q) AS BIGINT) AS nq
  FROM hist
),
terms AS (
  SELECT
    CAST(SUM(CASE WHEN n_p > 0 THEN n_p * CAST(FLOOR(ln(
      CAST(2 * n_p * nq AS DOUBLE)
      / CAST(n_p * nq + n_q * np AS DOUBLE)) * 1000000e0) AS BIGINT)
      ELSE 0 END) AS BIGINT) AS num_p,
    CAST(SUM(CASE WHEN n_q > 0 THEN n_q * CAST(FLOOR(ln(
      CAST(2 * n_q * np AS DOUBLE)
      / CAST(n_q * np + n_p * nq AS DOUBLE)) * 1000000e0) AS BIGINT)
      ELSE 0 END) AS BIGINT) AS num_q,
    MAX(np) AS np, MAX(nq) AS nq
  FROM hist CROSS JOIN tot
)
SELECT h.cell, h.n_p, h.n_q,
       CAST((CAST(t.num_p AS DOUBLE) / CAST(t.np AS DOUBLE)
             + CAST(t.num_q AS DOUBLE) / CAST(t.nq AS DOUBLE))
            / 2000000e0 AS DOUBLE) AS jsd_nats
FROM hist h CROSS JOIN terms t
ORDER BY h.cell
""",
)
def ext_embedding_distribution_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EMBEDDING-SPACE DISTRIBUTION DIVERGENCE (MAUVE-lite, Pillutla et
    al. 2021): compare two corpora in embedding space by quantizing
    every vector into k=16 hash-seeded cells (the margin-mining seed
    recipe: lowest md5(vec_id) vectors as deterministic uniform seeds,
    row-local best-cosine assignment against the broadcast seed array)
    and taking the Jensen-Shannon divergence between the two cell
    HISTOGRAMS. Sides are even/odd vec_id (the fixture's stand-in for
    model-vs-human or before/after-filter corpora); output is the
    per-cell histogram plus the one JSD number a data-curation
    dashboard tracks per snapshot.

    Exactness: the ext_jensen_shannon_matrix recipe — the even-mixture
    ratio collapses to the exact rational 2*n_p*nq / (n_p*nq + n_q*np),
    each directed numerator is an exact BIGINT sum of count * lnGrid
    terms (ln floored to the 1e-6 lattice), and empty-side cells
    contribute ln 2 naturally (the other count is 0) — no smoothing.
    The fixed k=16 is a histogram RESOLUTION, not a candidate bound:
    assignment cost is corpus x 16 (linear), the histogram is 16 rows,
    and nothing in the output grows with the corpus but the counts.

    Scale shape: one bounded seed collect (16 rows), one row-local
    assignment pass (zero shuffle), one 16-key combinable aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    seeds = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("se"))
    )
    seed_row = F.broadcast(
        seeds.agg(F.collect_list(F.struct("cell", "se")).alias("seeds"))
    )
    best = F.array_sort(
        F.transform(
            F.col("seeds"),
            lambda s: F.struct(
                (-F.floor(cosine(F.col("embedding"), s["se"]) * 1e9))
                .cast("bigint")
                .alias("ncg"),
                s["cell"].alias("cell"),
            ),
        )
    )[0]["cell"]
    assigned = e.crossJoin(seed_row).select(
        (F.col("vec_id") % 2).alias("side"), best.alias("cell")
    )
    hist = assigned.groupBy("cell").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_p"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_q"),
    )
    tot = hist.agg(
        F.sum("n_p").cast("bigint").alias("np"),
        F.sum("n_q").cast("bigint").alias("nq"),
    )
    ht = hist.crossJoin(F.broadcast(tot))

    def _term(c_self: str, n_self: str, c_other: str, n_other: str):
        return F.when(
            F.col(c_self) > 0,
            F.col(c_self)
            * F.floor(
                F.log(
                    (2 * F.col(c_self) * F.col(n_other)).cast("double")
                    / (
                        F.col(c_self) * F.col(n_other)
                        + F.col(c_other) * F.col(n_self)
                    ).cast("double")
                )
                * 1e6
            ).cast("bigint"),
        ).otherwise(0)

    terms = ht.agg(
        F.sum(_term("n_p", "np", "n_q", "nq")).cast("bigint").alias("num_p"),
        F.sum(_term("n_q", "nq", "n_p", "np")).cast("bigint").alias("num_q"),
        F.max("np").alias("np"),
        F.max("nq").alias("nq"),
    )
    return (
        hist.crossJoin(F.broadcast(terms))
        .select(
            "cell",
            "n_p",
            "n_q",
            (
                (
                    F.col("num_p").cast("double") / F.col("np").cast("double")
                    + F.col("num_q").cast("double")
                    / F.col("nq").cast("double")
                )
                / F.lit(2e6)
            ).alias("jsd_nats"),
        )
        .orderBy("cell")
    )

def _srp_planes() -> list[list[int]]:
    """16 Rademacher hyperplanes over 64 dims, derived once from md5
    (sign = parity of the first hex nibble of md5('srp:i:d')) and baked
    into BOTH the Spark plan and the oracle text as literals — the
    projection matrix is a shared constant, not an engine computation."""
    import hashlib

    return [
        [
            1 - 2 * (int(hashlib.md5(f"srp:{i}:{d}".encode())
                         .hexdigest()[0], 16) % 2)
            for d in range(1, 65)
        ]
        for i in range(16)
    ]


_SRP_PLANES = _srp_planes()
_SRP_BANDS = 4  # 4 bands x 4 bits


def _srp_oracle() -> str:
    values = ",\n    ".join(
        f"({i}, {d}, {s})"
        for i, row in enumerate(_SRP_PLANES)
        for d, s in enumerate(row, start=1)
    )
    return f"""
WITH fv AS MATERIALIZED (
  SELECT vec_id, embedding,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e10) AS BIGINT)) AS f
  FROM embeddings
),
md AS (SELECT GREATEST(1, COUNT(*) // 16) AS m FROM embeddings),
srp(i, d, s) AS (
  VALUES
    {values}
),
bits AS MATERIALIZED (
  SELECT t.vec_id, p.i,
         CASE WHEN SUM(t.f[g.d] * p.s) >= 0 THEN 1 ELSE 0 END AS b
  FROM fv t,
       LATERAL (SELECT UNNEST(generate_series(1, 64)) AS d) g
  JOIN srp p ON p.d = g.d
  GROUP BY t.vec_id, p.i
),
bands AS MATERIALIZED (
  SELECT vec_id, i // 4 AS band_id,
         CAST(SUM(b * (1 << (i % 4))) AS BIGINT) AS bv
  FROM bits GROUP BY vec_id, i // 4
),
probes AS MATERIALIZED (
  SELECT vec_id AS probe_id, embedding AS pe
  FROM fv CROSS JOIN md WHERE vec_id % md.m = 0
),
pbands AS MATERIALIZED (
  SELECT p.probe_id, b.band_id, b.bv
  FROM probes p JOIN bands b ON b.vec_id = p.probe_id
),
cand AS MATERIALIZED (
  SELECT DISTINCT pb.probe_id, b.vec_id
  FROM pbands pb JOIN bands b
    ON b.band_id = pb.band_id AND b.bv = pb.bv
  WHERE b.vec_id <> pb.probe_id
),
scored AS MATERIALIZED (
  SELECT p.probe_id, e.vec_id,
         CAST(FLOOR({sql_cosine('p.pe', 'e.embedding')} * 1e9) AS BIGINT)
           AS cg
  FROM probes p JOIN fv e ON e.vec_id <> p.probe_id
),
exact AS MATERIALIZED (
  SELECT probe_id, vec_id FROM (
    SELECT probe_id, vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY probe_id ORDER BY cg DESC, vec_id) AS rk
    FROM scored
  ) WHERE rk <= 10
),
nc AS MATERIALIZED (
  SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS n_cand
  FROM cand GROUP BY probe_id
),
hits AS MATERIALIZED (
  SELECT e.probe_id, CAST(COUNT(*) AS BIGINT) AS hits
  FROM exact e JOIN cand c
    ON c.probe_id = e.probe_id AND c.vec_id = e.vec_id
  GROUP BY e.probe_id
)
SELECT p.probe_id,
       COALESCE(nc.n_cand, 0) AS n_cand,
       COALESCE(h.hits, 0) AS hits,
       COALESCE(h.hits, 0) * 10 AS recall_pct
FROM probes p
LEFT JOIN nc ON nc.probe_id = p.probe_id
LEFT JOIN hits h ON h.probe_id = p.probe_id
ORDER BY p.probe_id"""


@register(
    "ext_srp_hyperplane_lsh",
    survey_id="EXT-SRP-LSH",
    category="llm-vectors",
    oracle=_srp_oracle(),
)
def ext_srp_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIGNED RANDOM PROJECTION LSH (Charikar 2002 hyperplane hashing)
    over the embedding corpus — the third member of the binary family:
    simhash hashes TOKEN sets, ext_binary_embedding_recall signs the
    COORDINATES, and SRP signs 16 RANDOM Rademacher projections, the
    classic cosine-LSH whose per-bit collision probability is
    1 - angle/pi regardless of the coordinate basis.  The 16 bits band
    as 4x4; for the count-derived probe sample each probe's candidate
    set = vectors sharing at least one band value, and recall@10 vs
    the exact gridded-cosine top-10 plus the candidate-set size are
    reported per probe — bucket selectivity AND recall, the two
    numbers that decide whether the 4-bit banding survives a scale-up.

    Exactness: the projection matrix is a CONSTANT baked into both
    plans (md5-parity signs, materialized as literals); each bit
    compares an exact int64 sum of floor-gridded products against
    zero; band values, candidate joins, and both top-10s tie-break on
    vec_id.

    Scale shape: fingerprints are one row-local pass (16 x 64 integer
    mul-adds); the candidate join is banded equi-join (never
    all-pairs); the exact side is the bounded-probe scan every recall
    eval pays.  At 4-bit bands selectivity is ~n/16 per band — the
    measured number this query reports before a deployment picks
    wider bands."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    md = max(1, n // 16)
    fv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1e10)).cast("bigint"),
    )
    # r11 perf (guide §2.5): spread before checkpointing — the 16x64
    # fingerprint folds and the exact-cosine probe product both consume
    # t row-locally, and the local embeddings scan is ONE split (no-op
    # at real scale where the scan is already wide).
    t = (
        e.select("vec_id", "embedding", fv.alias("f"))
        .transform(spread)
        .localCheckpoint()
    )

    def bit(i: int):
        plane = F.array(*[F.lit(s) for s in _SRP_PLANES[i]])
        dot = F.aggregate(
            F.zip_with(F.col("f"), plane, lambda x, s: x * s),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    bands = t.select(
        "vec_id",
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                sum(
                    (bit(4 * b + j) * F.lit(1 << j)).cast("bigint")
                    for j in range(4)
                ).alias("bv"),
            ).alias(f"s{b}")
            for b in range(_SRP_BANDS)
        ],
    ).select(
        "vec_id",
        F.explode(
            F.array(*[F.col(f"s{b}") for b in range(_SRP_BANDS)])
        ).alias("s"),
    ).select("vec_id", "s.band_id", "s.bv").localCheckpoint()
    probes = t.where(F.col("vec_id") % md == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    pbands = bands.join(
        probes.select("probe_id"),
        bands["vec_id"] == F.col("probe_id"),
    ).select("probe_id", F.col("band_id").alias("pb_id"), F.col("bv").alias("pbv"))
    cand = (
        pbands.join(
            bands,
            (F.col("band_id") == F.col("pb_id"))
            & (F.col("bv") == F.col("pbv")),
        )
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
        .localCheckpoint()
    )
    scored = (
        t.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.floor(cosine(F.col("pe"), F.col("embedding")) * 1e9)
            .cast("bigint")
            .alias("cg"),
        )
    )
    w_ex = Window.partitionBy("probe_id").orderBy(
        F.col("cg").desc(), "vec_id"
    )
    exact = (
        scored.withColumn("rk", F.row_number().over(w_ex))
        .where(F.col("rk") <= 10)
        .select("probe_id", "vec_id")
    )
    nc = cand.groupBy("probe_id").agg(
        F.count("*").cast("bigint").alias("n_cand")
    )
    hits = (
        exact.join(cand, ["probe_id", "vec_id"], "left_semi")
        .groupBy("probe_id")
        .agg(F.count("*").cast("bigint").alias("hits"))
    )
    return (
        probes.select("probe_id")
        .join(nc, "probe_id", "left")
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce("n_cand", F.lit(0)).cast("bigint").alias("n_cand"),
            F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
            (F.coalesce("hits", F.lit(0)) * 10)
            .cast("bigint")
            .alias("recall_pct"),
        )
        .orderBy("probe_id")
    )
