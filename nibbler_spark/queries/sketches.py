"""Probabilistic-sketch operators: count-min heavy-hitter estimation
and a Bloom-filter semi-join — the two sketch primitives every
large-scale pipeline leans on (frequency estimation without a full
groupBy result, and join pre-filtering without shipping the probe side).

Both use the md5-nibble portable hash (llm_text.ext_feature_hashing
precedent): engine-identical on Spark and DuckDB, so the sketches —
normally "approximate" — are bit-reproducible here and earn full hash
oracles rather than bounded checks. Spark itself applies the same idea
natively (spark.sql.optimizer.runtime.bloomFilter.enabled injects bloom
runtime filters into shuffle joins); these queries make the mechanism
an explicit, oracle-checkable dataflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nibbler_spark.queries import register
from nibbler_spark.sources import load_table

_HEX = "0123456789abcdef"


def _nib_hash(expr: Column, mod: int) -> Column:
    """First 4 hex nibbles of md5(expr) as an int in [0, mod) —
    Spark side of the portable hash."""
    h = F.md5(expr)
    v = (
        (F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1) * 4096
        + (F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1) * 256
        + (F.instr(F.lit(_HEX), F.substring(h, 3, 1)) - 1) * 16
        + (F.instr(F.lit(_HEX), F.substring(h, 4, 1)) - 1)
    )
    return (v % mod).cast("int")


def _sql_nib_hash(expr: str, mod: int) -> str:
    """DuckDB spelling of :func:`_nib_hash`."""
    return (
        f"CAST(((strpos('{_HEX}', substr(md5({expr}), 1, 1)) - 1) * 4096"
        f" + (strpos('{_HEX}', substr(md5({expr}), 2, 1)) - 1) * 256"
        f" + (strpos('{_HEX}', substr(md5({expr}), 3, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr(md5({expr}), 4, 1)) - 1)) % {mod}"
        f" AS INT)"
    )


_CMS_W = 64  # buckets per row
_CMS_D = 4  # hash rows (seeds 0..3)


@register(
    "ext_countmin_heavy_hitters",
    survey_id="EXT-CMS",
    category="sketch",
    oracle=f"""
WITH seeds AS (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS seed),
cells AS (
  SELECT s.seed,
         {_sql_nib_hash("CONCAT(CAST(s.seed AS VARCHAR), ':', CAST(e.user_id AS VARCHAR))", _CMS_W)}
           AS bucket,
         COUNT(*) AS cell
  FROM events e CROSS JOIN seeds s
  GROUP BY 1, 2
),
exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id),
est AS (
  SELECT x.user_id, MIN(c.cell) AS cms_est
  FROM exact x CROSS JOIN seeds s
  JOIN cells c
    ON c.seed = s.seed
   AND c.bucket = {_sql_nib_hash("CONCAT(CAST(s.seed AS VARCHAR), ':', CAST(x.user_id AS VARCHAR))", _CMS_W)}
  GROUP BY x.user_id
)
SELECT user_id, exact_n, cms_est,
       cms_est - exact_n AS overcount,
       cms_est >= exact_n AS never_undercounts
FROM exact JOIN est USING (user_id)
ORDER BY exact_n DESC, user_id
LIMIT 15
""",
)
def ext_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    readout: a d={_CMS_D} x w={_CMS_W} counter grid built in ONE grouped
    aggregation over (seed, bucket) — the event stream is replicated d
    times, but the shuffle output is at most d*w = 256 cells regardless
    of input size, the whole point of sketching at 100 TB. Estimates
    (min over rows) are joined against exact counts for the top-15
    users; the one-sided error guarantee (est >= exact, overshoot from
    bucket collisions at 150 users into 64 buckets) is visible in the
    emitted overcount column. Portable md5-nibble hashing makes the
    sketch bit-identical across engines — a sketch with a hash oracle,
    not a bounded check."""
    e = load_table(spark, sf_dir, "events")
    seeds = spark.range(_CMS_D).select(
        F.col("id").cast("int").alias("seed")
    )
    keyed = e.crossJoin(F.broadcast(seeds)).select(
        "seed",
        _nib_hash(
            F.concat_ws(":", F.col("seed"), F.col("user_id")), _CMS_W
        ).alias("bucket"),
    )
    cells = keyed.groupBy("seed", "bucket").agg(
        F.count("*").alias("cell")
    )
    exact = e.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    probe = exact.crossJoin(F.broadcast(seeds)).select(
        "user_id",
        "exact_n",
        "seed",
        _nib_hash(
            F.concat_ws(":", F.col("seed"), F.col("user_id")), _CMS_W
        ).alias("bucket"),
    )
    est = (
        probe.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cell").alias("cms_est"))
    )
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
            (F.col("cms_est") >= F.col("exact_n")).alias(
                "never_undercounts"
            ),
        )
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(15)
    )


_BLOOM_M = 1024  # bits
_BLOOM_K = 3  # hash functions


@register(
    "ext_bloom_semijoin",
    survey_id="EXT-BLOOM",
    category="sketch",
    oracle=f"""
WITH ks AS (SELECT UNNEST(generate_series(0, {_BLOOM_K - 1})) AS k),
build AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
bits AS (
  SELECT DISTINCT
         {_sql_nib_hash("CONCAT(CAST(ks.k AS VARCHAR), ':', CAST(build.c_custkey AS VARCHAR))", _BLOOM_M)}
           AS bit
  FROM build CROSS JOIN ks
),
probe AS (SELECT DISTINCT o_custkey FROM orders),
hits AS (
  SELECT p.o_custkey, COUNT(*) AS n_hit
  FROM probe p CROSS JOIN ks
  JOIN bits b
    ON b.bit = {_sql_nib_hash("CONCAT(CAST(ks.k AS VARCHAR), ':', CAST(p.o_custkey AS VARCHAR))", _BLOOM_M)}
  GROUP BY p.o_custkey
)
SELECT h.o_custkey AS custkey,
       TRUE AS bloom_pass,
       build.c_custkey IS NOT NULL AS exact_member,
       build.c_custkey IS NULL AS false_positive
FROM hits h LEFT JOIN build ON build.c_custkey = h.o_custkey
WHERE h.n_hit = {_BLOOM_K}
ORDER BY custkey
""",
)
def ext_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join: an m={_BLOOM_M}-bit / k={_BLOOM_K}-hash
    filter built from the dim-side key set (negative-balance customers)
    pre-screens the fact side's keys before any exact join. The bit set
    is DISTINCT positions — a few hundred ints — broadcast to the probe;
    a probe key passes iff all k of its positions are set. Emits every
    bloom-passing probe key with its exact-membership verdict, making
    the false-positive rate (~(fill)^k, deliberately non-trivial at
    this fill factor) directly observable while proving zero false
    negatives. This is exactly the runtime filter Spark injects with
    spark.sql.optimizer.runtime.bloomFilter.enabled — expressed as an
    auditable dataflow: at 100 TB the bloom build reads only the dim
    side, and the fact scan drops non-members before the shuffle."""
    ks = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("k"))
    build = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    bits = (
        build.crossJoin(F.broadcast(ks))
        .select(
            _nib_hash(
                F.concat_ws(":", F.col("k"), F.col("c_custkey")),
                _BLOOM_M,
            ).alias("bit")
        )
        .distinct()
    )
    probe = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey"))
        .distinct()
    )
    hits = (
        probe.crossJoin(F.broadcast(ks))
        .select(
            "o_custkey",
            _nib_hash(
                F.concat_ws(":", F.col("k"), F.col("o_custkey")),
                _BLOOM_M,
            ).alias("bit"),
        )
        .join(F.broadcast(bits), "bit")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_hit"))
        .where(F.col("n_hit") == _BLOOM_K)
    )
    # Fresh projection for the exact-membership probe: `hits` already
    # derives from `build` (via the bit set), so joining `build` itself
    # back would be an ambiguous self-join.
    members = build.select(F.col("c_custkey").alias("b_custkey"))
    return (
        hits.join(
            members, F.col("o_custkey") == F.col("b_custkey"), "left"
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.lit(True).alias("bloom_pass"),
            F.col("b_custkey").isNotNull().alias("exact_member"),
            F.col("b_custkey").isNull().alias("false_positive"),
        )
        .orderBy("custkey")
    )


@register(
    "ext_hll_portable",
    survey_id="EXT-HLL-PORT",
    category="sketch",
    mode="bounded",
    oracle="""
WITH h AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 12))
              AS BIGINT) AS hv
  FROM lineitem
),
hw AS (SELECT hv % 256 AS idx, hv // 256 AS w FROM h),
regs0 AS (
  SELECT idx,
         MAX(CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END) AS m
  FROM hw GROUP BY idx
),
spine AS (SELECT UNNEST(range(256)) AS idx),
regs AS (
  SELECT s.idx, COALESCE(r.m, 0) AS m FROM spine s LEFT JOIN regs0 r USING (idx)
),
z AS (
  SELECT CAST(SUM(CAST(FLOOR(pow(2.0e0, -m) * 1e10) AS DECIMAL(20,0)))
              AS DOUBLE) / 1e10 AS zz,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM regs
),
est AS (
  SELECT CASE WHEN (0.7213e0 / (1e0 + 1.079e0 / 256e0)) * 256e0 * 256e0 / zz
                   <= 2.5e0 * 256e0 AND v > 0
              THEN 256e0 * ln(256e0 / v)
              ELSE (0.7213e0 / (1e0 + 1.079e0 / 256e0)) * 256e0 * 256e0 / zz
         END AS e
  FROM z
),
tru AS (SELECT COUNT(DISTINCT l_orderkey) AS t FROM lineitem),
ok AS (SELECT ABS(e / t - 1e0) < 0.15e0 AS est_ok FROM est, tru)
SELECT r.idx // 16 AS grp,
       CAST(SUM(r.m) AS BIGINT) AS reg_sum,
       CAST(SUM(r.m * (r.idx + 1)) AS BIGINT) AS reg_weighted,
       CAST(SUM(CASE WHEN r.m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       ok.est_ok
FROM regs r, ok GROUP BY grp, ok.est_ok ORDER BY grp
""",
)
def ext_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog, built from scratch (Flajolet et al.
    2007): md5-derived 48-bit hashes split into a 256-register index
    plus a 40-bit tail whose leading-zero rank comes from the
    bin()-length trick (bin drops leading zeros, so rank = 41 −
    bitlength). Because every step is integer-exact and md5 is
    engine-portable, the ORACLE REPLICATES THE REGISTERS THEMSELVES —
    the 16 output rows carry register-group sums, position-weighted
    checksums and zero counts that hash-match DuckDB bit-for-bit, a
    stronger check than any estimate tolerance (MLlib's approx_count_
    distinct seeds are JVM-private; this sketch is reproducible
    anywhere md5 exists). The harmonic-mean estimate (2^-M summed on a
    floored 1e-10 grid — exact decimal addition, no float summation
    order) then lands within the declared 15% of the true distinct
    (~2.3σ at m=256), carried as the est_ok flag. Scale: one map-side-
    combined groupBy into 256 cells, mergeable across any partitioning
    by construction — register max is associative."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    h = F.conv(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    hw = li.select(h.alias("hv")).select(
        (F.col("hv") % 256).alias("idx"), F.expr("hv div 256").alias("w")
    )
    rho = F.when(F.col("w") == 0, F.lit(41)).otherwise(
        F.lit(41) - F.length(F.bin("w"))
    )
    regs0 = hw.groupBy("idx").agg(F.max(rho).alias("m"))
    spine = spark.range(256).select(F.col("id").alias("idx"))
    regs = spine.join(F.broadcast(regs0), "idx", "left").select(
        "idx", F.coalesce("m", F.lit(0)).alias("m")
    )
    z = regs.agg(
        (
            F.sum(
                F.floor(F.pow(F.lit(2.0), -F.col("m")) * 1e10).cast(
                    "decimal(20,0)"
                )
            ).cast("double")
            / F.lit(1e10)
        ).alias("zz"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v"),
    )
    alpha_mm = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
    ) * F.lit(256.0) * F.lit(256.0)
    raw = alpha_mm / F.col("zz")
    est = z.select(
        F.when(
            (raw <= F.lit(2.5) * F.lit(256.0)) & (F.col("v") > 0),
            F.lit(256.0) * F.log(F.lit(256.0) / F.col("v")),
        )
        .otherwise(raw)
        .alias("e")
    )
    tru = li.agg(F.countDistinct("l_orderkey").alias("t"))
    ok = (
        est.join(F.broadcast(tru))
        .select(
            (F.abs(F.col("e") / F.col("t") - F.lit(1.0)) < F.lit(0.15)).alias(
                "est_ok"
            )
        )
    )
    return (
        regs.join(F.broadcast(ok))
        .groupBy(F.expr("idx div 16").alias("grp"), "est_ok")
        .agg(
            F.sum("m").cast("bigint").alias("reg_sum"),
            F.sum(F.col("m") * (F.col("idx") + 1))
            .cast("bigint")
            .alias("reg_weighted"),
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero"),
        )
        .select("grp", "reg_sum", "reg_weighted", "n_zero", "est_ok")
        .orderBy("grp")
    )


_JCE_W = 2048  # inner-product sketch width


@register(
    "ext_join_cardinality_estimate",
    survey_id="EXT-JOINCARD",
    category="sketch",
    oracle=f"""
WITH fa AS (
  SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS f
  FROM events GROUP BY user_id
),
fb AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS f
  FROM orders GROUP BY o_custkey
),
exact AS (
  SELECT CAST(SUM(fa.f * fb.f) AS BIGINT) AS exact_size
  FROM fa JOIN fb USING (key)
),
seeds AS (SELECT UNNEST(generate_series(0, 3)) AS seed),
ska AS (
  SELECT seed,
         {_sql_nib_hash("seed || ':' || key", _JCE_W)} AS bucket,
         CAST(SUM(f) AS BIGINT) AS af
  FROM fa CROSS JOIN seeds GROUP BY 1, 2
),
skb AS (
  SELECT seed,
         {_sql_nib_hash("seed || ':' || key", _JCE_W)} AS bucket,
         CAST(SUM(f) AS BIGINT) AS bf
  FROM fb CROSS JOIN seeds GROUP BY 1, 2
),
ip AS (
  SELECT ska.seed, CAST(SUM(af * bf) AS BIGINT) AS prod
  FROM ska JOIN skb ON ska.seed = skb.seed AND ska.bucket = skb.bucket
  GROUP BY ska.seed
),
est AS (SELECT CAST(MIN(prod) AS BIGINT) AS estimate FROM ip)
SELECT exact_size, estimate,
       ROUND(CAST(estimate AS DOUBLE) / exact_size, 6) + 0
         AS overestimate_ratio,
       estimate >= exact_size AS is_upper_bound
FROM exact CROSS JOIN est
""",
)
def ext_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from count-min sketch inner products — the
    optimizer trick (AGMS/CMS estimators) for sizing a join WITHOUT
    running it: |A ⋈ B| = Σ_k f_A(k)·f_B(k), and the inner product of
    the two sketches' rows overestimates it by only hash-collision
    mass; taking the MIN across 4 independent hash rows tightens the
    bound. The md5-nibble portable hash makes the sketches — and
    therefore the estimate itself — bit-identical on both engines, so
    even the 'approximate' number earns a full hash oracle, alongside
    the structural guarantee (estimate >= exact, by construction).
    Estimated here: events.user_id ⋈ orders.o_custkey. Scale: each
    sketch is one map-side-combinable groupBy into depth x width
    (4 x 2048) cells — constant-size state however large the input;
    the comparison's exact join is only the oracle-side check."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    fa = e.groupBy(F.col("user_id").alias("key")).agg(
        F.count("*").cast("bigint").alias("f")
    )
    fb = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").cast("bigint").alias("f")
    )
    exact = (
        fa.join(fb, "key")
        .agg(
            F.sum(fa["f"] * fb["f"]).cast("bigint").alias("exact_size")
        )
    )
    seeds = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("seed")

    def sketch(df, out):
        return (
            df.select("key", "f", seeds)
            .select(
                "seed",
                _nib_hash(
                    F.concat(
                        F.col("seed").cast("string"),
                        F.lit(":"),
                        F.col("key").cast("string"),
                    ),
                    _JCE_W,
                ).alias("bucket"),
                "f",
            )
            .groupBy("seed", "bucket")
            .agg(F.sum("f").cast("bigint").alias(out))
        )

    ska = sketch(fa, "af")
    skb = sketch(fb, "bf")
    ip = (
        ska.join(skb, ["seed", "bucket"])
        .groupBy("seed")
        .agg(F.sum(F.col("af") * F.col("bf")).cast("bigint").alias("prod"))
    )
    est = ip.agg(F.min("prod").cast("bigint").alias("estimate"))
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            "exact_size",
            "estimate",
            (
                F.round(
                    F.col("estimate").cast("double") / F.col("exact_size"),
                    6,
                )
                + F.lit(0.0)
            ).alias("overestimate_ratio"),
            (F.col("estimate") >= F.col("exact_size")).alias(
                "is_upper_bound"
            ),
        )
    )


_HQ_W = 10000  # histogram bucket width, in cents


@register(
    "ext_histogram_quantile",
    survey_id="EXT-HISTQ",
    category="sketch",
    oracle=f"""
WITH c AS (
  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
hist AS (
  SELECT cents // {_HQ_W} AS b, CAST(COUNT(*) AS BIGINT) AS n
  FROM c GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM c),
cum AS (
  SELECT b, n,
         CAST(SUM(n) OVER (ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cn
  FROM hist
),
qb AS (
  SELECT q.q, MIN(cum.b) AS qb
  FROM (VALUES (0.5), (0.9), (0.99)) AS q(q), cum, tot
  WHERE cum.cn >= CAST(CEIL(q.q * tot.n_rows) AS BIGINT)
  GROUP BY q.q
),
exact AS (
  SELECT q.q,
         MIN(c2.cents) AS lo
  FROM (VALUES (0.5), (0.9), (0.99)) AS q(q), tot,
       (SELECT cents, row_number() OVER (ORDER BY cents) AS rk FROM c) c2
  WHERE c2.rk >= CAST(CEIL(q.q * tot.n_rows) AS BIGINT)
  GROUP BY q.q
)
SELECT CAST(qb.q AS DOUBLE) AS q,
       qb.qb * {_HQ_W} AS est_lo_cents,
       (qb.qb + 1) * {_HQ_W} - 1 AS est_hi_cents,
       exact.lo AS exact_cents,
       exact.lo BETWEEN qb.qb * {_HQ_W}
                    AND (qb.qb + 1) * {_HQ_W} - 1 AS within_bucket
FROM qb JOIN exact ON qb.q = exact.q
ORDER BY qb.q
""",
)
def ext_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantiles — the two-phase distributed
    percentile that actually runs at 100 TB: phase 1 is one map-side-
    combinable groupBy into fixed-width buckets (mergeable across any
    partitioning, like the portable HLL/CMS family), phase 2 walks the
    tiny cumulative histogram to the bucket containing each target
    rank. The estimate is an INTERVAL (bucket bounds) with the error
    bound = bucket width BY CONSTRUCTION; the query also computes the
    exact rank-order statistic and PROVES it falls inside the declared
    bucket — so this 'approximate' sketch carries a full hash oracle.
    Quantile rank convention: smallest value with rank >= ceil(q*n)
    (the discrete lower quantile), identical in both engines as pure
    integer logic. Scale: the exact side is the oracle-only check; the
    product path never sorts."""
    from pyspark.sql import Window as _W

    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    hist = c.groupBy(
        F.expr(f"cents div {_HQ_W}").alias("b")
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = c.agg(F.count("*").cast("bigint").alias("n_rows"))
    w = _W.orderBy("b").rowsBetween(_W.unboundedPreceding, _W.currentRow)
    cum = hist.select(
        "b", F.sum("n").over(w).cast("bigint").alias("cn")
    )
    qs = F.explode(
        F.array(*[F.lit(x) for x in (0.5, 0.9, 0.99)])
    ).alias("q")
    qb = (
        cum.crossJoin(F.broadcast(tot))
        .select("b", "cn", "n_rows", qs)
        .where(
            F.col("cn")
            >= F.ceil(F.col("q") * F.col("n_rows")).cast("bigint")
        )
        .groupBy("q")
        .agg(F.min("b").alias("qb"))
    )
    # exact rank statistic (oracle-side verification only): the
    # smallest value whose rank reaches ceil(q*n). Computed with a
    # bucket-partitioned window + the cumulative histogram offsets —
    # no unpartitioned sort (two_phase_rank pattern inline).
    wb = _W.partitionBy("bk").orderBy("cents")
    ranked = (
        c.withColumn("bk", F.expr(f"cents div {_HQ_W}"))
        .join(
            F.broadcast(
                cum.select(
                    F.col("b").alias("bk"),
                    (F.col("cn")).alias("cum_hi"),
                )
            ),
            "bk",
        )
        .join(F.broadcast(hist.select(F.col("b").alias("bk"), "n")), "bk")
        .withColumn(
            "rk", F.col("cum_hi") - F.col("n") + F.row_number().over(wb)
        )
    )
    exact = (
        ranked.crossJoin(F.broadcast(tot))
        .select("cents", "rk", "n_rows", qs)
        .where(
            F.col("rk")
            >= F.ceil(F.col("q") * F.col("n_rows")).cast("bigint")
        )
        .groupBy("q")
        .agg(F.min("cents").alias("exact_cents"))
    )
    return (
        qb.join(exact, "q")
        .select(
            "q",
            (F.col("qb") * _HQ_W).alias("est_lo_cents"),
            ((F.col("qb") + 1) * _HQ_W - 1).alias("est_hi_cents"),
            "exact_cents",
            F.col("exact_cents")
            .between(F.col("qb") * _HQ_W, (F.col("qb") + 1) * _HQ_W - 1)
            .alias("within_bucket"),
        )
        .orderBy("q")
    )


@register(
    "ext_aqp_sampled_agg",
    survey_id="EXT-AQP",
    category="sketch",
    oracle="""
WITH s AS (
  SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(('0x' || substr(md5('aqp:' || l_orderkey || ':'
                                  || l_linenumber), 1, 12)) AS BIGINT)
           % 10 = 0 AS in_sample
  FROM lineitem
),
est AS (
  SELECT CAST(SUM(CASE WHEN in_sample THEN cents END) * 10 AS BIGINT)
           AS est_cents,
         CAST(COUNT(CASE WHEN in_sample THEN 1 END) AS BIGINT)
           AS n_sampled
  FROM s
),
ex AS (SELECT CAST(SUM(cents) AS BIGINT) AS exact_cents FROM s)
SELECT est_cents, n_sampled, exact_cents,
       ROUND(ABS(CAST(est_cents - exact_cents AS DOUBLE))
             / exact_cents, 6) + 0 AS rel_error,
       ABS(CAST(est_cents - exact_cents AS DOUBLE)) / exact_cents < 0.05
         AS within_5pct
FROM est CROSS JOIN ex
""",
)
def ext_aqp_sampled_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing by deterministic sampling — the
    sample-and-scale estimator interactive BI layers use when a 2%
    answer in 1% of the time beats an exact one: a 10% md5-hash sample
    of lineitem (membership is a pure function of the row key — the
    SAME rows sample on both engines and on every run, so even the
    'approximate' estimate earns a full hash oracle), summed and
    scaled by 1/rate. The CLT relative error at n≈6k line items is
    well under the declared 5% check. Scale: the sample predicate is
    row-local and pushes into the scan; at 100 TB pair it with a
    SAMPLE-laid-out table or the b13/tablesample row for IO-level
    (not just CPU-level) savings."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("bigint")
    in_sample = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("aqp:"),
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % 10
        == 0
    )
    s = li.select(cents.alias("cents"), in_sample.alias("in_sample"))
    agg = s.agg(
        (F.sum(F.when(F.col("in_sample"), F.col("cents"))) * 10)
        .cast("bigint")
        .alias("est_cents"),
        F.count(F.when(F.col("in_sample"), 1))
        .cast("bigint")
        .alias("n_sampled"),
        F.sum("cents").cast("bigint").alias("exact_cents"),
    )
    rel = (
        F.abs((F.col("est_cents") - F.col("exact_cents")).cast("double"))
        / F.col("exact_cents")
    )
    return agg.select(
        "est_cents",
        "n_sampled",
        "exact_cents",
        (F.round(rel, 6) + F.lit(0.0)).alias("rel_error"),
        (rel < 0.05).alias("within_5pct"),
    )


_KMV_K = 256
_KMV_SPACE = 1 << 48  # md5 48-bit hash space


@register(
    "ext_kmv_theta_setops",
    survey_id="EXT-KMV-THETA",
    category="sketch",
    mode="bounded",
    oracle="""
WITH a_keys AS (
  SELECT DISTINCT l_orderkey AS key FROM lineitem WHERE l_returnflag = 'R'
),
b_keys AS (
  SELECT DISTINCT l_orderkey AS key FROM lineitem WHERE l_linenumber >= 4
),
ah AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 12))
                       AS BIGINT) AS hv
  FROM a_keys
),
bh AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 12))
                       AS BIGINT) AS hv
  FROM b_keys
),
ska AS (SELECT hv FROM ah ORDER BY hv LIMIT 256),
skb AS (SELECT hv FROM bh ORDER BY hv LIMIT 256),
sku AS (
  SELECT hv FROM (SELECT hv FROM ska UNION SELECT hv FROM skb) u
  ORDER BY hv LIMIT 256
),
sa AS (SELECT COUNT(*) AS n, MAX(hv) AS kth,
              CAST(SUM(hv) AS BIGINT) AS chk FROM ska),
sb AS (SELECT COUNT(*) AS n, MAX(hv) AS kth,
              CAST(SUM(hv) AS BIGINT) AS chk FROM skb),
su AS (SELECT COUNT(*) AS n, MAX(hv) AS kth,
              CAST(SUM(hv) AS BIGINT) AS chk FROM sku),
theta AS (
  SELECT LEAST(CASE WHEN sa.n = 256 THEN sa.kth ELSE 281474976710656 END,
               CASE WHEN sb.n = 256 THEN sb.kth ELSE 281474976710656 END)
           AS th
  FROM sa, sb
),
inter AS (
  SELECT COUNT(*) AS n, COALESCE(CAST(SUM(a.hv) AS BIGINT), 0) AS chk
  FROM ska a JOIN skb b ON a.hv = b.hv, theta t
  WHERE a.hv < t.th
),
ta AS (SELECT COUNT(*) AS t FROM a_keys),
tb AS (SELECT COUNT(*) AS t FROM b_keys),
ti AS (SELECT COUNT(*) AS t FROM a_keys JOIN b_keys USING (key)),
tu AS (SELECT COUNT(*) AS t
       FROM (SELECT key FROM a_keys UNION SELECT key FROM b_keys) u),
est AS (
  SELECT 'a' AS measure,
         CASE WHEN sa.n < 256 THEN sa.n
              ELSE (255 * 281474976710656) // sa.kth END AS est,
         ta.t AS true_n, sa.chk AS sketch_checksum, 0.2e0 AS bound
  FROM sa, ta
  UNION ALL
  SELECT 'b',
         CASE WHEN sb.n < 256 THEN sb.n
              ELSE (255 * 281474976710656) // sb.kth END,
         tb.t, sb.chk, 0.2e0
  FROM sb, tb
  UNION ALL
  SELECT 'union',
         CASE WHEN su.n < 256 THEN su.n
              ELSE (255 * 281474976710656) // su.kth END,
         tu.t, su.chk, 0.2e0
  FROM su, tu
  UNION ALL
  SELECT 'intersect', (inter.n * 281474976710656) // t.th,
         ti.t, inter.chk, 0.3e0
  FROM inter, theta t, ti
)
SELECT measure, CAST(est AS BIGINT) AS est, CAST(true_n AS BIGINT) AS true_n,
       sketch_checksum,
       ABS(CAST(est AS DOUBLE) / CAST(true_n AS DOUBLE) - 1e0) < bound
         AS within_bound
FROM est ORDER BY measure
""",
)
def ext_kmv_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-sketch SET OPERATIONS (Beyer et al. 2007; the
    Apache DataSketches theta family): distinct-count estimates for
    two sets AND their union/intersection from two k=256 sketches —
    the mergeable-summary answer to "how many distinct users do these
    two sources share?" that never joins the raw sets. Each sketch is
    the k SMALLEST md5-derived 48-bit hashes of the set (a distributed
    distinct + TakeOrderedAndProject — no full sort); sketches are
    O(k) driver-mergeable, exactly how production systems union
    sketches across days/partitions. Union = k smallest of the merged
    sketch; intersection follows the theta rule: count common hashes
    below theta = min(theta_a, theta_b), estimate = count / (theta /
    2^48). Every estimate here is INTEGER math ((k-1)*2^48 div kth) on
    an engine-portable hash, so the oracle replicates the sketches,
    checksums and estimates bit-for-bit — plus declared error bounds
    vs the exact counts (RSE ~ 1/sqrt(k-2) ~ 6.3%; 0.2 declared for
    a/b/union, 0.3 for the harder intersection). Small-set edge: a
    sketch holding fewer than k hashes IS its set and the estimate
    collapses to the exact count (theta = 2^48). Scale: sketch build
    is one distinct + top-k per set; everything after is O(k)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linenumber"
    )
    hv = F.conv(
        F.substring(F.md5(F.col("key").cast("string")), 1, 12), 16, 10
    ).cast("bigint")

    def sketch(keys: DataFrame) -> list[int]:
        sk = (
            keys.select(hv.alias("hv"))
            .distinct()
            .orderBy("hv")
            .limit(_KMV_K)
            .collect()
        )
        return sorted(r["hv"] for r in sk)

    a_keys = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("key"))
        .distinct()
    )
    b_keys = (
        li.where(F.col("l_linenumber") >= 4)
        .select(F.col("l_orderkey").alias("key"))
        .distinct()
    )
    ska, skb = sketch(a_keys), sketch(b_keys)
    sku = sorted(set(ska) | set(skb))[:_KMV_K]

    # exact counts (the check side): one distributed aggregate each
    ta = a_keys.count()
    tb = b_keys.count()
    ti = a_keys.join(b_keys, "key").count()
    tu = a_keys.union(b_keys).distinct().count()

    def est_of(sk: list[int]) -> int:
        if len(sk) < _KMV_K:
            return len(sk)
        return (_KMV_K - 1) * _KMV_SPACE // sk[-1]

    th_a = ska[-1] if len(ska) == _KMV_K else _KMV_SPACE
    th_b = skb[-1] if len(skb) == _KMV_K else _KMV_SPACE
    theta = min(th_a, th_b)
    common = [h for h in set(ska) & set(skb) if h < theta]
    est_i = len(common) * _KMV_SPACE // theta

    rows = []
    for measure, est, true_n, chk, bound in [
        ("a", est_of(ska), ta, sum(ska), 0.2),
        ("b", est_of(skb), tb, sum(skb), 0.2),
        ("union", est_of(sku), tu, sum(sku), 0.2),
        ("intersect", est_i, ti, sum(common), 0.3),
    ]:
        rows.append(
            (measure, est, true_n, chk, abs(est / true_n - 1.0) < bound)
        )
    return spark.createDataFrame(
        sorted(rows),
        "measure string, est bigint, true_n bigint, "
        "sketch_checksum bigint, within_bound boolean",
    )


@register(
    "ext_ddsketch_quantile",
    survey_id="EXT-DDSKETCH",
    category="sketch",
    mode="bounded",
    oracle="""
WITH c AS (
  SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
),
ix AS (
  SELECT v,
         CASE WHEN v < 32 THEN v
              ELSE 32 + (length(bin(v)) - 6) * 16
                   + v // CAST(pow(2e0, length(bin(v)) - 5) AS BIGINT) - 16
         END AS i
  FROM c
),
regs AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n FROM ix GROUP BY i),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM regs) AS n_buckets
        FROM c),
cum AS (
  SELECT i, n,
         CAST(SUM(n) OVER (ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cn
  FROM regs
),
qt AS (
  SELECT q_pct, (q_pct * n_rows + 99) // 100 AS target, n_rows, n_buckets
  FROM (VALUES (25), (50), (90), (99)) AS q(q_pct), tot
),
qb AS (
  SELECT qt.q_pct, qt.target, qt.n_rows, qt.n_buckets, MIN(cum.i) AS qi
  FROM qt, cum WHERE cum.cn >= qt.target
  GROUP BY qt.q_pct, qt.target, qt.n_rows, qt.n_buckets
),
dec AS (
  SELECT q_pct, target, n_rows, n_buckets, qi,
         CASE WHEN qi < 32 THEN qi
              ELSE (16 + qi % 16)
                   * CAST(pow(2e0, (qi - 32) // 16 + 1) AS BIGINT)
         END AS lo,
         CASE WHEN qi < 32 THEN CAST(1 AS BIGINT)
              ELSE CAST(pow(2e0, (qi - 32) // 16 + 1) AS BIGINT)
         END AS wdt
  FROM qb
),
ranked AS (
  SELECT i, v, row_number() OVER (PARTITION BY i ORDER BY v) AS rn FROM ix
),
exact AS (
  SELECT d.q_pct, MIN(r.v) AS exact_v
  FROM dec d
  JOIN cum ON cum.i = d.qi
  JOIN regs ON regs.i = d.qi
  JOIN ranked r ON r.i = d.qi
  WHERE cum.cn - regs.n + r.rn >= d.target
  GROUP BY d.q_pct
)
SELECT d.q_pct, d.qi AS bucket_idx,
       2 * d.lo + d.wdt - 1 AS est_x2,
       2 * e.exact_v AS exact_x2,
       e.exact_v BETWEEN d.lo AND d.lo + d.wdt - 1 AS within_bucket,
       32 * ABS((2 * d.lo + d.wdt - 1) - 2 * e.exact_v) <= 2 * e.exact_v
         AS within_bound,
       d.n_rows, d.n_buckets
FROM dec d JOIN exact e USING (q_pct)
ORDER BY d.q_pct
""",
)
def ext_ddsketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style relative-error quantile sketch (Masson et al.,
    VLDB 2019) with the log-bucket index computed EXACTLY through
    integer bit tricks — no logs, no doubles, no boundary ulps: for
    integer cents v >= 32 the bucket is (bitlength, top-4-mantissa-bits)
    = the HDR-histogram realization of gamma-indexed buckets, giving
    hi/lo <= 17/16 per bucket and a guaranteed relative error <= 1/32
    for the bucket-midpoint estimate (|mid - x| <= (w-1)/2, x >= lo =
    m*w >= 16w); v < 32 gets exact singleton buckets. Because the index
    is pure integer arithmetic (length(bin(v)) + shifts), the oracle
    replicates the REGISTERS bit-for-bit — unlike float log_gamma
    indexing whose ceil can flip between libm and the JVM. Per target
    rank (discrete lower quantile, ceil(q*n) in integer form) the query
    walks the tiny cumulative register table, decodes the bucket back
    to [lo, lo+w), and PROVES both guarantees against the exact order
    statistic: the exact value lands in the bucket AND the midpoint is
    within 1/32 relative. Scale: phase 1 is one map-side-combinable
    groupBy into <= ~350 buckets for the full BIGINT range (registers
    merge across partitions/streams by +); the unpartitioned cumsum
    window rides the kilobyte register table only; the exact side
    reuses the sketch buckets as rank buckets (bucket-partitioned
    row_number — the two_phase_rank pattern with the sketch itself as
    the bucket function)."""
    from pyspark.sql import Window as _W

    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("v")
    )
    blen = F.length(F.bin(F.col("v")))
    p2 = F.pow(F.lit(2.0), blen - 5).cast("bigint")
    ix = c.select(
        "v",
        F.when(F.col("v") < 32, F.col("v"))
        .otherwise(
            F.lit(32)
            + (blen - 6) * 16
            + F.expr("v div cast(pow(2.0, length(bin(v)) - 5) as bigint)")
            - 16
        )
        .alias("i"),
    )
    regs = ix.groupBy("i").agg(F.count("*").cast("bigint").alias("n"))
    n_buckets = regs.agg(F.count("*").cast("bigint").alias("n_buckets"))
    tot = (
        c.agg(F.count("*").cast("bigint").alias("n_rows"))
        .crossJoin(F.broadcast(n_buckets))
    )
    w = _W.orderBy("i").rowsBetween(_W.unboundedPreceding, _W.currentRow)
    cum = regs.select("i", "n", F.sum("n").over(w).cast("bigint").alias("cn"))
    qvals = F.explode(
        F.array(*[F.lit(x) for x in (25, 50, 90, 99)])
    ).alias("q_pct")
    qt = tot.select(qvals, "n_rows", "n_buckets").select(
        "q_pct",
        F.expr("(q_pct * n_rows + 99) div 100").alias("target"),
        "n_rows",
        "n_buckets",
    )
    qb = (
        cum.crossJoin(F.broadcast(qt))
        .where(F.col("cn") >= F.col("target"))
        .groupBy("q_pct", "target", "n_rows", "n_buckets")
        .agg(F.min("i").alias("qi"))
    )
    p2q = F.pow(F.lit(2.0), F.expr("(qi - 32) div 16") + 1).cast("bigint")
    dec_ = qb.select(
        "q_pct",
        "target",
        "n_rows",
        "n_buckets",
        "qi",
        F.when(F.col("qi") < 32, F.col("qi"))
        .otherwise((F.lit(16) + F.col("qi") % 16) * p2q)
        .alias("lo"),
        F.when(F.col("qi") < 32, F.lit(1).cast("bigint"))
        .otherwise(p2q)
        .alias("wdt"),
    )
    wb = _W.partitionBy("i").orderBy("v")
    ranked = ix.withColumn("rn", F.row_number().over(wb))
    exact = (
        ranked.join(
            F.broadcast(
                dec_.join(cum.select(F.col("i").alias("qi"), "cn"), "qi")
                .join(
                    regs.select(F.col("i").alias("qi"), F.col("n")), "qi"
                )
                .select("q_pct", "qi", "target", "cn", "n")
            ),
            ranked.i == F.col("qi"),
        )
        .where(F.col("cn") - F.col("n") + F.col("rn") >= F.col("target"))
        .groupBy("q_pct")
        .agg(F.min("v").alias("exact_v"))
    )
    est_x2 = 2 * F.col("lo") + F.col("wdt") - 1
    return (
        dec_.join(exact, "q_pct")
        .select(
            "q_pct",
            F.col("qi").alias("bucket_idx"),
            est_x2.alias("est_x2"),
            (2 * F.col("exact_v")).alias("exact_x2"),
            F.col("exact_v")
            .between(F.col("lo"), F.col("lo") + F.col("wdt") - 1)
            .alias("within_bucket"),
            (
                32 * F.abs(est_x2 - 2 * F.col("exact_v"))
                <= 2 * F.col("exact_v")
            ).alias("within_bound"),
            "n_rows",
            "n_buckets",
        )
        .orderBy("q_pct")
    )
