"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label).

Cross-engine determinism trick: embeddings are quantized once to
integer milli-units (``q = round(x * 1000)`` — a float32 value times
1000 can never land exactly on .5, so Spark's HALF_UP and DuckDB's
rounding agree), and every similarity is computed in exact integer /
correctly-rounded-double arithmetic from those ints, emitted as
floor-scaled BIGINT ``cos_x10k``. Ties in top-k are broken by vec_id,
so rankings are bit-identical between the Spark query and its DuckDB
oracle.

Operators:

* **cosine_neardup_pairs** — all pairs with cosine ≥ τ; brute-force
  self-join at test scale. The 100 TB path is the LSH variant below —
  the all-pairs form exists as the verification baseline.
* **ann_topk_bruteforce** — exact top-k per query vector (the recall
  oracle for any approximate method).
* **ann_topk_lsh** — random-hyperplane LSH: 16 integer-weight planes →
  16-bit bucket; candidates share a bucket; exact re-rank within the
  bucket. Scale path: the self-join touches only bucket collisions.
"""

from __future__ import annotations

import random

from tesseract_glue_spark.functions import dialect as D

QUANT = 1000
# The synthetic embeddings are near-orthogonal (max pairwise cosine
# ≈ 0.51, p99 ≈ 0.29) — τ sits at the p99 knee so the near-dup query
# returns a real, non-empty pair set to verify.
COS_TAU_X10K = 3000       # near-dup threshold: cosine ≥ 0.30
TOPK = 10
QUERY_MOD = 25            # vec_id % QUERY_MOD == 0 → query vector
LSH_PLANES = 6            # 64 buckets → meaningful candidate sets at test SF
EMB_DIM = 64

_rng = random.Random(777)
PLANES: list[list[int]] = [
    [_rng.randrange(-QUANT, QUANT + 1) for _ in range(EMB_DIM)] for _ in range(LSH_PLANES)
]


def _quant(d: str, col: str = "embedding") -> str:
    """float[] → integer milli-unit BIGINT array."""
    if d == D.SPARK:
        return f"transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"
    return f"list_transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"


def _dot(d: str, a: str, b: str) -> str:
    if d == D.SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {EMB_DIM}), "
        f"i -> ({a})[i] * ({b})[i])) AS BIGINT)"
    )


def _cos_x10k(d: str, dot: str, n2a: str, n2b: str) -> str:
    """floor(10^4·cos) as BIGINT; exact-int inputs + correctly-rounded
    double ops → identical across engines. 0 for zero-norm vectors."""
    return (
        f"(CASE WHEN {n2a} = 0 OR {n2b} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(floor(10000.0 * {dot} / (sqrt(CAST({n2a} AS DOUBLE)) * sqrt(CAST({n2b} AS DOUBLE)))) AS BIGINT) END)"
    )


def _q_cte(d: str, table: str) -> str:
    q = _quant(d)
    n2 = _dot(d, "q", "q")
    return f"""
    q0 AS (SELECT vec_id, label, {q} AS q FROM {table}),
    qv AS (SELECT vec_id, label, q, {n2} AS n2 FROM q0)
    """.strip()


def cosine_neardup_pairs_sql(d: str, table: str = "embeddings") -> str:
    cos = _cos_x10k(d, "dot_ab", "n2a", "n2b")
    return f"""
    WITH {_q_cte(d, table)},
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_dot(d, "a.q", "b.q")} AS dot_ab,
               a.n2 AS n2a, b.n2 AS n2b
        FROM qv a JOIN qv b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cos_x10k
    FROM (SELECT vec_a, vec_b, {cos} AS cos_x10k FROM pairs) s
    WHERE cos_x10k >= {COS_TAU_X10K}
    """.strip()


def ann_topk_bruteforce_sql(d: str, table: str = "embeddings") -> str:
    dot = _dot(d, "a.q", "b.q")
    cos = _cos_x10k(d, dot, "a.n2", "b.n2")
    return f"""
    WITH {_q_cte(d, table)},
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {cos} AS cos_x10k
        FROM qv a JOIN qv b ON b.vec_id <> a.vec_id
        WHERE a.vec_id % {QUERY_MOD} = 0
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_x10k,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_x10k DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_x10k, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {TOPK}
    """.strip()


def _bucket_expr(d: str) -> str:
    """16-bit hyperplane-sign bucket from the quantized vector ``q``."""
    terms = []
    for p, plane in enumerate(PLANES):
        if d == D.SPARK:
            arr = "array(" + ", ".join(f"CAST({w} AS BIGINT)" for w in plane) + ")"
            pd_ = _dot(d, "q", arr)
            terms.append(f"(CASE WHEN {pd_} >= 0 THEN shiftleft(CAST(1 AS BIGINT), {p}) ELSE 0 END)")
        else:
            arr = "[" + ", ".join(f"CAST({w} AS BIGINT)" for w in plane) + "]"
            pd_ = _dot(d, "q", arr)
            terms.append(f"(CASE WHEN {pd_} >= 0 THEN (CAST(1 AS BIGINT) << {p}) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def ann_topk_lsh_sql(d: str, table: str = "embeddings") -> str:
    """Approximate top-k: exact re-rank restricted to same-LSH-bucket
    candidates. At 10^12 rows the bucket join replaces the all-pairs
    product; recall is measured against :func:`ann_topk_bruteforce_sql`
    in tests."""
    dot = _dot(d, "a.q", "b.q")
    cos = _cos_x10k(d, dot, "a.n2", "b.n2")
    return f"""
    WITH {_q_cte(d, table)},
    qb AS (
        SELECT vec_id, label, q, n2, {_bucket_expr(d)} AS bucket FROM qv
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {cos} AS cos_x10k
        FROM qb a JOIN qb b
          ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
        WHERE a.vec_id % {QUERY_MOD} = 0
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_x10k,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_x10k DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_x10k, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {TOPK}
    """.strip()


def embedding_label_centroids_sql(d: str, table: str = "embeddings") -> str:
    """Per-label centroid norms/counts (integer aggregates only) — the
    clustering-sanity diagnostic."""
    q = _quant(d)
    if d == D.SPARK:
        sum_sq = "aggregate(q, CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"
    else:
        sum_sq = f"CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT)"
    return f"""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM({sum_sq}) AS BIGINT) AS sum_sq_norm
    FROM (SELECT label, {q} AS q FROM {table}) t
    GROUP BY label
    """.strip()


def embedding_dedup_survivors_sql(d: str, table: str = "embeddings") -> str:
    """Embedding-cosine near-dup keep-list (greedy keep-smallest-id)."""
    return f"""
    SELECT vec_id, label
    FROM {table}
    WHERE vec_id NOT IN (
        SELECT vec_b FROM ({cosine_neardup_pairs_sql(d, table)}) pairs
    )
    """.strip()


IVF_K = 16          # coarse clusters
IVF_ITERS = 3       # Lloyd iterations
IVF_NPROBE = 2      # clusters probed per query

_D2 = (
    "aggregate(zip_with(q, cq, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def ann_topk_ivf(spark, sf_dir: str, table: str = "embeddings"):
    """IVF (inverted-file) ANN: deterministic integer k-means coarse
    quantizer + probe-the-nearest-nprobe-clusters exact re-rank.

    Determinism without seeds: vectors are quantized to integer
    milli-units, centroid updates are integer floor-averages (integer
    sums are shuffle-order-independent, unlike float sums), and initial
    centroids are the K lowest vec_ids. Iterative -> not SQL-expressible;
    the driver records a rows-only check and tests measure recall vs
    the exact baseline.

    Scale shape: assignment = broadcast(K centroids) x N map-side join;
    the probe join touches only rows in the query's nprobe clusters —
    never the full N x N product. Centroids live in a small DataFrame,
    NOT in literal expressions (a K x dim literal tree is a codegen
    bomb: minutes of Janino compile per iteration).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark.read.parquet(f"{sf_dir}/{table}.parquet").createOrReplaceTempView(table)
    q = _quant(D.SPARK)
    vecs = spark.sql(
        f"SELECT vec_id, q, {_dot(D.SPARK, 'q', 'q')} AS n2 "
        f"FROM (SELECT vec_id, {q} AS q FROM {table})"
    ).persist()

    def cents_df(cents: list[list[int]]):
        return spark.createDataFrame(
            [(i, [int(v) for v in c]) for i, c in enumerate(cents)],
            schema="cluster INT, cq ARRAY<BIGINT>",
        )

    def assign(df, cdf):
        scored = df.crossJoin(F.broadcast(cdf)).withColumn("d2", F.expr(_D2))
        win = Window.partitionBy("vec_id").orderBy("d2", "cluster")
        return (
            scored.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .drop("_rn", "d2", "cq")
        )

    centroids = [list(r["q"]) for r in vecs.orderBy("vec_id").limit(IVF_K).collect()]
    for _ in range(IVF_ITERS):
        assigned = assign(vecs, cents_df(centroids))
        sums = (
            assigned.select("cluster", F.posexplode("q").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        acc: dict[int, list[int]] = {}
        for r in sums:
            acc.setdefault(r["cluster"], [0] * EMB_DIM)[r["dim"]] = int(r["s"]) // int(r["n"])
        centroids = [acc.get(i, centroids[i]) for i in range(IVF_K)]

    indexed = assign(vecs, cents_df(centroids)).persist()

    # per-query probe list: the IVF_NPROBE nearest centroids
    queries = vecs.where(F.col("vec_id") % QUERY_MOD == 0)
    qc = queries.crossJoin(F.broadcast(cents_df(centroids))).withColumn("d2", F.expr(_D2))
    win = Window.partitionBy("vec_id").orderBy("d2", "cluster")
    probes = (
        qc.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.col("n2").alias("qn2"),
            "cluster",
        )
    )
    cand = probes.join(indexed, "cluster").where(F.col("vec_id") != F.col("query_id"))
    dot = "aggregate(zip_with(qq, q, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    cos = (
        f"(CASE WHEN qn2 = 0 OR n2 = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"CAST(floor(10000.0 * {dot} / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))) AS BIGINT) END)"
    )
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), F.expr(cos).alias("cos_x10k")
    )
    rwin = Window.partitionBy("query_id").orderBy(F.desc("cos_x10k"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(rwin))
        .where(F.col("rnk") <= TOPK)
        .select("query_id", "neighbor_id", "cos_x10k", F.col("rnk").cast("long").alias("rnk"))
    )


SIMILARITY_OPS = {
    "emb_cosine_neardup": cosine_neardup_pairs_sql,
    "emb_ann_topk_brute": ann_topk_bruteforce_sql,
    "emb_ann_topk_lsh": ann_topk_lsh_sql,
    "emb_label_centroids": embedding_label_centroids_sql,
    "emb_dedup_survivors": embedding_dedup_survivors_sql,
}
