"""Approximate nearest neighbour / embedding similarity operators.

The reference answers vector queries three ways: brute-force cosine over every
chunk (/root/reference/store/gob.go:66-94), pgvector `<=>` index scans
(store/postgres.go:144-160), and Qdrant HNSW (store/qdrant.go:76-107). On
Spark the brute-force path stays (TakeOrderedAndProject — see search.cosine_topk);
this module adds the two scale paths a 100 TB embedding corpus needs:

* IVF top-k     — coarse cells (the `label` column plays the trained
                  quantizer's cell id), rank cells by centroid~query cosine,
                  probe the best `nprobe` cells, exact search inside. At scale
                  the cell ranking touches `n_cells` rows and the probe scans
                  ~nprobe/n_cells of the corpus — the standard IVF trade.
* sign-LSH      — random-hyperplane buckets (deterministic ±1 planes derived
                  from md5, inlined as literals into BOTH the Spark plan and
                  the DuckDB oracle); same-bucket candidates only.
* near-dup      — cell-blocked exact-cosine pair join (embedding-cosine
                  near-duplicate detection for training-data dedup).

Everything is built-in expressions (zip_with/aggregate) — JVM-side, inside
whole-stage codegen; no Python in the hot path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EMBED_TABLE_DIM = 64  # driver's embeddings.parquet vector width
N_PLANES = 8
NEAR_DUP_COS = 0.4
IVF_NPROBE = 2
# per-cell membership cap for the near-dup pair join — the reference's
# block-cap skew guard (/root/reference/rpg/indexer.go:20): one hot cell
# must never go O(k^2) at corpus scale
NEAR_DUP_CELL_CAP = 1000


def planes(n_planes: int = N_PLANES, dim: int = EMBED_TABLE_DIM) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign of md5("p:d"). Literal constants, so
    Spark and DuckDB agree bit-for-bit on every plane coefficient."""
    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1.0 if h[0] >= "8" else -1.0)
        out.append(row)
    return out


def _arr_lit(vals: list[float], dialect: str) -> str:
    """Array literal cast to double explicitly — bare decimal-point literals
    parse as DECIMAL in both engines, which would change arithmetic types."""
    body = ", ".join(f"{v:.1f}" if v in (1.0, -1.0) else repr(v) for v in vals)
    if dialect == "spark":
        return f"CAST(array({body}) AS array<double>)"
    return f"CAST([{body}] AS DOUBLE[])"


def dot_sql(vec_col: str, vals: list[float], dialect: str = "spark") -> str:
    """Dot product of an array column with a literal vector, sequential fold
    in both engines (same accumulation order -> same IEEE result)."""
    lit = _arr_lit(vals, dialect)
    if dialect == "spark":
        return (
            f"aggregate(zip_with(CAST({vec_col} AS array<double>), {lit},"
            f" (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    return f"list_dot_product(CAST({vec_col} AS DOUBLE[]), {lit})"


def bucket_sql(
    vec_col: str,
    n_planes: int = N_PLANES,
    dim: int = EMBED_TABLE_DIM,
    dialect: str = "spark",
) -> str:
    """Sign-LSH bucket id as an n_planes-char '01' string."""
    ps = planes(n_planes, dim)
    bits = [
        f"CASE WHEN {dot_sql(vec_col, p, dialect)} >= 0 THEN '1' ELSE '0' END"
        for p in ps
    ]
    if dialect == "spark":
        return "concat(" + ", ".join(bits) + ")"
    return " || ".join(bits)


def py_bucket(vec: list[float], n_planes: int = N_PLANES) -> str:
    """Driver-side twin for query vectors."""
    ps = planes(n_planes, len(vec))
    out = []
    for p in ps:
        acc = 0.0
        for x, y in zip(vec, p):
            acc += float(x) * y
        out.append("1" if acc >= 0 else "0")
    return "".join(out)


def cosine_vs_query_sql(
    vec_col: str, query_vec: list[float], dialect: str = "spark"
) -> str:
    """cosine(vec, q) with the norms spelled out (corpus vectors are NOT
    assumed normalized, unlike the turn encoder's output)."""
    d = dot_sql(vec_col, query_vec, dialect)
    qn = sum(x * x for x in query_vec) ** 0.5
    sq = dot_sql_self(vec_col, dialect)
    return f"({d}) / (sqrt({sq}) * CAST('{qn!r}' AS DOUBLE))"


def dot_sql_self(vec_col: str, dialect: str = "spark") -> str:
    if dialect == "spark":
        return (
            f"aggregate(transform(CAST({vec_col} AS array<double>),"
            f" x -> x * x), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    return f"list_dot_product(CAST({vec_col} AS DOUBLE[]), CAST({vec_col} AS DOUBLE[]))"


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    n_planes: int = N_PLANES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k among vectors in the query's sign-LSH bucket.

    The bucket predicate is a plain filter -> at scale, bucket becomes a
    partition column and this is partition pruning: the scan reads
    ~1/2^n_planes of the corpus. Exact cosine re-ranks inside the bucket.
    """
    qb = py_bucket(query_vec, n_planes)
    bucket = F.expr(bucket_sql(vec_col, n_planes))
    cos = F.expr(cosine_vs_query_sql(vec_col, query_vec))
    return (
        emb.where(bucket == F.lit(qb))
        .withColumn("score", F.round(cos, 6))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .select(id_col, "score")
    )


def write_lsh_bucketed(
    emb: DataFrame,
    path: str,
    n_planes: int = N_PLANES,
    vec_col: str = "embedding",
) -> None:
    """Materialize the embedding table PARTITIONED BY its sign-LSH bucket —
    the batch job that turns ann_lsh_topk's per-row bucket expression into a
    physical partition column. One pass over the corpus, one write; queries
    then touch ~1/2^n_planes of the files (see ann_lsh_topk_bucketed)."""
    emb.withColumn("bucket", F.expr(bucket_sql(vec_col, n_planes))).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def ann_lsh_topk_bucketed(
    spark,
    path: str,
    query_vec: list[float],
    k: int,
    n_planes: int = N_PLANES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k over a bucket-partitioned embedding store: the bucket predicate
    is a PARTITION filter (directory pruning — the scan never opens files
    outside the query's bucket), then exact cosine re-ranks inside. This is
    the physical realization of ann_lsh_topk's scale story; results are
    identical by construction (same planes, same bucket function)."""
    qb = py_bucket(query_vec, n_planes)
    cos = F.expr(cosine_vs_query_sql(vec_col, query_vec))
    return (
        spark.read.parquet(path)
        .where(F.col("bucket") == F.lit(qb))
        .withColumn("score", F.round(cos, 6))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .select(id_col, "score")
    )


def ivf_centroids(
    emb: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, dim, c): the IVF coarse-quantizer centroid table.

    At corpus scale this is built ONCE (a batch job over the embedding
    table: posexplode + groupBy(cell, dim), map-side combinable) and stored;
    every query then reads n_cells x dim rows instead of re-aggregating the
    full corpus. ivf_topk accepts it precomputed for exactly that reason.
    """
    comp = emb.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(F.col(vec_col)).alias("dim", "val"),
    )
    return comp.groupBy("cell", "dim").agg(F.avg("val").alias("c"))


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    nprobe: int = IVF_NPROBE,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF search: rank coarse cells by centroid·query, probe the best
    `nprobe` cells with exact cosine.

    Pass `centroids` (from :func:`ivf_centroids`, stored as a table) so the
    per-query cost is n_cells x dim + the probed fraction of the corpus —
    recomputing centroids per query would rescan everything. The probed
    scan is an IN-filter on the cell column (partition pruning at scale).
    """
    qn = sum(x * x for x in query_vec) ** 0.5
    cent = centroids if centroids is not None else ivf_centroids(
        emb, cell_col, vec_col
    )
    qarr = F.lit(query_vec).cast("array<double>")
    scored_cells = (
        cent.withColumn("q", F.element_at(qarr, F.col("dim") + 1))
        .groupBy("cell")
        .agg((F.sum(F.col("c") * F.col("q")) / F.lit(qn)).alias("cell_score"))
        .orderBy(F.desc("cell_score"), F.asc("cell"))
        .limit(nprobe)
    )
    probed = emb.join(
        F.broadcast(scored_cells.select(F.col("cell").alias(cell_col))),
        cell_col,
    )
    cos = F.expr(cosine_vs_query_sql(vec_col, query_vec))
    return (
        probed.withColumn("score", F.round(cos, 6))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.col(cell_col).alias("cell"), "score")
    )


def near_dup_cosine_pairs(
    emb: DataFrame,
    threshold: float = NEAR_DUP_COS,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_cap: int = NEAR_DUP_CELL_CAP,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by coarse cell.

    Pair generation is an equi-join on the cell id (never a cross join), and
    cell membership is capped deterministically (first `cell_cap` ids per
    cell) BEFORE pairing — the same block-cap guard every other pair
    generator here carries (dedup._bucket_pairs, link block cap): without
    it one hot cell goes O(k^2) no matter how well the join partitions.
    """
    w = Window.partitionBy(cell_col).orderBy(id_col)
    emb = (
        emb.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cell_cap)
        .drop("_rn")
    )
    a = emb.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("va"),
    )
    b = emb.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("vb"),
    )
    dot = F.expr(
        "aggregate(zip_with(CAST(va AS array<double>), CAST(vb AS array<double>),"
        " (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    na = F.sqrt(F.expr(dot_sql_self("va")))
    nb = F.sqrt(F.expr(dot_sql_self("vb")))
    cos = dot / (na * nb)
    return (
        a.join(b, "cell")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("_cos", cos)
        .where(F.col("_cos") >= F.lit(threshold))
        .select(
            "a_id", "b_id", F.col("cell"), F.round("_cos", 6).alias("cos")
        )
    )


NEAR_DUP_LSH_PLANES = 4  # fewer planes than top-k search: recall over pruning


def near_dup_lsh_pairs(
    emb: DataFrame,
    threshold: float = NEAR_DUP_COS,
    n_planes: int = NEAR_DUP_LSH_PLANES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_cap: int = NEAR_DUP_CELL_CAP,
) -> DataFrame:
    """Embedding near-dup pairs WITHOUT a precomputed coarse-cell column:
    bucket = sign-LSH signature of the vector itself.

    Two vectors at angle theta land in the same bucket with probability
    (1 - theta/pi)^n_planes — fewer planes = higher recall, bigger buckets
    (4 planes: cos 0.4 -> ~33% per-bucket recall; production runs several
    plane sets and unions, like MinHash bands). Same deterministic
    bucket-cap guard as every other pair generator; exact cosine verifies.
    """
    b = emb.select(
        F.col(id_col).alias("the_id"),
        F.col(vec_col).alias("v"),
        F.expr(bucket_sql(vec_col, n_planes)).alias("bkt"),
    )
    w = Window.partitionBy("bkt").orderBy("the_id")
    b = (
        b.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= bucket_cap)
        .drop("_rn")
    )
    a = b.select(
        F.col("bkt"), F.col("the_id").alias("a_id"), F.col("v").alias("va")
    )
    c = b.select(
        F.col("bkt"), F.col("the_id").alias("b_id"), F.col("v").alias("vb")
    )
    dot = F.expr(
        "aggregate(zip_with(CAST(va AS array<double>), CAST(vb AS array<double>),"
        " (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    cos = dot / (F.sqrt(F.expr(dot_sql_self("va"))) * F.sqrt(F.expr(dot_sql_self("vb"))))
    return (
        a.join(c, "bkt")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("_cos", cos)
        .where(F.col("_cos") >= F.lit(threshold))
        .select("a_id", "b_id", F.col("bkt"), F.round("_cos", 6).alias("cos"))
    )


def near_dup_lsh_pairs_oracle(
    threshold: float = NEAR_DUP_COS,
    n_planes: int = NEAR_DUP_LSH_PLANES,
    bucket_cap: int = NEAR_DUP_CELL_CAP,
) -> str:
    bucket = bucket_sql("embedding", n_planes, dialect="duckdb")
    dotp = "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    na = "sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    nb = "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))"
    cos = f"({dotp}) / ({na} * {nb})"
    return f"""
WITH bkts AS (
  SELECT vec_id, embedding, ({bucket}) AS bkt FROM embeddings
),
capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY bkt ORDER BY vec_id) AS rn
    FROM bkts
  ) x WHERE rn <= {bucket_cap}
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bkt,
       round({cos}, 6) AS cos
FROM capped a
JOIN capped b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
""".strip()


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def ann_lsh_topk_oracle(
    query_vec: list[float], k: int, n_planes: int = N_PLANES
) -> str:
    qb = py_bucket(query_vec, n_planes)
    bucket = bucket_sql("embedding", n_planes, dialect="duckdb")
    cos = cosine_vs_query_sql("embedding", query_vec, "duckdb")
    return f"""
SELECT vec_id, round({cos}, 6) AS score
FROM embeddings
WHERE ({bucket}) = '{qb}'
ORDER BY score DESC, vec_id ASC
LIMIT {k}
""".strip()


def ivf_topk_oracle(
    query_vec: list[float], k: int, nprobe: int = IVF_NPROBE
) -> str:
    qn = sum(x * x for x in query_vec) ** 0.5
    qlit = _arr_lit([float(x) for x in query_vec], "duckdb")
    cos = cosine_vs_query_sql("embedding", query_vec, "duckdb")
    return f"""
WITH comp AS (
  SELECT label AS cell, generate_subscripts(embedding, 1) AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
),
cent AS (
  SELECT cell, dim, avg(val) AS c FROM comp GROUP BY cell, dim
),
cells AS (
  SELECT cell, sum(c * ({qlit})[dim]) / CAST('{qn!r}' AS DOUBLE) AS cell_score
  FROM cent GROUP BY cell
  ORDER BY cell_score DESC, cell ASC LIMIT {nprobe}
)
SELECT e.vec_id, e.label AS cell, round({cos}, 6) AS score
FROM embeddings e JOIN cells ON e.label = cells.cell
ORDER BY score DESC, vec_id ASC
LIMIT {k}
""".strip()


def near_dup_cosine_pairs_oracle(
    threshold: float = NEAR_DUP_COS, cell_cap: int = NEAR_DUP_CELL_CAP
) -> str:
    dotp = "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    na = "sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    nb = "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))"
    cos = f"({dotp}) / ({na} * {nb})"
    return f"""
WITH capped AS (
  SELECT * FROM (
    SELECT vec_id, label, embedding,
           row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
    FROM embeddings
  ) x WHERE rn <= {cell_cap}
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS cell,
       round({cos}, 6) AS cos
FROM capped a
JOIN capped b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
""".strip()
