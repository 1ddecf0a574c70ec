"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k neighbors of one query
  vector.  Fully native: F.zip_with dot product + F.aggregate norms stay in
  the JVM; TakeOrderedAndProject does the distributed top-k.  This is the
  baseline/oracle path.
- :func:`lsh_bucket_neighbors` — the scale path: random-hyperplane LSH
  (SimHash for vectors, Charikar 2002).  Each vector gets a B-bit signature
  from seeded deterministic hyperplanes; neighbor search only compares
  within matching buckets (optionally ± multi-probe).  At 10^9 vectors the
  bucket join replaces the full scan; recall tunes with bits/tables.
- :func:`embedding_near_duplicates` — pairs whose cosine ≥ threshold,
  discovered via LSH buckets and verified exactly (native math).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    cast_vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    cos = _dot(cast_vec, q) / (_norm(cast_vec) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def rp_signature_col(vec_col, planes: np.ndarray):
    """Random-hyperplane signature as a native expression: bit i = sign of
    <v, plane_i>, packed into a long (bits ≤ 63)."""
    bits = []
    for i, plane in enumerate(planes):
        const = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(F.transform(vec_col, lambda v: v.cast("double")), const)
        bits.append(F.shiftleft(F.when(d >= 0, 1).otherwise(0).cast("long"), i))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucket_neighbors(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_hamming: int = 1,
) -> DataFrame:
    """ANN: compare only vectors whose signature is within ``max_hamming``
    of the query's signature (multi-probe), score those exactly."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    sig = rp_signature_col(F.col(vec_col), planes)
    qbits = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for i, plane in enumerate(planes):
        if float(plane @ qv) >= 0:
            qbits |= 1 << i
    probes = [qbits]
    if max_hamming >= 1:
        probes += [qbits ^ (1 << i) for i in range(bits)]
    with_sig = embeddings.withColumn("_sig", sig)
    cand = with_sig.filter(F.col("_sig").isin(probes))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 12,
    tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold.

    Multi-table random-hyperplane LSH: ``tables`` independent signatures
    per vector (a single table splits a tight cluster whenever one
    hyperplane happens to cut through it; the miss probability decays
    exponentially in the table count).  Candidates = same (table, sig)
    bucket — a shuffle join on the bucket key, never a cross join — then
    exact cosine verification with native math, distinct-ed."""
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    sig_structs = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 7919 * t)
        sig_structs.append(
            F.struct(
                F.lit(t).alias("tbl"),
                rp_signature_col(F.col(vec_col), planes).alias("sig"),
            )
        )
    with_sig = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("v"),
        F.explode(F.array(*sig_structs)).alias("bk"),
    ).select(id_col, "v", F.col("bk.tbl").alias("tbl"), F.col("bk.sig").alias("sig"))
    a = with_sig.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), "tbl", "sig"
    )
    b = with_sig.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "tbl", "sig"
    )
    pairs = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
