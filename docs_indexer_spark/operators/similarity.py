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
from pyspark.sql import DataFrame, SparkSession
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


def _batch_matrix(batch):
    """(ids, x) from an Arrow batch of (id, list<float|double>) — with the
    same null/ragged guards as _rp_sig_kernel (a bad row would misalign
    every subsequent one in the reshape)."""
    import pyarrow.compute as pc

    ids = batch.column(0).to_numpy(zero_copy_only=False)
    emb = batch.column(1)
    if emb.null_count:
        raise ValueError("cosine kernel: null embedding rows in batch")
    lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
    n = batch.num_rows
    if n and int(lens.min()) != int(lens.max()):
        raise ValueError(
            "cosine kernel: ragged embedding lengths "
            f"{int(lens.min())}..{int(lens.max())} in batch"
        )
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = int(lens[0]) if n else 0
    return ids, flat.reshape(n, dim)


def _cosine_kernel(query_vec, qn):
    """Arrow kernel: (id, vec) → (id, cosine).  Dot and squared-norm
    accumulate DIMENSION-BY-DIMENSION (numpy-vectorized over rows), the
    same left-to-right fold order as the native zip_with/aggregate
    expressions — so the cosines are bit-identical to the Column path
    (same technique as _rp_sig_kernel) while the per-row interpreted-HOF
    cost collapses to dim vectorized adds per batch."""
    import pyarrow as pa

    q = [float(x) for x in query_vec]

    def kernel(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids, x = _batch_matrix(batch)
            dot = np.zeros(len(ids), dtype=np.float64)
            nrm = np.zeros(len(ids), dtype=np.float64)
            for d in range(x.shape[1]):
                dot = dot + x[:, d] * q[d]
                nrm = nrm + x[:, d] * x[:, d]
            cos = dot / (np.sqrt(nrm) * qn)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64), type=pa.int64()),
                    pa.array(cos, type=pa.float64()),
                ],
                names=["_id", "cosine"],
            )

    return kernel


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    ``vectorized=True`` (default) scores through the Arrow kernel
    (fold-order-preserving → bit-identical cosines, pinned by test);
    ``vectorized=False`` keeps the pure-Column zip_with/aggregate path.
    Interleaved same-session A/B at sf1.0 (20k vectors): kernel 0.24 s
    vs column 0.32 s warm."""
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    if vectorized:
        scored = embeddings.select(
            F.col(id_col).cast("long"), F.col(vec_col)
        ).mapInArrow(
            _cosine_kernel(query_vec, qn), schema="_id long, cosine double"
        ).select(F.col("_id").alias(id_col), "cosine")
        return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
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


def _rp_sig_kernel(planes_by_table):
    """Arrow kernel: (vec_id, v) → (vec_id, v, tbl, sig) rows, one per
    table.  Dot products accumulate DIMENSION-BY-DIMENSION (a python loop
    over dims, numpy-vectorized over rows), which is float-for-float the
    same left-to-right order as the native zip_with/aggregate fold — so
    the sign bits (and thus buckets) are bit-identical to
    :func:`rp_signature_col`, while the per-row interpreted-HOF cost
    (tables × bits × dims expression evaluations) collapses to
    tables × bits × dims vectorized adds per BATCH."""
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            emb = batch.column(1)
            n = batch.num_rows
            # a null or ragged-length row would silently misalign every
            # subsequent row in the reshape — fail loudly instead
            if emb.null_count:
                raise ValueError(
                    "rp_signatures: null embedding rows in batch"
                )
            import pyarrow.compute as pc

            lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
            if n and int(lens.min()) != int(lens.max()):
                raise ValueError(
                    "rp_signatures: ragged embedding lengths "
                    f"{int(lens.min())}..{int(lens.max())} in batch"
                )
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            dim = int(lens[0]) if n else 0
            x = flat.reshape(n, dim)
            out_ids, out_v, out_tbl, out_sig = [], [], [], []
            for t, planes in enumerate(planes_by_table):
                sig = np.zeros(n, dtype=np.uint64)
                for i, plane in enumerate(planes):
                    acc = np.zeros(n, dtype=np.float64)
                    for d in range(dim):
                        acc = acc + x[:, d] * plane[d]
                    sig |= (acc >= 0).astype(np.uint64) << np.uint64(i)
                out_ids.append(ids)
                out_v.append(emb)
                out_tbl.append(np.full(n, t, dtype=np.int32))
                out_sig.append(sig.astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_ids), type=pa.int64()),
                    pa.concat_arrays(
                        [v.cast(pa.list_(pa.float64())) for v in out_v]
                    ),
                    pa.array(np.concatenate(out_tbl), type=pa.int32()),
                    pa.array(np.concatenate(out_sig), type=pa.int64()),
                ],
                names=["_id", "v", "tbl", "sig"],
            )

    return kernel


def lsh_bucket_neighbors(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_hamming: int = 1,
    vectorized: bool = True,
) -> DataFrame:
    """ANN: compare only vectors whose signature is within ``max_hamming``
    of the query's signature (multi-probe), score those exactly.

    ``vectorized=True`` computes relation-side signatures in the Arrow
    kernel (fold-order-preserving — bit-identical buckets, see
    :func:`_rp_sig_kernel`); ``vectorized=False`` keeps the pure-Column
    path."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qbits = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for i, plane in enumerate(planes):
        if float(plane @ qv) >= 0:
            qbits |= 1 << i
    probes = [qbits]
    if max_hamming >= 1:
        probes += [qbits ^ (1 << i) for i in range(bits)]
    if vectorized:
        sigged = (
            embeddings.select(F.col(id_col).cast("long"), F.col(vec_col))
            .mapInArrow(
                _rp_sig_kernel([planes]),
                schema="_id long, v array<double>, tbl int, sig long",
            )
        )
        cand = sigged.filter(F.col("sig").isin(probes)).select(
            F.col("_id").alias(id_col), F.col("v").alias(vec_col)
        )
        return cosine_topk(cand, query_vec, k=k, id_col=id_col,
                           vec_col=vec_col)
    sig = rp_signature_col(F.col(vec_col), planes)
    with_sig = embeddings.withColumn("_sig", sig)
    cand = with_sig.filter(F.col("_sig").isin(probes))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ivf_centroids(dim: int, n_centroids: int, seed: int = 7) -> np.ndarray:
    """Seeded random unit-norm coarse centroids — the data-independent IVF
    quantizer (deterministic, so an external SQL oracle can inline them).
    For production recall, train with :func:`ivf_train_kmeans` instead."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def kmeans_cosine(
    x: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 7
) -> np.ndarray:
    """Lloyd's k-means with cosine assignment on a numpy sample —
    the shared trainer core, so an external oracle can recompute the
    EXACT centroids from the same sample rows (bit-identical float64
    arithmetic) and inline them as SQL constants."""
    x = np.asarray(x, dtype=np.float64)
    cent = ivf_centroids(x.shape[1], n_centroids, seed)
    for _ in range(iters):
        # cosine assignment on normalized data
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(xn @ cent.T, axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_train_kmeans(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> np.ndarray:
    """Lloyd's k-means on a deterministic sample (driver-side numpy — the
    sample is a bounded model artifact, ≤ sample×dim floats; at 10^9+
    vectors the TRAINING set stays this size while assignment runs
    distributed)."""
    rows = (
        embeddings.orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    return kmeans_cosine(x, n_centroids, iters, seed)


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, centroid_id, v): each vector assigned to its max-cosine
    centroid (unit-norm centroids ⇒ argmax dot).  Native expression:
    array_max over (dot, -centroid_id) structs — lexicographic struct max
    = argmax with smallest-id tie-break, no UDF, one scan."""
    cast_vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    entries = []
    for cid, c in enumerate(centroids):
        const = F.array(*[F.lit(float(x)) for x in c])
        entries.append(
            F.struct(
                _dot(F.col("_v"), const).alias("dot"),
                F.lit(-cid).alias("neg_cid"),
            )
        )
    best = F.array_max(F.array(*entries))
    return (
        embeddings.select(F.col(id_col), cast_vec.alias("_v"))
        .withColumn("centroid_id", (-best.getField("neg_cid")).cast("int"))
        .select(id_col, "centroid_id", F.col("_v").alias("v"))
    )


def _ivf_probe_kernel(centroids, probes, query_vec, qnorm):
    """Fused Arrow kernel for the self-contained IVF query: centroid
    assignment (dim-by-dim dots — the zip_with fold order, so the argmax
    sees bit-identical values; np.argmax's first-max tie == the struct
    max's smallest-cid tie), probe filter, and exact cosine for the
    survivors, in ONE pass with no per-row expression interpretation."""
    import pyarrow as pa

    cents = [[float(x) for x in c] for c in centroids]
    probe_arr = np.asarray(sorted(probes), dtype=np.int64)
    q = [float(x) for x in query_vec]

    def kernel(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids, x = _batch_matrix(batch)
            n, dim = x.shape
            dots = np.empty((n, len(cents)), dtype=np.float64)
            for c, cent in enumerate(cents):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(dim):
                    acc = acc + x[:, d] * cent[d]
                dots[:, c] = acc
            assign = np.argmax(dots, axis=1)
            keep = np.isin(assign, probe_arr)
            if not keep.any():
                continue
            ids, x = ids[keep], x[keep]
            dot = np.zeros(len(ids), dtype=np.float64)
            nrm = np.zeros(len(ids), dtype=np.float64)
            for d in range(dim):
                dot = dot + x[:, d] * q[d]
                nrm = nrm + x[:, d] * x[:, d]
            cos = dot / (np.sqrt(nrm) * qnorm)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64), type=pa.int64()),
                    pa.array(cos, type=pa.float64()),
                ],
                names=["_id", "cosine"],
            )

    return kernel


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """IVF ANN: probe the nprobe centroids closest to the query, score
    only their inverted lists exactly.  At scale the assignment is built
    once (ivf_assign persisted/partitioned by centroid_id → partition
    pruning per query); the scan here fuses assign+filter for the
    self-contained query form.  ``vectorized=True`` (default) runs
    assignment + probe filter + cosine in one Arrow kernel
    (fold-order-preserving — results bit-identical to the Column path,
    pinned by test); ``vectorized=False`` keeps the native expressions."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    order = np.argsort(-(centroids @ qn))
    probes = [int(c) for c in order[:nprobe]]
    if vectorized:
        scored = embeddings.select(
            F.col(id_col).cast("long"), F.col(vec_col)
        ).mapInArrow(
            _ivf_probe_kernel(
                centroids, probes, query_vec, float(np.linalg.norm(qv))
            ),
            schema="_id long, cosine double",
        ).select(F.col("_id").alias(id_col), "cosine")
        return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("centroid_id").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(float(np.linalg.norm(qv))))
    return (
        cand.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


class IvfIndex:
    """Persisted IVF index — the at-scale serving shape the self-contained
    :func:`ivf_topk` fuses inline: the centroid assignment is computed
    ONCE, written partitioned by ``centroid_id`` (so each inverted list is
    its own directory), and every query reads only its ``nprobe`` probed
    lists via partition pruning — at 10^9+ vectors a query touches
    nprobe/n_centroids of the data and no assignment recompute.
    """

    def __init__(self, spark: SparkSession, path: str):
        import json
        import os

        self.spark = spark
        self.path = path
        with open(os.path.join(path, "centroids.json")) as f:
            self.centroids = np.asarray(json.load(f), dtype=np.float64)
        self.assigned = spark.read.parquet(os.path.join(path, "assigned"))

    @staticmethod
    def build(
        embeddings: DataFrame,
        centroids: np.ndarray,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        import json
        import os

        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
        (
            assigned.write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(os.path.join(path, "assigned"))
        )
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "centroids.json"), "w") as f:
            json.dump([[float(x) for x in c] for c in centroids], f)
        return IvfIndex(embeddings.sparkSession, path)

    def topk(
        self,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
        id_col: str = "vec_id",
        allowed: "DataFrame | None" = None,
    ) -> DataFrame:
        """Same semantics (and results) as :func:`ivf_topk` with these
        centroids — but the centroid_id filter hits a PARTITION COLUMN, so
        only the probed lists' files are read.

        ``allowed`` (a relation with an ``id_col`` column) restricts the
        candidate set BEFORE the top-k cut — filter-then-rank, the same
        contract as the text scorers' ``allowed``, so k survivors are
        guaranteed when the filtered lists hold that many."""
        qv = np.asarray(query_vec, dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(self.centroids @ qn))
        probes = [int(c) for c in order[:nprobe]]
        cand = self.assigned.filter(F.col("centroid_id").isin(probes))
        if allowed is not None:
            cand = cand.join(allowed.select(id_col), id_col, "left_semi")
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        cos = _dot(F.col("v"), q) / (
            _norm(F.col("v")) * F.lit(float(np.linalg.norm(qv)))
        )
        return (
            cand.select(F.col(id_col), cos.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 12,
    tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    vectorized: bool = True,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold.

    Multi-table random-hyperplane LSH: ``tables`` independent signatures
    per vector (a single table splits a tight cluster whenever one
    hyperplane happens to cut through it; the miss probability decays
    exponentially in the table count).  Candidates = same (table, sig)
    bucket — a shuffle join on the bucket key, never a cross join — then
    exact cosine verification with native math, distinct-ed.

    ``vectorized=True`` (default) computes the signatures in an Arrow
    kernel whose dimension-order accumulation is bit-identical to the
    native HOF fold (pinned by a test); ``vectorized=False`` keeps the
    pure-Column path."""
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    if first is None:  # empty relation → empty result, not a crash
        return embeddings.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    dim = int(first["d"])
    planes_by_table = [
        _hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)
    ]
    if vectorized:
        with_sig = (
            embeddings.select(
                F.col(id_col).cast("long"), F.col(vec_col)
            )
            .mapInArrow(
                _rp_sig_kernel(planes_by_table),
                schema="_id long, v array<double>, tbl int, sig long",
            )
            .select(F.col("_id").alias(id_col), "v", "tbl", "sig")
        )
    else:
        sig_structs = []
        for t in range(tables):
            sig_structs.append(
                F.struct(
                    F.lit(t).alias("tbl"),
                    rp_signature_col(
                        F.col(vec_col), planes_by_table[t]
                    ).alias("sig"),
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


def rrf_fuse(
    rankings: "list[DataFrame]",
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009; the OpenSearch
    hybrid-search RRF processor): fuse N ranked hit lists — canonically
    a BM25 text arm and an ANN vector arm — into one ranking scored by
    ``sum over lists of 1 / (c + rank)``, ``c`` = 60 per the paper and
    every production default.  Each input is a two-column (id, score)
    relation ranked by (score desc, id asc).

    Rank-fusion runs on top-k hit lists, which are k-row relations BY
    CONSTRUCTION — the per-list ``row_number`` window over an
    unpartitioned sort is a k-row driver-adjacent sort, not a
    corpus-wide one, and the fusion aggregate touches N·k rows.
    Nothing here scales with the corpus; both arms already did their
    distributed work."""
    from pyspark.sql import Window

    ranked = []
    for df in rankings:
        idc, sc = df.columns[0], df.columns[1]
        w = Window.orderBy(F.desc(sc), F.asc(idc))
        ranked.append(
            df.select(
                F.col(idc).alias(id_col),
                F.row_number().over(w).alias("_rank"),
            )
        )
    u = ranked[0]
    for r in ranked[1:]:
        u = u.unionByName(r)
    return (
        u.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.sum(F.lit(1.0) / (F.col("_rank") + F.lit(c))).alias(
                "rrf_score"
            ),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — the billion-scale ANN memory layout: vectors
# compress to m sub-codes (here 8×4 bits = 4 bytes per 64-dim vector, a
# 64× reduction over float32) and queries score codes via an
# asymmetric-distance (ADC) table lookup without decompressing anything.


def pq_train(
    x: np.ndarray, m: int = 8, ks: int = 16, iters: int = 8, seed: int = 7
) -> np.ndarray:
    """Per-subvector L2 Lloyd's k-means on a numpy sample → codebooks of
    shape (m, ks, dim//m).  Shared trainer core (same contract as
    :func:`kmeans_cosine`): an external oracle retrains from the same
    sample rows and gets bit-identical float64 codebooks to inline as
    SQL constants.  Deterministic: seeded init from the sample's own
    rows, fixed iteration count, first-minimum argmin ties."""
    x = np.asarray(x, dtype=np.float64)
    n, dim = x.shape
    d = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ks, d), dtype=np.float64)
    for s in range(m):
        sub = x[:, s * d:(s + 1) * d]
        cent = sub[rng.choice(n, size=ks, replace=False)].copy()
        for _ in range(iters):
            # ||sub - c||^2 argmin == argmin(||c||^2 - 2 sub.c)
            d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
            assign = np.argmin(d2, axis=1)
            for c in range(ks):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each subvector mapped to its nearest
    codebook entry (L2, first-minimum ties).  Vectorized Arrow kernel:
    per batch one (n × ks) GEMM per subvector, no per-row Python."""
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, ks, d = books.shape

    # ||c||^2 constants are Python floats shared verbatim with the SQL
    # oracle; the sub·c dot accumulates DIMENSION-BY-DIMENSION so the
    # fold order is float-for-float the one list_inner_product uses —
    # argmin ties then break identically (first minimum) on both sides
    # (same technique as _rp_sig_kernel).
    cc2 = (books * books).sum(axis=2)  # (m, ks)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                sub = x[:, s * d:(s + 1) * d]
                d2 = np.empty((len(x), ks), dtype=np.float64)
                for c in range(ks):
                    acc = np.zeros(len(x), dtype=np.float64)
                    for j in range(d):
                        acc = acc + sub[:, j] * books[s, c, j]
                    d2[:, c] = cc2[s, c] - 2.0 * acc
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "codes": list(codes)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} long, codes array<int>"
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query is NOT
    quantized — per subvector a ks-entry inner-product table
    ``dt[s][c] = q_s · codebook[s][c]`` is precomputed (m·ks floats,
    driver-side numpy), and each stored vector's approximate score is
    the m-term table-lookup sum.  One Arrow kernel pass over the codes
    relation + native TakeOrderedAndProject — the scan reads 4-byte
    codes, never the original vectors.  Scores approximate the true
    inner product (that is PQ's contract); the gate pins the
    quantized computation itself, bit-for-bit."""
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, ks, d = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    dt = np.stack(
        [books[s] @ q[s * d:(s + 1) * d] for s in range(m)]
    )  # (m, ks)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.array(pdf["codes"].tolist(), dtype=np.int64)
            # left-to-right subvector accumulation — matches the
            # oracle's explicit addition chain term for term
            score = np.zeros(len(c), dtype=np.float64)
            for s in range(m):
                score = score + dt[s][c[:, s]]
            yield pd.DataFrame({id_col: pdf[id_col].values, "adc": score})

    scored = codes.mapInPandas(kernel, schema=f"{id_col} long, adc double")
    return scored.orderBy(F.desc("adc"), F.asc(id_col)).limit(k)


class IvfPqIndex:
    """IVF-PQ — THE billion-scale ANN serving structure (Jégou et al.
    2011 §V): coarse IVF centroids shard vectors into inverted lists
    (a partition column on disk), and inside each list only the 4-byte
    PQ code is stored.  A query probes ``nprobe`` lists (partition
    pruning — unprobed lists' files never open) and scores candidates
    by ADC table lookup — at 10^9+ vectors a query reads
    nprobe/n_centroids of a codes-only relation: ~1/1000th of the bytes
    a float32 scan would touch.
    """

    def __init__(self, spark: SparkSession, path: str):
        import json
        import os

        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        self.centroids = np.asarray(meta["centroids"], dtype=np.float64)
        self.codebooks = np.asarray(meta["codebooks"], dtype=np.float64)
        self.codes = spark.read.parquet(os.path.join(path, "codes"))

    @staticmethod
    def build(
        embeddings: DataFrame,
        centroids: np.ndarray,
        codebooks: np.ndarray,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfPqIndex":
        import json
        import os

        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
        coded = pq_encode(
            assigned.select(id_col, F.col("v").alias(vec_col)),
            codebooks,
            id_col=id_col,
            vec_col=vec_col,
        )
        (
            assigned.select(id_col, "centroid_id")
            .join(coded, id_col)
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(os.path.join(path, "codes"))
        )
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "centroids": [[float(x) for x in c] for c in centroids],
                    "codebooks": [
                        [[float(x) for x in e] for e in book]
                        for book in codebooks
                    ],
                },
                f,
            )
        return IvfPqIndex(embeddings.sparkSession, path)

    def topk(
        self,
        query_vec,
        k: int = 10,
        nprobe: int = 4,
        id_col: str = "vec_id",
        allowed: "DataFrame | None" = None,
    ) -> DataFrame:
        """Probe the nprobe nearest lists (partition-pruned scan of the
        CODES relation), ADC-score their candidates, top-k by
        approximate inner product.  ``allowed`` (a relation with an
        ``id_col`` column) restricts candidates BEFORE the cut —
        filter-then-rank, the same contract as :meth:`IvfIndex.topk`."""
        qv = np.asarray(query_vec, dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(self.centroids @ qn))
        probes = [int(c) for c in order[:nprobe]]
        cand = self.codes.filter(F.col("centroid_id").isin(probes))
        if allowed is not None:
            cand = cand.join(allowed.select(id_col), id_col, "left_semi")
        return pq_adc_topk(
            cand.select(id_col, "codes"),
            self.codebooks,
            query_vec,
            k=k,
            id_col=id_col,
        )
