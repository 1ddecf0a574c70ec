"""Deduplication operators for large-scale training-data pipelines.

All hashing is md5-based and defined identically in Spark SQL and ANSI SQL
(DuckDB), so every operator here has an exact SQL oracle: the first 8 hex
chars of md5 are parsed as a 32-bit unsigned int — `conv(substr(md5(x),1,8),
16,10)` in Spark, `from_hex`-equivalent arithmetic in DuckDB.

- exact_duplicates:   hash-groupBy on normalized text (one shuffle,
                      map-side combine; at 100 TB group on the 128-bit md5,
                      never the raw text — 16 bytes/row through the shuffle)
- minhash_signatures: k permutations approximated by k seeded md5 draws
                      over word shingles; LSH banding → candidate pairs via
                      a self-join on (band, band_hash) buckets (broadcast is
                      wrong here — bucket join scales linearly)
- simhash64:          64-bit simhash over token md5s (near-dup by hamming
                      distance; native bit ops)
- ngram_jaccard_pairs: exact n-gram Jaccard over candidate pairs
- embedding near-dup: see operators/similarity.py (cosine buckets)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# first-8-hex-chars-of-md5 as an unsigned 32-bit int — the shared hash
# primitive; expressible in DuckDB as: CAST(('0x' || substr(md5(x),1,8)) AS BIGINT)


def _h32(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_docs, min_doc_id).

    The canonical keep-one rule is "keep min doc_id"; rows with n_docs > 1
    are duplicate clusters.  Shuffles 16-byte hashes, not documents.
    """
    return (
        docs.select(id_col, F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_doc_id"),
        )
    )


def word_shingles(text_col, n: int = 3):
    """n-word shingles as array<string> (native)."""
    from docs_indexer_spark.functions.analysis import tokens_col

    toks = tokens_col(text_col) if isinstance(text_col, str) else text_col
    size = F.size(toks)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, sig: array<long>) — minhash over word shingles.

    Permutation i is approximated by md5(i || shingle); the signature entry
    is the min over shingles.  Fully native (no UDF): transform + array_min
    inside one projection, so the whole thing is one scan, zero shuffles.
    """
    sh = word_shingles(text_col, shingle_n)

    def entry(seed: int):
        return F.array_min(
            F.transform(sh, lambda s: _h32(F.concat(F.lit(f"{seed}:"), s)))
        )

    sig = F.array(*[entry(i) for i in range(num_hashes)])
    return docs.select(F.col(id_col), sig.alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH: band the signature, bucket-join on (band, band_key).

    Pairs sharing any band bucket are candidates: (doc_a, doc_b) with
    doc_a < doc_b.  The join is a shuffle join on the bucket key — the
    scalable formulation (a broadcast would cap corpus size); AQE splits
    skewed buckets (a degenerate all-identical corpus).
    """
    n_hashes_row = signatures.select(F.size("sig").alias("n")).first()
    rows_per_band = int(n_hashes_row["n"]) // bands
    banded = signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col(f"l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash long): 64-bit simhash over token xxhash64 bits.

    Bit b of the simhash is 1 iff the majority of tokens have bit b set in
    their 64-bit hash.  Native aggregate: explode tokens → per-bit sums via
    shift/mask → reassemble.  Near-dups are rows with small hamming
    distance (bit_count(a ^ b)).
    """
    from docs_indexer_spark.functions.analysis import tokens_col

    toks = docs.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
    hashed = toks.withColumn("h", F.xxhash64("tok"))
    bit_sums = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(64)
        ],
    )
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") * 2 > F.col("n"), F.lit(1)).otherwise(F.lit(0))
        term = F.shiftleft(bit.cast("long"), b)
        sim = term if sim is None else sim.bitwiseOR(term)
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: (doc_a, doc_b, jaccard).

    docs→shingle-sets once; two joins to attach both sides; the set ops are
    native array functions.  Meant for the (small) LSH candidate set — this
    is the verify stage, not the discovery stage.
    """
    sets_df = docs.select(
        F.col(id_col),
        F.array_distinct(word_shingles(text_col, n)).alias("grams"),
    )
    a = sets_df.withColumnRenamed(id_col, "doc_a").withColumnRenamed("grams", "ga")
    b = sets_df.withColumnRenamed(id_col, "doc_b").withColumnRenamed("grams", "gb")
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb")).cast("double")
    return joined.select(
        "doc_a",
        "doc_b",
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )
