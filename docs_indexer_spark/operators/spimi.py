"""SPIMI-style compressed posting-block construction with a salted,
doc-range-bucketed merge (SURVEY.md §2 C1 + C2).

Input: the uncompressed postings relation (term, doc_id, tf) plus document
lengths and global stats.  Output: the block index

    (term, bucket, block_seq, n_docs, first_doc_id, last_doc_id,
     max_tf, max_score, doc_ids_bin, tfs_bin, tf_norms_bin)

Skew story (the part the reference never had — it ran 1 OpenSearch shard,
/root/reference/common.py:6): a Zipf-head term like "the" may appear in a
large fraction of all documents.  A naive ``groupBy(term)`` would ship that
whole posting list to ONE task.  Instead the shuffle key is
``(term, bucket)`` where ``bucket = floor(doc_id / span)`` is a RANGE of
doc_id — the salt.  Consequences:

- the head term's postings split across up to ``n_buckets`` tasks — the
  merge-stage skew bound improves by that factor;
- within a bucket, blocks are doc_id-sorted; buckets are disjoint ordered
  doc_id ranges, so the per-term global order is simply
  ``(bucket, block_seq)`` — merging partial results is an ordered CONCAT of
  already-encoded blocks: no decode, no re-sort, no second shuffle;
- block-max WAND also exploits the bucketing: buckets partition the doc
  space, so per-bucket WAND + global top-k merge is exact.

Execution shape: ``repartition(term, bucket)`` →
``sortWithinPartitions(term, bucket, doc_id)`` → ``mapInPandas`` with a
carry-over between Arrow batches.  NOT ``groupBy().applyInPandas()`` — that
materializes one pandas DataFrame per (term, bucket) group, and with a 30k
vocabulary × 32 buckets the ~1 ms/group protocol overhead dominates
(measured 113 s for a 2000-doc corpus).  The mapInPandas kernel sees whole
10k-row Arrow batches and slices groups with numpy change-point detection —
same output, ~none of the per-group overhead.

All arithmetic (idf, tf-norm) is native Column math; Python appears only in
the block encoder (numpy varint inside the Arrow batch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docs_indexer_spark.config import BLOCK_SIZE, BM25Params
from docs_indexer_spark.operators.compression import varint_encode_with_lengths
from docs_indexer_spark.operators.postings import idf_col

# Scoring reads ONLY doc_ids_bin + tf_norms_bin (wand.py / bm25.py); raw
# tf values are redundant with the stored norm on the serving path, so
# the default block row does NOT carry a tfs_bin stream (−20-25% block
# bytes through the encode exchange and at rest).  Positional blocks DO
# keep it: per-posting position counts equal the tfs and segment the
# positions_bin stream on decode.  ``store_tf=True`` opts a tf-path build
# back in for debugging/inspection.
BLOCKS_SCHEMA = (
    "term_id long, bucket int, block_seq int, n_docs int, "
    "first_doc_id long, last_doc_id long, max_tf int, max_score double, "
    "doc_ids_bin binary, tf_norms_bin binary"
)
# opt-in positional stream (reference mapping term_vector
# with_positions_offsets, mappings/hugo.json:6,48,60): per posting, the
# delta-gapped varint positions (first absolute); per-posting counts are
# the decoded tfs_bin, which positional blocks therefore retain
BLOCKS_POS_SCHEMA = BLOCKS_SCHEMA.replace(
    "doc_ids_bin binary", "doc_ids_bin binary, tfs_bin binary"
) + ", positions_bin binary"


def blocks_schema(positions: bool = False, store_tf: bool = False,
                  raw: bool = False) -> str:
    """DDL schema of a block row for the given build options.  ``raw``
    selects the pre-idf kernel output (max_norm instead of max_score)."""
    s = BLOCKS_POS_SCHEMA if positions else BLOCKS_SCHEMA
    if store_tf and not positions:
        s = s.replace("doc_ids_bin binary", "doc_ids_bin binary, tfs_bin binary")
    return s.replace("max_score", "max_norm") if raw else s


# kernel output before the block-level idf join
_RAW_BLOCKS_SCHEMA = blocks_schema(raw=True)
_RAW_BLOCKS_POS_SCHEMA = blocks_schema(positions=True, raw=True)

_COLS = ["term_id", "bucket", "doc_id", "tf", "tf_norm"]


def _encode_positions(pos_vals, pos_lens, bs, be):
    """Positions payload per block: the per-posting position lists arrive
    flattened (``pos_vals``) with per-posting counts (``pos_lens``); gaps
    are taken WITHIN each posting (absolute at each posting start), varint-
    encoded in one vectorized pass, and the single stream is sliced per
    block by posting-aligned byte offsets."""
    vals = pos_vals.astype(np.int64, copy=False)
    starts = np.concatenate(([0], np.cumsum(pos_lens)))[:-1].astype(np.int64)
    gaps = np.empty(len(vals), dtype=np.uint64)
    if len(vals):
        gaps[1:] = np.diff(vals).astype(np.uint64)
        gaps[starts] = vals[starts].astype(np.uint64)
    stream, vlens = varint_encode_with_lengths(gaps)
    pp_bytes = np.add.reduceat(vlens, starts) if len(vals) else np.zeros(0, np.int64)
    pb_off = np.concatenate(([0], np.cumsum(pp_bytes)))
    return [stream[pb_off[s]: pb_off[e]] for s, e in zip(bs, be)]


def _encode_runs(cols: dict, norm_dtype, pos=None, store_tf: bool = False) -> pa.RecordBatch:
    """Encode every (term, bucket) run of a sorted column batch into block
    rows.

    Fully vectorized: block boundaries via numpy change points, per-block
    max via ``np.maximum.reduceat`` (blocks tile the batch contiguously),
    and ONE varint pass over the whole batch whose stream is then sliced
    per block by byte offsets — per-block Python is reduced to bytes
    slicing.  (A per-run loop calling the encoder cost ~100 µs/run; with
    Zipf tails most runs are a handful of postings, and that overhead
    dominated the whole build stage.)

    Operates on raw numpy columns from mapInArrow — profiling showed the
    Arrow→pandas materialization in mapInPandas cost ~10× the actual
    encode work (~16 µs/row vs ~1.2 µs/row).
    """
    terms = cols["term_id"].astype(np.int64, copy=False)
    buckets = cols["bucket"].astype(np.int64, copy=False)
    ids = cols["doc_id"].astype(np.int64, copy=False)
    tfs = cols["tf"].astype(np.uint64, copy=False)
    norms = cols["tf_norm"].astype(norm_dtype, copy=False)
    # per-block MAX NORM only; max_score = idf * max_norm is attached by a
    # block-granularity join after encoding (idf is constant per term, so
    # carrying it on every posting row through shuffle+sort+Arrow wasted
    # 8 B/row; IEEE multiply by a positive constant is monotone, so
    # idf*max(norm) is the exact same upper bound as max(idf*norm))
    fnorms = norms.astype(np.float64)
    n = len(terms)

    # run change points of the (term, bucket) key
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
    run_starts = np.flatnonzero(change)
    run_ends = np.empty_like(run_starts)
    run_ends[:-1] = run_starts[1:]
    run_ends[-1] = n

    # block boundaries: tile each run in BLOCK_SIZE steps
    bs_parts = [np.arange(s, e, BLOCK_SIZE) for s, e in zip(run_starts, run_ends)]
    bs = np.concatenate(bs_parts)
    seqs = np.concatenate([np.arange(len(p)) for p in bs_parts])
    nb_per_run = np.array([len(p) for p in bs_parts])
    be = np.minimum(bs + BLOCK_SIZE, np.repeat(run_ends, nb_per_run))

    # delta gaps with an absolute value at every block start (each block
    # is an independently decodable delta chain)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[1:] = np.diff(ids).astype(np.uint64)
    # absolute (wrapped-modular) value at every block start — bs[0] == 0,
    # so index 0 is covered here
    gaps[bs] = ids[bs].astype(np.uint64)

    id_stream, id_lens = varint_encode_with_lengths(gaps)
    id_off = np.concatenate(([0], np.cumsum(id_lens)))
    norm_bytes = np.ascontiguousarray(norms).tobytes()
    isz = norms.dtype.itemsize

    arrays = [
        pa.array(terms[bs], type=pa.int64()),
        pa.array(buckets[bs].astype(np.int32), type=pa.int32()),
        pa.array(seqs.astype(np.int32), type=pa.int32()),
        pa.array((be - bs).astype(np.int32), type=pa.int32()),
        pa.array(ids[bs], type=pa.int64()),
        pa.array(ids[be - 1], type=pa.int64()),
        pa.array(np.maximum.reduceat(tfs, bs).astype(np.int32), type=pa.int32()),
        pa.array(np.maximum.reduceat(fnorms, bs), type=pa.float64()),
        pa.array([id_stream[id_off[s]: id_off[e]] for s, e in zip(bs, be)], type=pa.binary()),
    ]
    names = [
        "term_id", "bucket", "block_seq", "n_docs", "first_doc_id",
        "last_doc_id", "max_tf", "max_norm", "doc_ids_bin",
    ]
    if pos is not None or store_tf:
        # per-posting tfs: positional blocks NEED them (they segment the
        # positions stream on decode); tf-path blocks carry them only on
        # explicit opt-in — scoring never reads them
        tf_stream, tf_lens = varint_encode_with_lengths(tfs)
        tf_off = np.concatenate(([0], np.cumsum(tf_lens)))
        arrays.append(
            pa.array([tf_stream[tf_off[s]: tf_off[e]] for s, e in zip(bs, be)], type=pa.binary())
        )
        names.append("tfs_bin")
    arrays.append(
        pa.array([norm_bytes[s * isz: e * isz] for s, e in zip(bs, be)], type=pa.binary())
    )
    names.append("tf_norms_bin")
    if pos is not None:
        arrays.append(
            pa.array(_encode_positions(pos[0], pos[1], bs, be), type=pa.binary())
        )
        names.append("positions_bin")
    return pa.RecordBatch.from_arrays(arrays, names=names)


class _RunCarry:
    """Chunk-list carry for run-spanning Arrow batches.

    Holding back the trailing (term_id, bucket) run between batches must
    NOT re-concatenate the accumulated run per batch: a head term's run
    can span thousands of 10k-row batches (cf-sized in the fused path,
    10^8 postings/bucket at 10^12 docs in the classic path) and per-batch
    concatenation is O(run²) copying — measured 127 s vs ~4 s on a 20k-doc
    Zipf corpus.  Chunks are appended to a list and concatenated exactly
    once, when the run completes.
    """

    def __init__(self, positions: bool):
        self.positions = positions
        self.chunks: list[dict] = []
        self.pos_chunks: list[tuple] = []
        self.key = None  # (term_id, bucket) of the pending run

    def empty(self) -> bool:
        return not self.chunks

    def _merged(self, head, head_pos):
        parts = self.chunks + ([head] if head is not None else [])
        cols = (
            parts[0]
            if len(parts) == 1
            else {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
        )
        pos = None
        if self.positions:
            pparts = self.pos_chunks + ([head_pos] if head_pos is not None else [])
            pos = (
                np.concatenate([p[0] for p in pparts]),
                np.concatenate([p[1] for p in pparts]),
            ) if len(pparts) > 1 else pparts[0]
        return cols, pos

    def feed(self, cols: dict, pos):
        """Consume one batch; yield (merged_cols, merged_pos) for every
        completed stretch (≥1 full runs)."""
        t, b = cols["term_id"], cols["bucket"]
        batch_key = (t[-1], b[-1])
        tail = (t == t[-1]) & (b == b[-1])
        split = len(t) - int(tail.sum())
        if split == 0:
            # whole batch is one run
            if self.chunks and self.key != batch_key:
                yield self._merged(None, None)
                self.chunks, self.pos_chunks = [], []
            self.chunks.append(cols)
            if self.positions:
                self.pos_chunks.append(pos)
            self.key = batch_key
            return
        head = {k: v[:split] for k, v in cols.items()}
        head_pos = None
        tail_pos = None
        if self.positions:
            vsplit = int(pos[1][:split].sum())
            head_pos = (pos[0][:vsplit], pos[1][:split])
            tail_pos = (pos[0][vsplit:], pos[1][split:])
        # the head closes the pending run (the encoder's change-point scan
        # handles the case where the head actually starts a NEW run)
        yield self._merged(head, head_pos)
        self.chunks = [{k: v[split:] for k, v in cols.items()}]
        self.pos_chunks = [tail_pos] if self.positions else []
        self.key = batch_key

    def flush(self):
        if self.chunks:
            yield self._merged(None, None)
            self.chunks, self.pos_chunks = [], []


def _make_kernel(norm_dtype, positions: bool = False, store_tf: bool = False):
    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        carry = _RunCarry(positions)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            cols = {
                name: batch.column(j).to_numpy(zero_copy_only=False)
                for j, name in enumerate(names)
                if name != "positions"
            }
            pos = None
            if positions:
                la = batch.column(names.index("positions"))
                pos = (
                    la.flatten().to_numpy(zero_copy_only=False).astype(np.int64),
                    la.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64),
                )
            for mcols, mpos in carry.feed(cols, pos):
                yield _encode_runs(mcols, norm_dtype, mpos, store_tf=store_tf)
        for mcols, mpos in carry.flush():
            yield _encode_runs(mcols, norm_dtype, mpos, store_tf=store_tf)

    return kernel


def build_blocks(
    postings: DataFrame,
    doclens: DataFrame,
    dfs: DataFrame,
    n_docs: int,
    avgdl: float,
    max_doc_id: int,
    min_doc_id: int = 0,
    params: BM25Params = BM25Params(),
    n_buckets: int | None = None,
    norm_dtype=np.float32,
    shuffle_partitions: int | None = None,
    target_run_postings: int = 1_000_000,
    positions: bool = False,
    store_tf: bool = False,
) -> DataFrame:
    """(term, doc_id, tf) ⨝ dl ⨝ df → compressed block index.

    ``positions=True`` expects a ``positions array<int>`` column on the
    postings relation (see operators/phrase.token_positions) and emits a
    ``positions_bin`` delta-varint stream per block — the term_vector
    with_positions analogue; per-posting counts equal the tfs.

    ``n_buckets`` defaults to ADAPTIVE: ceil(max(df) / target_run_postings)
    clamped to [1, 1024].  The bucket count trades head-term task size
    (run ≈ max_df / n_buckets postings — keep ≲ 1M ≈ 8 MB so no single
    merge task is outsized) against tail fragmentation (a term with
    df < n_buckets splits into single-posting runs whose per-block
    metadata inflates the index).  Deriving it from the actual max
    document frequency keeps small corpora at 1 bucket (zero
    fragmentation) and 10^12-doc corpora at the cap (head term 10^11 df →
    ~100M-posting runs across 1024 tasks)."""
    if "term_id" not in postings.columns:
        # string-keyed callers (SQL-parity plane): hash on entry so the
        # shuffle/sort/encode below stay numeric
        postings = postings.withColumn("term_id", F.xxhash64("term")).drop("term")
    if "term_id" not in dfs.columns:
        dfs = dfs.withColumn("term_id", F.xxhash64("term")).drop("term")
    if n_buckets is None:
        max_df = int(dfs.agg(F.max("df")).collect()[0][0] or 1)
        n_buckets = min(1024, max(1, -(-max_df // target_run_postings)))
    # span over the ACTUAL id range: doc_id = xxhash64(url) is negative for
    # ~half of docs, so a max-only span would double the bucket range (and
    # an all-negative corpus would overflow the int cast).  The range of
    # hashed ids can exceed int64 (≈2^64 wide), so the bucket is computed
    # in double space: long→double is monotone, so buckets remain ordered
    # disjoint doc_id ranges in [0, n_buckets) — their exact boundaries
    # don't matter, only ordering + disjointness (WAND and the ordered-
    # concat merge rely on nothing else).
    span_d = max(1.0, float(max_doc_id - min_doc_id + 1) / n_buckets)
    # doclens (16 B/doc) is broadcast when the corpus is small enough that
    # shipping it beats shuffling the 10-100x larger postings relation;
    # above the threshold AQE picks the strategy from runtime sizes.  The
    # df/idf table is NOT joined here at all — idf is per-term, so it is
    # attached at BLOCK granularity after encoding (~128x fewer rows).
    dl_side = F.broadcast(doclens) if n_docs <= 20_000_000 else doclens
    enriched = (
        postings.join(dl_side, "doc_id")
        .withColumn(
            "tf_norm",
            F.col("tf")
            / (
                F.col("tf")
                + params.k1
                * (1.0 - params.b + params.b * F.col("dl") / F.lit(avgdl))
            ),
        )
        .withColumn(
            "bucket",
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (F.col("doc_id").cast("double") - F.lit(float(min_doc_id)))
                        / F.lit(span_d)
                    ).cast("int"),
                ),
            ),
        )
        .select(*(_COLS + ["positions"] if positions else _COLS))
    )
    if not shuffle_partitions:
        # explicit N: a bare repartition(cols) is AQE-coalesced toward
        # 64 MB partitions, which throttles the (Python-side) encode stage
        # to a handful of tasks regardless of cores — measured flat 8→32
        # core scaling until pinned.  2× parallelism keeps every core busy
        # through stragglers.
        sc = postings.sparkSession.sparkContext
        shuffle_partitions = max(sc.defaultParallelism * 2, 16)
    part = enriched.repartition(shuffle_partitions, "term_id", "bucket")
    sorted_part = part.sortWithinPartitions("term_id", "bucket", "doc_id")
    raw = sorted_part.mapInArrow(
        _make_kernel(norm_dtype, positions=positions, store_tf=store_tf),
        schema=blocks_schema(positions=positions, store_tf=store_tf, raw=True),
    )
    idf_tbl = dfs.select(
        "term_id", idf_col(F.col("df"), n_docs).alias("_idf")
    )
    if n_docs <= 20_000_000:
        idf_tbl = F.broadcast(idf_tbl)
    return (
        raw.join(idf_tbl, "term_id")
        .withColumn("max_score", F.col("max_norm") * F.col("_idf"))
        .drop("max_norm", "_idf")
    )


def decode_position_blocks(blocks: DataFrame) -> DataFrame:
    """Block index (positions=True) → (term_id, doc_id, positions) rows.

    Used by the phrase plane: the caller filters term_id IN (phrase terms)
    FIRST so the parquet scan prunes to the handful of terms' blocks; the
    decode is a vectorized mapInArrow (per-block numpy, never per-posting
    Python).  Positions un-delta by segmented cumsum keyed on the tf runs.
    """
    from docs_indexer_spark.operators.compression import (
        delta_decode_doc_ids,
        varint_decode,
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            col = {n: batch.column(names.index(n)) for n in
                   ("term_id", "doc_ids_bin", "tfs_bin", "positions_bin")}
            out_tid, out_ids, out_vals, out_offs = [], [], [], [0]
            for r in range(batch.num_rows):
                ids = delta_decode_doc_ids(col["doc_ids_bin"][r].as_py())
                tfs = varint_decode(col["tfs_bin"][r].as_py()).astype(np.int64)
                gaps = varint_decode(
                    col["positions_bin"][r].as_py()
                ).astype(np.int64)
                starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
                c = np.cumsum(gaps)
                base = c[starts] - gaps[starts]
                pos = c - np.repeat(base, tfs)
                tid = col["term_id"][r].as_py()
                out_tid.append(np.full(len(ids), tid, dtype=np.int64))
                out_ids.append(ids)
                out_vals.append(pos)
                last = out_offs[-1]
                out_offs.extend((last + np.cumsum(tfs)).tolist())
            tids = np.concatenate(out_tid)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(tids, type=pa.int64()),
                    pa.array(np.concatenate(out_ids), type=pa.int64()),
                    pa.ListArray.from_arrays(
                        pa.array(out_offs, type=pa.int32()),
                        pa.array(
                            np.concatenate(out_vals).astype(np.int32),
                            type=pa.int32(),
                        ),
                    ),
                ],
                names=["term_id", "doc_id", "positions"],
            )

    return blocks.mapInArrow(
        kernel, schema="term_id long, doc_id long, positions array<int>"
    )


def write_blocks(blocks: DataFrame, path: str, term_partitions: int = 32) -> None:
    """Persist the block index term-clustered so query-time
    `term_id IN (...)` filters prune parquet row groups (min/max stats)."""
    (
        blocks.repartition(term_partitions, "term_id")
        .sortWithinPartitions("term_id", "bucket", "block_seq")
        .write.mode("overwrite")
        .parquet(path)
    )
