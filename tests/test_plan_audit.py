"""Physical-plan regression gates: the plans that make this engine scale
must KEEP their shape — pushed-down scans, no cartesian joins, top-k
without a global sort, broadcast where the small side is provably small.
These are the `.explain("formatted")` properties a 100-TB deployment
depends on; a silent optimizer-shape regression should fail CI, not a
cluster."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_blocks_scan_prunes_terms(spark, tmp_path):
    """term_id IN (...) must reach the parquet scan of a published block
    index (row-group pruning via min/max stats is what makes per-query
    decode O(query terms), not O(index))."""
    from docs_indexer_spark.operators import spimi
    from docs_indexer_spark.operators.fused import fused_build_blocks

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    fb = fused_build_blocks(docs, analyzer="stop", n_buckets=4)
    path = str(tmp_path / "blocks")
    spimi.write_blocks(fb.blocks, path)
    scan = spark.read.parquet(path).filter(F.col("term_id").isin([1, 2, 3]))
    plan = _plan(scan)
    assert "PushedFilters" in plan and "In(term_id" in plan


def test_simhash_plan_has_no_cartesian_join(spark):
    plan = _plan(E.queries()["simhash_near_dups"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_pairs_plan_has_no_cartesian_join(spark):
    plan = _plan(E.queries()["minhash_lsh_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_uses_heap_not_global_sort(spark):
    plan = _plan(E.queries()["bm25_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_join_default_broadcasts_small_dims(spark):
    plan = _plan(E.queries()["join_default"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_keyword_filter_pushes_down(spark):
    plan = _plan(E.queries()["keyword_filter_facet"](spark, SF))
    assert "PushedFilters" in plan
    assert "EqualTo(lang,en)" in plan.replace(" ", "").replace("'", "")


# Cross-join whitelist: plans where a BroadcastNestedLoopJoin is BOUNDED
# BY CONSTRUCTION, with the bound.  Anything else sweeping in a nested-
# loop or cartesian join fails CI before it fails a cluster.
_BNLJ_WHITELIST = {
    # sliced exact-math parity probes (oracle twins of candidate-driven
    # production operators): inputs hard-capped in the query text
    "ngram_jaccard_pairs",     # doc_id < 60 slice, all-pairs verify probe
    "embedding_pair_cosine",   # vec_id < 80 slice, all-pairs cosine probe
    # phrase-suggester assembly: crossJoins are per-term candidate BEAMS
    # (≤ num_candidates=5 rows each) and the 1-row corpus-stats relation
    "suggest_correction",
}


def test_every_entry_plan_is_cartesian_free(spark):
    """Sweep ALL queries() plans: no CartesianProduct anywhere; a
    BroadcastNestedLoopJoin only in the whitelisted bounded probes — a
    future edit that unbounds a slice or drops a join key fails here."""
    queries = E.queries()
    offenders = {}
    for name, fn in sorted(queries.items()):
        plan = _plan(fn(spark, SF))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_WHITELIST:
            flags.append("BroadcastNestedLoopJoin")
        if flags:
            offenders[name] = flags
    assert not offenders, offenders


def test_parity_probes_stay_sliced(spark):
    """The whitelisted all-pairs probes must keep their input slices: the
    bound is what makes the BNLJ acceptable."""
    import inspect

    src_jac = inspect.getsource(E.q_ngram_jaccard_pairs)
    src_cos = inspect.getsource(E.q_embedding_pair_cosine)
    assert "doc_id" in src_jac and "< 60" in src_jac.replace("<60", "< 60")
    assert "vec_id" in src_cos and "< 80" in src_cos.replace("<80", "< 80")
