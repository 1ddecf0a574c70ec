"""Iceberg-semantics catalog features (round-2 verdict "missing #2"):
optimistic-concurrency commits, manifest-level file pruning, incremental
snapshot scans.  All parquet/JSON-backed — the interface swaps to real
Iceberg (commit retries, manifests, incremental reads) unchanged."""

import json
import os

import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.sources.catalog import CommitConflictError, SnapshotCatalog


def test_optimistic_commit_conflict(tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "wh"))
    g1, _ = cat.stage_generation("t", "fp1")
    cat.publish("t", g1, "fp1", expected_fingerprint=None)

    # two writers both based on fp1
    g2, _ = cat.stage_generation("t", "fp2")
    g3, _ = cat.stage_generation("t", "fp3")
    cat.publish("t", g2, "fp2", expected_fingerprint="fp1")
    with pytest.raises(CommitConflictError):
        cat.publish("t", g3, "fp3", expected_fingerprint="fp1")
    # rebase on the new state → commit succeeds
    cat.publish("t", g3, "fp3", expected_fingerprint="fp2")
    assert cat.current_generation("t")["fingerprint"] == "fp3"
    # unconditional publish (no expected) never conflicts
    g4, _ = cat.stage_generation("t", "fp4")
    cat.publish("t", g4, "fp4")


@pytest.fixture(scope="module")
def published_index(spark, tmp_path_factory):
    from docs_indexer_spark.plans.build_index import build_index
    from docs_indexer_spark.plans.query import IndexReader

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cat = SnapshotCatalog(str(tmp_path_factory.mktemp("wh_manifest")))
    build_index(spark, docs, cat, fingerprint="fp-m", id_col="doc_id",
                n_build_partitions=2)
    return cat, IndexReader(spark, cat)


def test_manifest_written_and_prunes_files(spark, published_index):
    cat, reader = published_index
    blocks_dir = os.path.join(cat.generation_path("index"), "blocks.parquet")
    with open(os.path.join(blocks_dir, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["key"] == "term_id"
    n_files = len(manifest["files"])
    assert n_files > 1, "fixture must produce several block files"
    assert all(e["min"] is not None for e in manifest["files"])

    # one mid-frequency term: pruned read must touch fewer files and
    # return the same rows as the full read + filter
    tid = int(reader.df_stats.orderBy("df", "term_id").collect()[5]["term_id"])
    pruned = cat.read_pruned(spark, "index", "blocks.parquet", "term_id", [tid])
    full = cat.read(spark, "index", "blocks.parquet")
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    want = sorted(
        (r["term_id"], r["bucket"], r["block_seq"])
        for r in full.filter(F.col("term_id") == tid).collect()
    )
    got = sorted(
        (r["term_id"], r["bucket"], r["block_seq"])
        for r in pruned.filter(F.col("term_id") == tid).collect()
    )
    assert got == want and got


def test_manifest_pruned_search_matches_full(spark, published_index):
    """End-to-end: IndexReader.search routes through _blocks_for (manifest
    pruning) — results must equal scoring over the unpruned relation."""
    from docs_indexer_spark.operators import bm25

    cat, reader = published_index
    query = "spark join window"
    got = [(r["doc_id"], round(r["score"], 9))
           for r in reader.search(query, k=10, exact=True).collect()]
    idf = reader._idf(sorted(set(query.split())))
    full = bm25.score_from_blocks(
        cat.read(spark, "index", "blocks.parquet"), idf, sorted(idf), k=10
    )
    want = [(r["doc_id"], round(r["score"], 9)) for r in full.collect()]
    assert got == want and got


def test_read_pruned_unindexed_term_is_empty(spark, published_index):
    cat, _ = published_index
    df = cat.read_pruned(spark, "index", "blocks.parquet", "term_id",
                         [123456789])
    assert df.filter(F.col("term_id") == 123456789).count() == 0


def test_incremental_scan(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "wh_inc"))
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, text string"
    )
    v2 = spark.createDataFrame(
        [(1, "alpha"), (2, "BETA-CHANGED"), (4, "delta")],
        "id long, text string",
    )
    g1, p1 = cat.stage_generation("docs", "s1")
    v1.write.parquet(os.path.join(p1, "rows.parquet"))
    cat.publish("docs", g1, "s1")
    g2, p2 = cat.stage_generation("docs", "s2")
    v2.write.parquet(os.path.join(p2, "rows.parquet"))
    cat.publish("docs", g2, "s2", retain=2)

    # added-or-changed rows of the current snapshot vs g1
    delta = {
        (r["id"], r["text"])
        for r in cat.incremental(spark, "docs", "rows.parquet", g1).collect()
    }
    assert delta == {(2, "BETA-CHANGED"), (4, "delta")}
    # deletions = the reverse direction
    gone = {
        (r["id"], r["text"])
        for r in cat.incremental(
            spark, "docs", "rows.parquet", g2, to_generation=g1
        ).collect()
    }
    assert gone == {(2, "beta"), (3, "gamma")}


def test_commit_with_retries_rebases_under_contention(tmp_path):
    """Two writers race: the loser's attempt re-runs against the winner's
    state (Iceberg commit-retry), and the observed base chain is linear."""
    import threading

    cat = SnapshotCatalog(str(tmp_path / "wh_race"))
    g0, _ = cat.stage_generation("t", "base")
    cat.publish("t", g0, "base")

    bases_seen = {"w1": [], "w2": []}
    barrier = threading.Barrier(2)

    def writer(name, fp):
        def attempt(cur):
            bases_seen[name].append(cur["fingerprint"] if cur else None)
            g, _ = cat.stage_generation("t", fp + str(len(bases_seen[name])))
            if len(bases_seen[name]) == 1:
                # both writers observe the same base before either commits
                barrier.wait(timeout=10)
            return g, fp, {}
        return cat.commit_with_retries("t", attempt)

    results = {}

    def run(name, fp):
        results[name] = writer(name, fp)

    t1 = threading.Thread(target=run, args=("w1", "fpA"))
    t2 = threading.Thread(target=run, args=("w2", "fpB"))
    t1.start(); t2.start(); t1.join(); t2.join()

    assert results["w1"]["attempts"] + results["w2"]["attempts"] >= 3, (
        "at least one writer must have conflicted and rebased", results)
    loser = "w1" if results["w1"]["attempts"] > 1 else "w2"
    other_fp = "fpB" if loser == "w1" else "fpA"
    # the loser's rebase observed the winner's committed state
    assert other_fp in bases_seen[loser]
    assert cat.current_generation("t")["fingerprint"] in ("fpA", "fpB")


def test_commit_with_retries_exhausts(tmp_path):
    """A base that is ALWAYS stale exhausts the retry budget and raises."""
    cat = SnapshotCatalog(str(tmp_path / "wh_exhaust"))
    g0, _ = cat.stage_generation("t", "v0")
    cat.publish("t", g0, "v0")

    n = {"i": 0}

    def attempt(cur):
        # sabotage: advance the table after reading the base, every time
        n["i"] += 1
        g, _ = cat.stage_generation("t", f"saboteur{n['i']}")
        cat.publish("t", g, f"saboteur{n['i']}")
        g2, _ = cat.stage_generation("t", f"mine{n['i']}")
        return g2, f"mine{n['i']}", {}

    with pytest.raises(CommitConflictError):
        cat.commit_with_retries("t", attempt, max_attempts=3)
    assert n["i"] == 3
