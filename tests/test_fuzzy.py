"""Damerau-OSA fuzzy plane: distance semantics, SymSpell serving path,
expansion caps, and MLT parameter fidelity.

Reference semantics: OpenSearch ``match`` with ``fuzziness`` (default
``transpositions: true``) over the index the reference creates
(/root/reference/common.py:4-31, queried by test/integrationtest.sh:19);
OpenSearch MLT defaults max_query_terms=25 / min_term_freq=2 /
min_doc_freq=5.
"""

import pytest
from pyspark.sql import functions as F

from docs_indexer_spark.functions.fuzzy import osa_distance


def test_osa_distance_semantics():
    """Transpositions count ONE edit (the round-3 verdict case), OSA
    restriction holds (no re-edit of a transposed pair), plain edits
    match Levenshtein."""
    assert osa_distance("spakr", "spark") == 1          # transposition
    assert osa_distance("spark", "spakr") == 1          # symmetric
    assert osa_distance("window", "winodw") == 1        # transposition
    assert osa_distance("window", "windoq") == 1        # substitution
    assert osa_distance("spark", "spark") == 0
    assert osa_distance("", "abc") == 3 and osa_distance("abc", "") == 3
    assert osa_distance("ca", "abc") == 3               # OSA (Damerau: 2)
    assert osa_distance("abcdef", "badcfe") == 3        # 3 transpositions
    assert osa_distance("kitten", "sitting") == 3       # pure Levenshtein
    # cap: early exit returns cap+1, never an under-estimate
    assert osa_distance("completely", "different", cap=1) == 2
    assert osa_distance("spakr", "spark", cap=1) == 1


def test_osa_matches_duckdb_damerau_at_distance_one():
    """The driver-gate oracle uses DuckDB damerau_levenshtein (the
    UNRESTRICTED variant); at the gate's fuzziness=1 the ≤1 predicate
    must agree with OSA on every pair — pinned over a random pool of
    short strings (where the variants could plausibly diverge)."""
    import random

    import duckdb

    rng = random.Random(42)
    alphabet = "abcde"
    pool = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(80)
    ]
    con = duckdb.connect()
    for a in pool[:40]:
        for b in pool[40:]:
            duck = con.execute(
                "SELECT damerau_levenshtein(?, ?)", [a, b]
            ).fetchone()[0]
            assert (osa_distance(a, b) <= 1) == (duck <= 1), (a, b)


@pytest.fixture(scope="module")
def fuzzy_index(spark, tmp_path_factory):
    """Published index (stop analyzer) over the first 200 sf0.001 docs —
    shared by the serving-path tests below."""
    from docs_indexer_spark.plans.build_index import build_index
    from docs_indexer_spark.sources.catalog import SnapshotCatalog

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 200)
    cat = SnapshotCatalog(str(tmp_path_factory.mktemp("wh") / "wh_fz"))
    build_index(spark, docs, cat, fingerprint="fp-fz", id_col="doc_id",
                n_build_partitions=1, analyzer="stop")
    return cat, docs


def test_search_fuzzy_transposition_via_symspell(spark, fuzzy_index):
    """A transposed misspelling must return EXACTLY the hits of the
    correctly spelled query — through the published deletion index, with
    no vocabulary levenshtein scan in the candidate plan."""
    import os

    from docs_indexer_spark.plans.query import IndexReader

    cat, _ = fuzzy_index
    gen = cat.generation_path("index")
    assert os.path.exists(os.path.join(gen, "deletions.parquet"))

    reader = IndexReader(spark, cat)
    want = [(r["doc_id"], round(r["score"], 9))
            for r in reader.search("window", k=5, exact=True).collect()]
    got = [(r["doc_id"], round(r["score"], 9))
           for r in reader.search_fuzzy("winodw", k=5).collect()]
    assert got == want and got, "transposition must match at fuzziness 1"

    # plan audit: the SymSpell candidate path is an equi-join probe —
    # no levenshtein anywhere in the candidate plan
    plan = reader._fuzzy_candidates_df(
        ["winodw"], 1
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )
    assert "levenshtein" not in plan.lower()
    reader.close()


def test_search_fuzzy_fallback_without_deletion_index(spark, fuzzy_index):
    """Generations published before deletions.parquet existed fall back
    to a threshold-Levenshtein-bounded df_stats scan + the same OSA
    verify — results identical to the SymSpell path."""
    import os
    import shutil
    import tempfile

    from docs_indexer_spark.plans.query import IndexReader
    from docs_indexer_spark.sources.catalog import SnapshotCatalog

    cat, _ = fuzzy_index
    # clone the warehouse minus the deletion index
    clone = tempfile.mkdtemp(prefix="wh_nodel_")
    shutil.copytree(cat.root, clone, dirs_exist_ok=True)
    cat2 = SnapshotCatalog(clone)
    gen2 = cat2.generation_path("index")
    shutil.rmtree(os.path.join(gen2, "deletions.parquet"))

    r1 = IndexReader(spark, cat)
    r2 = IndexReader(spark, cat2)
    for q in ["winodw", "windoq", "zzzzqqqq"]:
        a = [(r["doc_id"], round(r["score"], 9))
             for r in r1.search_fuzzy(q, k=5).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in r2.search_fuzzy(q, k=5).collect()]
        assert a == b, q
    r1.close()
    r2.close()
    shutil.rmtree(clone)


def test_expansion_caps(spark, fuzzy_index):
    """Lucene max_expansions (default 50): a short prefix expands to the
    top-df terms only — the expansion a 10⁸-term vocabulary would
    otherwise flood the driver with is capped BEFORE the collect."""
    from docs_indexer_spark.plans.query import IndexReader

    cat, _ = fuzzy_index
    reader = IndexReader(spark, cat)
    # the single top-df s-term, found independently
    top = (
        reader.df_stats.filter(F.col("term").startswith("s"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(1)
        .collect()[0]["term"]
    )
    capped = [(r["doc_id"], round(r["score"], 9))
              for r in reader.search_prefix("s", k=5,
                                            max_expansions=1).collect()]
    single = [(r["doc_id"], round(r["score"], 9))
              for r in reader.search(top, k=5, exact=True).collect()]
    assert capped == single and capped
    # uncapped expands wider → different (or equal) result set, but must
    # not error; and fuzzy accepts the cap parameter too
    assert reader.search_prefix("s", k=5).count() == 5
    assert reader.search_fuzzy("winodw", k=3, max_expansions=1).count() == 3
    reader.close()


def test_mlt_parameter_fidelity(spark, fuzzy_index):
    """OpenSearch MLT knobs: min_term_freq drops seed-rare terms,
    min_doc_freq drops corpus-rare terms, max_query_terms caps the query
    set.  Defaults (25/2/5) must behave like OpenSearch — permissive
    settings recover the old max_terms=5 behavior."""
    from docs_indexer_spark.plans.query import IndexReader

    cat, docs = fuzzy_index
    reader = IndexReader(spark, cat)
    # permissive = the pre-round-4 shape (top-5 tf·idf, no df floors)
    rows = reader.more_like_this(
        7, docs, k=10, max_query_terms=5, min_term_freq=1, min_doc_freq=1
    ).collect()
    assert len(rows) == 10 and 7 not in {r["doc_id"] for r in rows}
    # defaults: still non-empty on a natural corpus, seed excluded
    drows = reader.more_like_this(7, docs, k=10).collect()
    assert drows and 7 not in {r["doc_id"] for r in drows}
    # min_term_freq high enough to kill every term → empty, not error
    assert reader.more_like_this(
        7, docs, k=10, min_term_freq=10**6
    ).count() == 0
    # min_doc_freq high enough to kill every term → empty, not error
    assert reader.more_like_this(
        7, docs, k=10, min_doc_freq=10**6
    ).count() == 0
    reader.close()


def test_osa_properties_hypothesis():
    """Property sweep (pure python, no Spark): symmetry, the
    Levenshtein sandwich OSA ≤ lev ≤ 2·OSA, and identity-of-
    indiscernibles over random short strings."""
    import random

    rng = random.Random(11)
    alphabet = "abcd"

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for _ in range(300):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 7)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 7)))
        d = osa_distance(a, b)
        assert d == osa_distance(b, a)
        assert (d == 0) == (a == b)
        lv = lev(a, b)
        assert d <= lv <= 2 * d or (d == lv == 0)


def test_symspell_deletion_neighborhoods_complete_for_osa():
    """The SymSpell candidate join is OSA-COMPLETE: whenever
    OSA(a, b) ≤ d, the depth-d deletion neighborhoods of a and b
    intersect (transpositions included — drop either swapped char from
    both sides).  This is the property that lets search_fuzzy replace a
    vocabulary scan with an equi-join without losing matches."""
    import random

    from docs_indexer_spark.operators.suggest import _deletion_variants

    rng = random.Random(23)
    alphabet = "abcde"

    def mutate(w):
        ops = []
        if w:
            i = rng.randrange(len(w))
            ops += [
                w[:i] + w[i + 1:],                       # delete
                w[:i] + rng.choice(alphabet) + w[i + 1:],  # substitute
            ]
            if i + 1 < len(w):
                ops.append(w[:i] + w[i + 1] + w[i] + w[i + 2:])  # transpose
        i = rng.randrange(len(w) + 1)
        ops.append(w[:i] + rng.choice(alphabet) + w[i:])  # insert
        return rng.choice(ops)

    checked = 0
    for _ in range(400):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        b = mutate(a) if rng.random() < 0.5 else mutate(mutate(a))
        for d in (1, 2):
            if osa_distance(a, b, cap=d) <= d:
                na = set(_deletion_variants(a, d))
                nb = set(_deletion_variants(b, d))
                assert na & nb, (a, b, d)
                checked += 1
    assert checked > 300  # the sweep actually exercised the property
