"""Round-trip property tests for posting-block compression (SURVEY §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from docs_indexer_spark.operators.compression import (
    decode_tf_norms,
    delta_decode_doc_ids,
    delta_encode_doc_ids,
    encode_tf_norms,
    varint_decode,
    varint_encode,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=400, unique=True
    )
)
def test_delta_docids_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    assert (delta_decode_doc_ids(delta_encode_doc_ids(arr)) == arr).all()


def test_adversarial_gap_distributions():
    for arr in [
        np.zeros(100, dtype=np.uint64),                      # all-zero
        np.full(10, 2**64 - 1, dtype=np.uint64),             # max values
        np.array([0, 127, 128, 16383, 16384], dtype=np.uint64),  # boundaries
        np.arange(1000, dtype=np.uint64),                    # all-equal gaps
    ]:
        assert (varint_decode(varint_encode(arr)) == arr).all()
    # max-gap docids
    ids = np.array([0, 2**62], dtype=np.int64)
    assert (delta_decode_doc_ids(delta_encode_doc_ids(ids)) == ids).all()
    assert len(varint_encode(np.empty(0, dtype=np.uint64))) == 0
    assert len(varint_decode(b"")) == 0


def test_tf_norms_roundtrip():
    f = np.array([0.0, 0.5, 1.0, 0.123456], dtype=np.float32)
    assert (decode_tf_norms(encode_tf_norms(f)) == f).all()


def test_negative_docids_roundtrip():
    """xxhash64 doc ids are signed; delta coding must wrap modularly."""
    ids = np.array(
        [-9223372036854775000, -7785330373092500946, -5, 3, 9223372036854775000],
        dtype=np.int64,
    )
    assert (delta_decode_doc_ids(delta_encode_doc_ids(ids)) == ids).all()


# ---- winnowing properties (pure-python reference of the Spark operator;
# the Spark/oracle identity is pinned in test_dedup_similarity /
# test_entry_contract — these pin the ALGORITHM's guarantees) ----

def _py_winnow(tokens, k=3, w=4, h=None):
    import hashlib

    def default_h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    h = h or default_h
    if not tokens:
        return set()
    if len(tokens) < k:
        sh = [" ".join(tokens)]
    else:
        sh = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    hs = [h(s) for s in sh]
    if len(hs) >= w:
        return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}
    return {min(hs)}


@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=40),
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=40),
    st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=12),
)
def test_winnowing_shared_run_guarantee(prefix_a, prefix_b, shared):
    """Schleimer et al. Theorem: any shared token run of length
    ≥ k + w - 1 (= 6 at k=3, w=4) between two documents yields at least
    one SHARED fingerprint, wherever the run sits in each document."""
    doc_a = list(prefix_a) + list(shared)
    doc_b = list(prefix_b) + list(shared) + ["z"]
    fa, fb = _py_winnow(doc_a), _py_winnow(doc_b)
    assert fa & fb


@given(st.lists(st.sampled_from("abcdefghij"), min_size=7, max_size=120))
def test_winnowing_density_and_subset(tokens):
    """Fingerprints are a subset of the shingle hashes and at most one
    per window position."""
    fps = _py_winnow(tokens)
    sh = [" ".join(tokens[i:i + 3]) for i in range(len(tokens) - 2)]
    import hashlib
    all_h = {int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh}
    assert fps <= all_h
    assert 1 <= len(fps) <= max(1, len(sh) - 4 + 1)
