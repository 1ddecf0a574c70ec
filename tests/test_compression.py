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
