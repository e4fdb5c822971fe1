"""Property-based codec gates (hypothesis): every encoder/decoder pair is a
bijection on arbitrary valid inputs, including the grouped/concatenated
variants the vectorized merge relies on. Mirrors the reference's unit-level
list roundtrip tests (RdbListTest, SURVEY.md §5.1) with randomized inputs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_spark.functions import codec

uints = st.lists(
    st.integers(min_value=0, max_value=(1 << 63) - 1), min_size=0, max_size=200
)


@settings(max_examples=200, deadline=None)
@given(uints)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(codec.varbyte_decode(codec.varbyte_encode(arr))) == vals


@settings(max_examples=100, deadline=None)
@given(uints, st.integers(min_value=1, max_value=8))
def test_varbyte_groups_concat_equals_whole(vals, n_groups):
    """Grouped encoding is EXACTLY the per-group slices of one shared pass,
    and the concatenation decodes to the original values."""
    arr = np.array(vals, dtype=np.uint64)
    if arr.size == 0:
        return
    cuts = sorted(
        set([0] + [(i * arr.size) // n_groups for i in range(1, n_groups)])
    )
    gs = np.array(cuts, dtype=np.int64)
    bufs = codec.varbyte_encode_groups(arr, gs)
    assert b"".join(bufs) == codec.varbyte_encode(arr)
    dec, counts = codec.varbyte_decode_concat(bufs)
    assert list(dec) == vals
    assert list(np.cumsum(counts) - counts) == cuts


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=30
        ),
        min_size=1,
        max_size=20,
    )
)
def test_delta_groups_roundtrip(groups):
    sorted_groups = [sorted(g) for g in groups]
    flat = np.array([x for g in sorted_groups for x in g], dtype=np.uint64)
    sizes = np.array([len(g) for g in sorted_groups], dtype=np.int64)
    gs = np.cumsum(sizes) - sizes
    gaps = codec.delta_encode_groups(flat, gs)
    back = codec.delta_decode_groups(gaps, gs)
    assert list(back) == [x for g in sorted_groups for x in g]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10000), min_size=0, max_size=12),
        min_size=1,
        max_size=25,
    ),
    st.randoms(use_true_random=False),
)
def test_permute_segments(segs, rnd):
    flat = np.array([x for s in segs for x in s], dtype=np.int64)
    lens = np.array([len(s) for s in segs], dtype=np.int64)
    perm = list(range(len(segs)))
    rnd.shuffle(perm)
    perm = np.array(perm, dtype=np.int64)
    out = codec.permute_segments(flat, lens, perm)
    expect = [x for i in perm for x in segs[i]]
    assert list(out) == expect


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=10),
        min_size=1,
        max_size=20,
    )
)
def test_positions_roundtrip(pos_lists):
    pos_lists = [sorted(p) for p in pos_lists]
    tfs = np.array([len(p) for p in pos_lists], dtype=np.int64)
    flat = np.array([x for p in pos_lists for x in p], dtype=np.int64)
    buf = codec.encode_positions(tfs, flat)
    back = codec.decode_positions(tfs, buf)
    assert list(back) == list(flat)
