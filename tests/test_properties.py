"""Property-based tests (hypothesis) for the engine's pure logic — the
positional/selection arithmetic that everything else compiles into. No Spark
session needed, so these run in milliseconds and explore far more of the
input space than the golden tests."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from nimhdfstore_spark.datasets import _flatten, _strides
from nimhdfstore_spark.sources.hdf5 import plan_partitions

# -- hdf5 partition planning -------------------------------------------------


@given(
    nrecords=st.integers(0, 10_000_000),
    chunk=st.integers(1, 100_000),
    target=st.integers(1, 10_000_000),
)
@settings(max_examples=300, deadline=None)
def test_plan_partitions_invariants(nrecords, chunk, target):
    if nrecords // max(chunk, target) > 50_000:
        return  # cap the O(#partitions) verification loop, not the planner
    parts = plan_partitions(nrecords, chunk, target)
    # covering, contiguous, non-empty, chunk-aligned starts
    assert sum(b - a for a, b in parts) == nrecords
    prev = 0
    for a, b in parts:
        assert a == prev and b > a
        assert a % chunk == 0
        prev = b
    if parts:
        assert parts[-1][1] == nrecords
        # every partition except the last reads whole chunks
        for a, b in parts[:-1]:
            assert (b - a) % chunk == 0


# -- row-major stride / linear-index arithmetic ------------------------------


@given(st.lists(st.integers(1, 6), min_size=1, max_size=4))
@settings(max_examples=200)
def test_strides_roundtrip(shape):
    strides = _strides(shape)
    size = math.prod(shape)
    # linear index <-> coordinates is a bijection under these strides
    seen = set()
    for lin in range(min(size, 500)):
        coord = tuple((lin // s) % d for d, s in zip(shape, strides))
        back = sum(c * s for c, s in zip(coord, strides))
        assert back == lin
        seen.add(coord)
    assert len(seen) == min(size, 500)


@given(
    st.integers(1, 30), st.integers(1, 10), st.integers(1, 5), st.integers(1, 5)
)
@settings(max_examples=200)
def test_1d_hyperslab_enumeration(d, count, stride, block):
    # the predicate arithmetic (operators/positional.py) vs direct enumeration
    if block > stride:
        return
    offset = 0
    selected = [
        i for i in range(d)
        if offset <= i < offset + (count - 1) * stride + block
        and (i - offset) % stride < block
    ]
    expected = sorted(
        {offset + c * stride + b for c in range(count) for b in range(block)}
        & set(range(d))
    )
    assert selected == expected


# -- nested-list flatten ------------------------------------------------------


@given(st.lists(st.lists(st.floats(allow_nan=False), min_size=3, max_size=3),
                min_size=1, max_size=5))
@settings(max_examples=100)
def test_flatten_shape_and_order(data):
    flat, shape = _flatten(data)
    assert shape == [len(data), 3]
    assert flat == [x for row in data for x in row]
