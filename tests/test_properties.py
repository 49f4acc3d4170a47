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


# -- deletion-vector composition model (pure Python, no Spark) --------------

from nimhdfstore_spark.store import _logical_to_raw, _merge_ranges


@given(
    st.integers(5, 60),
    st.lists(st.tuples(st.integers(0, 59), st.integers(0, 14)), min_size=1, max_size=8),
)
@settings(max_examples=300, deadline=None)
def test_deletion_vector_matches_list_model(n, deletes):
    # model: raw rows are ints 0..n-1; each delete removes a LOGICAL
    # inclusive range [a, a+k] from the current list
    live = list(range(n))
    dv: list[tuple[int, int]] = []
    for a, k in deletes:
        if not live:
            break
        a = a % len(live)
        b = min(a + k, len(live) - 1)
        new_raw = _logical_to_raw(dv, a, b, raw_total=n)
        # the raw positions mapped must be exactly the list elements removed
        removed = live[a : b + 1]
        flat = [r for lo, hi in new_raw for r in range(lo, hi + 1)]
        assert flat == removed, (dv, a, b, new_raw, removed)
        dv = _merge_ranges(dv + new_raw)
        del live[a : b + 1]
    # final state: dv's complement in 0..n-1 equals the surviving rows
    dead = {r for lo, hi in dv for r in range(lo, hi + 1)}
    assert [r for r in range(n) if r not in dead] == live
    # dv is sorted, disjoint, non-adjacent
    for (a1, b1), (a2, b2) in zip(dv, dv[1:]):
        assert b1 + 1 < a2


# -- h5lite structured round-trip (pure numpy, no Spark) --------------------

_H5_SCALARS = ["<i2", "<i4", "<i8", "<f4", "<f8", "S3", "S9"]


@given(
    st.lists(st.sampled_from(_H5_SCALARS), min_size=1, max_size=5),
    st.integers(0, 200),
    st.integers(0, 7),
)
@settings(max_examples=60, deadline=None)
def test_h5lite_roundtrip_property(codes, nrows, seed):
    import os
    import tempfile

    import numpy as np

    from nimhdfstore_spark.sources import h5lite

    dt = np.dtype([(f"c{i}", c) for i, c in enumerate(codes)])
    rng = np.random.RandomState(seed)
    arr = np.zeros(nrows, dtype=dt)
    for name in dt.names:
        k = dt.fields[name][0].kind
        if k == "i":
            info = np.iinfo(dt.fields[name][0])
            arr[name] = rng.randint(info.min, info.max, size=nrows)
        elif k == "f":
            arr[name] = rng.randn(nrows).astype(dt.fields[name][0])
        else:
            w = dt.fields[name][0].itemsize
            arr[name] = [
                bytes(rng.randint(65, 90, size=rng.randint(0, w + 1)).astype("u1"))
                for _ in range(nrows)
            ]
    fd, path = tempfile.mkstemp(suffix=".h5")
    os.close(fd)
    try:
        h5lite.write(path, {"t": arr})
        back = h5lite.read(path, "t")
        assert back.dtype == arr.dtype
        assert len(back) == nrows
        if nrows:
            for name in dt.names:
                assert (back[name] == arr[name]).all(), name
            lo, hi = nrows // 3, 2 * nrows // 3
            assert (h5lite.read_range(path, "t", lo, hi) == arr[lo:hi]).all()
    finally:
        os.unlink(path)


# -- h5lite round-trip property: random tables × random layouts ------------

_H5_SCALARS = ["<i8", "<i4", "<i2", "<f8", "<f4", "S5"]


@st.composite
def _h5_tables(draw):
    import numpy as np

    ncols = draw(st.integers(1, 4))
    nrows = draw(st.integers(0, 120))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    fields, cols = [], {}
    for c in range(ncols):
        kind = draw(st.sampled_from(_H5_SCALARS + ["vlen_f8", "vlen_i4"]))
        name = f"c{c}"
        if kind.startswith("vlen"):
            base = np.dtype("<f8" if kind == "vlen_f8" else "<i4")
            dt = np.dtype("O", metadata={"vlen": base})
            vals = np.empty(nrows, dtype=object)
            for i in range(nrows):
                k = int(rng.integers(0, 6))
                vals[i] = (rng.integers(-50, 50, size=k)).astype(base)
            fields.append((name, dt))
            cols[name] = vals
        else:
            dt = np.dtype(kind)
            if dt.kind == "S":
                vals = np.array(
                    [f"s{int(v)}".encode()[:5] for v in rng.integers(0, 999, nrows)],
                    dtype=dt,
                ) if nrows else np.empty(0, dtype=dt)
            elif dt.kind == "f":
                vals = rng.normal(size=nrows).astype(dt)
            else:
                vals = rng.integers(-1000, 1000, size=nrows).astype(dt)
            fields.append((name, dt))
            cols[name] = vals
    arr = np.empty(nrows, dtype=np.dtype(fields))
    for name, _dt in fields:
        arr[name] = cols[name]
    chunk = draw(st.sampled_from([None, 7, 40, 1000]))
    comp = draw(st.sampled_from([None, 1, 6])) if chunk else None
    return arr, chunk, comp


@settings(max_examples=40, deadline=None)
@given(_h5_tables(), st.integers(0, 130), st.integers(0, 130))
def test_h5lite_roundtrip_property(table, a, b):
    """write → catalog → read_range == in-memory slice, for random column
    mixes (scalars, strings, vlen) × layouts (contiguous, chunked,
    chunked+gzip) × arbitrary slice bounds."""
    import os
    import tempfile

    import numpy as np

    from nimhdfstore_spark.sources import h5lite

    arr, chunk, comp = table
    if chunk is not None and len(arr) > chunk * 64:
        chunk = -(-len(arr) // 64)
    fd, path = tempfile.mkstemp(suffix=".h5")
    os.close(fd)
    try:
        h5lite.write(path, {"t": arr}, chunk_rows=chunk, compress=comp)
        info = h5lite.catalog(path)["t"]
        assert info["nrows"] == len(arr)
        lo, hi = min(a, b), max(a, b)
        got = h5lite.read_range(path, "t", lo, hi)
        want = arr[lo:min(hi, len(arr))]
        assert len(got) == len(want)
        for name in arr.dtype.names:
            if h5lite._is_vlen(arr.dtype.fields[name][0]):
                for g, w in zip(got[name], want[name]):
                    assert np.asarray(g).tolist() == np.asarray(w).tolist()
            else:
                assert got[name].tolist() == want[name].tolist()
    finally:
        os.unlink(path)
