"""Round-6 additions: exact kNN graph, k-anonymity audit, and the
vectorized dedup kernels' exactness pins."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from nimhdfstore_spark.operators import dedup as D
from nimhdfstore_spark.operators import similarity as S


def test_knn_graph_planted_neighbors(spark):
    # 3 tight clusters of 3 around orthogonal axes: each vector's 2 nearest
    # must be its cluster mates, ranked above everything cross-cluster
    rows = []
    vid = 0
    for axis in range(3):
        for jitter in (0.0, 0.01, -0.01):
            v = [0.0] * 8
            v[axis] = 1.0
            v[(axis + 3) % 8] = jitter
            rows.append((vid, v))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = S.knn_graph(df, "vec_id", "embedding", k=2, dims=8).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.vec_id, []).append(r.neighbor_id)
    assert len(by_src) == 9
    for src, nbrs in by_src.items():
        cluster = src // 3
        assert all(n // 3 == cluster for n in nbrs), (src, nbrs)
        assert len(nbrs) == 2


def test_knn_graph_rank_deterministic_on_ties(spark):
    # identical vectors -> identical cosines; rank ties must break by
    # ascending neighbor id on every run
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = S.knn_graph(df, "vec_id", "embedding", k=3, dims=4).collect()
    for r in got:
        expect = [n for n in range(5) if n != r.vec_id][r.rank - 1]
        assert r.neighbor_id == expect
        assert r.cosine == 1.0


def test_knn_graph_matches_bruteforce_python(spark, sf_dir):
    # pin the whole operator against a direct python recompute at sf0.001
    from nimhdfstore_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    q = {
        i: [math.floor(x * (1 << 20) + 0.5) if x >= 0 else math.ceil(x * (1 << 20) - 0.5) for x in v]
        for i, v in vecs.items()
    }

    def cos(a, b):
        da = sum(x * x for x in q[a])
        db = sum(x * x for x in q[b])
        dd = sum(x * y for x, y in zip(q[a], q[b]))
        return dd / (math.sqrt(da) * math.sqrt(db))

    got = S.knn_graph(emb, "vec_id", "embedding", k=3).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id))
    for src, ranked in by_src.items():
        want = sorted(
            (o for o in vecs if o != src), key=lambda o: (-cos(src, o), o)
        )[:3]
        assert [n for _, n in sorted(ranked)] == want, src


def test_k_anonymity_flags(spark, sf_dir):
    from nimhdfstore_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["x176_k_anonymity"](spark, sf_dir).collect()
    assert rows, "audit must produce equivalence classes"
    for r in rows:
        assert r.k_at_risk == (r.class_size < 5)
        assert r.l_at_risk == (r.n_sources < 2)
        assert r.n_sources <= r.class_size


def test_minhash_buckets_match_sql_shape(spark):
    # the vectorized signature must equal the documented formulas on a
    # hand-computable doc: poly hash of each 3-gram, affine min
    docs = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    got = D.minhash_buckets(docs, "doc_id", "text", n=3, num_hashes=4, bands=2)
    rows = got.collect()
    assert len(rows) == 2  # one per band
    grams = ["abc", "bcd"]

    def ph(g):
        acc = 0
        for c in g:
            acc = (acc * 31 + ord(c)) % 1_000_000_007
        return acc

    pgs = [ph(g) for g in grams]
    want_sig = [
        min((p * a + b) % 1_000_000_007 for p in pgs)
        for a, b in D.minhash_coeffs(4)
    ]
    assert rows[0].sig == want_sig
    for r in rows:
        s = want_sig[r.band * 2 : r.band * 2 + 2]
        acc = 0
        for v in s:
            acc = (acc * 31 + v) % 1_000_000_007
        assert r.bucket == acc


def test_hyperplane_bits_table_empty_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.5] * 64)], "vec_id long, embedding array<double>"
    ).where(F.col("vec_id") < 0)
    assert D.hyperplane_bits_table(df, "vec_id", "embedding").count() == 0


# --------------------------------------------------------------------------
# property: the vectorized (numpy) minhash kernel equals a from-scratch
# pure-python recompute of the documented formulas on arbitrary text,
# including unicode, empty, and shorter-than-n strings
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_MOD, _MUL = 1_000_000_007, 31


def _py_minhash(text: str, n: int, num_hashes: int):
    t = text.lower()
    if len(t) < n:
        return None
    grams = [t[i : i + n] for i in range(len(t) - n + 1)]
    pgs = []
    for g in grams:
        acc = 0
        for c in g:
            acc = (acc * _MUL + ord(c)) % _MOD
        pgs.append(acc)
    return [
        min((p * a + b) % _MOD for p in pgs) for a, b in D.minhash_coeffs(num_hashes)
    ]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_minhash_buckets_match_python(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.id: r.sig
        for r in D.minhash_buckets(docs, "doc_id", "text", n=3, num_hashes=8, bands=4)
        .select("id", "sig")
        .dropDuplicates(["id"])
        .collect()
    }
    for i, t in enumerate(texts):
        want = _py_minhash(t, 3, 8)
        if want is None:
            assert i not in got
        else:
            assert got[i] == want, (t,)


# --------------------------------------------------------------------------
# fine-grained read policies (q48 surface)
# --------------------------------------------------------------------------


def _policy_store(spark, tmp_path):
    from nimhdfstore_spark.store import Store

    store = Store(spark, str(tmp_path / "polstore"))
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        (F.col("id") % 3).alias("grp"),
    )
    store.put("t", df, order_by=["k"])
    return store


def test_policy_filters_masks_projects_and_persists(spark, tmp_path):
    from nimhdfstore_spark.store import Store

    store = _policy_store(spark, tmp_path)
    store.table("t").set_policy(
        "reader", row_filter="grp = 1", columns=["k", "name"],
        masks={"name": "sha256"},
    )
    # fresh store handle: policy must load from the catalog, not memory
    again = Store(spark, store.root)
    rows = again.table("t").df_as("reader").orderBy("k").collect()
    assert [r.k for r in rows] == [1, 4, 7]
    assert set(rows[0].asDict()) == {"_rowid", "k", "name"}
    import hashlib

    assert rows[0].name == hashlib.sha256(b"name-1").hexdigest()


def test_policy_null_mask_and_owner_access(spark, tmp_path):
    store = _policy_store(spark, tmp_path)
    t = store.table("t")
    t.set_policy("redacted", masks={"name": "null"})
    rows = t.df_as("redacted").orderBy("k").collect()
    assert all(r.name is None for r in rows) and len(rows) == 10
    # principals without a policy read everything unmasked
    full = t.df_as("owner").orderBy("k").collect()
    assert full[0].name == "name-0"


def test_policy_validation_and_drop(spark, tmp_path):
    import pytest as _pytest

    from nimhdfstore_spark.store import StoreError

    store = _policy_store(spark, tmp_path)
    t = store.table("t")
    with _pytest.raises(StoreError):
        t.set_policy("x", columns=["nope"])
    with _pytest.raises(StoreError):
        t.set_policy("x", masks={"name": "rot13"})
    with _pytest.raises(Exception):
        t.set_policy("x", row_filter="this is not an expression !!")
    t.set_policy("x", row_filter="grp = 0")
    assert "x" in t.policies
    t.drop_policy("x")
    assert "x" not in t.policies
    with _pytest.raises(StoreError):
        t.drop_policy("x")


def test_policy_filter_pushes_to_scan(spark, tmp_path):
    from nimhdfstore_spark.plans import executed_plan

    store = _policy_store(spark, tmp_path)
    t = store.table("t")
    t.set_policy("reader", row_filter="k >= 7")
    plan = executed_plan(t.df_as("reader"))
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1], (
        f"policy row filter did not push down:\n{plan[:1500]}"
    )


def test_drain_restores_shuffle_partitions_on_failure(spark):
    from nimhdfstore_spark.streaming.windows import drain

    old = spark.conf.get("spark.sql.shuffle.partitions")

    class Boom:
        def start(self):
            raise RuntimeError("boom")

    try:
        drain(spark, Boom())
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_multiprobe_recall_on_planted_neardups(spark):
    # 60 planted near-identical pairs (cosine ~0.9995): multi-probe with 4
    # wide bands must recover nearly all of them at tau=0.95
    import random

    rng = random.Random(42)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        near = [v + rng.uniform(-0.01, 0.01) for v in base]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, near))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in D.embedding_multiprobe_pairs(
            df, "vec_id", "embedding", threshold=0.95, bands=4
        ).collect()
    }
    hits = sum((2 * i, 2 * i + 1) in got for i in range(60))
    assert hits >= 54, f"multi-probe recall {hits}/60 < 0.9"
