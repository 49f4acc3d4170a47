"""Property-style tests for the round-2 operators, run against small Spark
frames: sampling must be invariant to physical partitioning, the bucketized
interval join must equal the brute-force BETWEEN join, and connected
components must match a plain union-find — each across randomized inputs
(seeded, so failures replay)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nimhdfstore_spark.operators import sampling as SA
from nimhdfstore_spark.operators.dedup import connected_components
from nimhdfstore_spark.operators.interval import interval_join


def test_hash_sample_invariant_to_partitioning(spark):
    base = spark.range(0, 5000).select(F.col("id"))
    expected = {r.id for r in SA.hash_sample(base, "id", 0.2).collect()}
    assert 700 <= len(expected) <= 1300  # ~20%, hash-uniformity sanity
    for parts in (1, 7, 64):
        shuffled = base.repartition(parts)
        got = {r.id for r in SA.hash_sample(shuffled, "id", 0.2).collect()}
        assert got == expected  # identical SET, not just size
    # salt decorrelates
    other = {r.id for r in SA.hash_sample(base, "id", 0.2, salt=3).collect()}
    assert other != expected


def test_fixed_size_sample_deterministic_and_exact(spark):
    base = spark.range(0, 3000)
    a = [r.id for r in SA.fixed_size_hash_sample(base, "id", 50).collect()]
    b = [r.id for r in
         SA.fixed_size_hash_sample(base.repartition(13), "id", 50).collect()]
    assert len(a) == 50 and a == b


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_interval_join_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    intervals = [
        (rng.randrange(3), rng.randrange(0, 900), rng.randrange(0, 120))
        for _ in range(60)
    ]
    iv = spark.createDataFrame(
        [(k, s, s + w) for k, s, w in intervals], "k long, s long, e long"
    )
    pts = spark.createDataFrame(
        [(rng.randrange(3), rng.randrange(0, 1100)) for _ in range(300)],
        "k long, p long",
    )
    got = sorted(
        (r.k, r.p, r.s, r.e)
        for r in interval_join(pts, iv, "p", "s", "e", on=["k"], bucket=37).collect()
    )
    brute = sorted(
        (r.k, r.p, r.s, r.e)
        for r in pts.alias("a").join(
            iv.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.p") >= F.col("b.s"))
            & (F.col("a.p") <= F.col("b.e")),
        ).select(F.col("a.k").alias("k"), "p", "s", "e").collect()
    )
    assert got == brute and len(brute) > 0


@pytest.mark.parametrize("seed", [10, 11])
def test_connected_components_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 80
    edges = sorted({
        tuple(sorted(rng.sample(range(n), 2))) for _ in range(60)
    })
    # reference union-find
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for i in range(n):
        root = find(i)
        want[i] = min(j for j in range(n) if find(j) == root)

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    # driver_max_edges=0 forces the distributed min-label-propagation path
    # (the default fast path IS a union-find, which would test nothing);
    # then the fast path must agree with it exactly.
    got = {
        r.id: r.comp
        for r in connected_components(
            pairs, nodes, driver_max_edges=0
        ).collect()
    }
    assert got == want
    fast = {r.id: r.comp for r in connected_components(pairs, nodes).collect()}
    assert fast == want


def test_hash_sample_handles_negative_ids(spark):
    base = spark.createDataFrame(
        [(i,) for i in range(-2000, 2000)], "id long"
    )
    kept = SA.hash_sample(base, "id", 0.2).collect()
    neg = sum(1 for r in kept if r.id < 0)
    pos = sum(1 for r in kept if r.id >= 0)
    # both halves sampled at ~20%, not "all negatives kept"
    assert 250 <= neg <= 550 and 250 <= pos <= 550


def test_rowid_tie_breaking_matches_duckdb(spark, sf_dir):
    # lineitem's canonical key is NOT unique (~24% of keys repeat with
    # distinct rows); both rowid strategies must number ties in input file
    # order — exactly what DuckDB's row_number does — or every positional
    # oracle with tied keys would hash-mismatch.
    import duckdb

    from nimhdfstore_spark.rowid import with_rowid

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = ["l_orderkey", "l_linenumber"]

    def as_map(df):
        return {
            (r.l_orderkey, r.l_linenumber, r.l_partkey): r._rowid
            for r in df.select("_rowid", "l_partkey", *keys).collect()
        }

    offsets = as_map(with_rowid(li, keys, strategy="offsets"))
    window = as_map(with_rowid(li, keys, strategy="window"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW li AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    duck = {
        (int(r.l_orderkey), int(r.l_linenumber), int(r.l_partkey)): int(r.r)
        for r in con.execute(
            "SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1"
            " AS r, l_orderkey, l_linenumber, l_partkey FROM li"
        ).df().itertuples()
    }
    assert offsets == window == duck


def test_rowid_rank_set_correct_on_duplicate_keys(spark, sf_dir):
    # ranks must equal the global window rank for every UNIQUE key even
    # though the canonical key has duplicates; duplicate groups must own
    # exactly their contiguous rank range
    from nimhdfstore_spark.rowid import with_rowid

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = ["l_orderkey", "l_linenumber"]
    off = with_rowid(li, keys, strategy="offsets")
    grp = off.groupBy(*keys).agg(
        F.min("_rowid").alias("lo"), F.max("_rowid").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    # each key group's rowids are contiguous: hi - lo + 1 == n
    bad = grp.where(F.col("hi") - F.col("lo") + 1 != F.col("n")).count()
    assert bad == 0


def test_morton_code_bijective_on_grid(spark):
    # z-codes over an 8-bit x 8-bit grid must be a bijection onto
    # [0, 2^16) — interleave loses nothing and collides nowhere
    from nimhdfstore_spark.operators.zorder import morton_code

    grid = spark.range(256 * 256).select(
        (F.col("id") / 256).cast("long").alias("a"),
        (F.col("id") % 256).alias("b"),
    )
    z = grid.select(morton_code("a", "b", bits=8).alias("z"))
    stats = z.agg(
        F.countDistinct("z").alias("n"), F.min("z").alias("lo"), F.max("z").alias("hi")
    ).collect()[0]
    assert (stats.n, stats.lo, stats.hi) == (65536, 0, 65535)


def test_morton_code_locality(spark):
    # adjacent cells differ by small z-distance ON AVERAGE vs random pairs —
    # the clustering property; deterministic check: neighbors share the
    # high bits when both coordinates share their high bits
    from nimhdfstore_spark.operators.zorder import morton_code

    pts = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a long, b long"
    )
    rows = pts.select("a", "b", morton_code("a", "b", bits=4).alias("z")).collect()
    zmap = {(r.a, r.b): r.z for r in rows}
    # cells in the same 4x4 block share z >> 4
    for a in range(16):
        for b in range(16):
            assert zmap[(a, b)] >> 4 == zmap[(a & ~3, b & ~3)] >> 4


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    offset=st.integers(0, 40),
    count=st.integers(1, 10),
    stride=st.integers(1, 8),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_hyperslab_predicate_matches_set_semantics(
    spark, offset, count, stride, data
):
    # independent formulation: the selected rowids are exactly
    # {offset + i*stride + j | i < count, j < block}
    from nimhdfstore_spark.operators.positional import hyperslab

    block = data.draw(st.integers(1, stride))
    n = 120
    expected = {
        offset + i * stride + j
        for i in range(count)
        for j in range(block)
        if offset + i * stride + j < n
    }
    got = {
        r.id
        for r in spark.range(n)
        .withColumnRenamed("id", "_rowid")
        .where(hyperslab(offset, count, stride, block))
        .withColumnRenamed("_rowid", "id")
        .collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_pack_blocks_matches_python_reference(spark, seed):
    # random token counts (incl. zeros), random sparse ids; the two-phase
    # distributed prefix sum must equal a sequential scan exactly
    rng = random.Random(seed)
    ids = sorted(rng.sample(range(10_000), 300))
    rows = [(i, rng.choice([0, 1, 3, 17, 256, 999])) for i in ids]
    from nimhdfstore_spark.operators.packing import pack_blocks

    df = spark.createDataFrame(rows, ["doc_id", "ntok"]).repartition(7)
    got = {
        r["doc_id"]: (r["start_token"], r["first_block"], r["last_block"], r["n_blocks"])
        for r in pack_blocks(df, "doc_id", F.col("ntok"),
                             block_size=128, bucket_size=13).collect()
    }
    run = 0
    for i, n in rows:
        if n == 0:
            assert got[i] == (run, -1, -1, 0), f"doc {i}"
        else:
            first, last = run // 128, (run + n - 1) // 128
            assert got[i] == (run, first, last, last - first + 1), f"doc {i}"
        run += n
    assert len(got) == len(rows)


@pytest.mark.parametrize("seed", [21, 22])
def test_temperature_sample_matches_python_reference(spark, seed):
    # exact-arithmetic contract: thresholds and the kept SET are reproducible
    # from pure Python ints/floats, independent of partitioning
    import math

    rng = random.Random(seed)
    rows = [(i, rng.choice("abcde"[: rng.randint(2, 5)])) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "grp"]).repartition(11)

    counts: dict[str, int] = {}
    for _, g in rows:
        counts[g] = counts.get(g, 0) + 1
    r = {g: math.floor(math.sqrt(float(n))) for g, n in counts.items()}
    n_total, r_total = sum(counts.values()), sum(r.values())
    s = {g: min(counts[g], (n_total // 2) * r[g] // r_total) for g in counts}
    t = {g: math.floor(s[g] / counts[g] * (1 << 32)) for g in counts}

    def pyhash(i: int, salt: int) -> int:
        m = 1 << 32
        h = (i % m + m) % m
        h ^= (salt * 40503 + 17) % m
        h = h * 40503 % m
        h = (h ^ (h // 65536)) * 65599 % m
        return h

    expected = {i for i, g in rows if pyhash(i, 5) < t[g]}
    got = {r_["id"] for r_ in
           SA.temperature_sample(df, "grp", "id", budget_den=2, salt=5).collect()}
    assert got == expected

    th = {r_["grp"]: (r_["n_g"], r_["s_g"], r_["t_g"]) for r_ in
          SA.temperature_thresholds(df, "grp", 2).collect()}
    assert th == {g: (counts[g], s[g], t[g]) for g in counts}


@pytest.mark.parametrize("seed", [31, 32])
def test_doc_shingles_match_python_reference(spark, seed):
    import re

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
        for i in range(60)
    ]
    from nimhdfstore_spark.operators.decontam import doc_shingles

    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(5)
    got: dict[int, set] = {}
    for r in doc_shingles(df, "doc_id", "text", n=3).collect():
        got.setdefault(r["doc_id"], set()).add(r["gram"])
    for i, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        want = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
        assert got.get(i, set()) == want, f"doc {i}"


@pytest.mark.parametrize("seed", [41])
def test_byte_stats_match_python_reference(spark, seed):
    from collections import Counter

    from nimhdfstore_spark.operators.multimodal import byte_stats, pack_binary

    rng = random.Random(seed)
    rows = [(i, "".join(chr(rng.randint(97, 103)) for _ in range(rng.randint(1, 50))))
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(3)
    got = {r["doc_id"]: r for r in
           byte_stats(pack_binary(df, "doc_id", "text")).collect()}
    for i, text in rows:
        c = Counter(text.encode("utf-8"))
        n = sum(c.values())
        modal_cnt = max(c.values())
        modal_byte = format(min(b for b, k in c.items() if k == modal_cnt), "02X")
        r = got[i]
        assert r["n_bytes"] == n and r["n_distinct_bytes"] == len(c)
        assert (r["modal_byte"], r["modal_count"]) == (modal_byte, modal_cnt)
        # HALF_UP like Spark/DuckDB ROUND — python round() is banker's
        from decimal import ROUND_HALF_UP, Decimal

        want_cp = float(
            Decimal(sum(k * k for k in c.values()) / (n * n)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert r["collision_prob"] == want_cp


@pytest.mark.parametrize("seed", [51])
def test_salted_join_equals_plain_join(spark, seed):
    from nimhdfstore_spark.operators.skew import salted_join

    rng = random.Random(seed)
    fact_rows = [(rng.choice([7, 7, 7, 7, 11, 13]), i) for i in range(500)]
    dim_rows = [(7, "hot"), (11, "warm"), (13, "cold"), (99, "unmatched")]
    f = spark.createDataFrame(fact_rows, ["k", "rid"]).repartition(6)
    d = spark.createDataFrame(dim_rows, ["dk", "label"])
    got = sorted(
        (r["k"], r["rid"], r["label"])
        for r in salted_join(f, d, "k", "dk", salt_col=F.col("rid"),
                             num_salts=4).collect()
    )
    want = sorted(
        (k, i, {7: "hot", 11: "warm", 13: "cold"}[k]) for k, i in fact_rows
    )
    assert got == want  # exactly one dim match per fact row, none lost/duped


# --------------------------------------------------------------------------
# Engine-parity properties for the sketch hash family: a pure-Python twin
# of sample_hash / the Bloom bitmap is compared against the DuckDB SQL
# fragments for RANDOM ids (negative, huge) and salts — this is the
# arithmetic every sketch query's oracle equality rests on, checked without
# spinning Spark jobs per example.
# --------------------------------------------------------------------------

import duckdb as _duck

from nimhdfstore_spark.queries.sampling import _h as _sql_h

_M32 = 1 << 32


def _py_h(x: int, salt: int = 0) -> int:
    h = ((x % _M32) + _M32) % _M32
    h = h ^ ((salt * 40503 + 17) % _M32)
    h = h * 40503 % _M32
    h = (h ^ (h // 65536)) * 65599 % _M32
    return h


@given(
    ids=st.lists(st.integers(-(1 << 62), 1 << 62), min_size=1, max_size=20),
    salt=st.integers(0, 300),
)
@settings(max_examples=100, deadline=None)
def test_sql_hash_matches_python_twin(ids, salt):
    con = _duck.connect()
    try:
        vals = ", ".join(f"({v})" for v in ids)
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {_sql_h('x', salt=salt)} FROM (VALUES {vals}) t(x)"
            ).fetchall()
        ]
    finally:
        con.close()
    assert got == [_py_h(v, salt) for v in ids]


@given(
    members=st.sets(st.integers(-(1 << 40), 1 << 40), min_size=1, max_size=30),
)
@settings(max_examples=50, deadline=None)
def test_bloom_bitmap_sql_twin_no_false_negative(members):
    """The 63-bit-word bitmap arithmetic, as emitted into the x113 oracle,
    must flag every true member for arbitrary (incl. negative) keys."""
    from nimhdfstore_spark.operators.sketches import BLOOM_K, BLOOM_M_BITS, BLOOM_SALT0

    # python bitmap
    words: dict[int, int] = {}
    for x in members:
        for i in range(BLOOM_K):
            pos = _py_h(x, BLOOM_SALT0 + i) % BLOOM_M_BITS
            words[pos // 63] = words.get(pos // 63, 0) | (1 << (pos % 63))
    for x in members:
        assert all(
            (words.get(
                (_py_h(x, BLOOM_SALT0 + i) % BLOOM_M_BITS) // 63, 0
            ) >> ((_py_h(x, BLOOM_SALT0 + i) % BLOOM_M_BITS) % 63)) & 1
            for i in range(BLOOM_K)
        )
    # duckdb twin over the same members
    con = _duck.connect()
    try:
        vals = ", ".join(f"({v})" for v in members)
        unions = " UNION ALL ".join(
            f"SELECT ({_sql_h('x', salt=BLOOM_SALT0 + i)}) % {BLOOM_M_BITS} AS pos "
            f"FROM m"
            for i in range(BLOOM_K)
        )
        n_missed = con.execute(f"""
            WITH m AS (SELECT x FROM (VALUES {vals}) t(x)),
            pos AS ({unions}),
            bitmap AS (SELECT pos // 63 AS word,
                              bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS bits
                       FROM pos GROUP BY 1),
            probe AS ({" UNION ALL ".join(
                f"SELECT x, ({_sql_h('x', salt=BLOOM_SALT0 + i)}) % {BLOOM_M_BITS} AS pos FROM m"
                for i in range(BLOOM_K))}),
            hits AS (SELECT p.x,
                            MIN((COALESCE(b.bits, 0) >> CAST(p.pos % 63 AS INT)) & 1) AS hit
                     FROM probe p LEFT JOIN bitmap b ON p.pos // 63 = b.word
                     GROUP BY p.x)
            SELECT COUNT(*) FROM hits WHERE hit = 0
        """).fetchone()[0]
    finally:
        con.close()
    assert n_missed == 0


# -- round-4 operators -------------------------------------------------------

def _py_sample_hash(i: int, salt: int = 0) -> int:
    m = 1 << 32
    h = ((i % m) + m) % m
    h ^= (salt * 40503 + 17) % m
    h = h * 40503 % m
    h = (h ^ (h // 65536)) * 65599 % m
    return h


@pytest.mark.parametrize("seed", [1, 2])
def test_hll_registers_match_python_reference(spark, seed):
    """The Spark HLL register table must equal a pure-Python twin computed
    from the same hash family — partitioning-independent, duplicate-
    insensitive."""
    from nimhdfstore_spark.operators import sketches as SK

    rng = random.Random(seed)
    ids = [rng.randrange(-(10**12), 10**12) for _ in range(4000)]
    m, wbits, salt = SK.HLL_M, SK.HLL_WBITS, SK.HLL_SALT
    expected: dict[int, int] = {}
    for i in ids:
        h = _py_sample_hash(i, salt)
        idx, w = h % m, h // m
        rank = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
        expected[idx] = max(expected.get(idx, 0), rank)
    df = spark.createDataFrame([(i,) for i in ids], "k long").repartition(9)
    got = {r.idx: r.m_j for r in SK.hll_registers(df, "k").collect()}
    assert got == expected


@pytest.mark.parametrize("seed", [5, 6])
def test_chunk_tokens_matches_python_reference(spark, seed):
    from nimhdfstore_spark.operators.text import chunk_tokens

    rng = random.Random(seed)
    docs = [
        (d, " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randrange(0, 130))))
        for d in range(30)
    ]
    size, overlap = 20, 5
    stride = size - overlap
    expected = set()
    for d, text in docs:
        toks = [t for t in text.split(" ") if t]
        for ci, s in enumerate(range(0, len(toks), stride)):
            chunk = toks[s:s + size]
            expected.add((d, ci, len(chunk), " ".join(chunk)))
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
    got = {
        (r.id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_tokens(df, "doc_id", "text", size, overlap).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [11, 12])
def test_grouped_fixed_k_sample_matches_python_reference(spark, seed):
    from nimhdfstore_spark.operators.sampling import grouped_fixed_size_hash_sample

    rng = random.Random(seed)
    rows = [(rng.randrange(4), i) for i in range(600)]
    k, salt = 7, 3
    by_group: dict[int, list[int]] = {}
    for g, i in rows:
        by_group.setdefault(g, []).append(i)
    expected = set()
    for g, ids in by_group.items():
        keep = sorted(ids, key=lambda i: (_py_sample_hash(i, salt), i))[:k]
        expected.update((g, i) for i in keep)
    df = spark.createDataFrame(rows, "g long, id long").repartition(11)
    got = {
        (r.g, r.id)
        for r in grouped_fixed_size_hash_sample(df, "id", "g", k, salt=salt).collect()
    }
    assert got == expected


def test_histogram_quantiles_bound_exact_quantiles(spark):
    """Histogram estimates must bracket the true value within one bin
    width, and the bin table must merge additively (the mergeable-sketch
    property)."""
    from nimhdfstore_spark.operators import sketches as SK

    vals = [(float(i * i % 997),) for i in range(5000)]
    df = spark.createDataFrame(vals, "v double")
    width = 16.0
    bins = SK.histogram_bins(df, "v", width)
    qs = [0.25, 0.5, 0.9]
    est = {r.quantile: r.est_value
           for r in SK.histogram_quantiles(bins, width, qs).collect()}
    import statistics
    raw = sorted(v for (v,) in vals)
    for q in qs:
        exact = raw[int(q * len(raw)) - 1]
        assert abs(est[q] - exact) <= width, (q, est[q], exact)
    # mergeability: half-and-half histograms sum to the full histogram
    h1 = SK.histogram_bins(df.where("v < 500"), "v", width)
    h2 = SK.histogram_bins(df.where("v >= 500"), "v", width)
    merged = (
        h1.unionByName(h2).groupBy("b").agg(F.sum("cnt").alias("cnt"))
    )
    full = {r.b: r.cnt for r in bins.collect()}
    assert {r.b: r.cnt for r in merged.collect()} == full


@pytest.mark.parametrize("seed", [21, 22])
def test_triangle_count_matches_bruteforce(spark, seed):
    from itertools import combinations

    from nimhdfstore_spark.operators.graph import triangle_count

    rng = random.Random(seed)
    nodes = list(range(25))
    edges = {
        tuple(sorted(rng.sample(nodes, 2)))
        for _ in range(90)
    }
    adj: dict[int, set[int]] = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    expected: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    df = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "u long, v long",
    ).repartition(5)
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == expected
