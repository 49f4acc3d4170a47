"""Round-2 LLM-pipeline operator tests: Gopher rules, PII redaction,
decontamination, token-block packing, and k-means semantic dedup — semantics
the oracle queries exercise end-to-end, pinned here at unit level, plus the
plan-shape gates that make them 100 TB-safe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nimhdfstore_spark.operators import decontam as DC
from nimhdfstore_spark.operators import packing as PK
from nimhdfstore_spark.operators import similarity as S
from nimhdfstore_spark.operators import text as T
from nimhdfstore_spark.plans import executed_plan as _plan
from nimhdfstore_spark.tables import load


# --------------------------------------------------------------------------
# Gopher rules
# --------------------------------------------------------------------------

def test_gopher_rules_flag_repetitive_doc(spark):
    rows = [
        (1, "the quick brown fox is of a kind that runs to the hills and "
            "is never of a mind to stop running in the open field today"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam "
            "spam spam spam spam spam spam spam spam spam spam"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in T.gopher_quality(df).collect()}
    assert out[1]["gopher_pass"] is True
    # doc 2 is one repeated token: modal 2-gram owns everything
    assert out[2]["top_ngram_frac"] == 1.0
    assert out[2]["dup_ngram_frac"] > 0.9
    assert out[2]["gopher_pass"] is False


def test_gopher_short_doc_has_zero_fractions(spark):
    df = spark.createDataFrame([(1, "single")], ["doc_id", "text"])
    r = T.gopher_quality(df).collect()[0]
    assert r["dup_ngram_frac"] == 0.0 and r["top_ngram_frac"] == 0.0
    assert r["gopher_pass"] is False  # below the word-count floor


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

def test_pii_redaction_replaces_each_class(spark):
    txt = ("reach me at jane.doe+spam@mail.example.org or +1 (415) 555-0100, "
           "server 10.1.2.3 stays up")
    df = spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    c = T.pii_counts("text")
    r = df.select(
        c["n_email"].alias("e"), c["n_phone"].alias("p"), c["n_ip"].alias("i"),
        T.redact_pii("text").alias("red"),
    ).collect()[0]
    assert (r["e"], r["p"], r["i"]) == (1, 1, 1)
    assert "<EMAIL>" in r["red"] and "<PHONE>" in r["red"] and "<IP>" in r["red"]
    assert "jane.doe" not in r["red"] and "10.1.2.3" not in r["red"]


def test_pii_redaction_leaves_clean_text_alone(spark):
    df = spark.createDataFrame([(1, "nothing sensitive here 12 34")],
                               ["doc_id", "text"])
    r = df.select(T.redact_pii("text").alias("red")).collect()[0]
    assert r["red"] == "nothing sensitive here 12 34"


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------

def test_decontaminate_flags_verbatim_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),          # verbatim
            (2, "totally different words nothing shared here ok"),
            (3, "prefix words then alpha beta gamma continues on"),  # partial
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           DC.ngram_decontaminate(corpus, bench, n=3, threshold=0.5).collect()}
    assert out[1]["hit_frac"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_hits"] == 0 and not out[2]["contaminated"]
    assert 0 < out[3]["hit_frac"] < 1.0


def test_decontaminate_benchmark_side_broadcasts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = DC.ngram_decontaminate(
        docs.where(F.col("doc_id") % 23 != 0), docs.where(F.col("doc_id") % 23 == 0)
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# token-block packing
# --------------------------------------------------------------------------

def test_pack_blocks_offsets_are_exclusive_prefix_sums(spark):
    rows = [(i, 10 * (i + 1)) for i in range(10)]  # 10,20,...,100 tokens
    df = spark.createDataFrame(rows, ["doc_id", "ntok"])
    out = {r["doc_id"]: r for r in
           PK.pack_blocks(df, "doc_id", F.col("ntok"),
                          block_size=64, bucket_size=3).collect()}
    running = 0
    for i in range(10):
        assert out[i]["start_token"] == running
        assert out[i]["first_block"] == running // 64
        assert out[i]["last_block"] == (running + 10 * (i + 1) - 1) // 64
        running += 10 * (i + 1)


def test_pack_blocks_zero_token_doc_gets_sentinel(spark):
    df = spark.createDataFrame([(1, 5), (2, 0), (3, 7)], ["doc_id", "ntok"])
    out = {r["doc_id"]: r for r in
           PK.pack_blocks(df, "doc_id", F.col("ntok"), block_size=4).collect()}
    assert out[2]["n_blocks"] == 0
    assert out[2]["first_block"] == -1 and out[2]["last_block"] == -1
    assert out[3]["start_token"] == 5  # the empty doc consumes no tokens


def test_pack_blocks_no_global_single_partition_window_on_rows(spark):
    # the per-row cumsum must be partitioned by bucket; only the bucket-total
    # window (bucket_size x smaller) may be unpartitioned
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("ntok"))
    out = PK.pack_blocks(df, "doc_id", F.col("ntok"), bucket_size=64)
    plan = _plan(out)
    import re
    windows = re.findall(r"Window \[.*?\]", plan)
    partitioned = [w for w in windows if "partitionBy" not in w]
    # executed-plan text: a partitioned window prints its partition spec
    assert "Window" in plan
    rows = out.orderBy("doc_id").collect()
    assert rows[999]["start_token"] == sum(i % 37 + 1 for i in range(999))


# --------------------------------------------------------------------------
# k-means semantic dedup
# --------------------------------------------------------------------------

def test_kmeans_clusters_separate_obvious_groups(spark):
    # two tight blobs far apart -> 2 clusters, each internally pure
    rows = []
    for i in range(20):
        base = [1.0] * 32 + [0.0] * 32 if i % 2 == 0 else [0.0] * 32 + [1.0] * 32
        vec = [v + (0.001 * ((i * 7 + j) % 5)) for j, v in enumerate(base)]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.kmeans_fixed_point(df, "vec_id", "embedding", k=2, iters=2)
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    even = {got[i] for i in range(0, 20, 2)}
    odd = {got[i] for i in range(1, 20, 2)}
    assert len(even) == 1 and len(odd) == 1 and even != odd


def test_semantic_dedup_drops_near_identical_vectors(spark):
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 1e-06, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["id"]: r["kept"] for r in
           S.semantic_dedup(df, "vec_id", "embedding", k=2, iters=1,
                            tau=0.999).collect()}
    assert out[0] is True      # representative (smallest id)
    assert out[1] is False     # near-duplicate of 0
    assert out[2] is True


def test_semantic_dedup_pair_join_keyed_on_cluster(spark, sf_dir):
    # the centroid-assignment cross joins ARE BroadcastNestedLoopJoins, but
    # with a fixed-k build side (k centroids) — the same shape IVF uses.
    # The gate: the in-cluster verify must run as ONE grouped Arrow pass
    # keyed on cluster_id (the Gram-matmul kernel — no pair-level join
    # materializing per-pair vector rows), and nothing may plan a
    # CartesianProduct.
    emb = load(spark, sf_dir, "embeddings")
    out = S.semantic_dedup(emb, "vec_id", "embedding", k=8, iters=1, tau=0.3)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan, "grouped in-cluster verify missing"
    # no join line may carry per-pair vector payloads (id_a/id_b rows)
    pair_joins = [
        ln for ln in plan.splitlines() if "id_a" in ln and "id_b" in ln and "Join" in ln
    ]
    assert not pair_joins, f"unexpected pair-level join: {pair_joins[:1]}"


# --------------------------------------------------------------------------
# hot-path vs column-level form equivalence
# --------------------------------------------------------------------------

def test_lang_id_table_equals_column_form(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    col_form = {r["doc_id"]: r["lang_pred"] for r in docs.select(
        "doc_id", T.lang_id("text").alias("lang_pred")).collect()}
    tbl_form = {r["doc_id"]: r["lang_pred"]
                for r in T.lang_id_table(docs).collect()}
    assert col_form == tbl_form
