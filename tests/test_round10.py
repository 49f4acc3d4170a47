"""Round-10 additions (driver round 6):

- Sweep-slot rotation (round-5 verdict ask #1/#8): the driver's external
  correctness sweep verifies only ~50 entries; the extension ordering now
  rotates per round on a persisted counter (count of CORRECTNESS_r*.json
  records) so the ~3 extension slots verify three NEW entries every round.
  Invariants property-pinned here, over the real registry AND hypothesis-
  generated synthetic registries:
    * the frozen 47-entry core is always first, q01 the flagship, for any
      rotation;
    * every rotation yields a permutation of the full registry;
    * consecutive rounds' extension slots are disjoint until the cycle
      wraps, and every extension entry is driver-verified within
      ceil(len(ext)/3) rounds;
    * the rotation index is read from persisted state, not wall clock.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import nimhdfstore_spark.queries as Q

Q.load_all()

N_SLOTS = 3  # extension slots under the driver's ~50-entry cap


def _order(monkeypatch, r: int, verified: str = "") -> list[str]:
    # verified="" pins an EMPTY driver-verified set so the cyclic-shift
    # invariants below stay exact; the verified-aware reordering (round-7
    # verdict ask #2) has its own pins in test_round12_rotation below.
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", str(r))
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", verified)
    return Q.sweep_order()


def test_rotation_env_override_and_persisted_default(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "41")
    assert Q.sweep_rotation() == 41
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_ROTATION")
    # Default = number of archived CORRECTNESS records at the repo root:
    # deterministic persisted state, stable within a round.
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(Q.__file__)))
    root = os.path.dirname(root)
    expected = len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert Q.sweep_rotation() == expected


def test_core_frozen_and_permutation_for_any_rotation(monkeypatch):
    base = _order(monkeypatch, 0)
    core = [n for n in base if n.startswith("q")]
    assert base[: len(core)] == core and base[0] == "q01_full_scan"
    for r in (0, 1, 5, 13, 56, 57, 1000):
        o = _order(monkeypatch, r)
        assert o[: len(core)] == core, "rotation must not touch the core"
        assert sorted(o) == sorted(base), "rotation must permute, not drop"


def test_slots_disjoint_per_round_and_full_coverage(monkeypatch):
    # SWEEP_PRIORITY entries deliberately PIN the front until verified
    # (the round-11 explicit exception, tested in test_round16); this
    # test asserts the underlying rotation machinery in isolation.
    monkeypatch.setattr(Q, "SWEEP_PRIORITY", [])
    base = _order(monkeypatch, 0)
    n_core = sum(n.startswith("q") for n in base)
    ext = len(base) - n_core
    rounds = math.ceil(ext / N_SLOTS)
    seen: set[str] = set()
    prev: set[str] = set()
    for r in range(rounds):
        slots = set(_order(monkeypatch, r)[n_core : n_core + N_SLOTS])
        assert not (slots & prev), f"round {r} repeats round {r-1} slots"
        seen |= slots
        prev = slots
    assert len(seen) == ext, "every extension entry driver-verified in a cycle"


def test_round6_slots_are_new_vs_r05(monkeypatch):
    """The concrete 'done' criterion from the round-5 verdict: a round's
    slots differ from the trio the previous record verified. Round-13
    rewrite (verdict ask #1): the original read the REAL archived state
    and asserted the trio never reaches the front — an invariant that
    expires once the backlog drains (rotation of the verified partition
    legitimately re-offers them) or once staleness re-freshens them.
    Pin the historical r05 state synthetically instead."""
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "5")
    trio = {"x30_dedup_exact", "x156_bfs_hops", "x28_tfidf_terms"}
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(trio))
    monkeypatch.setattr(Q, "SWEEP_PRIORITY", [])
    base = Q.sweep_order()
    n_core = sum(n.startswith("q") for n in base)
    slots = base[n_core : n_core + N_SLOTS]
    assert not set(slots) & trio


@given(
    fam_sizes=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=8),
    n_core=st.integers(min_value=1, max_value=6),
    r=st.integers(min_value=0, max_value=200),
)
# monkeypatch resets per test, not per example — safe here because every
# example overwrites the same attributes before reading anything.
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rotation_invariants_on_synthetic_registries(fam_sizes, n_core, r, monkeypatch):
    queries = {f"q{i:02d}_core": (lambda *a: None) for i in range(1, n_core + 1)}
    queries["q01_full_scan"] = lambda *a: None
    family = {}
    for fi, size in enumerate(fam_sizes):
        for j in range(size):
            name = f"x{fi:02d}{j:02d}_op"
            queries[name] = lambda *a: None
            family[name] = f"fam{fi:02d}"
    monkeypatch.setattr(Q, "QUERIES", queries)
    monkeypatch.setattr(Q, "FAMILY", family)
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", str(r))
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    order = Q.sweep_order()
    assert sorted(order) == sorted(queries)
    core = [n for n in order if n.startswith("q")]
    assert order[: len(core)] == core and order[0] == "q01_full_scan"
    ext = order[len(core):]
    # same rotation → identical order (determinism)
    assert Q.sweep_order() == order
    # rotation is a cyclic shift of the r=0 interleave by 3·r
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "0")
    ext0 = Q.sweep_order()[len(core):]
    s = (3 * r) % len(ext0)
    assert ext == ext0[s:] + ext0[:s]


# --------------------------------------------------------------------------
# capped hot-bucket detection (round-5 verdict nit #1 / ask #3): the
# detection collect is limit(K+1)-bounded; a planted ALL-hot corpus that
# blows past the cap must fall back to uniform splitting and still emit the
# exact pair set; the normal targeted path is untouched.
# --------------------------------------------------------------------------

def _hot_corpus(spark, rng, n_hot=40, n_noise=20):
    base = rng.normal(size=8)
    rows = [(i, [float(x) for x in base + rng.normal(scale=1e-3, size=8)])
            for i in range(n_hot)]
    rows += [(n_hot + i, [float(x) for x in rng.normal(size=8)])
             for i in range(n_noise)]
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_hot_bucket_detection_cap_fallback_exact(spark, monkeypatch):
    import nimhdfstore_spark.operators.dedup as D

    df = _hot_corpus(spark, np.random.default_rng(17))
    kw = dict(threshold=0.8, num_planes=16, bands=4, dims=8,
              hot_bucket_block=7, hot_bucket_split=10)
    want = sorted(map(tuple, D.embedding_lsh_pairs(
        df, "id", "embedding", threshold=0.8, num_planes=16, bands=4,
        dims=8, hot_bucket_block=10_000).collect()))
    # normal targeted path (cap not hit)
    targeted = sorted(map(tuple, D.embedding_lsh_pairs(
        df, "id", "embedding", **kw).collect()))
    assert targeted == want
    # cap forced to 0 surviving rows: every detection result exceeds it →
    # uniform split of EVERY bucket; pair set must be byte-identical
    monkeypatch.setattr(D, "HOT_DETECT_CAP", 0)
    uniform = sorted(map(tuple, D.embedding_lsh_pairs(
        df, "id", "embedding", **kw).collect()))
    assert uniform == want
    assert len(want) >= 40 * 39 // 2  # the planted clique survived
    # tiny uniform S exercises sub-bucket counts smaller than bucket size
    monkeypatch.setattr(D, "HOT_UNIFORM_S", 3)
    uniform3 = sorted(map(tuple, D.embedding_lsh_pairs(
        df, "id", "embedding", **kw).collect()))
    assert uniform3 == want


# --------------------------------------------------------------------------
# stream_incremental_dedup replay safety (ADVICE r5, medium): foreachBatch
# is at-least-once — a micro-batch retried after its index append but
# before checkpoint commit must NOT self-match its own signatures (every
# doc would flag dup at est 1.0), must not grow the index again, and must
# not double-count the verdict log.
# --------------------------------------------------------------------------

def test_ingest_dedup_batch_is_idempotent_under_replay(spark):
    import os

    from nimhdfstore_spark.operators.dedup import minhash_buckets
    from nimhdfstore_spark.queries.core import scratch_store
    from nimhdfstore_spark.streaming.windows import _ingest_dedup_batch

    store = scratch_store(spark, "t-replay-dedup")
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "pack my box with five dozen liquor jugs right now"),
         (3, "completely unrelated corpus text about spark engines")],
        "doc_id long, text string",
    )
    num_hashes, bands, mod = 32, 8, 30
    idx = minhash_buckets(corpus, "doc_id", "text", 3, num_hashes, bands)
    if "sig_index" in store:
        store.drop("sig_index")
    store.put("sig_index", idx, order_by=["id", "band"])

    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
         (20, "a genuinely novel document nothing else resembles")],  # accept
        "doc_id long, text string",
    )
    log: dict = {}
    _ingest_dedup_batch(store, batch, num_hashes, bands, 0.7, mod, log)
    idx1 = sorted(map(tuple, store.table("sig_index").df()
                      .select("id", "band", "bucket").collect()))
    log1 = {k: tuple(v) for k, v in log.items()}
    assert log[10]["is_dup"] == 1 and log[10]["best_match_id"] == 1
    assert log[20]["is_dup"] == 0
    assert 20 in {t[0] for t in idx1} and 10 not in {t[0] for t in idx1}

    # REPLAY the same batch: state must be byte-identical — in particular
    # doc 20 must NOT flip to dup by matching its own indexed signatures
    _ingest_dedup_batch(store, batch, num_hashes, bands, 0.7, mod, log)
    idx2 = sorted(map(tuple, store.table("sig_index").df()
                      .select("id", "band", "bucket").collect()))
    log2 = {k: tuple(v) for k, v in log.items()}
    assert idx2 == idx1, "replayed batch grew the index"
    assert log2 == log1, "replayed batch changed the verdict log"
    assert log[20]["is_dup"] == 0, "replayed batch self-matched its own docs"


# --------------------------------------------------------------------------
# duplicate_spans per-doc contract (ADVICE r5, low): a length>=k document
# whose k-grams sample ZERO seeds must still get a zero-filled row — on
# both seed paths (the x191 oracle got the same base left-join).
# --------------------------------------------------------------------------

def test_duplicate_spans_zero_seed_doc_has_row(spark):
    from nimhdfstore_spark.operators.dedup import (
        HASH_MOD, HASH_MUL, duplicate_spans,
    )

    k, mod = 8, 4

    def sampled(t):
        out = []
        for i in range(len(t) - k + 1):
            h = 0
            for c in t[i : i + k]:
                h = (h * HASH_MUL + ord(c)) % HASH_MOD
            if h % mod == 0:
                out.append(i)
        return out

    # length-k texts carry ONE gram each: P(no seed) = 3/4 per candidate,
    # so both kinds appear within a few tries; a long text all but surely
    # samples some seed
    zero = next(t for t in (f"len8--{n:02d}"[:k] for n in range(100))
                if not sampled(t))
    assert len(zero) == k
    some = next(t for t in (f"document number {n} long enough to sample"
                            for n in range(100)) if sampled(t))
    docs = spark.createDataFrame(
        [(0, zero), (1, some), (2, "shrt")], "doc_id long, text string"
    )
    for rolling in (False, True):
        rows = {r["doc_id"]: r for r in duplicate_spans(
            docs, k=k, sample_mod=mod, rolling=rolling).collect()}
        assert set(rows) == {0, 1}, "len>=k docs exactly; short doc absent"
        assert tuple(rows[0])[1:] == (0, 0, 0, 0), "zero-filled counts"
        assert rows[1]["n_seeds"] > 0


# --------------------------------------------------------------------------
# AVI/MJPEG video container (operators/video.py): mux/demux round-trip,
# RIFF disambiguation in sniff_mime, frame sampling + drop contract.
# --------------------------------------------------------------------------

def _mjpeg_avi(doc, n_frames, w=32, h=24, fps=10):
    from nimhdfstore_spark.operators.jpeg import encode_jpeg
    from nimhdfstore_spark.operators.video import mux_avi_mjpeg

    frames = []
    for f in range(n_frames):
        img = np.zeros((h, w, 1), dtype=np.uint8)
        for b in range(h // 8):
            img[b * 8 : (b + 1) * 8] = 64 + 2 * ((doc * 3 + f * 7 + b * 5) % 80)
        frames.append(encode_jpeg(img, quality=50))
    return frames, mux_avi_mjpeg(frames, w, h, fps)


@given(st.integers(min_value=0, max_value=50),
       st.integers(min_value=1, max_value=7))
@settings(max_examples=15, deadline=None)
def test_avi_mux_demux_roundtrip(doc, n_frames):
    from nimhdfstore_spark.operators.video import demux_avi

    frames, avi = _mjpeg_avi(doc, n_frames)
    m = demux_avi(avi)
    assert (m["width"], m["height"], m["fps"]) == (32, 24, 10)
    assert m["n_frames"] == n_frames
    assert m["frames"] == frames  # byte-identical payloads back out


def test_avi_rejects_non_avi_and_foreign_codec():
    import struct

    from nimhdfstore_spark.operators.video import demux_avi, mux_avi_mjpeg

    with pytest.raises(ValueError):
        demux_avi(b"RIFF\x10\x00\x00\x00WAVEdata")
    with pytest.raises(ValueError):
        demux_avi(b"\x89PNG\r\n\x1a\n")
    _, avi = _mjpeg_avi(1, 2)
    h264 = avi.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(ValueError, match="codec"):
        demux_avi(h264)


def test_sniff_mime_disambiguates_riff_forms(spark):
    from nimhdfstore_spark.operators.multimodal import sniff_mime

    _, avi = _mjpeg_avi(0, 1)
    wav = (b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + bytes(16)
           + b"data" + (0).to_bytes(4, "little"))
    df = spark.createDataFrame(
        [(0, bytearray(avi)), (1, bytearray(wav)), (2, bytearray(b"RIFFxxxx????"))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["sniffed_mime"] for r in sniff_mime(df).collect()}
    assert got == {0: "video/avi", 1: "audio/wav", 2: "audio/wav"}


def test_sample_avi_frames_every_k_and_drop(spark):
    from nimhdfstore_spark.operators.video import sample_avi_frames

    _, avi5 = _mjpeg_avi(3, 5)
    _, avi2 = _mjpeg_avi(4, 2)
    df = spark.createDataFrame(
        [(3, bytearray(avi5)), (4, bytearray(avi2)),
         (9, bytearray(b"not a video at all"))],
        "doc_id long, payload binary",
    )
    rows = sample_avi_frames(df, every_k=2).collect()
    got = {(r["doc_id"], r["frame_no"]) for r in rows}
    assert got == {(3, 0), (3, 2), (3, 4), (4, 0)}
    for r in rows:
        nb = 3  # bands
        d, f, w = r["doc_id"], r["frame_no"], r["width"]
        vals = [64 + 2 * ((d * 3 + f * 7 + b * 5) % 80) for b in range(nb)]
        assert r["px_sum"] == sum(v * 8 * w for v in vals)
        assert (r["px_min"], r["px_max"]) == (min(vals), max(vals))


# --------------------------------------------------------------------------
# x199 fixture guarantees: 8 distinct pattern dHashes; every
# (pattern, shift, format) variant — lossless PNG and quality-97 JPEG —
# lands on the pattern's reference dHash (margin 40 vs measured worst
# JPEG error 4, so a lossy decode cannot flip a comparison bit).
# --------------------------------------------------------------------------

def test_x199_pattern_family_dhash_stable_across_formats():
    from nimhdfstore_spark.operators.gif import decode_gif, encode_gif
    from nimhdfstore_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from nimhdfstore_spark.operators.png import decode_png, encode_png
    from nimhdfstore_spark.queries.multimodal import _x199_pattern

    def dhash(img):
        bits = (img[:, 1:].astype(int) > img[:, :-1].astype(int)).flatten()
        return sum(1 << i for i, b in enumerate(bits) if b)

    refs = [dhash(_x199_pattern(p)) for p in range(8)]
    assert len(set(refs)) == 8, "patterns must have distinct dHashes"
    worst = 0
    for p in range(8):
        for s in (0, 4, 8):
            img = (_x199_pattern(p) + s).astype(np.uint8)
            assert dhash(decode_png(encode_png(img))[:, :, 0]) == refs[p]
            jpg = decode_jpeg(encode_jpeg(img[..., None], quality=97))[:, :, 0]
            worst = max(worst, np.abs(jpg.astype(int) - img.astype(int)).max())
            assert dhash(jpg) == refs[p], (p, s)
            gif = decode_gif(encode_gif(np.stack([img] * 3, axis=-1)))
            assert np.array_equal(gif[:, :, 0], img), "GIF must be lossless"
            assert dhash(gif[:, :, 0]) == refs[p], (p, s)
    assert worst * 2 < 40, f"JPEG error {worst} eats the comparison margin"


# --------------------------------------------------------------------------
# strip_html edge semantics (x201): escaped markup never activates,
# block contents never surface, double-escapes stay literal.
# --------------------------------------------------------------------------

def test_strip_html_edges(spark):
    from nimhdfstore_spark.operators.text import html_tag_count, strip_html

    cases = [
        # escaped <script> is TEXT, not an active tag
        ("a &lt;script&gt;x&lt;/script&gt; b", "a <script>x</script> b"),
        # real script/style/comment contents never surface
        ("<script>secret()</script>visible<style>.x{}</style>", "visible"),
        ("be<!-- <p>hidden</p> -->fore", "be fore"),
        # &amp; unescapes LAST: double-escape stays literal
        ("x &amp;lt; y", "x &lt; y"),
        ("<p>a</p>\n\n  <p>b</p>", "a b"),
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
    )
    got = {r["i"]: r["t"] for r in df.select(
        "i", strip_html("html").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
    n = df.select(html_tag_count("html").alias("n")).collect()
    assert [r["n"] for r in n] == [0, 4, 2, 0, 4, 0]


# --------------------------------------------------------------------------
# q29 leg rotation (ADVICE r5): the oracle-returned ingest leg is derived
# from the same persisted counter as the sweep slots, covering
# CSV/JSON/ORC/ANALYZE/binaryFile within five rounds.
# --------------------------------------------------------------------------

def test_q29_leg_rotates_with_counter(monkeypatch):
    import importlib

    import nimhdfstore_spark.queries.sinks as S

    try:
        for r in range(10):
            monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", str(r))
            mod = importlib.reload(S)
            assert mod._Q29_LEG == r % 5
            # the registered oracle must match the returned leg
            want = mod._q29_oracle()
            assert Q.ORACLE["q29_ingest_suite"] == want
    finally:
        monkeypatch.delenv("SPARK_GRAFT_SWEEP_ROTATION", raising=False)
        importlib.reload(S)  # restore the real rotation's registration


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=60, deadline=None)
def test_avi_demux_never_hangs_on_garbage(data):
    # robust-ingest: arbitrary bytes after a RIFF/AVI prelude either raise
    # or demux to a well-formed dict — never hang
    from nimhdfstore_spark.operators.video import demux_avi

    import struct as _struct

    blob = b"RIFF" + _struct.pack("<I", len(data) + 4) + b"AVI " + data
    try:
        m = demux_avi(blob)
    except Exception:
        return
    assert isinstance(m["n_frames"], int)
    assert all(isinstance(f, bytes) for f in m["frames"])
