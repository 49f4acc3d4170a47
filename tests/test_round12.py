"""Round-8 additions: vacuous-oracle audit (round-7 verdict "what's wrong"
#1), verified-aware sweep rotation (#2), and writer-writer optimistic
concurrency in the Store commit path (carryover ask #4/#1)."""

from __future__ import annotations

import pytest

from nimhdfstore_spark import queries as registry
from nimhdfstore_spark.store import Store, StoreConflictError
from tests._compare import run_oracle
from tests.test_store import SCHEMA, particles, rows_of

registry.load_all()

SF001 = "/root/testdata/sf0.01"


def test_no_unannotated_empty_oracles_sf001():
    """Every declared oracle returns rows at sf0.01, or is explicitly
    annotated EXPECTED_EMPTY. A driver row whose oracle is empty verifies
    `0 == 0`: an implementation returning everything, nothing, or garbage-
    then-filtered passes identically (round-7 verdict found x57, x110 and
    x183 in that state — all three are de-vacuated this round)."""
    empty = []
    for name, sql in sorted(registry.ORACLE.items()):
        n = len(run_oracle(sql, SF001))
        if n == 0 and name not in registry.EXPECTED_EMPTY:
            empty.append(name)
        if n > 0 and name in registry.EXPECTED_EMPTY:
            empty.append(f"{name} (annotated empty but returned {n} rows)")
    assert not empty, f"vacuous/mis-annotated oracles at sf0.01: {empty}"


# --------------------------------------------------------------------------
# Verified-aware sweep rotation (round-7 verdict ask #2): never-driver-
# verified extension entries order FIRST, so the driver's ~5 extension
# slots always add new verification breadth; already-green entries fill
# the back of the sweep. No-repeat-until-exhaustion pinned by simulation.
# --------------------------------------------------------------------------


def _ext(order):
    n_core = sum(n.startswith("q") for n in order)
    return order[n_core:]


def test_fresh_first_ordering_at_any_backlog_depth(monkeypatch):
    """Round-13 rewrite (verdict ask #1, the repeat offender): the old
    assertion — "the front 8 extension slots are never-driver-verified" —
    EXPIRED the moment the backlog hit zero (CORRECTNESS_r12 drained it:
    every entry is verified, so no slot can be fresh). Assert the durable
    ordering invariant instead, against the REAL archived records: every
    fresh entry precedes every verified entry, so the front slots carry
    min(backlog, 8) fresh entries at every backlog depth including 0."""
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_ROTATION", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_SWEEP_VERIFIED", raising=False)
    seen = registry.driver_verified()
    assert seen, "archived CORRECTNESS records exist; the set cannot be empty"
    ext = _ext(registry.sweep_order())
    n_fresh = sum(n not in seen for n in ext)
    # every fresh entry precedes every verified entry
    assert all(n not in seen for n in ext[:n_fresh])
    assert all(n in seen for n in ext[n_fresh:])
    # the driver's front slots are fresh exactly as far as backlog allows
    assert not set(ext[: min(n_fresh, 8)]) & seen


@pytest.mark.parametrize("n_verified", [0, 3, 40, 10_000])
def test_front_slots_fresh_while_backlog_exists(monkeypatch, n_verified):
    """Synthetic-history form of the round-7 'done' criterion, valid at
    every backlog depth: verify the first n entries of the flat order,
    then the NEXT front slots are all first-time — until the backlog is
    exhausted, at which point the verified partition must rotate with the
    round counter instead of pinning a fixed front (ADVICE r8)."""
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "4")
    all_ext = _ext(registry.sweep_order())
    verified = set(all_ext[:n_verified])
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(verified))
    ext = _ext(registry.sweep_order())
    backlog = len(all_ext) - min(n_verified, len(all_ext))
    fresh_front = ext[: min(backlog, 8)]
    assert not set(fresh_front) & verified
    if backlog == 0:
        # zero backlog: consecutive rounds re-verify a DIFFERENT order
        # (the pinned leg-coverage suites legitimately hold the front —
        # compare the whole partition, not a fixed prefix)
        monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "5")
        ext2 = _ext(registry.sweep_order())
        assert ext2 != ext, (
            "verified partition must rotate once the backlog is empty"
        )


def test_driver_verified_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    assert registry.driver_verified() == set()
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "x30_dedup_exact,x45_x")
    assert registry.driver_verified() == {"x30_dedup_exact", "x45_x"}


def test_no_repeat_until_exhaustion(monkeypatch):
    """Simulate the driver loop: each round the front K extension slots get
    verified and the counter advances. No entry may occupy a slot twice
    before every extension entry has been verified once."""
    K = 5
    verified: set[str] = set()
    slotted: list[str] = []
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    n_ext = len(_ext(registry.sweep_order()))
    for r in range(0, (n_ext + K - 1) // K):
        monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", str(r))
        monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(verified))
        # once fewer than K fresh entries remain, the slot window's tail is
        # legitimately backfilled with already-verified entries — only the
        # fresh-region prefix is under the no-repeat contract
        take = min(K, n_ext - len(verified))
        slots = _ext(registry.sweep_order())[:take]
        dup = set(slots) & set(slotted)
        assert not dup, f"round {r} re-offered already-verified slots: {dup}"
        slotted.extend(slots)
        verified |= set(slots)
    assert len(set(slotted)) == len(slotted) == n_ext, (
        "every extension entry must be slotted exactly once per cycle"
    )


def test_failed_slot_is_reoffered_not_pinned(monkeypatch):
    """An entry that FAILS driver verification stays fresh; the 3·r shift
    within the fresh partition moves the window past it so it cannot pin
    the front slots forever while still being re-offered eventually.

    Round 11: SWEEP_PRIORITY names sit AHEAD of the shifted partition by
    design (they stay put until verified — the priority list is the
    explicit, bounded exception to the no-pinning rule), so the property
    is asserted on the first NON-priority fresh slot."""
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "0")
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", "")
    prio = set(registry.SWEEP_PRIORITY)
    ext0 = [n for n in _ext(registry.sweep_order()) if n not in prio]
    flaky = ext0[0]
    # verify everything round 0 offered EXCEPT the flaky first slot
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_VERIFIED", ",".join(ext0[1:5]))
    monkeypatch.setenv("SPARK_GRAFT_SWEEP_ROTATION", "1")
    ext1 = [n for n in _ext(registry.sweep_order()) if n not in prio]
    assert flaky in ext1[: len(ext1) - 4], "failed entry must remain fresh"
    # and it is NOT frozen at position 0 (the shift moved the window)
    assert ext1[0] != flaky


@pytest.mark.parametrize(
    "name",
    ["x57_not_exists_antijoin", "x110_tpch_q22_no_orders",
     "x183_dedup_multiprobe_lsh"],
)
def test_devacuated_rows_nonempty_every_sf(spark, name):
    """The three rows the round-7 audit flagged stay non-empty at every
    generated scale factor (the oracle side; the Spark side is covered by
    the existing test_queries_oracle sweep)."""
    for sf in ("0.001", "0.01", "0.1"):
        n = len(run_oracle(registry.ORACLE[name], f"/root/testdata/sf{sf}"))
        assert n > 0, f"{name} oracle empty at sf{sf}"


# --------------------------------------------------------------------------
# Writer-writer optimistic concurrency (round-7 verdict ask #1, carried
# from round 6): two Store handles committing to one table must never
# silently drop a committed snapshot. The catalog pointer flip CAS-es on
# the version the handle planned against; losers raise StoreConflictError
# (appends auto-retry — no positional dependency). Conflict handling is
# exercised by interleaving two handles IN one process: the race is
# handle-level staleness, which interleaving reproduces deterministically.
# --------------------------------------------------------------------------


def _two_handles(spark, tmp_path, name="t"):
    root = str(tmp_path / "ccstore")
    s1 = Store(spark, root)
    s1.put(name, particles(spark, n=4, start=1), order_by=["lati"])
    s2 = Store(spark, root)
    return s1.table(name), s2.table(name)


def test_concurrent_appends_both_survive(spark, tmp_path):
    t1, t2 = _two_handles(spark, tmp_path)
    t1.append(particles(spark, n=2, start=100))
    # t2 planned against the pre-append snapshot: the CAS rejects its first
    # attempt and append's auto-retry replans from the refreshed tail
    t2.append(particles(spark, n=2, start=200))
    final = Store(spark, t1.store.root).table("t")
    keys = [r[0] for r in rows_of(final.df())]
    assert keys == [1, 2, 3, 4, 100, 101, 200, 201], (
        "a committed append was dropped or misplaced"
    )


def test_stale_positional_mutation_raises_and_refresh_recovers(spark, tmp_path):
    t1, t2 = _two_handles(spark, tmp_path)
    t1.delete(0)  # committed by the other handle
    with pytest.raises(StoreConflictError):
        t2.delete(0)  # stale positions: must surface, not guess
    # the conflict path refreshed t2; the retry deletes the CURRENT row 0
    t2.delete(0)
    keys = [r[0] for r in rows_of(Store(spark, t1.store.root).table("t").df())]
    assert keys == [3, 4], "exactly rows 1 and 2 should have been deleted"


def test_stale_meta_only_write_raises_nothing_lost(spark, tmp_path):
    t1, t2 = _two_handles(spark, tmp_path)
    t1.set_attrs(owner="a")
    with pytest.raises(StoreConflictError):
        t2.set_attrs(color="blue")
    # winner's attr intact; loser refreshed and can re-apply
    t2.set_attrs(color="blue")
    attrs = Store(spark, t1.store.root).table("t").attrs
    assert attrs.get("owner") == "a" and attrs.get("color") == "blue"


def test_stale_overwrite_put_raises(spark, tmp_path):
    root = str(tmp_path / "ccstore2")
    s1, s2 = Store(spark, root), None
    s1.put("t", particles(spark, n=3, start=1), order_by=["lati"])
    s2 = Store(spark, root)
    t2 = s2.table("t")
    s1.put("t", particles(spark, n=5, start=10), order_by=["lati"],
           overwrite=True)
    # a mutation through the handle opened before the overwrite must conflict
    with pytest.raises(StoreConflictError):
        t2.set_attrs(stale="yes")
    final = Store(spark, root).table("t")
    assert final.nrows == 5 and "stale" not in final.attrs


def test_transaction_aborts_on_conflict_nothing_published(spark, tmp_path):
    root = str(tmp_path / "ccstore3")
    s1 = Store(spark, root)
    s1.put("a", particles(spark, n=3, start=1), order_by=["lati"])
    s2 = Store(spark, root)
    with pytest.raises(StoreConflictError):
        with s2.transaction() as tx:
            tx.put("a", particles(spark, n=9, start=50), order_by=["lati"],
                   overwrite=True)
            tx.put("b", particles(spark, n=2, start=70), order_by=["lati"])
            # a racing commit lands AFTER staging, BEFORE the flip
            s1.table("a").set_attrs(racer=True)
    assert Store(spark, root).table("a").nrows == 3, "tx must publish nothing"
    assert "b" not in Store(spark, root), "tx must publish nothing"
    # and no staged debris is left behind
    import os

    leftovers = [e for e in os.listdir(os.path.join(root, "a"))
                 if e.startswith(".tmp-")]
    assert not leftovers


def test_interleaved_mutation_property(spark, tmp_path):
    """Seeded interleaving of two handles against a list oracle: every
    committed row survives or the commit raised — never a silent drop."""
    import random

    rng = random.Random(8)
    t1, t2 = _two_handles(spark, tmp_path)
    oracle = [1, 2, 3, 4]  # lati keys in position order
    next_key = 1000
    for step in range(10):
        h = (t1, t2)[rng.randrange(2)]
        op = rng.choice(["append", "delete", "attr"])
        try:
            if op == "append":
                h.append(particles(spark, n=1, start=next_key))
                oracle.append(next_key)
                next_key += 1
            elif op == "delete" and oracle:
                h.delete(0)
                oracle.pop(0)
            else:
                h.set_attrs(step=step)
        except StoreConflictError:
            # the loser's change was NOT applied; handle already refreshed
            if op == "append":
                raise AssertionError("append must auto-retry, not surface")
            continue
    final = Store(spark, t1.store.root).table("t")
    assert [r[0] for r in rows_of(final.df())] == oracle


# --------------------------------------------------------------------------
# GIF codec (operators/gif.py, round-7 verdict ask #5): LZW + palette from
# the public GIF89a spec. Round-trip exactness is the oracle x206 rides;
# the fuzz pins mirror the AVI demuxer's never-hangs contract.
# --------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_gif_decode_never_hangs_on_garbage(data):
    from nimhdfstore_spark.operators.gif import decode_gif

    try:
        img = decode_gif(data)
        assert img.ndim == 3 and img.shape[2] == 3
    except ValueError:
        pass  # every malformed input must land here — no hang, no crash


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_gif_decode_survives_corruption_of_valid_file(data):
    """Byte-level corruption of a VALID GIF must either decode (corruption
    hit don't-care bytes) or raise ValueError — never hang or allocate
    past the declared dimensions."""
    from nimhdfstore_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    img = rng.integers(0, 16, (9, 11), dtype=np.uint8) * 16
    blob = bytearray(encode_gif(np.stack([img] * 3, axis=-1)))
    pos = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    val = data.draw(st.integers(min_value=0, max_value=255))
    blob[pos] = val
    try:
        out = decode_gif(bytes(blob))
        assert out.shape[0] * out.shape[1] <= 1 << 26
    except ValueError:
        pass


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_exact(data):
    """GIF is lossless within a palette: encode→decode is the identity for
    any <=256-color image, interlaced or not, still or animated."""
    from nimhdfstore_spark.operators.gif import (
        decode_gif_frames, encode_gif,
    )

    h = data.draw(st.integers(min_value=1, max_value=24))
    w = data.draw(st.integers(min_value=1, max_value=24))
    ncol = data.draw(st.integers(min_value=1, max_value=256))
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    interlace = data.draw(st.booleans())
    nframes = data.draw(st.integers(min_value=1, max_value=3))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, ncol, (h, w))] for _ in range(nframes)]
    blob = encode_gif(frames, delay_cs=3, interlace=interlace)
    back = decode_gif_frames(blob)
    assert len(back) == nframes
    assert all(np.array_equal(b, f) for (b, _d), f in zip(back, frames))
    assert all(d == 3 for _b, d in back)


def test_gif_encoder_rejects_wide_palettes():
    from nimhdfstore_spark.operators.gif import encode_gif

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    with pytest.raises(ValueError):
        encode_gif(img)


def test_gif_magic_dispatch_and_sniff():
    from nimhdfstore_spark.operators.gif import encode_gif
    from nimhdfstore_spark.operators.multimodal import decode_image_auto

    g = np.full((5, 4, 3), 200, np.uint8)
    blob = encode_gif(g)
    assert blob[:6] == b"GIF89a"
    assert np.array_equal(decode_image_auto(blob), g)


# --------------------------------------------------------------------------
# h5lite adversarial-parse fuzz (round-7 verdict ask #6): corrupted
# offsets/counts/B-tree pointers in VALID files + raw-byte fuzz — every
# path must raise ValueError cleanly (no hang, no unbounded allocation,
# no stray exception class), the pin the AVI demuxer already carries.
# --------------------------------------------------------------------------


def _h5_fixture_bytes() -> dict[str, bytes]:
    """Two real h5lite files rendered to bytes once: a chunked+deflate
    numeric table (exercises the filter pipeline and the chunk B-tree)
    and a vlen-string table (exercises the global heap)."""
    import tempfile

    from nimhdfstore_spark.sources import h5lite

    out = {}
    with tempfile.TemporaryDirectory() as d:
        arr = np.zeros(500, dtype=np.dtype([("k", "<i8"), ("v", "<f8")]))
        arr["k"] = np.arange(500)
        arr["v"] = np.arange(500) * 0.5
        p = f"{d}/chunked.h5"
        h5lite.write(p, {"t": arr}, chunk_rows=64, compress=6)
        out["chunked"] = open(p, "rb").read()
        vdt = np.dtype([
            ("doc_id", "<i8"),
            ("text", np.dtype("O", metadata={"vlen": bytes})),
        ])
        va = np.empty(40, dtype=vdt)
        va["doc_id"] = np.arange(40)
        va["text"] = [b"x" * (i % 17) for i in range(40)]
        p2 = f"{d}/vlen.h5"
        h5lite.write(p2, {"t": va})
        out["vlen"] = open(p2, "rb").read()
    return out


_H5_BLOBS = None


def _h5_blobs():
    global _H5_BLOBS
    if _H5_BLOBS is None:
        _H5_BLOBS = _h5_fixture_bytes()
    return _H5_BLOBS


def _try_read(blob: bytes) -> None:
    import tempfile

    from nimhdfstore_spark.sources import h5lite

    with tempfile.NamedTemporaryFile(suffix=".h5") as f:
        f.write(blob)
        f.flush()
        try:
            cat = h5lite.catalog(f.name)
            for name in cat:
                h5lite.read(f.name, name)
        except ValueError:
            pass  # the ONLY acceptable failure class


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_h5lite_survives_single_byte_corruption(data):
    kind = data.draw(st.sampled_from(["chunked", "vlen"]))
    blob = bytearray(_h5_blobs()[kind])
    pos = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    val = data.draw(st.integers(min_value=0, max_value=255))
    blob[pos] = val
    _try_read(bytes(blob))


@given(st.data())
@settings(max_examples=80, deadline=None)
def test_h5lite_survives_field_corruption(data):
    """Targeted corruption of 8-byte aligned u64 fields (addresses, counts,
    heap offsets, B-tree child pointers) — the highest-leverage spots for
    cycles, out-of-file seeks, and allocation blowups."""
    kind = data.draw(st.sampled_from(["chunked", "vlen"]))
    blob = bytearray(_h5_blobs()[kind])
    off = data.draw(
        st.integers(min_value=0, max_value=(len(blob) - 8) // 8)
    ) * 8
    word = data.draw(st.sampled_from(
        [0, 1, 0xFFFFFFFFFFFFFFFF, 2**32, len(blob) - 8, 24]
    ))
    blob[off:off + 8] = int(word).to_bytes(8, "little")
    _try_read(bytes(blob))


@given(st.binary(min_size=0, max_size=600))
@settings(max_examples=120, deadline=None)
def test_h5lite_raw_garbage_never_hangs(data):
    _try_read(data)
    # and with a valid signature stapled on, so parsing goes deeper
    _try_read(b"\x89HDF\r\n\x1a\n" + data)


def test_h5lite_truncations_raise_cleanly():
    from nimhdfstore_spark.sources import h5lite  # noqa: F401

    for kind in ("chunked", "vlen"):
        blob = _h5_blobs()[kind]
        for cut in range(0, len(blob), 257):
            _try_read(blob[:cut])


def test_h5lite_deflate_bomb_is_bounded():
    """A chunk that inflates far past its declared size must raise, not
    allocate: splice a 100 MB-of-zeros deflate stream into the first
    chunk of a valid chunked file."""
    import tempfile
    import zlib

    from nimhdfstore_spark.sources import h5lite

    blob = bytearray(_h5_blobs()["chunked"])
    bomb = zlib.compress(b"\x00" * (100 << 20), 9)  # ~100 KB compressed
    with tempfile.NamedTemporaryFile(suffix=".h5") as f:
        f.write(bytes(blob) + bomb)
        f.flush()
        cat = h5lite.catalog(f.name)
        # rewrite the chunk index so the first chunk points at the bomb
        import struct as _struct

        info = cat["t"]
        with open(f.name, "r+b") as g:
            g.seek(info["btree"] + 24)
            # key(nbytes,mask,row,elem)=24 bytes, then child addr
            g.write(_struct.pack("<II", len(bomb), 0))
            g.seek(info["btree"] + 24 + 24)
            g.write(_struct.pack("<Q", len(blob)))
        with pytest.raises(ValueError):
            h5lite.read(f.name, "t")


# --------------------------------------------------------------------------
# PNG adversarial pins (round 8): the codec gains the same bomb/garbage
# contract as GIF/h5lite/AVI — bounded inflate (exact scanline size),
# implausible-dimension rejection, never-hangs.
# --------------------------------------------------------------------------


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_png_decode_never_hangs_on_garbage(data):
    from nimhdfstore_spark.operators.png import decode_apng, decode_png

    for blob in (data, b"\x89PNG\r\n\x1a\n" + data):
        for fn in (decode_png, decode_apng):
            try:
                fn(blob)
            except Exception:
                pass  # any clean raise is fine; the pin is no-hang/no-alloc


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_png_decode_survives_corruption_of_valid_file(data):
    from nimhdfstore_spark.operators.png import decode_png, encode_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (7, 9), dtype=np.uint8)
    blob = bytearray(encode_png(img))
    pos = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
    blob[pos] = data.draw(st.integers(min_value=0, max_value=255))
    try:
        out = decode_png(bytes(blob))
        assert out.shape[0] * out.shape[1] <= 64_000_000
    except Exception:
        pass


def test_png_deflate_bomb_is_bounded():
    """An IDAT that inflates far past the declared scanline size must raise
    before allocating: splice a 100 MB-of-zeros deflate stream into a valid
    PNG's IDAT chunk (dimensions say 7x9)."""
    import struct
    import zlib

    from nimhdfstore_spark.operators.png import decode_png, encode_png

    img = np.zeros((7, 9), np.uint8)
    blob = encode_png(img)
    bomb = zlib.compress(b"\x00" * (100 << 20), 9)
    # rebuild: signature + IHDR + bomb-IDAT + IEND
    sig, rest = blob[:8], blob[8:]
    ihdr = rest[: 8 + 13 + 4]
    idat = (
        struct.pack(">I", len(bomb)) + b"IDAT" + bomb
        + struct.pack(">I", zlib.crc32(b"IDAT" + bomb) & 0xFFFFFFFF)
    )
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
        ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
    )
    with pytest.raises(ValueError):
        decode_png(sig + ihdr + idat + iend)


def test_png_implausible_dimensions_rejected():
    import struct
    import zlib as _z

    from nimhdfstore_spark.operators.png import decode_png

    # hand-built IHDR declaring 100000 x 100000 (1e10 pixels)
    body = struct.pack(">IIBBBBB", 100000, 100000, 8, 0, 0, 0, 0)
    ihdr = (
        struct.pack(">I", 13) + b"IHDR" + body
        + struct.pack(">I", _z.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="implausible"):
        decode_png(b"\x89PNG\r\n\x1a\n" + ihdr)


def test_stale_handle_across_drop_recreate_cannot_clobber(spark, tmp_path):
    """ABA hole: drop + recreate resets the catalog version, so a handle
    from the OLD incarnation could pass the version CAS and point the new
    table's catalog at deleted files. The per-creation uid closes it."""
    root = str(tmp_path / "ccstore4")
    s = Store(spark, root)
    s.put("t", particles(spark, n=3, start=1), order_by=["lati"])
    stale = Store(spark, root).table("t")
    s.drop("t")
    s.put("t", particles(spark, n=5, start=50), order_by=["lati"])
    with pytest.raises(StoreConflictError):
        stale.set_attrs(ghost=True)  # meta-only write through the old uid
    fresh = Store(spark, root).table("t")
    assert fresh.nrows == 5 and "ghost" not in fresh.attrs
    assert [r[0] for r in rows_of(fresh.df())] == [50, 51, 52, 53, 54]


def test_two_process_append_contention(tmp_path):
    """REAL writer-writer contention: two independent PROCESSES (separate
    Spark sessions, separate JVMs) append to one table concurrently. The
    single-process interleaving tests above exercise handle staleness;
    only this exercises the commit lockfile and CAS under actual races.
    Every appended row must survive — auto-retry absorbs every conflict."""
    import subprocess
    import sys
    import textwrap

    root = str(tmp_path / "mpstore")
    worker_src = textwrap.dedent("""
        import sys
        sys.path.insert(0, "/root/repo")
        root, base = sys.argv[1], int(sys.argv[2])
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        from nimhdfstore_spark.store import Store
        t = Store(spark, root).table("t")
        for i in range(5):
            # driver-rows payload: the pyarrow local-write fast path, so
            # each commit is milliseconds and the two processes genuinely
            # collide on the catalog flip
            df = spark.createDataFrame(
                [(base + i, 1, 100.0, 20.0)],
                "lati long, longi long, pressure double, temperature double",
            )
            t.append(df)  # auto-retries on StoreConflictError
        spark.stop()
        print("WORKER-OK", base)
    """)
    script = tmp_path / "worker.py"
    script.write_text(worker_src)

    # seed the table from a third session-less process to keep this test
    # independent of the shared fixture session
    seed_src = worker_src.replace("t = Store(spark, root).table(\"t\")",
                                  "s = Store(spark, root)\n"
                                  "        t = None")
    from pyspark.sql import SparkSession

    seeder = (SparkSession.builder.master("local[2]")
              .config("spark.ui.enabled", "false").getOrCreate())
    Store(seeder, root).put(
        "t", particles(seeder, n=2, start=1), order_by=["lati"]
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), root, str(base)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for base in (1000, 2000)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "WORKER-OK" in out
    final = Store(seeder, root).table("t")
    keys = sorted(r[0] for r in rows_of(final.df()))
    assert keys == [1, 2] + list(range(1000, 1005)) + list(range(2000, 2005)), (
        f"a concurrently committed append was lost: {keys}"
    )
    assert final.nrows == 12
