"""Minimal pure-Python HDF5 (classic v0 layout) — enough of the public
file-format specification to round-trip the reference's table shape
(``H5TBmake_table`` / ``H5TBread_records``, nimtables.nim:94-171): 1-D
COMPOUND-type datasets under the root group, contiguous layout,
little-endian scalar + fixed-width string members.

Why this exists: the connector in ``hdf5.py`` is written against h5py, but
h5py is not installed in this container — which left the HDF5 read/write
legs never executing. This module implements the subset of the format the
connector needs directly from the published spec (HDF5 File Format
Specification v2/v0 structures: superblock v0, v1 object headers, local
heap, v1 group B-tree, SNOD symbol nodes, dataspace/datatype/layout
messages), so the leg runs everywhere. h5py, when present, reads these
files; the structures written here are the same ones libhdf5 emits for a
plain contiguous compound dataset.

Deliberately out of scope (documented, not silently wrong): chunked
layout, compression filters, variable-length types (they need the global
heap), nested groups, attributes. The parquet store remains the scale
backend; this is the interchange leg.

Addresses/lengths are 8 bytes; everything little-endian. Layout of a
written file: superblock → root object header → local heap → group B-tree
→ SNOD → per dataset (object header, raw data), EOF recorded in the
superblock.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


# -- datatype message encoding (spec IV.A.2.d) ------------------------------

def _dt_scalar(np_dt: np.dtype) -> bytes:
    """Encode one scalar member datatype (fixed-point / IEEE float /
    fixed-width string)."""
    k, size = np_dt.kind, np_dt.itemsize
    if k in ("i", "u"):
        signed = 0x08 if k == "i" else 0x00
        head = struct.pack("<B3BI", 0x10, signed, 0, 0, size)
        props = struct.pack("<HH", 0, size * 8)
        return head + props
    if k == "f":
        if size == 8:
            sign, eloc, esz, mloc, msz, bias = 63, 52, 11, 0, 52, 1023
        elif size == 4:
            sign, eloc, esz, mloc, msz, bias = 31, 23, 8, 0, 23, 127
        else:
            raise ValueError(f"unsupported float width {size}")
        head = struct.pack("<B3BI", 0x11, 0x20, sign, 0, size)
        props = struct.pack("<HHBBBBI", 0, size * 8, eloc, esz, mloc, msz, bias)
        return head + props
    if k == "S":
        # null-padded ASCII fixed-width string
        return struct.pack("<B3BI", 0x13, 0x01, 0, 0, size)
    raise ValueError(f"unsupported member dtype {np_dt!r}")


def _dt_compound(dt: np.dtype) -> bytes:
    """Encode a packed compound datatype (version 1 member layout)."""
    n = len(dt.names)
    out = struct.pack("<B3BI", 0x16, n & 0xFF, (n >> 8) & 0xFF, 0, dt.itemsize)
    for name in dt.names:
        sub, offset = dt.fields[name][0], dt.fields[name][1]
        nm = _pad8(name.encode() + b"\x00")
        out += nm
        out += struct.pack("<IB3BII4I", offset, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        out += _dt_scalar(sub)
    return out


def _parse_dt(buf: bytes, pos: int) -> tuple[np.dtype, int]:
    """Decode a datatype message at ``pos``; returns (numpy dtype, end)."""
    ver_cls, b0, b1, b2 = struct.unpack_from("<B3B", buf, pos)
    cls, ver = ver_cls & 0x0F, ver_cls >> 4
    size = struct.unpack_from("<I", buf, pos + 4)[0]
    pos += 8
    if cls == 0:  # fixed-point
        pos += 4  # bit offset + precision
        kind = "i" if (b0 & 0x08) else "u"
        return np.dtype(f"<{kind}{size}"), pos
    if cls == 1:  # float
        pos += 12
        return np.dtype(f"<f{size}"), pos
    if cls == 3:  # string
        return np.dtype(f"S{size}"), pos
    if cls == 6:  # compound
        n = b0 | (b1 << 8)
        names, formats, offsets = [], [], []
        for _ in range(n):
            end = buf.index(b"\x00", pos)
            name = buf[pos:end].decode()
            pos += (end - pos) // 8 * 8 + 8  # name padded to 8
            if ver != 1:
                raise ValueError(f"unsupported compound member version {ver}")
            offset = struct.unpack_from("<I", buf, pos)[0]
            pos += 4 + 4 + 4 + 4 + 16  # offset, rank+res, perm, res, dims
            sub, pos = _parse_dt(buf, pos)
            names.append(name)
            formats.append(sub)
            offsets.append(offset)
        return (
            np.dtype(
                {"names": names, "formats": formats, "offsets": offsets,
                 "itemsize": size}
            ),
            pos,
        )
    raise ValueError(f"unsupported datatype class {cls}")


# -- object headers ---------------------------------------------------------

def _message(mtype: int, data: bytes) -> bytes:
    data = _pad8(data)
    return struct.pack("<HHB3B", mtype, len(data), 0, 0, 0, 0) + data


def _object_header(messages: list[bytes]) -> bytes:
    body = b"".join(messages)
    # v1 prefix is 12 bytes + 4 pad so message data sits 8-byte aligned
    return (
        struct.pack("<BBHII", 1, 0, len(messages), 1, len(body)) + b"\x00" * 4
        + body
    )


def _dataset_header(nrows: int, dt: np.dtype, data_addr: int) -> bytes:
    space = struct.pack("<BBB5B", 1, 1, 0, 0, 0, 0, 0, 0) + struct.pack(
        "<Q", nrows
    )
    layout = struct.pack("<BBQQ", 3, 1, data_addr, nrows * dt.itemsize)
    return _object_header(
        [
            _message(0x0001, space),
            _message(0x0003, _dt_compound(dt)),
            _message(0x0008, layout),
        ]
    )


# -- public API -------------------------------------------------------------

def write(path: str, datasets: dict[str, np.ndarray]) -> None:
    """Write ``{name: 1-D structured array}`` as an HDF5 file (contiguous
    compound datasets in the root group)."""
    for name, arr in datasets.items():
        if arr.dtype.names is None or arr.ndim != 1:
            raise ValueError(f"dataset {name!r} must be a 1-D structured array")

    names = sorted(datasets)  # symbol nodes store entries in name order
    # ---- plan addresses ---------------------------------------------------
    sb_size = 24 + 8 * 4 + 40  # superblock v0 fields + root symtab entry
    root_oh = _object_header([_message(0x0011, struct.pack("<QQ", 0, 0))])
    root_oh_addr = sb_size

    heap_data = b"\x00" * 8  # offset 0: empty string (root link name)
    name_off: dict[str, int] = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += _pad8(n.encode() + b"\x00")
    heap_hdr_size = 8 + 8 * 3
    heap_addr = root_oh_addr + len(root_oh)
    heap_data_addr = heap_addr + heap_hdr_size

    btree_addr = heap_data_addr + len(heap_data)
    btree_size = 24 + 8 * 2 + 8 * (2 * len(names) + 1)  # generous
    snod_addr = btree_addr + btree_size
    snod_size = 8 + 40 * len(names)

    pos = snod_addr + snod_size
    ds_oh_addr: dict[str, int] = {}
    ds_data_addr: dict[str, int] = {}
    for n in names:
        arr = datasets[n]
        oh = _dataset_header(len(arr), arr.dtype, 0)  # size probe
        ds_oh_addr[n] = pos
        pos += len(oh)
        ds_data_addr[n] = pos
        pos += arr.nbytes
    eof = pos

    # ---- emit -------------------------------------------------------------
    out = bytearray()
    out += _SIG
    out += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
    out += struct.pack("<HHI", 4, 16, 0)
    out += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    # root symbol table entry: link name offset, OH addr, cache type 1,
    # scratch = (btree, heap)
    out += struct.pack("<QQII", 0, root_oh_addr, 1, 0)
    out += struct.pack("<QQ", btree_addr, heap_addr)
    assert len(out) == sb_size

    out += _object_header(
        [_message(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
    )

    out += b"HEAP" + struct.pack("<B3B", 0, 0, 0, 0)
    out += struct.pack("<QQQ", len(heap_data), UNDEF, heap_data_addr)
    out += heap_data

    bt = bytearray()
    bt += b"TREE" + struct.pack("<BBH", 0, 0, 1)
    bt += struct.pack("<QQ", UNDEF, UNDEF)
    bt += struct.pack("<Q", name_off[names[0]])  # key 0
    bt += struct.pack("<Q", snod_addr)  # child 0
    bt += struct.pack("<Q", name_off[names[-1]])  # key 1
    bt = bt.ljust(btree_size, b"\x00")
    out += bt

    sn = bytearray()
    sn += b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
    for n in names:
        sn += struct.pack("<QQII", name_off[n], ds_oh_addr[n], 0, 0)
        sn += b"\x00" * 16
    out += sn.ljust(snod_size, b"\x00")

    for n in names:
        arr = datasets[n]
        out += _dataset_header(len(arr), arr.dtype, ds_data_addr[n])
        assert len(out) == ds_data_addr[n]
        out += arr.tobytes()
    assert len(out) == eof

    with open(path, "wb") as f:
        f.write(bytes(out))


def _read_messages(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    ver, _, nmsg, _, hsize = struct.unpack_from("<BBHII", buf, addr)
    if ver != 1:
        raise ValueError(f"unsupported object header version {ver}")
    pos = addr + 16
    out = []
    for _ in range(nmsg):
        mtype, msize = struct.unpack_from("<HH", buf, pos)
        out.append((mtype, buf[pos + 8 : pos + 8 + msize]))
        pos += 8 + msize
    return out


def _catalog(buf: bytes) -> dict[str, dict[str, Any]]:
    if buf[:8] != _SIG:
        raise ValueError("not an HDF5 file (bad signature)")
    # superblock v0: root entry at fixed offset 24+32; scratch has btree/heap
    btree_addr, heap_addr = struct.unpack_from("<QQ", buf, 24 + 32 + 24)
    heap_data_addr = struct.unpack_from("<Q", buf, heap_addr + 24)[0]
    if buf[btree_addr : btree_addr + 4] != b"TREE":
        raise ValueError("bad group B-tree signature")
    entries_used = struct.unpack_from("<H", buf, btree_addr + 6)[0]
    out: dict[str, dict[str, Any]] = {}
    for c in range(entries_used):
        child = struct.unpack_from(
            "<Q", buf, btree_addr + 24 + 8 + c * 16
        )[0]
        if buf[child : child + 4] != b"SNOD":
            raise ValueError("bad symbol node signature")
        nsym = struct.unpack_from("<H", buf, child + 6)[0]
        for i in range(nsym):
            e = child + 8 + 40 * i
            noff, oh_addr = struct.unpack_from("<QQ", buf, e)
            end = buf.index(b"\x00", heap_data_addr + noff)
            name = buf[heap_data_addr + noff : end].decode()
            info: dict[str, Any] = {}
            for mtype, mdata in _read_messages(buf, oh_addr):
                if mtype == 0x0001:  # dataspace
                    rank = mdata[1]
                    if rank != 1:
                        raise ValueError("only 1-D datasets supported")
                    info["nrows"] = struct.unpack_from("<Q", mdata, 8)[0]
                elif mtype == 0x0003:
                    info["dtype"], _ = _parse_dt(mdata, 0)
                elif mtype == 0x0008:
                    ver, cls = mdata[0], mdata[1]
                    if ver != 3 or cls != 1:
                        raise ValueError(
                            "only v3 contiguous data layout supported"
                        )
                    info["addr"], info["size"] = struct.unpack_from(
                        "<QQ", mdata, 2
                    )
            out[name] = info
    return out


def catalog(path: str) -> dict[str, dict[str, Any]]:
    """{dataset name: {nrows, dtype, addr, size}} for the root group."""
    with open(path, "rb") as f:
        return _catalog(f.read())


def read_range(path: str, name: str, start: int, stop: int) -> np.ndarray:
    """Records [start, stop) of one dataset — reads ONLY that byte range
    (the executor-side partition read: each task seeks to its slice)."""
    info = catalog(path)[name]
    stop = min(stop, info["nrows"])
    if stop <= start:
        return np.empty(0, dtype=info["dtype"])
    itemsize = info["dtype"].itemsize
    with open(path, "rb") as f:
        f.seek(info["addr"] + start * itemsize)
        raw = f.read((stop - start) * itemsize)
    return np.frombuffer(raw, dtype=info["dtype"]).copy()


def read(path: str, name: str) -> np.ndarray:
    info = catalog(path)[name]
    return read_range(path, name, 0, info["nrows"])
