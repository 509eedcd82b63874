"""Pure-stdlib/numpy NetCDF-3 (classic format) writer + reader (round 3 —
upgrades the K4 NetCDF sink from a parquet stand-in to the REAL format the
reference emits, ref: PyOFS/model/wcofs.py to_netcdf / rtofs.py:390).

Scope: classic CDF-1 files with fixed (non-record) dimensions — the shape
the reference writes for gridded daily fields: coordinate variables
(lat, lon, optionally time) + data variables with a _FillValue attribute.
The binary layout follows the public NetCDF classic-format spec
(magic CDF\\x01, big-endian, dim/gatt/var lists, 4-byte aligned names and
attribute payloads); scipy.io.netcdf / netcdf4 read these files directly.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

_NC_TYPES = {
    np.dtype(">i1"): 1, np.dtype("S1"): 2, np.dtype(">i2"): 3,
    np.dtype(">i4"): 4, np.dtype(">f4"): 5, np.dtype(">f8"): 6,
}
_TYPE_NP = {1: ">i1", 2: "S1", 3: ">i2", 4: ">i4", 5: ">f4", 6: ">f8"}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _nc_type_of(arr: np.ndarray) -> int:
    be = arr.dtype.newbyteorder(">")
    for d, t in _NC_TYPES.items():
        if d == be:
            return t
    raise ValueError(f"unsupported netcdf dtype {arr.dtype}")


def _att_block(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)  # ABSENT
    out = [struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))]
    for aname, val in attrs.items():
        if isinstance(val, str):
            raw = val.encode()
            out.append(_name(aname) + struct.pack(">ii", 2, len(raw)) + _pad4(raw))
        else:
            arr = np.atleast_1d(np.asarray(val))
            if arr.dtype.kind == "f":
                arr = arr.astype(">f8" if arr.dtype.itemsize == 8 else ">f4")
            else:
                arr = arr.astype(">i4")
            t = _nc_type_of(arr)
            out.append(
                _name(aname)
                + struct.pack(">ii", t, arr.size)
                + _pad4(arr.tobytes())
            )
    return b"".join(out)


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict]],
    global_attrs: dict | None = None,
) -> None:
    """variables: name → (dim names, array, attrs). Arrays must match the
    declared dim sizes; dtype one of i1/i2/i4/f4/f8."""
    dim_ids = {d: i for i, d in enumerate(dims)}
    header = [b"CDF\x01", struct.pack(">i", 0)]  # numrecs = 0
    header.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
    for d, size in dims.items():
        header.append(_name(d) + struct.pack(">i", size))
    header.append(_att_block(global_attrs or {}))

    # variable metadata needs data offsets — build bodies first
    bodies = []
    metas = []
    for vname, (vdims, arr, attrs) in variables.items():
        shape = tuple(dims[d] for d in vdims)
        a = np.ascontiguousarray(arr)
        if a.shape != shape:
            raise ValueError(f"{vname}: shape {a.shape} != dims {shape}")
        a = a.astype(a.dtype.newbyteorder(">"))
        t = _nc_type_of(a)
        body = _pad4(a.tobytes())
        meta = (
            _name(vname)
            + struct.pack(">i", len(vdims))
            + b"".join(struct.pack(">i", dim_ids[d]) for d in vdims)
            + _att_block(attrs)
            + struct.pack(">ii", t, len(body))
        )
        bodies.append(body)
        metas.append(meta)

    header.append(struct.pack(">ii", _NC_VARIABLE, len(variables)))
    fixed = sum(len(h) for h in header) + sum(len(m) + 4 for m in metas)
    offsets = []
    pos = fixed
    for body in bodies:
        offsets.append(pos)
        pos += len(body)
    # temp-then-rename: a reader (including the streaming binaryFile
    # source watching this directory) never sees a half-written granule
    import os as _os

    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        for h in header:
            fh.write(h)
        for meta, off in zip(metas, offsets):
            fh.write(meta + struct.pack(">i", off))
        for body in bodies:
            fh.write(body)
    _os.replace(tmp, path)


def read_netcdf3(path: str) -> dict:
    """Parse a classic CDF-1 file (fixed dims) → {dims, variables, attrs};
    variables: name → {dims, data, attrs}."""
    with open(path, "rb") as fh:
        return read_netcdf3_bytes(fh.read())


def read_netcdf3_bytes(buf: bytes) -> dict:
    """Parse a classic CDF-1 byte buffer — the kernel behind both the
    path-based reader and the Spark binaryFile scan source (scan.py)."""
    if buf[:4] != b"CDF\x01":
        raise ValueError("not a classic NetCDF-3 (CDF-1) file")
    pos = 8  # magic + numrecs

    def read_i():
        nonlocal pos
        (v,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        return v

    def read_name():
        nonlocal pos
        n = read_i()
        raw = buf[pos : pos + n].decode()
        pos += n + (-n % 4)
        return raw

    def read_atts():
        nonlocal pos
        tag, n = read_i(), read_i()
        out = {}
        for _ in range(n if tag == _NC_ATTRIBUTE else 0):
            aname = read_name()
            t, count = read_i(), read_i()
            size = _TYPE_SIZE[t] * count
            raw = buf[pos : pos + size]
            pos += size + (-size % 4)
            if t == 2:
                out[aname] = raw.decode()
            else:
                vals = np.frombuffer(raw, _TYPE_NP[t])
                out[aname] = vals[0] if count == 1 else vals
        return out

    tag, ndims = read_i(), read_i()
    dim_names, dim_sizes = [], []
    for _ in range(ndims if tag == _NC_DIMENSION else 0):
        dim_names.append(read_name())
        dim_sizes.append(read_i())
    gattrs = read_atts()
    tag, nvars = read_i(), read_i()
    variables = {}
    for _ in range(nvars if tag == _NC_VARIABLE else 0):
        vname = read_name()
        nd = read_i()
        vdims = tuple(dim_names[read_i()] for _ in range(nd))
        attrs = read_atts()
        t, _vsize, begin = read_i(), read_i(), read_i()
        shape = tuple(dim_sizes[dim_names.index(d)] for d in vdims)
        count = int(np.prod(shape)) if shape else 1
        data = np.frombuffer(buf, _TYPE_NP[t], count=count, offset=begin).reshape(
            shape
        )
        variables[vname] = {"dims": vdims, "data": data.copy(), "attrs": attrs}
    return {
        "dims": dict(zip(dim_names, dim_sizes)),
        "variables": variables,
        "attrs": gattrs,
    }
