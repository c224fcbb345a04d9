"""PLY mesh reader (reference util/mesh.cpp TriQuadMesh::ReadPLY via ext/rply).

Supports ascii and binary_little/big_endian, vertex properties x/y/z,
nx/ny/nz, u/v (or s/t), and face vertex_indices lists (triangles + quads,
quads split). Pure numpy."""
from __future__ import annotations

import numpy as np

_TYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


_PLY_CACHE = {}


def read_ply(path):
    """Memoized by (path, mtime) — the role of the reference BufferCache
    (util/buffercache.h:33): identical mesh buffers load once."""
    import os
    key = (str(path), os.path.getmtime(path))
    if key in _PLY_CACHE:
        return _PLY_CACHE[key]
    out = _read_ply_impl(path)
    _PLY_CACHE[key] = out
    return out


def _read_ply_impl(path):
    """Returns dict(vertices (V,3) f32, indices (F,3) i64, normals (V,3)|None,
    uvs (V,2)|None)."""
    with open(path, "rb") as f:
        data = f.read()
    # header
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii", "replace").splitlines()
    body = data[end:]
    assert header[0].strip() == "ply"
    fmt = None
    elements = []  # (name, count, [(prop_type, prop_name) or ('list', ct, t, name)])
    for line in header[1:]:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
            else:
                elements[-1][2].append((parts[1], parts[2]))

    verts = normals = uvs = None
    faces = []
    if fmt == "ascii":
        tokens = body.split()
        pos = 0
        for name, count, props in elements:
            if name == "vertex":
                ncol = len(props)
                arr = np.array(tokens[pos:pos + count * ncol], np.float64).reshape(count, ncol)
                pos += count * ncol
                cols = {p[1]: i for i, p in enumerate(props)}
                verts, normals, uvs = _extract_vertex(arr, cols)
            elif name == "face":
                for _ in range(count):
                    n = int(tokens[pos]); pos += 1
                    idx = [int(tokens[pos + i]) for i in range(n)]
                    pos += n
                    _add_face(faces, idx)
            else:
                # skip unknown element (ascii: assume fixed props)
                pos += count * len(props)
    else:
        endian = "<" if "little" in fmt else ">"
        off = 0
        for name, count, props in elements:
            if name == "vertex" and all(p[0] != "list" for p in props):
                dt = np.dtype([(p[1], endian + _TYPES[p[0]]) for p in props])
                arr_s = np.frombuffer(body, dt, count, off)
                off += dt.itemsize * count
                cols = {p[1]: i for i, p in enumerate(props)}
                arr = np.stack([arr_s[p[1]].astype(np.float64) for p in props], 1)
                verts, normals, uvs = _extract_vertex(arr, cols)
            elif name == "face":
                for _ in range(count):
                    (ct, it, _nm) = (props[0][1], props[0][2], props[0][3])
                    cdt = np.dtype(endian + _TYPES[ct])
                    n = int(np.frombuffer(body, cdt, 1, off)[0])
                    off += cdt.itemsize
                    idt = np.dtype(endian + _TYPES[it])
                    idx = np.frombuffer(body, idt, n, off).tolist()
                    off += idt.itemsize * n
                    _add_face(faces, idx)
            else:
                # skip fixed-size unknown elements
                if all(p[0] != "list" for p in props):
                    dt = np.dtype([(f"c{i}", endian + _TYPES[p[0]])
                                   for i, p in enumerate(props)])
                    off += dt.itemsize * count
                else:
                    raise ValueError(f"unsupported PLY element {name}")
    return dict(vertices=np.asarray(verts, np.float32),
                indices=np.asarray(faces, np.int64).reshape(-1, 3),
                normals=None if normals is None else np.asarray(normals, np.float32),
                uvs=None if uvs is None else np.asarray(uvs, np.float32))


def _extract_vertex(arr, cols):
    verts = np.stack([arr[:, cols["x"]], arr[:, cols["y"]], arr[:, cols["z"]]], 1)
    normals = uvs = None
    if "nx" in cols:
        normals = np.stack([arr[:, cols["nx"]], arr[:, cols["ny"]], arr[:, cols["nz"]]], 1)
    for (ux, vx) in (("u", "v"), ("s", "t")):
        if ux in cols and vx in cols:
            uvs = np.stack([arr[:, cols[ux]], arr[:, cols[vx]]], 1)
            break
    return verts, normals, uvs


def _add_face(faces, idx):
    for k in range(1, len(idx) - 1):
        faces.append([idx[0], idx[k], idx[k + 1]])


def write_ply(path, vertices, indices, normals=None, uvs=None):
    """Binary little-endian writer (reference WritePLY, util/mesh.cpp:183)."""
    v = np.asarray(vertices, np.float32)
    f = np.asarray(indices, np.int32)
    lines = ["ply", "format binary_little_endian 1.0",
             f"element vertex {len(v)}",
             "property float x", "property float y", "property float z"]
    if normals is not None:
        lines += ["property float nx", "property float ny", "property float nz"]
    if uvs is not None:
        lines += ["property float u", "property float v"]
    lines += [f"element face {len(f)}",
              "property list uchar int vertex_indices", "end_header"]
    with open(path, "wb") as out:
        out.write(("\n".join(lines) + "\n").encode())
        cols = [v]
        if normals is not None:
            cols.append(np.asarray(normals, np.float32))
        if uvs is not None:
            cols.append(np.asarray(uvs, np.float32))
        out.write(np.concatenate(cols, 1).astype("<f4").tobytes())
        face_dt = np.dtype([("n", "u1"), ("i", "<i4", 3)])
        fr = np.empty(len(f), face_dt)
        fr["n"] = 3
        fr["i"] = f
        out.write(fr.tobytes())
