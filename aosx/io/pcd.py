"""PCD point-cloud IO for map replay (C16: the reference replays
/lio_sam/mapping/global_map PointCloud2 messages; offline those live as .pcd
files from LIO-SAM's save_map service).

Supports ASCII and binary PCD v0.7 with x/y/z fields (extra fields are
skipped). A native C++ fast path for large binary files lives in
aosx/native (used automatically when built)."""

from __future__ import annotations

import numpy as np


def _native_loader():
    try:
        from ..native import binding

        return binding.load_pcd_xyz if binding.available() else None
    except Exception:
        return None


def load_pcd(path: str) -> np.ndarray:
    """Returns [N,3] float32 xyz."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "DATA":
                break
        fields = header.get("FIELDS", "x y z").split()
        sizes = list(map(int, header.get("SIZE", "4 4 4").split()))
        types = header.get("TYPE", "F F F").split()
        counts = list(map(int, header.get("COUNT", " ".join("1" * len(fields))).split()))
        n = int(header.get("POINTS", header.get("WIDTH", "0")))
        data_kind = header["DATA"]

        if data_kind == "ascii":
            body = np.loadtxt(f, dtype=np.float64, max_rows=n)
            if body.ndim == 1:
                body = body[None, :]
            cols = {}
            ci = 0
            for fld, cnt in zip(fields, counts):
                cols[fld] = ci
                ci += cnt
            xyz = np.stack(
                [body[:, cols["x"]], body[:, cols["y"]], body[:, cols["z"]]], axis=1
            )
            return xyz.astype(np.float32)
        elif data_kind == "binary":
            native = _native_loader()
            if native is not None:
                f.seek(0)
                return native(path)
            tmap = {("F", 4): "f4", ("F", 8): "f8", ("U", 1): "u1", ("U", 2): "u2",
                    ("U", 4): "u4", ("I", 1): "i1", ("I", 2): "i2", ("I", 4): "i4"}
            dt = []
            for fld, t, sz, cnt in zip(fields, types, sizes, counts):
                base = tmap[(t, sz)]
                dt.append((fld, base, (cnt,)) if cnt > 1 else (fld, base))
            arr = np.frombuffer(f.read(), dtype=np.dtype(dt), count=n)
            return np.stack(
                [arr["x"].astype(np.float32), arr["y"].astype(np.float32),
                 arr["z"].astype(np.float32)], axis=1
            )
        else:
            raise ValueError(f"unsupported PCD DATA kind: {data_kind}")


def save_pcd(path: str, xyz: np.ndarray, binary: bool = True):
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            f.write(np.ascontiguousarray(xyz).tobytes())
        else:
            np.savetxt(f, xyz, fmt="%.6f")
