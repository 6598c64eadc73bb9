"""Minimal PCD (Point Cloud Data) writer/reader — artifact parity with
the reference's `pcl::io::savePCDFileASCII`/`savePCDFileBinary` dumps
(`savingGlobalMap`, `global_manager.cpp:143-170`; GEM submap saves)."""
from __future__ import annotations

import numpy as np

from ..ops.pointcloud import PointCloud


def write_pcd(path: str, xyz: np.ndarray, binary: bool = True, intensity=None):
    """Write Nx3 float32 points (+ optional intensity column)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = xyz.shape[0]
    fields = "x y z" + (" intensity" if intensity is not None else "")
    count = "1 1 1" + (" 1" if intensity is not None else "")
    size = "4 4 4" + (" 4" if intensity is not None else "")
    types = "F F F" + (" F" if intensity is not None else "")
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {size}\n"
        f"TYPE {types}\n"
        f"COUNT {count}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    data = xyz if intensity is None else np.concatenate(
        [xyz, np.asarray(intensity, np.float32).reshape(-1, 1)], axis=1
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            f.write(np.ascontiguousarray(data, np.float32).tobytes())
        else:
            np.savetxt(f, data, fmt="%.6f")


def read_pcd(path: str) -> np.ndarray:
    """Read x/y/z(/intensity) PCD written by write_pcd or PCL."""
    with open(path, "rb") as f:
        header = {}
        n_fields = 3
        while True:
            line = f.readline().decode(errors="replace").strip()
            if line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "FIELDS":
                n_fields = len(val.split())
            if key == "DATA":
                break
        n = int(header["POINTS"])
        if header["DATA"] == "binary":
            raw = np.frombuffer(f.read(4 * n_fields * n), np.float32)
            return raw.reshape(n, n_fields)
        return np.loadtxt(f).reshape(n, n_fields)


def cloud_to_pcd(path: str, pc: PointCloud, binary: bool = True):
    xyz = np.asarray(pc.xyz)[np.asarray(pc.mask)]
    write_pcd(path, xyz, binary=binary)
