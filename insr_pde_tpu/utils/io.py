"""Array/pointcloud output writers.

Replaces the reference's open3d PLY dump (elasticity/visualize.py
write_pointcloud_to_file) with a dependency-free ASCII PLY writer.
"""

from __future__ import annotations

import numpy as np


def write_pointcloud_to_file(path: str, points, colors=None):
    """Write an (N, 2|3) point cloud to ASCII PLY. 2D points get z=0."""
    pts = np.asarray(points, dtype=np.float32)
    if pts.shape[1] == 2:
        pts = np.concatenate([pts, np.zeros((pts.shape[0], 1), np.float32)],
                             axis=1)
    n = pts.shape[0]
    header = ["ply", "format ascii 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    cols = None
    if colors is not None:
        cols = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")
    with open(path, "w") as f:
        f.write("\n".join(header) + "\n")
        for i in range(n):
            line = f"{pts[i, 0]:.6f} {pts[i, 1]:.6f} {pts[i, 2]:.6f}"
            if cols is not None:
                line += f" {cols[i, 0]} {cols[i, 1]} {cols[i, 2]}"
            f.write(line + "\n")
