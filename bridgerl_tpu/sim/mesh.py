"""Visual-mesh fidelity renderer data path: vendor STL meshes -> link frames.

The reference renders the actual G1 STL meshes through Omniverse RTX
(reference scripts/deployment/render_viewport.py:199-201, meshes under
assets/g1_local/meshes/g1/). This module closes that last visible gap for
the matplotlib renderer: it loads the vendor binary STLs *as data* at render
time (no mesh files are vendored into the repo), folds every visual —
including ones on fixed/finger decoration links the 29-DoF chain drops —
into its nearest on-chain ancestor frame, and decimates the ~450k-triangle
set to a budget the software renderer can draw per frame.

The mesh root is located via BRIDGERL_G1_URDF or the known read-only vendor
mounts; when absent (end-user machines without the reference assets) loaders
return None and callers fall back to the collision-primitive volumetric body.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .urdf import JointSpec, KinematicChain, parse_urdf_joints, rpy_to_matrix
import xml.etree.ElementTree as ET

# candidate vendor URDFs, first hit wins (reference mount is read-only data)
VENDOR_URDF_CANDIDATES = (
    "/root/reference/assets/g1_local/urdf/g1/main.urdf",
)


def find_vendor_urdf() -> Optional[str]:
    env = os.environ.get("BRIDGERL_G1_URDF")
    if env:
        return env if os.path.exists(env) else None
    for cand in VENDOR_URDF_CANDIDATES:
        if os.path.exists(cand):
            return cand
    return None


def load_stl(path: str) -> np.ndarray:
    """Binary STL -> (T, 3, 3) float32 triangle vertices.

    The vendor G1 files say 'solid ...' in the 80-byte header but are binary
    (size == 84 + 50*n); detect by size, fall back to ASCII parse.
    """
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(84)
        if len(head) == 84:
            (n,) = struct.unpack("<I", head[80:84])
            if size == 84 + 50 * n:
                rec = np.frombuffer(f.read(50 * n), dtype=np.uint8)
                rec = rec.reshape(n, 50)
                # each record: normal (3f), v0 v1 v2 (9f), attr (u16)
                tri = rec[:, 12:48].copy().view("<f4").reshape(n, 3, 3)
                return np.ascontiguousarray(tri, dtype=np.float32)
    # ASCII fallback
    verts: List[List[float]] = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if parts[:1] == ["vertex"]:
                verts.append([float(x) for x in parts[1:4]])
    tri = np.asarray(verts, np.float32)
    return tri.reshape(-1, 3, 3)


def decimate(tris: np.ndarray, target_faces: int) -> np.ndarray:
    """Vertex-clustering decimation: quantize vertices to a grid, collapse
    clusters to their centroid, drop degenerate triangles. Deterministic,
    watertightness-preserving enough for opaque shaded rendering."""
    if tris.shape[0] <= target_faces:
        return tris
    v = tris.reshape(-1, 3)
    lo = v.min(axis=0)
    diag = float(np.linalg.norm(v.max(axis=0) - lo))
    if diag == 0.0:
        return tris[:target_faces]
    cell = diag / 96.0
    for _ in range(24):
        q = np.floor((v - lo) / cell).astype(np.int64)
        # row-unique via a collision-free mix of the 3 grid coords
        key = (q[:, 0] * 73856093) ^ (q[:, 1] * 19349663) ^ (q[:, 2] * 83492791)
        uniq, inverse = np.unique(key, return_inverse=True)
        rep = np.zeros((uniq.shape[0], 3), np.float64)
        cnt = np.bincount(inverse, minlength=uniq.shape[0]).astype(np.float64)
        for d in range(3):
            rep[:, d] = np.bincount(inverse, weights=v[:, d],
                                    minlength=uniq.shape[0]) / cnt
        fidx = inverse.reshape(-1, 3)
        keep = ((fidx[:, 0] != fidx[:, 1]) & (fidx[:, 1] != fidx[:, 2])
                & (fidx[:, 0] != fidx[:, 2]))
        if int(keep.sum()) <= target_faces:
            return rep[fidx[keep]].astype(np.float32)
        cell *= 1.4
    return rep[fidx[keep]][:target_faces].astype(np.float32)


@dataclass
class LinkMesh:
    """Decimated visual triangles expressed in an on-chain link's frame."""

    link: str                 # chain link the triangles are rigid to
    tris: np.ndarray          # (T, 3, 3) float32, link frame
    color: Tuple[float, float, float]


def _compose(R1, t1, R2, t2):
    """(R1,t1) ∘ (R2,t2) — apply 2 then 1."""
    return R1 @ R2, R1 @ t2 + t1


def parse_urdf_visual_entries(urdf_path: str):
    """[(link, resolved mesh path, origin_pos, origin_rpy, rgb color)] for
    every mesh-typed <visual> (reference main.urdf has 35)."""
    root = ET.parse(urdf_path).getroot()
    base = os.path.dirname(urdf_path)
    out = []
    for link in root.iter("link"):
        lname = link.get("name")
        for vis in link.findall("visual"):
            geom = vis.find("geometry")
            mesh = geom.find("mesh") if geom is not None else None
            if mesh is None:
                continue
            fname = os.path.normpath(os.path.join(base, mesh.get("filename")))
            origin = vis.find("origin")
            xyz = [float(x) for x in (origin.get("xyz", "0 0 0").split()
                                      if origin is not None else "0 0 0".split())]
            rpy = [float(x) for x in (origin.get("rpy", "0 0 0").split()
                                      if origin is not None else "0 0 0".split())]
            color = (0.55, 0.55, 0.58)
            mat = vis.find("material")
            if mat is not None and mat.find("color") is not None:
                rgba = [float(x) for x in mat.find("color").get("rgba").split()]
                color = tuple(rgba[:3])
            out.append((lname, fname, xyz, rpy, color))
    return out


def _paths_to_chain(joints: List[JointSpec], chain: KinematicChain):
    """link name -> (chain link, R, t) folding transform: compose every
    off-chain joint (fixed or zero-angle finger joint) up to the nearest
    ancestor the 29-DoF chain kept."""
    on_chain = set(chain.link_names)
    by_child: Dict[str, JointSpec] = {j.child_link: j for j in joints}
    cache: Dict[str, Optional[Tuple[str, np.ndarray, np.ndarray]]] = {}

    def resolve(link: str):
        if link in on_chain:
            return link, np.eye(3), np.zeros(3)
        if link in cache:
            return cache[link]
        j = by_child.get(link)
        if j is None:
            cache[link] = None
            return None
        up = resolve(j.parent_link)
        if up is None:
            cache[link] = None
            return None
        anchor, R_up, t_up = up
        # off-chain joints render at their zero configuration
        R, t = _compose(R_up, t_up, rpy_to_matrix(j.origin_rpy),
                        np.asarray(j.origin_xyz, np.float64))
        cache[link] = (anchor, R, t)
        return cache[link]

    return resolve


def load_link_meshes(
    chain: KinematicChain,
    urdf_path: Optional[str] = None,
    total_budget: int = 24000,
) -> Optional[List[LinkMesh]]:
    """Load + decimate every visual mesh, folded into chain link frames.

    Returns None when no vendor URDF/meshes are reachable (callers fall back
    to the volumetric collision-primitive body).
    """
    urdf_path = urdf_path or find_vendor_urdf()
    if urdf_path is None or not os.path.exists(urdf_path):
        return None
    entries = parse_urdf_visual_entries(urdf_path)
    entries = [e for e in entries if os.path.exists(e[1])]
    if not entries:
        return None
    resolve = _paths_to_chain(parse_urdf_joints(urdf_path), chain)

    raw = []
    counts = []
    for lname, fname, xyz, rpy, color in entries:
        anchor = resolve(lname)
        if anchor is None:
            continue
        tris = load_stl(fname)
        raw.append((anchor, xyz, rpy, color, tris))
        counts.append(tris.shape[0])
    if not raw:
        return None
    total = float(sum(counts))
    out: List[LinkMesh] = []
    for (anchor, xyz, rpy, color, tris), n in zip(raw, counts):
        budget = max(200, int(total_budget * n / total))
        tris = decimate(tris, budget)
        link, R_a, t_a = anchor
        R, t = _compose(R_a, t_a, rpy_to_matrix(rpy), np.asarray(xyz, np.float64))
        world = np.einsum("ij,tnj->tni", R, tris.astype(np.float64)) + t
        out.append(LinkMesh(link=link, tris=world.astype(np.float32),
                            color=color))
    return out


_MESH_CACHE: Dict[Tuple[str, int], Optional[List[LinkMesh]]] = {}


def load_g1_meshes(chain: KinematicChain,
                   total_budget: int = 24000) -> Optional[List[LinkMesh]]:
    urdf = find_vendor_urdf()
    key = (urdf or "", total_budget)
    if key not in _MESH_CACHE:
        _MESH_CACHE[key] = load_link_meshes(chain, urdf, total_budget)
    return _MESH_CACHE[key]
