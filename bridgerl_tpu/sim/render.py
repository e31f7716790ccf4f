"""Offline skeleton renderer: replay frames -> PNG / GIF / MP4.

Replaces the Isaac viewport/video render layers (reference
scripts/deployment/render_viewport.py, render_video.py, debug_camera_views.py)
with a dependency-light matplotlib 3D skeleton renderer. The reference's
renderer is kinematic-only (no physics stepping); visual output here is line
segments between parent/child link positions from the JAX FK.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from mpl_toolkits.mplot3d.art3d import Line3DCollection  # noqa: E402

from .urdf import CollisionPrim, KinematicChain, rpy_to_matrix

# preset camera views mirroring debug_camera_views.py:189-202 (elev, azim).
# The zero-pose G1 faces +x, so the front camera sits on the +x axis (azim 0).
CAMERA_VIEWS = {
    "front": (10, 0),
    "side": (10, -90),
    "back": (10, 180),
    "far": (25, -45),
}


def skeleton_segments(chain: KinematicChain, positions: np.ndarray) -> np.ndarray:
    """(L, 3) link positions -> (L-1, 2, 3) parent->child segments."""
    segs = []
    for i in range(1, chain.num_links):
        p = chain.parent_index[i]
        segs.append([positions[p], positions[i]])
    return np.asarray(segs)


def _prim_local_grid(prim: CollisionPrim, n: int = 10):
    """Parametric (3, n, m) surface grid of a primitive in its local frame.

    URDF cylinders extend along local Z. Boxes are returned as a closed
    band around the four side faces plus flat top/bottom rows — a single
    plot_surface call per primitive keeps volumetric GIF rendering fast.
    """
    if prim.kind == "sphere":
        (r,) = prim.size
        u = np.linspace(0.0, 2 * np.pi, 2 * n)
        v = np.linspace(0.0, np.pi, n)
        return np.stack([r * np.outer(np.cos(u), np.sin(v)),
                         r * np.outer(np.sin(u), np.sin(v)),
                         r * np.outer(np.ones_like(u), np.cos(v))])
    if prim.kind == "cylinder":
        r, length = prim.size
        u = np.linspace(0.0, 2 * np.pi, 2 * n)
        # closed profile: bottom center -> bottom rim -> top rim -> top center
        prof_r = np.array([0.0, r, r, 0.0])
        prof_z = np.array([-length / 2, -length / 2, length / 2, length / 2])
        return np.stack([np.outer(np.cos(u), prof_r),
                         np.outer(np.sin(u), prof_r),
                         np.outer(np.ones_like(u), prof_z)])
    if prim.kind == "box":
        sx, sy, sz = prim.size
        # perimeter of the XY cross-section (closed), swept over z with
        # degenerate center rows capping top and bottom
        px = np.array([1, 1, -1, -1, 1]) * (sx / 2)
        py = np.array([1, -1, -1, 1, 1]) * (sy / 2)
        zs = np.array([-sz / 2, -sz / 2, sz / 2, sz / 2])
        shrink = np.array([0.0, 1.0, 1.0, 0.0])  # collapse cap rows to axis
        return np.stack([np.outer(px, shrink),
                         np.outer(py, shrink),
                         np.broadcast_to(zs, (5, 4)).copy()])
    raise ValueError(f"unknown collision primitive kind {prim.kind!r}")


def draw_volumetric(ax, chain: KinematicChain, positions: np.ndarray,
                    rotations: np.ndarray, collisions: List[CollisionPrim],
                    color: str = "tab:blue", alpha: float = 0.95) -> int:
    """Draw the body's collision volumes at the FK world pose.

    ``positions``/``rotations``: (L, 3) and (L, 3, 3) world link poses from
    sim/kinematics FK. Primitives whose link is not on the chain (dropped
    fixed decorations) are skipped. Returns the number drawn.
    """
    by_link = {name: i for i, name in enumerate(chain.link_names)}
    drawn = 0
    for prim in collisions:
        li = by_link.get(prim.link)
        if li is None:
            continue
        grid = _prim_local_grid(prim)
        R_prim = rpy_to_matrix(prim.origin_rpy)
        R = rotations[li] @ R_prim
        t = positions[li] + rotations[li] @ np.asarray(prim.origin_pos)
        world = np.einsum("ij,jnm->inm", R, grid) + t[:, None, None]
        ax.plot_surface(world[0], world[1], world[2], color=color,
                        alpha=alpha, linewidth=0, antialiased=False,
                        shade=True)
        drawn += 1
    return drawn


def draw_meshes(ax, chain: KinematicChain, positions: np.ndarray,
                rotations: np.ndarray, meshes, light=(0.4, -0.25, 0.88),
                alpha: float = 1.0) -> int:
    """Draw the vendor visual meshes (sim/mesh.py LinkMesh list) at the FK
    world pose with flat Lambert shading — the mesh-fidelity answer to the
    reference's Omniverse RTX viewport (render_viewport.py:199-201).

    All links' triangles go into ONE Poly3DCollection so matplotlib's
    painter sort (zsort='average') resolves occlusion across bodies.
    """
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    by_link = {name: i for i, name in enumerate(chain.link_names)}
    polys, colors = [], []
    lv = np.asarray(light, np.float64)
    lv = lv / np.linalg.norm(lv)
    for lm in meshes:
        li = by_link.get(lm.link)
        if li is None:
            continue
        R, t = rotations[li], positions[li]
        world = np.einsum("ij,tnj->tni", R, lm.tris.astype(np.float64)) + t
        e1 = world[:, 1] - world[:, 0]
        e2 = world[:, 2] - world[:, 0]
        n = np.cross(e1, e2)
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.clip(norm, 1e-12, None)
        # two-sided flat shading: ambient 0.35 + diffuse 0.65*|n.l|
        shade = 0.35 + 0.65 * np.abs(n @ lv)
        base = np.asarray(lm.color, np.float64)
        polys.append(world)
        colors.append(np.clip(shade[:, None] * base, 0.0, 1.0))
    if not polys:
        return 0
    faces = np.concatenate(polys)
    rgba = np.concatenate(
        [np.concatenate(colors),
         np.full((faces.shape[0], 1), alpha)], axis=1)
    coll = Poly3DCollection(faces, facecolors=rgba, linewidths=0,
                            shade=False, zsort="average")
    ax.add_collection3d(coll)
    return faces.shape[0]


def render_frame(
    chain: KinematicChain,
    positions: np.ndarray,
    out_path: Optional[str] = None,
    view: str = "front",
    lim: Optional[float] = None,
    title: str = "",
    rotations: Optional[np.ndarray] = None,
    collisions: Optional[List[CollisionPrim]] = None,
    meshes=None,
) -> Optional[str]:
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    if meshes is not None and rotations is not None:
        draw_meshes(ax, chain, positions, rotations, meshes)
    elif collisions is not None and rotations is not None:
        draw_volumetric(ax, chain, positions, rotations, collisions)
    else:
        segs = skeleton_segments(chain, positions)
        ax.add_collection3d(
            Line3DCollection(segs, colors="tab:blue", linewidths=2))
        ax.scatter(positions[:, 0], positions[:, 1], positions[:, 2],
                   c="tab:red", s=8)
    # frame the skeleton: cube around the body centroid with a small margin
    center = positions.mean(axis=0)
    extent = float(np.abs(positions - center).max())
    r = max(extent * 1.25, 0.3) if lim is None else lim
    ax.set_xlim(center[0] - r, center[0] + r)
    ax.set_ylim(center[1] - r, center[1] + r)
    ax.set_zlim(max(center[2] - r, 0.0), center[2] + r)
    ax.set_box_aspect((1, 1, 1))
    elev, azim = CAMERA_VIEWS.get(view, CAMERA_VIEWS["front"])
    ax.view_init(elev=elev, azim=azim)
    if title:
        ax.set_title(title)
    ax.set_axis_off()
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return out_path
    # return RGB array for video writers
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf  # type: ignore[return-value]


def render_motion(
    chain: KinematicChain,
    trajectory: np.ndarray,           # (T, L, 3) from G1ReplayScene.rollout
    out_path: str,
    fps: int = 25,
    max_frames: int = 200,
    view: str = "front",
    rotations: Optional[np.ndarray] = None,   # (T, L, 3, 3) for volumetric
    collisions: Optional[List[CollisionPrim]] = None,
    meshes=None,                              # sim/mesh.py LinkMesh list
) -> str:
    """Render a trajectory to GIF or MP4 (by extension) via imageio
    (reference render_viewport.py:210-218, render_video.py:152-159)."""
    import imageio.v2 as imageio

    T = trajectory.shape[0]
    stride = max(1, T // max_frames)
    # fixed framing across the clip (per-frame auto-fit would jitter the camera)
    flat = np.asarray(trajectory).reshape(-1, 3)
    lim = max(float(np.abs(flat - flat.mean(0)).max()) * 1.15, 0.3)
    frames: List[np.ndarray] = []
    for t in range(0, T, stride):
        frames.append(render_frame(
            chain, np.asarray(trajectory[t]), None, view=view, lim=lim,
            rotations=(np.asarray(rotations[t])
                       if rotations is not None else None),
            collisions=collisions, meshes=meshes))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if out_path.endswith(".gif"):
        imageio.mimsave(out_path, frames, duration=1000.0 / fps)  # ms per frame
    else:
        try:
            imageio.mimsave(out_path, frames, fps=fps)
        except Exception:
            # fall back to GIF when no ffmpeg backend is available
            out_path = os.path.splitext(out_path)[0] + ".gif"
            imageio.mimsave(out_path, frames, duration=1000.0 / fps)
    return out_path


def debug_camera_views(
    chain: KinematicChain,
    positions: np.ndarray,
    out_dir: str,
    views: Sequence[str] = ("front", "side", "back", "far"),
) -> List[str]:
    """Shoot the frame-0 pose from preset camera views
    (reference debug_camera_views.py:84-202)."""
    out = []
    for v in views:
        out.append(render_frame(chain, positions, os.path.join(out_dir, f"view_{v}.png"),
                                view=v, title=v))
    return out
