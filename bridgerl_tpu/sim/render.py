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

from .urdf import KinematicChain

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


def render_frame(
    chain: KinematicChain,
    positions: np.ndarray,
    out_path: Optional[str] = None,
    view: str = "front",
    lim: Optional[float] = None,
    title: str = "",
) -> Optional[str]:
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    segs = skeleton_segments(chain, positions)
    ax.add_collection3d(Line3DCollection(segs, colors="tab:blue", linewidths=2))
    ax.scatter(positions[:, 0], positions[:, 1], positions[:, 2], c="tab:red", s=8)
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
        frames.append(render_frame(chain, np.asarray(trajectory[t]), None, view=view, lim=lim))
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
