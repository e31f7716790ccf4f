"""Kinematic sim layer tests: URDF parsing, FK correctness, motion resampling,
replay scene, renderer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bridgerl_tpu.sim import (
    DEFAULT_ROOT_HEIGHT,
    G1_JOINT_NAMES,
    G1ReplayScene,
    KinematicChain,
    build_chain,
    fk_numpy,
    load_g1_chain,
    load_motion,
    make_batched_fk,
    make_fk,
    render_frame,
    render_motion,
    resample_indices,
    rpy_to_matrix,
    skeleton_segments,
)
from bridgerl_tpu.sim.urdf import JointSpec


@pytest.fixture(scope="module")
def g1():
    return load_g1_chain()


# ---------- chain structure ----------

def test_g1_chain_structure(g1):
    assert g1.num_actuated == 29
    assert g1.actuated_names == G1_JOINT_NAMES
    assert g1.link_names[0] == "pelvis"
    assert g1.parent_index[0] == -1
    assert (g1.parent_index[1:] < np.arange(1, g1.num_links)).all()  # topo order
    # limits loaded (knee upper 2.8798 from the vendor URDF)
    knee = g1.actuated_names.index("left_knee_joint")
    assert abs(g1.upper[knee] - 2.8798) < 1e-4


def test_rpy_matrix_convention():
    np.testing.assert_allclose(rpy_to_matrix([0, 0, 0]), np.eye(3), atol=1e-7)
    # yaw 90deg: x-axis -> y-axis
    R = rpy_to_matrix([0, 0, np.pi / 2])
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-7)


def test_build_chain_simple_two_link():
    joints = [
        JointSpec("j1", "revolute", "base", "l1", [0, 0, 1.0], [0, 0, 0], [0, 0, 1], -1, 1),
        JointSpec("j2", "revolute", "l1", "l2", [1.0, 0, 0], [0, 0, 0], [0, 0, 1], -1, 1),
        JointSpec("decoration", "fixed", "l2", "cam", [0, 0, 0.1], [0, 0, 0], [1, 0, 0]),
    ]
    chain = build_chain(joints, ["j1", "j2"])
    assert chain.num_links == 3  # decoration dropped
    fk = make_fk(chain)
    # q = [90deg, 0]: l2 at base + [0,0,1] + Rz(90)@[1,0,0] = [0,1,1] (+root height offset)
    pos, rot = fk(jnp.array([np.pi / 2, 0.0]), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(pos[2]), [0, 1, 1], atol=1e-6)


# ---------- FK ----------

def test_fk_jax_matches_numpy(g1, rng):
    q = rng.uniform(-0.5, 0.5, size=29).astype(np.float32)
    fk = make_fk(g1)
    pos_j, rot_j = fk(jnp.asarray(q))
    pos_n, rot_n = fk_numpy(g1, q)
    np.testing.assert_allclose(np.asarray(pos_j), pos_n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot_j), rot_n, atol=1e-5)


def test_fk_zero_pose_plausible(g1):
    fk = make_fk(g1)
    pos, _ = fk(jnp.zeros(29))
    pos = np.asarray(pos)
    assert abs(pos[0, 2] - DEFAULT_ROOT_HEIGHT) < 1e-6  # pelvis at fake root height
    names = g1.link_names
    la = pos[names.index("left_ankle_roll_link")]
    ra = pos[names.index("right_ankle_roll_link")]
    assert la[2] < 0.2 and ra[2] < 0.2            # feet near the ground
    assert la[1] > ra[1]                           # left foot on +y side
    lw = pos[names.index("left_wrist_yaw_link")]
    assert lw[2] > la[2]                           # wrists above feet


def test_fk_rotations_are_orthonormal(g1, rng):
    q = rng.uniform(-1, 1, size=29).astype(np.float32)
    _, rot = make_fk(g1)(jnp.asarray(q))
    R = np.asarray(rot)
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-5)


def test_batched_fk_windows(g1, rng):
    q = rng.uniform(-0.3, 0.3, size=(4, 10, 29)).astype(np.float32)
    out = make_batched_fk(g1)(jnp.asarray(q))
    assert out.shape == (4, 10, g1.num_links, 3)
    single = fk_numpy(g1, q[2, 5])[0]
    np.testing.assert_allclose(np.asarray(out[2, 5]), single, atol=1e-4)


# ---------- motion resampling ----------

def test_resample_indices_reference_semantics():
    i0, i1, b = resample_indices(11, input_fps=10, output_fps=20)
    # duration = 1.0s; times = 0,0.05,...,<1.0 -> 20 frames
    assert len(i0) == 20
    assert i0[0] == 0 and b[0] == 0.0
    assert (i1 >= i0).all() and (i1 <= 10).all()


def test_load_motion_upsamples_and_velocities():
    T = 21
    t = np.linspace(0, 2, T, dtype=np.float32)  # 20 fps -> 1 unit/sec slope...
    dof = np.tile(t[:, None], (1, 29))  # linear ramp
    m = load_motion(dof, input_fps=20, output_fps=50)
    assert m.dof_pos.shape[1] == 29
    assert m.num_frames == 50  # duration 1.0s @ 50fps
    # linear ramp: velocity == slope everywhere (2 units/sec)
    np.testing.assert_allclose(np.asarray(m.dof_vel[5:45]), 2.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m.base_pos[:, 2]), DEFAULT_ROOT_HEIGHT, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.base_rot[:, 0]), 1.0, atol=1e-6)


# ---------- replay scene ----------

def test_replay_scene_loop(g1, rng):
    scene = G1ReplayScene(g1)
    dof = rng.uniform(-0.2, 0.2, size=(30, 29)).astype(np.float32)
    m = scene.load(dof, input_fps=20, output_fps=50)
    pos, rot = scene.step()
    assert pos.shape == (g1.num_links, 3)
    # wrap-around flag after a full pass
    wrapped = False
    for _ in range(m.num_frames):
        _, w = scene.get_next_state()
        wrapped = wrapped or w
    assert wrapped


def test_replay_rollout_matches_step(g1, rng):
    scene = G1ReplayScene(g1)
    dof = rng.uniform(-0.2, 0.2, size=(12, 29)).astype(np.float32)
    scene.load(dof, input_fps=20, output_fps=20)
    traj = np.asarray(scene.rollout())
    assert traj.shape[0] == scene.motion.num_frames
    ref = fk_numpy(g1, np.asarray(scene.motion.dof_pos[3]))[0]
    np.testing.assert_allclose(traj[3], ref, atol=1e-4)


# ---------- URDF provenance (round-2 VERDICT item 9) ----------

def test_spec_roundtrips_through_urdf(g1, tmp_path):
    """Bundled spec -> chain_to_urdf -> parse -> build_chain reproduces the
    chain exactly: the URDF->spec extraction path is lossless, so
    scripts/extract_urdf_spec.py can verify the bundled JSON against any
    vendor main.urdf."""
    from bridgerl_tpu.sim.urdf import (
        G1_JOINT_NAMES,
        build_chain,
        chain_to_urdf,
        chains_equal,
        parse_urdf_joints,
    )

    urdf_path = tmp_path / "g1_roundtrip.urdf"
    urdf_path.write_text(chain_to_urdf(g1))
    rebuilt = build_chain(parse_urdf_joints(str(urdf_path)), G1_JOINT_NAMES)
    assert chains_equal(g1, rebuilt) == []


def test_matrix_rpy_roundtrip(rng):
    from bridgerl_tpu.sim.urdf import matrix_to_rpy, rpy_to_matrix

    for _ in range(20):
        rpy = rng.uniform(-np.pi, np.pi, 3)
        rpy[1] = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01)  # avoid gimbal
        R = rpy_to_matrix(rpy)
        R2 = rpy_to_matrix(matrix_to_rpy(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)
    # gimbal case still reproduces the MATRIX (rpy itself is non-unique there)
    R = rpy_to_matrix([0.3, np.pi / 2, 0.0])
    np.testing.assert_allclose(R, rpy_to_matrix(matrix_to_rpy(R)), atol=1e-5)


def test_vendor_urdf_matches_bundled_spec():
    """Runs only when a vendor main.urdf is present (zero-egress images skip);
    the committed spec must equal the fresh extraction."""
    import os
    cand = os.environ.get("G1_URDF_PATH", "assets/g1_local/urdf/g1/main.urdf")
    if not os.path.exists(cand):
        pytest.skip(f"no vendor URDF at {cand}")
    from bridgerl_tpu.sim.urdf import (
        G1_JOINT_NAMES, build_chain, chains_equal, load_g1_chain, parse_urdf_joints)
    fresh = build_chain(parse_urdf_joints(cand), G1_JOINT_NAMES)
    assert chains_equal(load_g1_chain(), fresh) == []


# ---------- rendering ----------

def test_render_frame_and_motion(g1, tmp_path, rng):
    scene = G1ReplayScene(g1)
    dof = rng.uniform(-0.2, 0.2, size=(8, 29)).astype(np.float32)
    scene.load(dof, input_fps=20, output_fps=20)
    traj = np.asarray(scene.rollout())
    p = render_frame(g1, traj[0], str(tmp_path / "frame.png"))
    import os
    assert os.path.getsize(p) > 0
    gif = render_motion(g1, traj, str(tmp_path / "motion.gif"), max_frames=4)
    assert os.path.getsize(gif) > 0
    segs = skeleton_segments(g1, traj[0])
    assert segs.shape == (g1.num_links - 1, 2, 3)


# ---------- volumetric rendering ----------

def test_bundled_spec_has_collision_primitives(g1):
    """The spec bundles the vendor URDF's collision volumes (sphere/cylinder/
    box) for the volumetric renderer; every primitive's link must be on the
    chain and its numbers finite."""
    from bridgerl_tpu.sim import load_g1_collisions
    prims = load_g1_collisions()
    assert len(prims) >= 20   # 29 extracted from the vendor G1 URDF
    links = set(g1.link_names)
    kinds = {"sphere", "cylinder", "box"}
    for p in prims:
        assert p.link in links
        assert p.kind in kinds
        assert np.all(np.isfinite(p.size)) and np.all(np.array(p.size) > 0)
        assert np.all(np.isfinite(p.origin_pos))
    # the major bodies are covered: pelvis, both thighs/shins/feet, torso,
    # both upper arms/forearms/hands
    covered = {p.link for p in prims}
    for need in ("pelvis", "torso_link", "left_knee_link", "right_knee_link",
                 "left_elbow_link", "right_elbow_link",
                 "left_ankle_roll_link", "right_ankle_roll_link"):
        assert need in covered, need


def test_volumetric_render_frame_and_motion(g1, tmp_path, rng):
    from bridgerl_tpu.sim import load_g1_collisions, render_frame
    from bridgerl_tpu.sim.kinematics import fk_numpy
    import os
    prims = load_g1_collisions()
    pos, rot = fk_numpy(g1, np.zeros(29))
    p = render_frame(g1, pos, str(tmp_path / "vol.png"),
                     rotations=rot, collisions=prims)
    assert os.path.getsize(p) > 0
    # volumetric frame covers more pixels than the line skeleton
    import imageio.v2 as imageio
    sk = render_frame(g1, pos, str(tmp_path / "sk.png"))
    vol_ink = (imageio.imread(p)[..., :3] < 250).any(-1).sum()
    sk_ink = (imageio.imread(sk)[..., :3] < 250).any(-1).sum()
    assert vol_ink > sk_ink
    # animated path: rollout_full feeds rotations
    scene = G1ReplayScene(g1)
    dof = rng.uniform(-0.2, 0.2, size=(4, 29)).astype(np.float32)
    scene.load(dof, input_fps=20, output_fps=20)
    traj, rots = (np.asarray(a) for a in scene.rollout_full())
    gif = render_motion(g1, traj, str(tmp_path / "vol.gif"), max_frames=2,
                        rotations=rots, collisions=prims)
    assert os.path.getsize(gif) > 0


def test_rollout_full_matches_rollout(g1, rng):
    scene = G1ReplayScene(g1)
    dof = rng.uniform(-0.3, 0.3, size=(5, 29)).astype(np.float32)
    scene.load(dof, input_fps=20, output_fps=20)
    pos = np.asarray(scene.rollout())
    pos2, rot = (np.asarray(a) for a in scene.rollout_full())
    assert np.allclose(pos, pos2, atol=1e-5)
    # rotations are orthonormal
    eye = np.einsum("tlij,tlkj->tlik", rot, rot)
    assert np.allclose(eye, np.eye(3), atol=1e-4)


# ---------- live viewport ----------

def test_live_viewer_page_and_server(g1, rng):
    """The interactive viewport page embeds every frame, balances its JS, and
    serves over localhost (the reference's live-viewport counterpart,
    play_g1_npy.py:194-210)."""
    import re
    import threading
    import urllib.request

    from bridgerl_tpu.sim.live import (
        build_viewer_html, motion_to_frames, serve_viewer)

    q = rng.uniform(-0.3, 0.3, size=(5, g1.num_actuated)).astype(np.float32)
    pos = motion_to_frames(g1, q)
    assert pos.shape == (5, g1.num_links, 3)
    ref = fk_numpy(g1, q[3])[0]
    np.testing.assert_allclose(pos[3], ref, atol=1e-5)

    html = build_viewer_html(g1, pos, fps=20.0, title="t")
    js = re.search(r"<script>(.*)</script>", html, re.S).group(1)
    for a, b in ("()", "[]", "{}"):
        assert js.count(a) == js.count(b)
    assert f"const FRAMES = {np.round(pos, 4).tolist()}".replace("'", '"') \
        .split("=")[0] in js  # frames embedded
    assert str(g1.parent_index.tolist()) in js.replace(" ", "") or \
        str(g1.parent_index.tolist()).replace(" ", "") in js.replace(" ", "")

    # the server binds inside the thread, so early connects can be refused or
    # half-served on the loaded 1-core host (observed flake). Budget several
    # requests, daemonize, and retry the GET until a full body arrives.
    import time
    t = threading.Thread(target=serve_viewer, args=(html, 8739, 8), daemon=True)
    t.start()
    deadline = time.time() + 20
    body = b""
    while body != html.encode():
        try:
            body = urllib.request.urlopen("http://127.0.0.1:8739/", timeout=10).read()
        except (urllib.error.URLError, ConnectionError, TimeoutError):
            pass
        if body != html.encode() and time.time() > deadline:
            raise AssertionError(f"viewer never served the page "
                                 f"(last body: {len(body)} bytes)")
        time.sleep(0.05)
    assert body.decode() == html


def test_live_viewer_volumetric_page(g1, rng):
    """Volumetric page variant: capsules embedded, JS balanced, sphere rows
    have equal endpoints and cylinder rows span their length."""
    import re

    from bridgerl_tpu.sim import load_g1_collisions
    from bridgerl_tpu.sim.live import build_viewer_html, motion_to_frames, \
        motion_to_volumes

    prims = load_g1_collisions()
    q = rng.uniform(-0.3, 0.3, size=(3, g1.num_actuated)).astype(np.float32)
    pos = motion_to_frames(g1, q)
    vols = motion_to_volumes(g1, q, prims)
    assert vols.shape == (3, len(prims), 7)
    assert np.all(vols[..., 6] > 0)
    for pi, p in enumerate(prims):
        seg = np.linalg.norm(vols[0, pi, 3:6] - vols[0, pi, :3])
        if p.kind == "sphere":
            assert seg < 1e-6
        elif p.kind == "cylinder":
            assert abs(seg - p.size[1]) < 1e-4

    html = build_viewer_html(g1, pos, fps=20.0, volumes=vols)
    js = re.search(r"<script>(.*)</script>", html, re.S).group(1)
    for a, b in ("()", "[]", "{}"):
        assert js.count(a) == js.count(b)
    assert "const VOLS = [[[" in html          # capsules embedded
    assert "const VOLS = null" in build_viewer_html(g1, pos, fps=20.0)

    with pytest.raises(ValueError):
        build_viewer_html(g1, pos, volumes=vols[:2])  # T mismatch


def test_viewer_rejects_empty_trajectory(g1):
    """A single-frame input resamples to zero frames; the page builder must
    fail with a diagnosis instead of emitting JS that dies on FRAMES[0]."""
    from bridgerl_tpu.sim.live import build_viewer_html

    with pytest.raises(ValueError, match="zero frames"):
        build_viewer_html(g1, np.zeros((0, g1.num_links, 3), np.float32))
    with pytest.raises(ValueError, match="link positions"):
        build_viewer_html(g1, np.zeros((5, 3), np.float32))


# ---------- visual-mesh rendering (sim/mesh.py) ----------

def test_stl_parser_and_decimation(tmp_path):
    """Synthetic binary STL roundtrip + vertex-clustering decimation."""
    import struct
    from bridgerl_tpu.sim.mesh import decimate, load_stl

    rng = np.random.default_rng(0)
    tris = rng.normal(size=(50, 3, 3)).astype(np.float32)
    path = tmp_path / "t.stl"
    with open(path, "wb") as f:
        f.write(b"solid fake".ljust(80))      # vendor files lie in the header
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, "<f4").tobytes())
            f.write(t.astype("<f4").tobytes())
            f.write(struct.pack("<H", 0))
    back = load_stl(str(path))
    np.testing.assert_allclose(back, tris, rtol=0, atol=0)
    # decimation respects the budget and keeps the bounding box roughly
    dec = decimate(back, 20)
    assert dec.shape[0] <= 20 and dec.shape[1:] == (3, 3)
    assert np.abs(dec).max() <= np.abs(tris).max() + 1e-5


def test_mesh_loader_gates_on_missing_mount(monkeypatch, g1):
    """End-user machines without the reference mount fall back to None."""
    from bridgerl_tpu.sim import mesh

    monkeypatch.setattr(mesh, "VENDOR_URDF_CANDIDATES", ("/nonexistent.urdf",))
    monkeypatch.delenv("BRIDGERL_G1_URDF", raising=False)
    assert mesh.load_link_meshes(g1, None) is None


def test_vendor_mesh_render(g1, tmp_path):
    """Runs only where the read-only reference asset mount exists: all 35
    visuals fold onto the 29-DoF chain and the shaded mesh frame covers more
    pixels than the volumetric body."""
    from bridgerl_tpu.sim.mesh import find_vendor_urdf, load_g1_meshes

    if find_vendor_urdf() is None:
        pytest.skip("no vendor URDF mount")
    from bridgerl_tpu.sim import load_g1_collisions, render_frame
    from bridgerl_tpu.sim.kinematics import fk_numpy
    import os

    meshes = load_g1_meshes(g1)
    assert meshes and len(meshes) == 35
    assert {m.link for m in meshes} <= set(g1.link_names)
    total = sum(m.tris.shape[0] for m in meshes)
    assert 5000 < total <= 24000 + 35 * 200
    pos, rot = fk_numpy(g1, np.zeros(29))
    p = render_frame(g1, pos, str(tmp_path / "mesh.png"),
                     rotations=rot, meshes=meshes)
    assert os.path.getsize(p) > 0
    import imageio.v2 as imageio
    prims = load_g1_collisions()
    v = render_frame(g1, pos, str(tmp_path / "vol.png"),
                     rotations=rot, collisions=prims)
    mesh_ink = (imageio.imread(p)[..., :3] < 250).any(-1).sum()
    vol_ink = (imageio.imread(v)[..., :3] < 250).any(-1).sum()
    assert mesh_ink > 0.5 * vol_ink   # comparable body coverage


def test_live_viewer_mesh_page(g1, rng):
    """Mesh-mode viewer page embeds link-frame triangles + per-frame
    rotations and stays well-formed (vendor-mount gated)."""
    from bridgerl_tpu.sim.mesh import find_vendor_urdf, load_g1_meshes

    if find_vendor_urdf() is None:
        pytest.skip("no vendor URDF mount")
    from bridgerl_tpu.sim.live import (
        build_viewer_html,
        meshes_payload,
        motion_to_poses,
    )

    meshes = load_g1_meshes(g1)
    payload = meshes_payload(g1, meshes, total_budget=600)
    assert payload and all(len(m["tris"]) % 9 == 0 for m in payload)
    assert sum(len(m["tris"]) // 9 for m in payload) <= 600 + 60 * len(payload)
    q = rng.uniform(-0.2, 0.2, size=(3, 29)).astype(np.float32)
    pos, rot = motion_to_poses(g1, q)
    html = build_viewer_html(g1, pos, meshes=payload, rotations=rot)
    assert '"li":' in html and "const MESHES = [" in html
    assert "const ROTS = [[[" in html
    # rotations are required with meshes
    with pytest.raises(ValueError):
        build_viewer_html(g1, pos, meshes=payload)
