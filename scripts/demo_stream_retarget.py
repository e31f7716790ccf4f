#!/usr/bin/env python
"""Live-retargeting demo: human motion feed -> streaming retargeter -> G1.

Ties the whole deployment stack together in one command, frame by frame, the
way a live robot controller would consume it:

    synthetic human feed (or a saved 126-D npy)
      -> StreamingRetargeter over a frozen StableHLO artifact
         (emits each robot frame when it is final; latency window+1 frames)
      -> vmapped FK -> GIF / live browser viewport

The reference's pipeline is strictly offline (record -> export_motion ->
play_g1_npy); this demonstrates the same model driving a live consumer.

    python scripts/demo_stream_retarget.py --ckpt ckpts/..._best.ckpt \
        --frames 240 --render demo_stream.gif
    # or with no checkpoint (fresh-init weights; motion still flows):
    python scripts/demo_stream_retarget.py --render demo_stream.gif
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None,
                   help="trained checkpoint (fresh-init flagship when absent)")
    p.add_argument("--artifact", type=str, default=None,
                   help="pre-built serving zip (skips export)")
    p.add_argument("--input_file", type=str, default=None,
                   help="(T, 126) raw human npy; synthetic feed when absent")
    p.add_argument("--data_dir", type=str, default="./data/processed")
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--step", type=int, default=None,
                   help="streaming stride (default window // 2)")
    p.add_argument("--render", type=str, default="demo_stream.gif",
                   help="output GIF/MP4; 'live' serves the browser viewport")
    p.add_argument("--fps", type=int, default=25)
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    from bridgerl_tpu.export import load_serving_artifact
    from bridgerl_tpu.export.streaming import StreamingRetargeter

    # ---- artifact ----
    if args.artifact:
        art = args.artifact
    else:
        art = str(Path(tempfile.mkdtemp(prefix="demo_serving_")) / "model.zip")
        if args.ckpt:
            from bridgerl_tpu.export import export_serving_artifact
            export_serving_artifact(args.ckpt, art, data_dir=args.data_dir)
        else:
            from bridgerl_tpu.export.serialize import export_fresh_artifact
            export_fresh_artifact(art, window=10, data_dir=args.data_dir)
            print("[WARN] no --ckpt: fresh-init weights (motion flows, "
                  "retargeting is untrained)")
    mod = load_serving_artifact(art)
    W = mod.window_size
    h_dim = mod.meta["functions"]["retarget"]["input"][2]

    # ---- human feed ----
    if args.input_file:
        feed = np.load(args.input_file).astype(np.float32)[:args.frames]
    else:
        from bridgerl_tpu.data.rotations import compute_6d_rotation
        from bridgerl_tpu.data.synthetic import synth_pair
        _, human_aa = synth_pair(np.random.default_rng(0), args.frames)
        feed = np.asarray(compute_6d_rotation(human_aa), np.float32)
    assert feed.shape[1] == h_dim, (feed.shape, h_dim)

    # ---- stream ----
    S = args.step or max(W // 2, 1)
    sr = StreamingRetargeter(lambda x: np.asarray(mod.retarget(x)),
                             window=W, step=S, in_dim=h_dim)
    out_frames, push_ms = [], []
    t_start = time.perf_counter()
    for frame in feed:
        t0 = time.perf_counter()
        out = sr.push(frame)
        push_ms.append(1e3 * (time.perf_counter() - t0))
        if out.size:
            out_frames.append(out)
    tail = sr.flush()
    if tail.size:
        out_frames.append(tail)
    if not out_frames:
        sys.exit(f"feed too short: {feed.shape[0]} frames <= window {W} "
                 f"produce no output (need at least window+1 frames)")
    robot = np.concatenate(out_frames, axis=0)
    wall = time.perf_counter() - t_start
    print(f"streamed {feed.shape[0]} human frames -> {robot.shape[0]} robot "
          f"frames in {wall:.2f}s (median push {np.median(push_ms):.2f} ms, "
          f"latency {sr.latency_frames} frames)")

    # ---- drive the G1 ----
    from bridgerl_tpu.sim.replay import G1ReplayScene
    scene = G1ReplayScene()
    scene.load(robot, input_fps=float(args.fps), output_fps=float(args.fps))
    traj = np.asarray(scene.rollout())
    if args.render == "live":
        from bridgerl_tpu.sim.live import build_viewer_html, serve_viewer
        html = build_viewer_html(scene.chain, traj, fps=float(args.fps),
                                 title="streamed retargeting")
        serve_viewer(html)
    else:
        from bridgerl_tpu.sim.render import render_motion
        path = render_motion(scene.chain, traj, args.render, fps=args.fps)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
