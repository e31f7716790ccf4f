#!/usr/bin/env python
"""Sample NOVEL G1 motion from a trained motion-token prior.

The generation loop the reference's title promises but never ships: the prior
(scripts/train_prior.py) samples new token grids from the learned code
distribution; the VQ-VAE's decoder turns them back into joint trajectories
(ops/code_decode + decode_latent + overlap-add stitch); the kinematic scene
renders them.

    python scripts/generate_motions.py --ckpt checkpoints/..._best.ckpt \
        --prior checkpoints/prior.ckpt --num 4 --positions 32 \
        --out_dir motions/generated --render
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="trained VQ-VAE checkpoint")
    p.add_argument("--prior", required=True, help="token-prior checkpoint")
    p.add_argument("--data_dir", default="data/processed")
    p.add_argument("--out_dir", default="motions/generated")
    p.add_argument("--num", type=int, default=4, help="motions to sample")
    p.add_argument("--positions", type=int, default=32,
                   help="windows per motion (length = stride*(N-1)+W frames)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None,
                   help="nucleus sampling: keep the smallest token set with "
                        "this probability mass")
    p.add_argument("--guide_dyn", type=float, default=0.0,
                   help="dynamics-preserving guide weight (needs --guide>=2)")
    p.add_argument("--guide", type=int, default=0,
                   help="overlap-consistency guided sampling: candidates "
                        "per position (0/1 = off, e.g. 8)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render", action="store_true",
                   help="also render each sample to a skeleton GIF")
    p.add_argument("--volumetric", action="store_true",
                   help="render collision-primitive body volumes instead of "
                        "the line skeleton")
    p.add_argument("--mesh", action="store_true",
                   help="render vendor visual STL meshes (reference asset "
                        "mount as data; falls back to --volumetric)")
    p.add_argument("--fps", type=int, default=20, help="assumed motion fps")
    p.add_argument("--eval", action="store_true",
                   help="report motion statistics vs the training data")
    p.add_argument("--action", default=None,
                   help="action class for a conditioned prior (see the "
                        "checkpoint's class_names); all samples use it")
    p.add_argument("--prompt_take", type=int, default=None,
                   help="prompted continuation: tokenize this full_raw take "
                        "and anchor each sample's first --prompt_positions "
                        "positions on its real tokens (exposure-bias "
                        "mitigation; also the motion-continuation API)")
    p.add_argument("--prompt_positions", type=int, default=8,
                   help="prompt length in positions (with --prompt_take)")
    p.add_argument("--ref_normalize", action="store_true",
                   help="treat decoder output as normalized, like the "
                        "reference deployment (must match the prior's "
                        "tokenization; see scripts/train_prior.py)")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    from bridgerl_tpu.export.motion_export import (
        load_model_from_checkpoint,
        load_stats,
    )
    from bridgerl_tpu.train.prior import load_prior_checkpoint, sample_motion

    vq_model, vq_vars, exp = load_model_from_checkpoint(args.ckpt)
    prior_model, prior_vars, pcfg = load_prior_checkpoint(args.prior)
    if pcfg.source_experiment and pcfg.source_experiment != exp.id:
        print(f"[WARN] prior was trained on '{pcfg.source_experiment}', "
              f"decoding through '{exp.id}'")
    if args.ref_normalize:
        mean, std = load_stats(args.data_dir)
    else:
        mean, std = np.zeros(1, np.float32), np.ones(1, np.float32)

    class_ids = None
    if pcfg.class_names:
        if args.action is None:
            raise SystemExit(f"--action required; one of {pcfg.class_names}")
        if args.action not in pcfg.class_names:
            raise SystemExit(f"unknown action {args.action!r}; "
                             f"choose from {pcfg.class_names}")
        class_ids = np.full(args.num, pcfg.class_names.index(args.action),
                            np.int32)
    elif args.action is not None:
        raise SystemExit("--action given but the prior is unconditioned")

    prompt = None
    if args.prompt_take is not None:
        from bridgerl_tpu.train.prior import extract_code_grids
        full_raw = Path(args.data_dir) / "g1_train_full_raw.npy"
        seqs = list(np.load(full_raw, allow_pickle=True))
        if not 0 <= args.prompt_take < len(seqs):
            raise SystemExit(f"--prompt_take {args.prompt_take} outside "
                             f"[0, {len(seqs)})")
        grids, gmask, gp, _ = extract_code_grids(
            vq_model, vq_vars, exp, [seqs[args.prompt_take]], mean, std,
            pcfg.stride, max_len=pcfg.max_len)
        avail = int(gmask[0].sum())
        if args.prompt_positions >= args.positions:
            raise SystemExit("--prompt_positions must be < --positions")
        if avail < args.prompt_positions:
            raise SystemExit(f"take {args.prompt_take} has only {avail} "
                             f"positions (< {args.prompt_positions})")
        prompt = grids[0, :args.prompt_positions]
        print(f"[INFO] prompting on take {args.prompt_take}: "
              f"{args.prompt_positions}/{args.positions} positions anchored")

    motions, windows = sample_motion(
        vq_model, vq_vars, exp, prior_model, prior_vars, mean, std,
        n_samples=args.num, n_positions=args.positions,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        seed=args.seed, guide_candidates=args.guide,
        guide_dyn=args.guide_dyn,
        class_ids=class_ids, prompt=prompt, return_windows=True)

    if args.eval:
        from bridgerl_tpu.eval.generation import (
            compare_to_data,
            format_report,
            overlap_disagreement,
        )
        full_raw = Path(args.data_dir) / "g1_train_full_raw.npy"
        ref = (list(np.load(full_raw, allow_pickle=True)) if full_raw.exists()
               else list(np.load(Path(args.data_dir) / "g1_train.npy")))
        print(format_report(compare_to_data(motions, ref)))
        dis = np.mean([overlap_disagreement(w, pcfg.stride) for w in windows])
        print(f"  window overlap disagreement RMS {dis:.4f} "
              f"(data windows: 0 by construction)")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, m in enumerate(motions):
        tag = f"_{args.action}" if args.action else ""
        if args.prompt_take is not None:
            tag += f"_p{args.prompt_take}x{args.prompt_positions}"
        path = out_dir / (f"gen_{exp.id}{tag}_N{args.positions}"
                          f"_T{args.temperature:g}_seed{args.seed}_idx{i}.npy")
        np.save(path, m)
        print(f"[INFO] sample {i}: {m.shape[0]} frames "
              f"({m.shape[0] / args.fps:.1f}s @ {args.fps}fps) -> {path}")
        if args.render:
            from bridgerl_tpu.sim import (
                G1ReplayScene, load_g1_chain, load_g1_collisions, render_motion)
            chain = load_g1_chain(None)
            scene = G1ReplayScene(chain)
            scene.load(m, args.fps, args.fps)
            rotations = collisions = meshes = None
            if args.mesh:
                from bridgerl_tpu.sim.mesh import load_g1_meshes
                meshes = load_g1_meshes(chain)
            if args.volumetric and not meshes:
                collisions = load_g1_collisions() or None
            if collisions or meshes:
                traj, rotations = scene.rollout_full()
                rotations = np.asarray(rotations)
            else:
                traj = scene.rollout()
            gif = str(path.with_suffix(".gif"))
            render_motion(chain, np.asarray(traj), gif, fps=min(args.fps, 25),
                          rotations=rotations, collisions=collisions,
                          meshes=meshes)
            print(f"[INFO] rendered {gif}")


if __name__ == "__main__":
    main()
