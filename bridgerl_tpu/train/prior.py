"""Train the motion-token prior: code extraction, scanned-epoch training,
checkpointing, and sampling back to motion.

Pipeline (TPU-shaped like the main trainer — whole epoch is one jitted
`lax.scan` over pre-shuffled batch indices, grids HBM-resident):

    full_raw sequences --extract_code_grids--> (n_seq, max_len, S) int32 + mask
    train_prior: AdamW + causal CE, 90/10 sequence split, early stopping
    sample_motion: prior sample -> denormalize -> decode_codes ->
                   decode_latent -> overlap-add stitch -> raw (T, 29) motion

The reference has no generation path at all; this is the "learn the code
distribution, then sample it" second stage standard for VQ-VAE pipelines,
built on the same checkpoint/stats artifacts the rest of the framework uses.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.token_prior import (
    MotionTokenPrior,
    PriorConfig,
    codes_to_grid,
    grid_to_codes,
    prior_loss,
    prior_loss_sums,
    sample_grids,
    sample_grids_guided,
)
from ..ops.code_decode import (
    code_vocab_sizes,
    decode_codes,
    denormalize_codes,
    normalize_codes,
)


# --------------------------------------------------------------- extraction

def robot_codes(model, variables, x_robot) -> Dict[str, jnp.ndarray]:
    """Normalized-window robot batch -> {stream: (B, T') int32} code dict."""
    from flax import traverse_util

    _, mods = model.apply(variables, x_robot=x_robot, train=False,
                          mutable=["intermediates"])
    flat = traverse_util.flatten_dict(mods["intermediates"])
    return {"/".join(k[:-1]): v[0].astype(jnp.int32)
            for k, v in sorted(flat.items()) if k[-1] == "codes"}


def extract_code_grids(
    model, variables, exp, sequences: List[np.ndarray],
    mean: np.ndarray, std: np.ndarray, stride: int,
    max_len: int = 256, batch_windows: int = 4096,
    phases: Sequence[int] = (0,),
    return_energy: bool = False,
):
    """Tokenize raw robot sequences into padded normalized code grids.

    Windows are taken on the pure stride grid (start + W <= T) so positions
    advance uniformly in time — the property the prior models. ``phases``
    shifts the whole grid by a per-phase start offset in [0, stride): each
    phase is an independent valid stride grid over the same take, multiplying
    the prior's corpus |phases|-fold without changing its distribution (the
    measured constraint is grid count, docs/ROUND3.md). Returns
    (grids (n_grids, max_len, S), mask (n_grids, max_len), PriorConfig,
    seq_ids (n_grids,) — the input-sequence index each grid came from, so
    callers can attach per-sequence labels for a conditioned prior or split
    train/val by take; phase copies keep their take's id). With
    ``return_energy`` also returns energy (n_grids, max_len) float32 — each
    position's raw-window mean per-frame speed (mean |frame diff| in raw
    joint units), the signal energy-tilted prior training weights CE by
    (``energy_tilt_weights``).
    """
    W = exp.model.window_size
    sizes = sorted(code_vocab_sizes(exp.model).items())
    per_seq_windows: List[np.ndarray] = []
    counts: List[int] = []
    seq_ids: List[int] = []
    for si, seq in enumerate(sequences):
        seq = np.asarray(seq, np.float32)
        for phase in phases:
            if not 0 <= phase < max(stride, 1):
                raise ValueError(f"phase {phase} outside [0, stride)")
            starts = range(phase, seq.shape[0] - W + 1, stride)
            wins = [seq[s:s + W] for s in starts]
            # long takes become several max_len grids instead of being
            # truncated (a tail < 2 positions has no next-token signal)
            for off in range(0, len(wins), max_len):
                chunk_wins = wins[off:off + max_len]
                if len(chunk_wins) < 2:
                    continue
                per_seq_windows.append(np.stack(chunk_wins))
                counts.append(len(chunk_wins))
                seq_ids.append(si)
    if not per_seq_windows:
        raise ValueError(f"no sequence yields a full window (W={W})")

    all_wins = np.concatenate(per_seq_windows)          # (total, W, 29)
    norm = (all_wins - mean) / std
    total = norm.shape[0]
    # pad to a chunk multiple: every encode call has ONE static shape
    # (a ragged tail chunk would cost a second multi-minute tunnel compile)
    chunk = min(batch_windows, total)
    pad = (-total) % chunk
    if pad:
        norm = np.concatenate([norm, np.zeros((pad, *norm.shape[1:]), np.float32)])

    encode = jax.jit(lambda x: robot_codes(model, variables, x))
    chunks: List[Dict[str, np.ndarray]] = []
    for i in range(0, norm.shape[0], chunk):
        out = encode(jnp.asarray(norm[i:i + chunk]))
        chunks.append({k: np.asarray(v) for k, v in out.items()})
    codes = {k: np.concatenate([c[k] for c in chunks])[:total]
             for k in chunks[0]}
    codes = {k: np.asarray(v) for k, v in
             normalize_codes(exp.model, codes).items()}

    tokens_per_stream = codes[sizes[0][0]].shape[1]
    from ..models.token_prior import flatten_vocab_sizes
    pcfg = PriorConfig(
        streams=tuple(name for name, _ in sizes),
        vocab_sizes=flatten_vocab_sizes(sizes, tokens_per_stream),
        tokens_per_stream=tokens_per_stream,
        window=W, stride=int(stride), max_len=max_len,
        source_experiment=exp.id,
    )

    S = len(pcfg.vocab_sizes)
    flat = np.concatenate([codes[name] for name, _ in sizes], axis=-1)  # (total, S)
    grids = np.zeros((len(counts), max_len, S), np.int32)
    mask = np.zeros((len(counts), max_len), np.float32)
    energy = np.zeros((len(counts), max_len), np.float32)
    win_speed = np.abs(np.diff(all_wins, axis=1)).mean(axis=(1, 2))
    off = 0
    for i, n in enumerate(counts):
        grids[i, :n] = flat[off:off + n]
        mask[i, :n] = 1.0
        energy[i, :n] = win_speed[off:off + n]
        off += n
    if return_energy:
        return grids, mask, pcfg, np.asarray(seq_ids, np.int32), energy
    return grids, mask, pcfg, np.asarray(seq_ids, np.int32)


# ----------------------------------------------------------------- training

def energy_tilt_weights(energy: np.ndarray, mask: np.ndarray,
                        lam: float) -> np.ndarray:
    """Exponential tilt of the training distribution toward lively motion.

    The measured free-run failure at corpus scale is under-energetic output
    (vel ratio 0.33 vs the 0.93 data ceiling, docs/ROUND4.md) and every
    *sampling*-side lever is exhausted; this is the *training*-side lever:
    weight each position's CE by exp(lam * standardized window speed), i.e.
    fit the prior to the tilted density p(x)·e^{lam·energy(x)}/Z — an
    exponential-family reweighting that shifts probability mass toward
    high-velocity token patterns without touching the architecture.
    Weights are normalized to mean 1 over valid positions so the CE scale
    (and LR) stays comparable to the untilted baseline. lam=0 -> mask.
    """
    valid = mask > 0
    e = energy[valid]
    mu, sd = float(e.mean()), float(e.std()) + 1e-8
    w = np.exp(lam * (energy - mu) / sd) * mask
    w *= mask.sum() / np.maximum(w.sum(), 1e-8)
    return w.astype(np.float32)


@dataclasses.dataclass
class PriorTrainConfig:
    epochs: int = 200
    batch_size: int = 32
    lr: float = 3e-4
    weight_decay: float = 0.01
    val_fraction: float = 0.1
    patience: int = 30
    seed: int = 42
    compute_dtype: str = "float32"
    # which metric picks the returned weights (and drives early stopping):
    # "val"   — grouped-val CE: the generalization-faithful choice, but on a
    #           memorization-scale corpus (tens of takes) val CE rises from
    #           epoch 0 and this returns a near-init prior (docs/ROUND3.md);
    # "train" — train CE: the generative-fitting choice; the prior is allowed
    #           to fit the corpus and eval/generation novelty metrics guard
    #           against verbatim copying. Val CE is still logged either way.
    select: str = "val"
    # scheduled sampling (two-pass, Mihaylova/Martins-style for parallel
    # teacher forcing): with probability ramping linearly 0 -> this value
    # over the planned epochs, a context position's tokens are replaced by
    # the model's OWN first-pass samples before the loss pass. Targets stay
    # ground truth. 0.0 = pure teacher forcing (today's path, no extra
    # forward). The exposure-bias mitigation for free-running rollout
    # (measured damping at corpus scale, docs/ROUND3.md handoff).
    scheduled_sampling: float = 0.0


def train_prior(
    grids: np.ndarray, mask: np.ndarray, pcfg: PriorConfig,
    tcfg: PriorTrainConfig, verbose: bool = True,
    class_ids: Optional[np.ndarray] = None,
    seq_ids: Optional[np.ndarray] = None,
    val_take_ids: Optional[Sequence[int]] = None,
    pos_weights: Optional[np.ndarray] = None,
) -> Tuple[Dict[str, Any], Dict[str, List[float]]]:
    """Returns (best variables, history). Whole epoch = one jitted scan.

    ``pos_weights`` (n_grids, max_len) float weights multiply the TRAIN
    loss's per-position CE (e.g. ``energy_tilt_weights``); validation CE
    stays unweighted so arms remain comparable.

    ``class_ids`` (n_grids,) int32 per-grid action labels are required iff
    pcfg.class_names is non-empty (conditioned prior). ``seq_ids`` (n_grids,)
    groups grids by source take: when given, the 90/10 split is over TAKES,
    so chunked long takes and phase-augmented copies of one take never
    straddle train and val (otherwise near-duplicate grids leak and val CE
    reads optimistic). ``val_take_ids`` (requires seq_ids) pins the val set
    to exactly those takes instead of the seeded val_fraction draw — the
    conditioned-prior study holds out one take PER CLASS so held-out class
    accuracy is defined for every action (a fraction draw can miss classes).
    """
    import optax

    if bool(pcfg.class_names) != (class_ids is not None):
        raise ValueError("class_ids must be given exactly when "
                         "pcfg.class_names is set")
    if tcfg.select not in ("val", "train"):
        raise ValueError(f"select must be 'val' or 'train', got {tcfg.select}")
    if val_take_ids is not None and seq_ids is None:
        raise ValueError("val_take_ids requires seq_ids")
    n = grids.shape[0]
    rng = np.random.default_rng(tcfg.seed)
    if seq_ids is not None:
        seq_ids = np.asarray(seq_ids)
        if seq_ids.shape != (n,):
            raise ValueError(f"seq_ids shape {seq_ids.shape} != ({n},)")
        if val_take_ids is not None:
            all_takes = set(np.unique(seq_ids).tolist())
            val_takes = {int(s) for s in val_take_ids}
            unknown = val_takes - all_takes
            if unknown:
                raise ValueError(f"val_take_ids not in seq_ids: "
                                 f"{sorted(unknown)}")
            if not all_takes - val_takes:
                raise ValueError("val_take_ids covers every take; "
                                 "nothing left to train on")
        else:
            takes = rng.permutation(np.unique(seq_ids))
            n_val_takes = max(1, int(len(takes) * tcfg.val_fraction)) \
                if len(takes) > 1 else 0
            val_takes = set(takes[:n_val_takes].tolist())
        is_val = np.asarray([int(s) in val_takes for s in seq_ids])
        val_idx = rng.permutation(np.nonzero(is_val)[0])
        train_idx = rng.permutation(np.nonzero(~is_val)[0])
        n_val = val_idx.size
    else:
        perm = rng.permutation(n)
        n_val = max(1, int(n * tcfg.val_fraction)) if n > 1 else 0
        val_idx, train_idx = perm[:n_val], perm[n_val:]
    if train_idx.size == 0:
        raise ValueError("prior training needs at least one train sequence")
    bs = min(tcfg.batch_size, train_idx.size)
    steps = train_idx.size // bs

    dtype = jnp.bfloat16 if tcfg.compute_dtype == "bfloat16" else jnp.float32
    model = MotionTokenPrior(pcfg, dtype=dtype)
    key = jax.random.key(tcfg.seed)
    init_cls = (jnp.zeros((2,), jnp.int32) if pcfg.class_names else None)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((2, grids.shape[1], grids.shape[2]),
                                     jnp.int32), train=False,
                           class_ids=init_cls)
    params = variables["params"]
    tx = optax.adamw(tcfg.lr, weight_decay=tcfg.weight_decay)
    opt_state = tx.init(params)

    g_dev = jnp.asarray(grids)
    if pos_weights is not None:
        if pos_weights.shape != mask.shape:
            raise ValueError(f"pos_weights shape {pos_weights.shape} != "
                             f"mask shape {mask.shape}")
        m_dev = jnp.asarray((np.asarray(pos_weights, np.float32)
                             * mask).astype(np.float32))
    else:
        m_dev = jnp.asarray(mask)
    c_dev = (jnp.asarray(class_ids, jnp.int32) if class_ids is not None
             else jnp.zeros((n,), jnp.int32))
    use_cls = bool(pcfg.class_names)
    # Validation set, padded to a whole number of fixed-size chunks so the
    # chunked eval below compiles once. One-shot whole-split eval OOMs at
    # scale (docs/evidence/s10_queue.log: 233,856 positions -> 26.6G HBM in the depth
    # stack); ~32k positions/chunk keeps the peak under ~4G.
    if n_val:
        n_positions = int(grids.shape[1])
        eval_chunk = max(1, min(n_val, 32768 // max(n_positions, 1)))
        pad = (-n_val) % eval_chunk
        gv = np.concatenate([grids[val_idx],
                             np.zeros((pad,) + grids.shape[1:],
                                      grids.dtype)]) if pad \
            else grids[val_idx]
        mv = np.concatenate([mask[val_idx],
                             np.zeros((pad,) + mask.shape[1:],
                                      mask.dtype)]) if pad else mask[val_idx]
        gv, mv = jnp.asarray(gv), jnp.asarray(mv)
        if class_ids is not None:
            cvn = np.asarray(class_ids)[val_idx].astype(np.int32)
            cv = jnp.asarray(np.concatenate([cvn, np.zeros(pad, np.int32)])
                             if pad else cvn)
        else:
            cv = jnp.zeros((n_val + pad,), jnp.int32)
    else:
        gv = mv = cv = None

    use_ss = tcfg.scheduled_sampling > 0.0

    def loss_fn(p, g, m, c, drop_key, ss_prob):
        g_in = g
        if use_ss:
            # two-pass scheduled sampling for parallel teacher forcing:
            # pass 1 (no grad) samples the model's own predictions; whole
            # positions of the CONTEXT are replaced with prob ss_prob; the
            # loss pass then reads partly-self-generated context while the
            # targets stay ground truth — training matches free-running
            # rollout's input distribution (exposure-bias mitigation).
            logits1 = model.apply(
                {"params": jax.lax.stop_gradient(p)}, g, train=False,
                class_ids=c if use_cls else None)
            ss_key, drop_key = jax.random.split(drop_key)
            keys = jax.random.split(ss_key, len(logits1) + 1)
            sampled = jnp.stack(
                [jax.random.categorical(keys[s], lg)
                 for s, lg in enumerate(logits1)], axis=-1).astype(jnp.int32)
            replace = jax.random.bernoulli(
                keys[-1], ss_prob, g.shape[:2])[..., None]
            g_in = jnp.where(replace, sampled, g)
        logits = model.apply({"params": p}, g_in, train=True,
                             rngs={"dropout": drop_key},
                             class_ids=c if use_cls else None)
        return prior_loss(logits, g, m)

    # The dataset tensors are jit ARGUMENTS, not closures: a closed-over
    # device array is baked into the program as a constant literal and
    # ships inside the remote-compile payload — at the 5120-take arm that
    # constant alone is ~90MB and the compile tunnel rejects the request
    # (HTTP 413, docs/evidence/s14_queue.log). As arguments they stay
    # device-resident data and the payload stays model-sized.
    @jax.jit
    def epoch_fn(params, opt_state, idx_mat, drop_key, ss_prob,
                 g_all, m_all, c_all):
        def step(carry, args):
            p, o = carry
            idx, k = args
            loss, grads = jax.value_and_grad(loss_fn)(
                p, g_all[idx], m_all[idx], c_all[idx], k, ss_prob)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        keys = jax.random.split(drop_key, idx_mat.shape[0])
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (idx_mat, keys))
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def eval_chunk_fn(params, g, m, c):
        logits = model.apply({"params": params}, g, train=False,
                             class_ids=c if use_cls else None)
        return prior_loss_sums(logits, g, m)

    def eval_fn(params):
        total = weight = 0.0
        for i in range(0, int(gv.shape[0]), eval_chunk):
            s, w = eval_chunk_fn(params, gv[i:i + eval_chunk],
                                 mv[i:i + eval_chunk], cv[i:i + eval_chunk])
            # block per chunk (tunneled-TPU timing rule) and recombine the
            # masked mean exactly: padded chunks contribute weight 0
            total += float(s)
            weight += float(w)
        return total / max(weight, 1.0)

    history: Dict[str, List[float]] = {"train_loss": [], "val_loss": []}
    best, best_params, patience = float("inf"), params, 0
    t0 = time.time()
    for ep in range(tcfg.epochs):
        order = np.random.default_rng(tcfg.seed * 100003 + ep).permutation(
            train_idx)[: steps * bs]
        idx_mat = jnp.asarray(order.reshape(steps, bs))
        # linear 0 -> scheduled_sampling ramp over the planned epochs
        # (a traced scalar: the ramp costs no recompiles)
        ss_prob = tcfg.scheduled_sampling * ep / max(tcfg.epochs - 1, 1)
        params, opt_state, tr = epoch_fn(
            params, opt_state, idx_mat,
            jax.random.fold_in(jax.random.key(tcfg.seed + 1), ep),
            jnp.asarray(ss_prob, jnp.float32), g_dev, m_dev, c_dev)
        vl = float(eval_fn(params)) if n_val else float(tr)
        history["train_loss"].append(float(tr))
        history["val_loss"].append(vl)
        monitored = vl if tcfg.select == "val" else float(tr)
        if monitored < best - 1e-6:
            best, best_params, patience = monitored, jax.device_get(params), 0
        else:
            patience += 1
        if verbose and (ep % 10 == 0 or ep == tcfg.epochs - 1):
            print(f"[prior] ep {ep}: train {float(tr):.4f} val {vl:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if tcfg.patience > 0 and patience >= tcfg.patience:
            if verbose:
                print(f"[prior] early stop at epoch {ep} (best {best:.4f})",
                      flush=True)
            break
    return {"params": best_params}, history


def classify_grids(model, variables, grids: np.ndarray, mask: np.ndarray,
                   *, batch: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Prior-as-classifier: per-grid next-token CE under EVERY class token.

    The principled readout of what the class conditioning actually encodes:
    with a uniform class prior, argmin-CE is the Bayes decision rule
    p(class | grid) ∝ p(grid | class). Returns (pred (n,) int32 predicted
    class ids, ce (n, C) float32 per-class mean CE). Only defined for a
    class-conditioned prior. Chunked to ONE static shape so the tunneled
    TPU compiles a single program.
    """
    import optax

    C = len(model.cfg.class_names)
    if not C:
        raise ValueError("classify_grids needs a class-conditioned prior")
    n = grids.shape[0]
    b = min(batch, n)

    @jax.jit
    def ce_fn(g, m):
        denom = jnp.maximum(m.sum(axis=1), 1.0)

        def one(c):
            cls = jnp.full((g.shape[0],), c, jnp.int32)
            logits = model.apply(variables, g, train=False, class_ids=cls)
            tot = 0.0
            for s_i, lg in enumerate(logits):
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    lg, g[..., s_i])
                tot = tot + (ce * m).sum(axis=1) / denom
            return tot / len(logits)

        return jnp.stack([one(c) for c in range(C)], axis=1)  # (b, C)

    out = np.zeros((n, C), np.float32)
    for i in range(0, n, b):
        g = np.zeros((b, *grids.shape[1:]), grids.dtype)
        m = np.zeros((b, mask.shape[1]), mask.dtype)
        take = min(b, n - i)
        g[:take], m[:take] = grids[i:i + take], mask[i:i + take]
        out[i:i + take] = np.asarray(ce_fn(jnp.asarray(g),
                                           jnp.asarray(m)))[:take]
    return out.argmin(axis=1).astype(np.int32), out


# ------------------------------------------------------------- checkpointing

def save_prior_checkpoint(path: str, variables, pcfg: PriorConfig,
                          history: Optional[dict] = None) -> None:
    import flax

    payload = {
        "kind": "bridgerl-token-prior",
        "variables": flax.serialization.to_state_dict(
            jax.device_get(variables)),
        "config_json": pcfg.to_json(),
        "history": history or {},
    }
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_prior_checkpoint(path: str):
    """Returns (model, variables, PriorConfig)."""
    import flax

    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if payload.get("kind") != "bridgerl-token-prior":
        raise ValueError(f"{path}: not a token-prior checkpoint")
    pcfg = PriorConfig.from_json(payload["config_json"])
    model = MotionTokenPrior(pcfg)
    template = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        jnp.zeros((1, pcfg.max_len, len(pcfg.vocab_sizes)), jnp.int32),
        train=False,
        class_ids=(jnp.zeros((1,), jnp.int32) if pcfg.class_names else None))
    variables = flax.serialization.from_state_dict(template, payload["variables"])
    return model, variables, pcfg


# ------------------------------------------------------------- generation

def stitch_windows_jax(windows: jnp.ndarray, stride: int) -> jnp.ndarray:
    """In-graph overlap-add: (B, N, W, D) windows on the stride grid ->
    (B, stride*(N-1)+W, D). Same averaging as `stitch_windows`, jittable
    (N static -> unrolled dynamic_update_slice adds; counts precomputed)."""
    B, N, W, D = windows.shape
    T = stride * (N - 1) + W
    acc = jnp.zeros((B, T, D), windows.dtype)
    cnt = np.zeros((T, 1), np.float32)
    for i in range(N):
        s = i * stride
        acc = acc.at[:, s:s + W].add(windows[:, i])
        cnt[s:s + W] += 1.0
    return acc / jnp.asarray(np.maximum(cnt, 1.0))


def make_generation_fn(vq_model, vq_variables, exp, prior_model,
                       prior_variables, mean, std, *, n_positions: int,
                       n_samples: int = 1, temperature: float = 1.0,
                       top_k: Optional[int] = None,
                       top_p: Optional[float] = None,
                       guide_candidates: int = 0,
                       guide_dyn: float = 0.0):
    """One jittable program: PRNG key (+ optional class ids) -> raw motion.

    Returns fn(key, class_ids?) -> (batch, stride*(N-1)+W, D) float32, where
    batch = class_ids.shape[0] for a conditioned prior, else ``n_samples``.
    Everything — prior sampling (optionally overlap-consistency guided,
    ``guide_candidates`` >= 2), code decode, decoder, de-normalization,
    overlap-add — is one traced graph, so it freezes into a StableHLO
    serving artifact (export/serialize.export_generator_artifact).
    """
    pcfg = prior_model.cfg
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    W, S = pcfg.window, pcfg.stride

    def generate(key, class_ids=None):
        batch = class_ids.shape[0] if class_ids is not None else n_samples
        if guide_candidates >= 2:
            decode_window = make_decode_window_fn(
                vq_model, vq_variables, exp, pcfg, mean, std)
            grid = sample_grids_guided(
                prior_model, prior_variables, key, batch, n_positions,
                decode_window, candidates=guide_candidates,
                temperature=temperature, top_k=top_k, top_p=top_p,
                class_ids=class_ids, dyn_weight=guide_dyn)
        else:
            grid = sample_grids(prior_model, prior_variables, key, batch,
                                n_positions, temperature=temperature,
                                top_k=top_k,
                                top_p=top_p, class_ids=class_ids)
        codes = grid_to_codes(pcfg, grid)
        codes = denormalize_codes(exp.model, codes)
        z_q = decode_codes(exp.model, vq_variables, codes)
        wins = vq_model.apply(vq_variables, z_q, method="decode_latent")
        wins = wins.astype(jnp.float32) * std + mean
        wins = wins.reshape(batch, n_positions, W, -1)
        return stitch_windows_jax(wins, S)

    return generate


def stitch_windows(windows: np.ndarray, stride: int, *,
                   counts_floor: float = 1.0) -> np.ndarray:
    """Overlap-add average of consecutive windows placed at the stride grid.

    windows (N, W, D) -> (stride * (N-1) + W, D); same averaging as the
    offline reconstruction (export/reconstruct.py), applied to generated
    windows whose placement is by construction the pure stride grid.
    """
    N, W, D = windows.shape
    T = stride * (N - 1) + W
    acc = np.zeros((T, D), np.float64)
    cnt = np.zeros((T, 1), np.float64)
    for i in range(N):
        s = i * stride
        acc[s:s + W] += windows[i]
        cnt[s:s + W] += 1.0
    return (acc / np.maximum(cnt, counts_floor)).astype(np.float32)


def make_decode_window_fn(vq_model, vq_variables, exp, pcfg,
                          mean: np.ndarray, std: np.ndarray):
    """Traced single-position decoder for guided sampling: (B, S) int32
    NORMALIZED codes of one position -> (B, W, D) raw decoded window."""
    mean_j = jnp.asarray(mean, jnp.float32)
    std_j = jnp.asarray(std, jnp.float32)

    def decode_window(codes_pos):
        codes = grid_to_codes(pcfg, codes_pos[:, None, :])
        codes = denormalize_codes(exp.model, codes)
        z_q = decode_codes(exp.model, vq_variables, codes)
        wins = vq_model.apply(vq_variables, z_q, method="decode_latent")
        return wins.astype(jnp.float32) * std_j + mean_j

    return decode_window


def sample_motion(
    vq_model, vq_variables, exp, prior_model, prior_variables,
    mean: np.ndarray, std: np.ndarray, *, n_samples: int = 4,
    n_positions: int = 32, temperature: float = 1.0,
    top_k: Optional[int] = None, top_p: Optional[float] = None,
    seed: int = 0,
    class_ids: Optional[np.ndarray] = None,
    prompt: Optional[np.ndarray] = None,
    guide_candidates: int = 0,
    guide_dyn: float = 0.0,
    return_windows: bool = False, return_grid: bool = False,
):
    """Sample new token grids and decode them to raw robot motions.

    Returns a list of (T, 29) float32 raw joint trajectories,
    T = stride*(n_positions-1) + W. ``class_ids`` (n_samples,) selects the
    action per sample for a conditioned prior. With ``return_windows`` also
    returns the pre-stitch decoded windows (n_samples, N, W, D) — the input
    eval/generation.overlap_disagreement diagnoses sampling coherence on;
    with ``return_grid`` also the sampled normalized code grid
    (n_samples, N, S) int32 — the input eval/generation.code_novelty scores
    memorize-vs-recombine on. ``prompt`` ((P, S) or (n_samples, P, S)
    NORMALIZED code grid, e.g. a prefix of extract_code_grids output) anchors
    the rollout on real tokens: positions < P are kept, the rest sampled —
    prompted motion continuation. ``guide_candidates`` >= 2 switches to
    overlap-consistency guided sampling (sample_grids_guided: best-of-N
    resampling against the previous window's overlap — the measured
    free-run coherence lever, docs/ROUND4.md); ``guide_dyn`` > 0 adds the
    dynamics-preserving term to its selection score (token_prior.
    sample_grids_guided dyn_weight).
    """
    pcfg = prior_model.cfg
    cls = (jnp.asarray(class_ids, jnp.int32)
           if class_ids is not None else None)
    if guide_candidates >= 2:
        decode_window = make_decode_window_fn(
            vq_model, vq_variables, exp, pcfg, mean, std)
        grid = sample_grids_guided(
            prior_model, prior_variables, jax.random.key(seed), n_samples,
            n_positions, decode_window, candidates=guide_candidates,
            temperature=temperature, top_k=top_k, top_p=top_p,
            prompt=prompt, class_ids=cls, dyn_weight=guide_dyn)
    else:
        grid = sample_grids(prior_model, prior_variables,
                            jax.random.key(seed),
                            n_samples, n_positions, temperature=temperature,
                            top_k=top_k, top_p=top_p, prompt=prompt,
                            class_ids=cls)
    codes = grid_to_codes(pcfg, grid)                      # normalized
    codes = denormalize_codes(exp.model, codes)            # raw index space
    z_q = decode_codes(exp.model, vq_variables, codes)     # (B*N, T', hidden)
    wins = vq_model.apply(vq_variables, z_q, method="decode_latent")
    wins = np.asarray(wins, np.float32) * std + mean       # raw windows
    W = pcfg.window
    wins = wins.reshape(n_samples, n_positions, W, -1)
    motions = [stitch_windows(w, pcfg.stride) for w in wins]
    extras = []
    if return_windows:
        extras.append(wins)
    if return_grid:
        extras.append(np.asarray(grid, np.int32))
    if extras:
        return (motions, *extras)
    return motions
