"""Autoregressive prior over VQ motion-token streams: learn the DISTRIBUTION
of discrete motion codes and sample novel robot motion from it.

The reference's title promises "distribution reinforcement learning" over the
VQ-VAE, but its code stops at retargeting — indices are discarded inside the
quantizer forward (reference models/vqvae.py:38-40) and nothing downstream
ever consumes a token. This module closes that loop TPU-natively:

    windows --(robot encoder + quantizer)--> code grid (N positions x S tokens)
    prior   : causal transformer, teacher-forced next-position prediction
    sample  : autoregressive generation as ONE jitted lax.fori_loop program
    decode  : ops/code_decode + DualMotionVQVAE.decode_latent -> motion

A "position" is one encoder window; its S tokens are the flattened
(stream, latent-timestep) axis — e.g. the flagship transformer+hybrid emits
5 tokens/position (1 FSQ + 4 RVQ stages, each with T'=1), a resnet+rvq
window emits n_layers * (W/4). Factorized heads predict all S tokens of the
next position in parallel (RQ-transformer-style spatial factorization over a
temporal AR backbone).

Everything is static-shape and jit-friendly: embeddings sum over a fixed S,
the causal mask is built once, and sampling runs the full-length model inside
`lax.fori_loop` (positions are short — a 20 s take at 25 fps, W=10, S=5 is
N=49 — so prefix recompute beats a KV cache at these sizes).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TransformerStack


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    """Prior architecture + the code-space contract it was trained on.

    ``streams``/``vocab_sizes``/``tokens_per_stream`` pin the exact token
    layout (normalized code space, ops/code_decode.normalize_codes) so a
    sampled grid can always be mapped back onto quantizer streams.
    """

    streams: Tuple[str, ...]            # sorted stream names
    vocab_sizes: Tuple[int, ...]        # per flattened token slot (len S_total)
    tokens_per_stream: int              # T' of the underlying quantizer
    window: int                         # encoder window (motion frames)
    stride: int                         # window stride on the motion timeline
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 4
    ff_dim: int = 512
    dropout: float = 0.1
    max_len: int = 256                  # max positions (windows) per sequence
    source_experiment: str = ""         # provenance: the VQ-VAE experiment id
    # class-conditioned generation: action names, empty = unconditioned
    class_names: Tuple[str, ...] = ()
    # within-position slot autoregression (full RQ-transformer): slot s of a
    # position conditions on slots < s of the SAME position through a small
    # causal depth transformer, instead of the slots being conditionally
    # independent given the temporal prefix. Measured cure for incoherent
    # slot combinations in sampled windows (docs/ROUND3.md generation notes).
    slot_ar: bool = False
    depth_layers: int = 2

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @staticmethod
    def from_json(s: str) -> "PriorConfig":
        d = json.loads(s)
        d["streams"] = tuple(d["streams"])
        d["vocab_sizes"] = tuple(d["vocab_sizes"])
        d["class_names"] = tuple(d.get("class_names", ()))
        return PriorConfig(**d)


def flatten_vocab_sizes(stream_sizes: Sequence[Tuple[str, int]],
                        tokens_per_stream: int) -> Tuple[int, ...]:
    """Vocab per flattened token slot: stream-major, T'-minor order."""
    out = []
    for _, v in stream_sizes:
        out.extend([v] * tokens_per_stream)
    return tuple(out)


class MotionTokenPrior(nn.Module):
    """GPT-style causal transformer over flattened motion-token grids.

    Input grid: (B, N, S) int32, values in the *normalized* code space
    [0, vocab_s). Returns per-slot logits (B, N, V_s) predicting the tokens
    at each position given every position strictly before it. With
    ``slot_ar=False`` slots 0..S-1 of position t are conditionally
    independent given the prefix (spatial factorization); with
    ``slot_ar=True`` a small causal depth transformer additionally feeds
    slot s the position's own slots < s (RQ-transformer).
    """

    cfg: PriorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, grid: jax.Array, train: bool = False,
                 class_ids: Optional[jax.Array] = None):
        c = self.cfg
        B, N, S = grid.shape
        assert S == len(c.vocab_sizes), (
            f"grid has {S} token slots, config expects {len(c.vocab_sizes)}")
        embs = [nn.Embed(v, c.d_model, dtype=self.dtype,
                         name=f"embed_{s}")(grid[..., s])
                for s, v in enumerate(c.vocab_sizes)]
        h = jnp.zeros((B, N, c.d_model), self.dtype)
        for e in embs:
            h = h + e
        # shift right: position t sees positions < t; a learned BOS vector
        # stands in for "before the take started"
        bos = self.param("bos", nn.initializers.normal(0.02), (c.d_model,))
        h = jnp.concatenate(
            [jnp.broadcast_to(bos.astype(h.dtype), (B, 1, c.d_model)),
             h[:, :-1]], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (c.max_len, c.d_model))
        h = h + pos[:N].astype(h.dtype)
        if c.class_names:
            # style-token conditioning: one learned vector per action class,
            # added to every position (the whole take shares its class)
            if class_ids is None:
                raise ValueError("class-conditioned prior needs class_ids")
            cls = nn.Embed(len(c.class_names), c.d_model, dtype=self.dtype,
                           name="class_embed")(class_ids)
            h = h + cls[:, None, :]
        mask = nn.make_causal_mask(jnp.zeros((B, N)))
        h = TransformerStack(c.n_layers, c.d_model, c.n_heads, c.ff_dim,
                             dropout=c.dropout, dtype=self.dtype,
                             name="stack")(h, train=train, mask=mask)
        if not c.slot_ar:
            # heads in f32: softmax/CE numerics independent of compute dtype
            return [nn.Dense(v, dtype=jnp.float32, name=f"head_{s}")(h)
                    for s, v in enumerate(c.vocab_sizes)]
        # depth AR (RQ-transformer): within position t the depth sequence is
        # [ctx, ctx+emb(tok_0), ..., ctx+emb(tok_{S-2})] where ctx = backbone
        # output at t (reads positions < t only). Causal over depth, so slot
        # s's logits see exactly the prefix positions plus slots < s of t.
        # Embedding tables are shared with the backbone sum.
        d_in = jnp.stack([h] + [h + embs[s] for s in range(S - 1)], axis=2)
        dpos = self.param("depth_pos", nn.initializers.normal(0.02),
                          (S, c.d_model))
        d_in = d_in + dpos.astype(d_in.dtype)
        d_in = d_in.reshape(B * N, S, c.d_model)
        dmask = nn.make_causal_mask(jnp.zeros((B * N, S)))
        d_out = TransformerStack(c.depth_layers, c.d_model, c.n_heads,
                                 c.ff_dim, dropout=c.dropout,
                                 dtype=self.dtype, name="depth_stack")(
                                     d_in, train=train, mask=dmask)
        d_out = d_out.reshape(B, N, S, c.d_model)
        return [nn.Dense(v, dtype=jnp.float32, name=f"head_{s}")(
                    d_out[:, :, s]) for s, v in enumerate(c.vocab_sizes)]


def prior_loss_sums(logits, grid: jax.Array, mask: jax.Array):
    """(masked CE sum averaged over slots, mask sum) — the chunkable form.

    Evaluating a large validation split in one batch OOMs the depth stack
    (the (B*N, S, S) attention temp hit 26.6G HBM at the 2560-take scaling
    arm); callers chunk the batch axis and recombine
    ``sum(chunk_sums) / sum(chunk_weights)``, which is exactly the
    whole-set masked mean.
    """
    import optax

    total = 0.0
    for s, lg in enumerate(logits):
        ce = optax.softmax_cross_entropy_with_integer_labels(lg, grid[..., s])
        total = total + jnp.sum(ce * mask)
    return total / len(logits), jnp.sum(mask)


def prior_loss(logits, grid: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean next-token cross-entropy over valid positions and token slots.

    ``mask`` is (B, N) with 1.0 on real positions (padded grids train in
    fixed shapes; XLA never sees the ragged lengths).
    """
    total, weight = prior_loss_sums(logits, grid, mask)
    return total / jnp.maximum(weight, 1.0)


def nucleus_filter(lg: jax.Array, top_p: float) -> jax.Array:
    """Top-p (nucleus) filtering: keep the smallest logit set whose
    probability mass reaches ``top_p``; everything else goes to -inf. The
    token that crosses the threshold is kept, so at least one survives.
    Static-shape (sort + cumsum), jit-friendly.
    """
    sorted_lg = jnp.flip(jnp.sort(lg, axis=-1), axis=-1)
    probs = jax.nn.softmax(sorted_lg, axis=-1)
    exclusive = jnp.cumsum(probs, axis=-1) - probs
    keep = exclusive < top_p
    thresh = jnp.min(jnp.where(keep, sorted_lg, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(lg < thresh, -jnp.inf, lg)


def sample_position(model: MotionTokenPrior, variables, grid: jax.Array,
                    t, keys, *, temperature: float = 1.0,
                    top_k: Optional[int] = None, top_p: Optional[float] = None,
                    class_ids: Optional[jax.Array] = None) -> jax.Array:
    """Sample all S slots of position ``t`` (traced scalar ok) into ``grid``.

    The causal mask guarantees the model reads only positions < t (plus, for
    a ``slot_ar`` prior, the slots of position t already written this call).
    ``keys`` is a sequence of S PRNG keys. Shared by `sample_grids` and
    `sample_grids_guided` (each candidate row draws independently — one key
    per slot samples the whole batch axis i.i.d.).
    """
    S = len(model.cfg.vocab_sizes)

    def sample_slot(grid, logits, s, key):
        lg = jax.lax.dynamic_slice_in_dim(logits[s], t, 1, axis=1)[:, 0]
        lg = lg / jnp.asarray(max(temperature, 1e-6), lg.dtype)
        if top_k is not None and top_k < lg.shape[-1]:
            kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
            lg = jnp.where(lg < kth, -jnp.inf, lg)
        if top_p is not None and top_p < 1.0:
            lg = nucleus_filter(lg, top_p)
        tok = jax.random.categorical(key, lg)
        return jax.lax.dynamic_update_slice(
            grid, tok[:, None, None].astype(jnp.int32), (0, t, s))

    if model.cfg.slot_ar:
        for s in range(S):
            logits = model.apply(variables, grid, train=False,
                                 class_ids=class_ids)
            grid = sample_slot(grid, logits, s, keys[s])
    else:
        logits = model.apply(variables, grid, train=False,
                             class_ids=class_ids)
        for s in range(S):
            grid = sample_slot(grid, logits, s, keys[s])
    return grid


def sample_grids(model: MotionTokenPrior, variables, rng: jax.Array,
                 batch: int, length: int, temperature: float = 1.0,
                 top_k: Optional[int] = None, top_p: Optional[float] = None,
                 class_ids: Optional[jax.Array] = None,
                 prompt: Optional[jax.Array] = None) -> jax.Array:
    """Autoregressively sample (batch, length, S) normalized code grids.

    One jitted program: `lax.fori_loop` over positions, each step running the
    full-length causal model on the grid so far (static shapes; the causal
    mask guarantees step t only reads positions < t, so the not-yet-filled
    suffix can hold anything). A ``slot_ar`` prior re-applies the model once
    per slot within the position so each slot conditions on the ones already
    sampled (S small — the depth loop unrolls). ``class_ids`` (batch,)
    selects the action for a class-conditioned prior.

    ``top_p`` applies nucleus filtering after temperature (composable with
    top_k; the measured follow-up knob for free-run dynamics damping at
    corpus scale, docs/ROUND3.md handoff). ``prompt`` (batch, P, S) or
    (P, S) seeds the first P positions with real
    tokens and samples only positions P..length-1 — prompted continuation.
    Free-running rollout from BOS compounds its own early errors (exposure
    bias: measured 100%-novel position tuples at every temperature/top-k on
    the memorization-scale corpus, abruns/prior_ar); anchoring the context on
    a data prefix is the standard mitigation and doubles as the motion-
    continuation API.
    """
    S = len(model.cfg.vocab_sizes)
    if length > model.cfg.max_len:
        raise ValueError(f"length {length} > max_len {model.cfg.max_len}")
    n_prompt = 0
    if prompt is not None:
        prompt = jnp.asarray(prompt, jnp.int32)
        if prompt.ndim == 2:
            prompt = jnp.broadcast_to(prompt[None], (batch, *prompt.shape))
        if prompt.shape[0] != batch or prompt.shape[2] != S:
            raise ValueError(f"prompt shape {prompt.shape} incompatible with "
                             f"(batch={batch}, ..., S={S})")
        n_prompt = int(prompt.shape[1])
        if n_prompt >= length:
            raise ValueError(f"prompt length {n_prompt} >= sample length "
                             f"{length}: nothing to generate")

    def step(t, carry):
        grid, rng = carry
        rng, *keys = jax.random.split(rng, S + 1)
        grid = sample_position(model, variables, grid, t, keys,
                               temperature=temperature, top_k=top_k,
                               top_p=top_p, class_ids=class_ids)
        return grid, rng

    grid0 = jnp.zeros((batch, length, S), jnp.int32)
    if n_prompt:
        grid0 = grid0.at[:, :n_prompt].set(prompt)
    grid, _ = jax.lax.fori_loop(n_prompt, length, step, (grid0, rng))
    return grid


def sample_grids_guided(model: MotionTokenPrior, variables, rng: jax.Array,
                        batch: int, length: int, decode_window,
                        *, candidates: int = 8, temperature: float = 1.0,
                        top_k: Optional[int] = None,
                        top_p: Optional[float] = None,
                        class_ids: Optional[jax.Array] = None,
                        prompt: Optional[jax.Array] = None,
                        dyn_weight: float = 0.0) -> jax.Array:
    """Overlap-consistency guided sampling (best-of-N resampling).

    The measured free-run failure mode at corpus scale is NOT bad marginals
    but cross-position incoherence: adjacent sampled windows disagree on
    their stride-overlap frames (RMS 0.17-0.19 vs the decode+stitch
    ceiling's 0.041, docs/ROUND3.md/ROUND4.md), and overlap-add then
    averages real dynamics away. This sampler attacks that directly and
    retraining-free: at each position it draws ``candidates`` i.i.d.
    continuations per sample from the SAME prior (candidates ride the batch
    axis — one model call per step regardless of N), decodes each
    candidate's window through ``decode_window``, and keeps the candidate
    whose first W-stride frames best agree (min MSE) with the previously
    chosen window's trailing frames. Selection picks among true samples of
    the prior, so (unlike lowering the temperature) it sharpens
    *consistency* without averaging or mode-collapsing the marginals.

    ``decode_window``: (B, S) int32 normalized codes of ONE position ->
    (B, W, D) decoded raw window (train/prior.make_decode_window_fn). The
    whole rollout is one jitted program: `lax.fori_loop` over positions,
    candidate scoring inside the step.

    With a ``prompt`` ((P, S) or (batch, P, S)) the previous-window carry is
    initialized from the prompt's last position, so the first generated
    position is already consistency-selected against real data. Free-run
    (no prompt) position 0 has nothing to agree with: candidate 0 (a pure
    prior sample) is kept. Returns (batch, length, S) int32.

    ``dyn_weight`` > 0 subtracts that multiple of the candidate window's
    mean per-frame speed from the (minimized) overlap-MSE score: pure
    overlap agreement can systematically prefer the *stillest* candidate
    (static windows are the easiest to agree with), compounding the
    measured under-dynamics; the dynamics term breaks the tie toward
    livelier candidates. 0.0 (default) = pure consistency selection.
    """
    cfg = model.cfg
    S = len(cfg.vocab_sizes)
    W, stride = cfg.window, cfg.stride
    ov = W - stride
    if ov <= 0:
        raise ValueError(f"guided sampling needs window overlap: "
                         f"W={W} stride={stride}")
    if candidates < 2:
        raise ValueError("guided sampling needs candidates >= 2")
    if length > cfg.max_len:
        raise ValueError(f"length {length} > max_len {cfg.max_len}")
    C = candidates
    BC = batch * C
    cls_t = (jnp.repeat(jnp.asarray(class_ids, jnp.int32), C)
             if class_ids is not None else None)

    n_prompt = 0
    grid0 = jnp.zeros((BC, length, S), jnp.int32)
    if prompt is not None:
        prompt = jnp.asarray(prompt, jnp.int32)
        if prompt.ndim == 2:
            prompt = jnp.broadcast_to(prompt[None], (batch, *prompt.shape))
        n_prompt = int(prompt.shape[1])
        if n_prompt >= length:
            raise ValueError(f"prompt length {n_prompt} >= sample length "
                             f"{length}: nothing to generate")
        tiled = jnp.repeat(prompt, C, axis=0)  # (BC, P, S)
        grid0 = grid0.at[:, :n_prompt].set(tiled)
        prev0 = decode_window(prompt[:, -1])  # (batch, W, D)
    else:
        # shape probe supplies D; contents never scored (t==0 keeps cand 0)
        prev0 = jnp.zeros_like(decode_window(grid0[:batch, 0]))

    def step(t, carry):
        grid, prev, rng = carry
        rng, *keys = jax.random.split(rng, S + 1)
        grid = sample_position(model, variables, grid, t, keys,
                               temperature=temperature, top_k=top_k,
                               top_p=top_p, class_ids=cls_t)
        wins = decode_window(grid[:, t]).reshape(batch, C, W, -1)
        score = jnp.mean(
            (wins[:, :, :ov] - prev[:, None, stride:]) ** 2, axis=(2, 3))
        if dyn_weight:
            speed = jnp.mean(jnp.abs(jnp.diff(wins, axis=2)), axis=(2, 3))
            score = score - dyn_weight * speed
        choice = jnp.argmin(score, axis=1)  # (batch,)
        if n_prompt == 0:
            choice = jnp.where(t == 0, 0, choice)
        g4 = grid.reshape(batch, C, length, S)
        chosen = jnp.take_along_axis(
            g4[:, :, t], choice[:, None, None], axis=1)[:, 0]  # (batch, S)
        g4 = g4.at[:, :, t].set(chosen[:, None, :])
        prev = jnp.take_along_axis(
            wins, choice[:, None, None, None], axis=1)[:, 0]
        return g4.reshape(BC, length, S), prev, rng

    grid, _, _ = jax.lax.fori_loop(n_prompt, length, step,
                                   (grid0, prev0, rng))
    return grid.reshape(batch, C, length, S)[:, 0]


def grid_to_codes(cfg: PriorConfig, grid) -> dict:
    """(B, N, S_total) normalized grid -> per-stream NORMALIZED code dicts.

    Returns {stream: (B*N, T')} — one decode row per position, ready for
    ops/code_decode.denormalize_codes + decode_codes.
    """
    B, N, S = grid.shape
    tp = cfg.tokens_per_stream
    flat = grid.reshape(B * N, S)
    return {name: flat[:, i * tp:(i + 1) * tp]
            for i, name in enumerate(cfg.streams)}


def codes_to_grid(cfg: PriorConfig, codes: dict, n_positions: int):
    """Inverse of grid_to_codes: {stream: (B*N, T')} -> (B, N, S_total)."""
    cols = [jnp.asarray(codes[name]) for name in cfg.streams]
    flat = jnp.concatenate(cols, axis=-1)  # (B*N, S_total)
    S = flat.shape[-1]
    return flat.reshape(-1, n_positions, S).astype(jnp.int32)
