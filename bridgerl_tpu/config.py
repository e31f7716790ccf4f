"""Configuration system: dataclass config tree, experiment registry, artifact naming.

Replaces the reference's three config mechanisms (argparse constants,
module-level hyperparameters, and the EXPERIMENTS list — see reference
scripts/train_ablation.py:39-57 and models/experiment_config.py:9-18) with a
single serializable dataclass tree. Naming conventions are load-bearing in
the reference (logs are grouped by splitting on ``_seed_``,
scripts/evaluation/plot_results.py:54-57) and are reproduced exactly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

ARCHS = ("simple", "resnet", "resnet_no_down", "transformer")
METHODS = ("standard", "ema", "rvq", "fsq", "lfq", "hybrid", "ae")
MODES = ("teacher", "student")


@dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (defaults mirror reference models/vqvae.py:509-517)."""

    human_input_dim: int = 126
    robot_input_dim: int = 29
    hidden_dim: int = 64
    codebook_size: int = 1024
    arch: str = "transformer"
    method: str = "hybrid"
    n_layers: int = 4          # RVQ depth
    window_size: int = 64
    # transformer internals (hard-coded 256/4/4/512 in reference vqvae.py:527-528,565-571)
    d_model: int = 256
    n_heads: int = 4
    n_tf_layers: int = 4
    ff_dim: int = 512
    dropout: float = 0.1   # torch TransformerEncoderLayer default
    # pack P windows into one attention call with a block-diagonal mask:
    # T=10 windows give 10x10 attention matmuls that pad to 128x128 MXU tiles;
    # packing P=12 makes 120-token tiles at identical math. 1 = off.
    attn_packing: int = 1
    # compile the transformer layer once and lax.scan it over stacked params
    # (compile-time saver on remote-compile runtimes; changes the param tree)
    scan_layers: bool = False
    # Opt-in multi-token transformer latent: pool the window into k tokens
    # (chunked mean over T/k frames each) instead of the reference's single
    # mean-pooled token (vqvae.py:458, 488). The W64 single-token bottleneck
    # is the measured ceiling on decodable dynamics (data-codes roundtrip
    # recovers only ~55% of the data's velocity RMS, docs/ROUND3.md); k>1
    # raises the latent rate at identical parameter count. 1 = reference.
    # Requires window_size % tf_tokens == 0.
    tf_tokens: int = 1
    # fused Pallas attention core (scores+mask+softmax+dropout+PV in VMEM,
    # flash-style custom VJP; ops/pallas/attention.py). Same param tree —
    # only the attention_fn changes. Off-TPU (or with dropout active off-TPU)
    # falls back to the stock flax kernel.
    fused_attention: bool = False
    # uint8-bit dropout masks (8 PRNG bits/element instead of 32; keep prob
    # quantized to 1/256). Dropout-mask generation measured at ~11% of the
    # flagship step even on rbg (perf_battery.md) — this recovers most of it.
    # Same expectation/scaling semantics; param tree unchanged.
    cheap_dropout: bool = False
    # int8 MXU path for the transformer FF matmuls (ops/int8.py): dynamic
    # abs-max int8 forward, straight-through bf16 backward. v5e int8 runs at
    # 2x bf16 peak; opt-in until the perf battery shows a quality-neutral
    # win (same protocol as fused_attention).
    int8_ff: bool = False
    # quantizer internals
    fsq_levels: Tuple[int, ...] = (8, 5, 5, 5)
    # FSQ bounding (Mentzer et al. 2023 tanh-squash to exactly prod(levels)
    # codes). The reference rounds the UNBOUNDED projection (vqvae.py:118-122)
    # whose spread is a learned equilibrium — measured at 2.8-4.6x nominal
    # here vs the reference's 1.36x (diag_fsq_spread.py). Default True since
    # the round-3 arm measured it better on BOTH axes: W64 grid best
    # val_recon 0.0372@150ep (vs 0.0453 unbounded at equal epochs) with
    # unique/nominal 1.0 and DCR 0.003 — the reference's own published
    # signature. bounded=False restores the reference's exact formulation.
    fsq_bounded: bool = True
    lfq_dim: int = 10
    # LFQ pre-sign LayerNorm (no affine): stops the measured STE scale
    # runaway that freezes the reference formulation at mean-prediction on
    # this repo's data (scripts/diag_lfq.py). Default True since the round-3
    # sweep: collapsed best val_recon 0.2703/PPL 33 -> 0.0562/PPL 981 at 80
    # epochs with the norm. lfq_norm=False restores reference semantics.
    lfq_norm: bool = True
    # Opt-in pre-quantizer LayerNorm (parameter-free, shared by both encoder
    # branches): removes the latents' common-mode offset before the
    # nearest-code search. Cures the measured W64-transformer EMA collapse
    # that data seeding alone cannot (the cloud's common-mode drift outruns
    # the ~100x-smaller per-window spread within one epoch) — the same
    # failure class lfq_norm fixes for LFQ.
    vq_norm: bool = False
    commitment_cost: float = 0.25
    ema_decay: float = 0.99
    entropy_loss_weight: float = 0.1
    num_res_layers: int = 4
    # compute dtype for matmul-heavy paths ("bfloat16" or "float32")
    compute_dtype: str = "float32"
    # --- ref-exact switches (see docs/REF_EXACT.md) ---
    # Warm-start EMA codebook stats (ema_w = embedding, cluster_size = 1).
    # False restores the reference's normal-init ema_w + zero cluster sizes
    # (vqvae.py:24-26), whose first EMA fold explodes unused codes to ~1e5
    # norm — tolerable at the reference's small-batch regime, pathological at
    # TPU batch sizes (round-1 flagship PPL=1 collapse).
    ema_warm_start: bool = True
    # torch-style kaiming-uniform kernel init (U(±sqrt(1/fan_in))) instead of
    # flax lecun-normal. Default True since the round-3 factorized A/B
    # (docs/REF_EXACT.md): the torch init measured 11.6% better best
    # val_recon on the flagship at 150 epochs x 2 seeds, with every other
    # flag at its default. False restores lecun-normal (the round-2 regime
    # all pre-round-3 results/ logs trained under).
    torch_init: bool = True

    def __post_init__(self):
        if self.arch not in ARCHS:
            raise ValueError(f"Unknown arch {self.arch!r}; expected one of {ARCHS}")
        if self.method not in METHODS:
            raise ValueError(f"Unknown quantization method {self.method!r}; expected one of {METHODS}")
        if self.tf_tokens < 1 or (self.arch == "transformer"
                                  and self.window_size % self.tf_tokens):
            raise ValueError(
                f"tf_tokens={self.tf_tokens} must be >=1 and divide "
                f"window_size={self.window_size}")


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (defaults mirror reference scripts/train_ablation.py:39-57)."""

    mode: str = "teacher"
    epochs: int = 400
    batch_size: int = 512
    learning_rate: float = 2e-4
    weight_decay: float = 1e-4
    patience: int = -1           # early stopping; -1 disables
    seeds: Tuple[int, ...] = (42,)
    val_fraction: float = 0.1
    # loss weights (reference scripts/train_ablation.py:52-57)
    lambda_recon: float = 1.0
    lambda_vq: float = 1.0
    lambda_vel: float = 0.5
    lambda_cross: float = 5.0
    lambda_align: float = 100.0
    lambda_fk: float = 0.0       # world-space FK loss weight (BASELINE.json north star;
                                 # 0 = off, matching the reference's joint-space-only loss)
    temperature: float = 0.07    # InfoNCE (kept for completeness; unused by default)
    resume: bool = False
    teacher_ckpt: Optional[str] = None
    # Reference-exact velocity loss: diff along the CHANNEL axis like the
    # reference's `recon[:,:,1:] - recon[:,:,:-1]` (train_ablation.py:214 — an
    # apparent indexing slip); False = time-axis semantics. Default True
    # since the round-3 factorized A/B (docs/REF_EXACT.md): reference
    # semantics measured 8.4% better best val_recon while the time-axis
    # val_vel eval metric worsened only 1.6% — the time-axis training loss
    # does not buy the smoothness it costs in recon. Time-axis remains one
    # flag away (--no-ref_exact_vel).
    ref_exact_vel: bool = True
    save_every: int = 1          # epochs between `_last` checkpoint writes (ref: 1)
    # Seed first-stage EMA codebooks from encoder outputs on a real batch
    # before training (VQ-VAE-2/Jukebox-style data init). Cures the measured
    # winner-take-all collapse when latents sit in a tiny ball far from the
    # reference's U(-1/K,1/K) code init (W64 transformer: PPL pinned at 1.0
    # from epoch 0 — train/codebook_seed.py has the numbers). Init-only;
    # opt-in (teacher mode, fresh starts).
    codebook_data_init: bool = False
    # Transfer init: checkpoint path (or "{seed}" pattern) whose matching
    # leaves (same path + shape) initialize this run; mismatched leaves (e.g.
    # a fresh quantizer absent from an ae checkpoint) keep their init. The
    # round-3 W64-transformer recipe: pretrain `ae` so latents spread, then
    # train hybrid from it with codebook_data_init (train/codebook_seed.py).
    init_from: Optional[str] = None
    # TPU-specific
    data_axis: str = "data"      # mesh axis name for batch sharding
    donate: bool = True
    # Gradient accumulation: split each optimizer batch into `accum_chunks`
    # sequential microbatches inside the step (lax.scan), summing gradients and
    # applying the optimizer once. Gradients are bit-identical to the single
    # big-batch step (all losses are batch means); live activation memory drops
    # by the chunk factor — the measured cure for the large-batch HBM-pressure
    # slowdown (compiled temp buffers: 3.2 GB at batch 4096 vs 12.8 GB at
    # 16384 on 16 GB v5e HBM). EMA `qstats` / BatchNorm stats update once per
    # microbatch, i.e. exactly the reference's semantics at batch_size/accum.
    accum_chunks: int = 1
    # Reuse ONE dropout mask across the microbatches of an accumulated step:
    # the mask computation becomes loop-invariant w.r.t. the microbatch scan,
    # in principle letting XLA's while-loop LICM hoist the PRNG work (the
    # measured ~10% mask-generation cost at micro-512) out of the inner loop.
    # MEASURED: it does NOT pay — 220.1k -> 208.6k win/s at the headline
    # 16384@micro512 and neutral at micro256 (perf_battery.md round-3); XLA
    # either re-materializes the masks per iteration or the hoisted buffers'
    # liveness costs more than the PRNG saved. Kept as a documented negative
    # result; regularization semantics differ (all microbatches of one update
    # drop the same units), so it would also need a quality A/B before use.
    reuse_dropout_mask: bool = False

    def __post_init__(self):
        if self.mode not in MODES:
            raise ValueError(f"Unknown mode {self.mode!r}; expected one of {MODES}")
        if self.accum_chunks < 1 or self.batch_size % self.accum_chunks:
            raise ValueError(
                f"accum_chunks={self.accum_chunks} must be >=1 and divide "
                f"batch_size={self.batch_size}")


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline config (reference scripts/data/process_data.py:143-150)."""

    input_dir: str = "data/raw/unzipped/extended_datasets/lafan1_dataset/g1"
    output_dir: str = "data/processed"
    window: int = 64
    step: int = 20
    overwrite: bool = False


@dataclass(frozen=True)
class ExperimentConfig:
    """One ablation entry: everything needed to reproduce a run."""

    id: str
    name: str
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    log_dir: str = "results"
    checkpoint_dir: str = "checkpoints"

    # ---- artifact naming (reference conventions, scripts/train_ablation.py:124-126, 350, 363) ----
    def run_name(self, seed: int) -> str:
        return f"{self.name}_{self.model.method}_{self.train.mode}_seed_{seed}"

    def log_name(self, seed: int) -> str:
        # Teacher keeps the bare id (reference grouping); the student gets its
        # own log family — with a shared name the student's every-epoch write
        # would overwrite the teacher history of the same experiment (the
        # reference's shipped logs are mode-distinct files).
        if self.train.mode == "student":
            return f"log_{self.id}_student_seed_{seed}.json"
        return f"log_{self.id}_seed_{seed}.json"

    def ckpt_name(self, seed: int, kind: str) -> str:
        assert kind in ("last", "best", "final")
        return f"{self.run_name(seed)}_{kind}"

    # ---- serialization (config travels inside checkpoints, train_ablation.py:281) ----
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExperimentConfig":
        d = dict(d)
        model = d.pop("model", {})
        train = d.pop("train", {})
        if isinstance(model.get("fsq_levels"), list):
            model["fsq_levels"] = tuple(model["fsq_levels"])
        if isinstance(train.get("seeds"), list):
            train["seeds"] = tuple(train["seeds"])
        return cls(model=ModelConfig(**model), train=TrainConfig(**train), **d)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        return cls.from_dict(json.loads(s))


# Window each arch family's bare registry id refers to (every shipped
# artifact follows this: simple/resnet grid at W64, resnet_no_down anchor and
# transformer flagship at W10 — reference README.md:139-145, 294-322).
_CANONICAL_WINDOW: Dict[str, int] = {
    "simple": 64, "resnet": 64, "resnet_no_down": 10, "transformer": 10,
}


def make_experiment(
    arch: str,
    method: str,
    *,
    window: int = 64,
    mode: str = "teacher",
    seeds: Sequence[int] = (42,),
    exp_id: Optional[str] = None,
    name: Optional[str] = None,
    **overrides: Any,
) -> ExperimentConfig:
    """Build an ExperimentConfig with the reference's derived names.

    Mirrors the CLI->config assembly of reference scripts/train_ablation.py:399-418:
    name = "Exp_{arch}_W{window}"; id = "{arch}_{method}" WHEN the window is the
    arch family's canonical one (_CANONICAL_WINDOW: simple/resnet=64,
    resnet_no_down/transformer=10), else "{arch}_{method}_W{window}" — the bare
    reference id is window-less and a second window would silently overwrite
    the first family's logs (measured hazard; see comment below). Callers that
    need the reference's literal id at a non-canonical window can pass exp_id.
    """
    model_keys = {f.name for f in dataclasses.fields(ModelConfig)}
    train_keys = {f.name for f in dataclasses.fields(TrainConfig)}
    model_over = {k: v for k, v in overrides.items() if k in model_keys}
    train_over = {k: v for k, v in overrides.items() if k in train_keys}
    other = {k: v for k, v in overrides.items() if k not in model_keys | train_keys}
    if other:
        raise TypeError(f"Unknown config overrides: {sorted(other)}")
    model = ModelConfig(arch=arch, method=method, window_size=window, **model_over)
    train = TrainConfig(mode=mode, seeds=tuple(seeds), **train_over)
    # The bare "{arch}_{method}" id is the reference's registry contract, but
    # it is window-less: training the same arch+method at a second window
    # would silently overwrite the first family's id-style logs (measured
    # hazard: a W64 transformer probe clobbered the W10 flagship logs).
    # Non-canonical windows therefore get a window-qualified id.
    canonical = _CANONICAL_WINDOW.get(arch, 64)
    default_id = f"{arch}_{method}" + ("" if window == canonical else f"_W{window}")
    default_name = f"Exp_{arch}_W{window}"
    if getattr(model, "tf_tokens", 1) != 1:
        # non-reference latent rate: qualify BOTH id and name so K>1 runs
        # can never clobber the reference-semantics artifacts (same hazard
        # class as the window qualification above)
        default_id += f"_K{model.tf_tokens}"
        default_name += f"_K{model.tf_tokens}"
    return ExperimentConfig(
        id=exp_id or default_id,
        name=name or default_name,
        model=model,
        train=train,
    )


def ref_exact(exp: ExperimentConfig) -> ExperimentConfig:
    """Flip every documented deviation back to reference semantics for A/B:
    channel-axis velocity diff (train_ablation.py:214), torch kaiming-uniform
    kernel init, and the reference's cold EMA-state init (normal ema_w, zero
    cluster sizes). Measured deltas are recorded in docs/REF_EXACT.md."""
    return dataclasses.replace(
        exp,
        model=dataclasses.replace(exp.model, ema_warm_start=False, torch_init=True),
        train=dataclasses.replace(exp.train, ref_exact_vel=True),
    )


# Central ablation registry (reference models/experiment_config.py:9-18).
# id -> display name -> arch/method; consumed by the LaTeX exporter ordering.
EXPERIMENTS: List[Dict[str, str]] = [
    {"id": "simple_ema", "name": "Baseline(Simple)", "arch": "simple", "method": "ema"},
    {"id": "resnet_ema", "name": "ResNet+EMA", "arch": "resnet", "method": "ema"},
    {"id": "resnet_rvq", "name": "ResNet+RVQ", "arch": "resnet", "method": "rvq"},
    {"id": "resnet_fsq", "name": "FSQ", "arch": "resnet", "method": "fsq"},
    {"id": "resnet_lfq", "name": "LFQ", "arch": "resnet", "method": "lfq"},
    {"id": "resnet_hybrid", "name": "Ours(Dual-Enc+Hybrid)", "arch": "resnet", "method": "hybrid"},
]


# Full metric schema the evaluators expect (reference export_latex_table.py:19-27,
# plot_results.py:11-25). The reference train loop only wrote a subset; we log all.
HISTORY_KEYS: Tuple[str, ...] = (
    "train_loss",
    "train_recon_loss",
    "train_vq_loss",
    "val_loss",
    "val_recon",
    "val_cross_recon",
    "val_align",
    "val_vel",
    "val_jerk",
    "perplexity",
    "dcr",
    "dead_code_ratio",
    "rvq_ppl",
)
