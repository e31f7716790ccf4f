"""Config system: validation, serialization round-trips, artifact naming."""

import json

import pytest

from bridgerl_tpu.config import (
    EXPERIMENTS,
    HISTORY_KEYS,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    make_experiment,
)


def test_model_config_validation():
    with pytest.raises(ValueError):
        ModelConfig(arch="nope")
    with pytest.raises(ValueError):
        ModelConfig(method="nope")
    with pytest.raises(ValueError):
        TrainConfig(mode="nope")


def test_make_experiment_names_match_reference_scheme():
    exp = make_experiment("transformer", "hybrid", window=10, mode="teacher")
    assert exp.id == "transformer_hybrid"                      # train_ablation.py:414
    assert exp.name == "Exp_transformer_W10"                   # train_ablation.py:409
    assert exp.run_name(42) == "Exp_transformer_W10_hybrid_teacher_seed_42"
    assert exp.log_name(42) == "log_transformer_hybrid_seed_42.json"
    assert exp.ckpt_name(42, "best") == "Exp_transformer_W10_hybrid_teacher_seed_42_best"


def test_make_experiment_rejects_unknown_overrides():
    with pytest.raises(TypeError):
        make_experiment("simple", "ema", not_a_field=1)


def test_experiment_json_roundtrip():
    exp = make_experiment("resnet", "rvq", window=64, seeds=(42, 7),
                          epochs=123, batch_size=77, lambda_fk=0.5,
                          attn_packing=8, compute_dtype="bfloat16")
    back = ExperimentConfig.from_json(exp.to_json())
    assert back == exp
    # json is valid and carries tuples as lists
    d = json.loads(exp.to_json())
    assert d["train"]["seeds"] == [42, 7]
    assert d["model"]["fsq_levels"] == [8, 5, 5, 5]


def test_registry_matches_reference():
    """The ablation registry ids/names (experiment_config.py:9-18)."""
    ids = [e["id"] for e in EXPERIMENTS]
    assert ids == ["simple_ema", "resnet_ema", "resnet_rvq", "resnet_fsq",
                   "resnet_lfq", "resnet_hybrid"]
    assert EXPERIMENTS[-1]["name"] == "Ours(Dual-Enc+Hybrid)"


def test_history_schema_covers_evaluator_expectations():
    """Keys the LaTeX exporter + plotters read must all be logged."""
    for k in ("val_recon", "val_cross_recon", "val_align", "val_vel",
              "val_jerk", "perplexity", "dead_code_ratio", "dcr", "rvq_ppl",
              "train_loss"):
        assert k in HISTORY_KEYS
