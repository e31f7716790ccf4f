"""Inference/serving surface.

Submodules are imported lazily (PEP 562) so dependency-light consumers stay
light: `client` (urllib + numpy) and `streaming` (numpy) must be importable
on deployment hosts without flax/the training stack, and `serve_http.py`
startup shouldn't pay the model-library import just to reach `make_server`.
"""

_EXPORTS = {
    "export_motions": "motion_export",
    "load_model_from_checkpoint": "motion_export",
    "load_stats": "motion_export",
    "robot_recon_fn": "motion_export",
    "reconstruct_long_sequence": "reconstruct",
    "reconstruct_single_window": "reconstruct",
    "window_starts": "reconstruct",
    "ServingModule": "serialize",
    "export_serving_artifact": "serialize",
    "load_serving_artifact": "serialize",
    "make_serving_fns": "serialize",
    "ServingApp": "server",
    "make_server": "server",
    "ServingClient": "client",
    "ServingError": "client",
    "StreamingRetargeter": "streaming",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(f".{_EXPORTS[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return __all__
