from .native import (
    available,
    ensure_built,
    load_npy_f32,
    mean_std,
    normalize_inplace,
    shuffle_indices,
    slice_windows,
)
