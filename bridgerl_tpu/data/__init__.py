from .dataset import (
    PairedDataset,
    denormalize,
    epoch_batch_indices,
    iterate_batches,
    normalize,
    split_indices,
    train_val_split,
)
from .pipeline import (
    ARTIFACTS,
    inspect_npz,
    load_artifacts,
    process_paired_data,
    save_artifacts,
    slice_windows,
)
from .rotations import (
    axis_angle_to_matrix,
    compute_6d_rotation,
    matrix_to_6d,
    quat_slerp,
    quat_to_matrix,
    rotation_6d_to_matrix,
)
from .manifest import DATASET, VerifyReport, candidate_files, verify_tree
from .synthetic import generate_synthetic_dataset, synth_pair, synthetic_npz_tree
