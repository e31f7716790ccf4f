from .checkpoint import (
    load_checkpoint,
    merge_teacher_into_student,
    restore_opt_state,
    restore_variables,
    save_checkpoint,
    trainable_mask,
)
from .losses import (
    eval_metrics,
    info_nce_loss,
    jerk_loss,
    mse,
    student_loss,
    teacher_loss,
    time_diff,
    velocity_loss,
)
from .trainer import (
    Trainer,
    TrainState,
    make_eval_epoch,
    make_optimizer,
    make_train_epoch,
    split_variables,
    val_index_matrix,
)
from .multiseed import MultiSeedTrainer, init_states_vmapped
from .prior import (
    PriorTrainConfig,
    extract_code_grids,
    load_prior_checkpoint,
    sample_motion,
    save_prior_checkpoint,
    stitch_windows,
    train_prior,
)
