from .distill_module import (
    DistillConfig,
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from .losses import cosine_similarity, distill_loss
from .projections import (
    apply_projections,
    flatten_groups,
    init_projections,
    parse_layer_groups,
    projections_from_state_dict,
    projections_to_state_dict,
)
from .schedules import linear_decay_factor, tri_stage_factor
from .trainer import (
    export_student_checkpoint,
    load_train_state,
    save_train_state,
    train,
)

__all__ = [
    "DistillConfig",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "make_eval_step",
    "distill_loss",
    "cosine_similarity",
    "linear_decay_factor",
    "tri_stage_factor",
    "parse_layer_groups",
    "flatten_groups",
    "init_projections",
    "apply_projections",
    "projections_to_state_dict",
    "projections_from_state_dict",
    "train",
    "save_train_state",
    "load_train_state",
    "export_student_checkpoint",
]
