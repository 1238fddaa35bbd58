from bridgelang_tpu.training.trainer import (
    OptimConfig,
    TrainState,
    cross_entropy_ignore_index,
    init_train_state,
    make_optimizer,
    make_vla_train_step,
    vla_metrics_on_device,
)

__all__ = [
    "OptimConfig",
    "TrainState",
    "cross_entropy_ignore_index",
    "init_train_state",
    "make_optimizer",
    "make_vla_train_step",
    "vla_metrics_on_device",
]
