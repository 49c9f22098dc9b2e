from caiman_asr_tpu.training.lr import lr_schedule
from caiman_asr_tpu.training.optimizer import OptimizerConfig, build_optimizer
from caiman_asr_tpu.training.step import TrainState, make_train_step, make_val_loss_step

__all__ = [
    "lr_schedule",
    "OptimizerConfig",
    "build_optimizer",
    "TrainState",
    "make_train_step",
    "make_val_loss_step",
]
