"""Training layer: objectives, fused train step, trainer, checkpoints, logs."""

from meanflow_audio_codec_tpu.training.objectives import (
    AutoencoderObjective,
    FlowMatchingLoss,
    FlowMatchingObjective,
    ImprovedMeanFlowLoss,
    ImprovedMeanFlowObjective,
    LossStrategy,
    MeanFlowLoss,
    MeanFlowObjective,
    Objective,
    create_loss_strategy,
)
from meanflow_audio_codec_tpu.training.train_step import (
    make_eval_step,
    make_train_step,
    train_step,
)
