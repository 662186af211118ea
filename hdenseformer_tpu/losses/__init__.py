from hdenseformer_tpu.losses.losses import (
    binary_dice_loss,
    dice_loss,
    cross_entropy_loss,
    topk_loss,
    focal_loss,
    fl_loss,
    ce_plus_dice,
    fl_plus_dice,
    deep_supervision_loss,
    get_loss,
    LOSS_REGISTRY,
)

__all__ = [
    "binary_dice_loss",
    "dice_loss",
    "cross_entropy_loss",
    "topk_loss",
    "focal_loss",
    "fl_loss",
    "ce_plus_dice",
    "fl_plus_dice",
    "deep_supervision_loss",
    "get_loss",
    "LOSS_REGISTRY",
]
