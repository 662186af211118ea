from hdenseformer_tpu.metrics.batch import binary_dice, compute_dice
from hdenseformer_tpu.metrics.running import (
    RunningDice,
    RunningConfusionMatrix,
    confusion_matrix_device,
)
from hdenseformer_tpu.metrics.eval3d import (
    cal_score,
    multi_dice,
    multi_hd,
    multi_jc,
    multi_vs,
    multi_asd,
)

__all__ = [
    "binary_dice",
    "compute_dice",
    "RunningDice",
    "RunningConfusionMatrix",
    "confusion_matrix_device",
    "cal_score",
    "multi_dice",
    "multi_hd",
    "multi_jc",
    "multi_vs",
    "multi_asd",
]
