"""Running confusion-matrix metrics (dice / mIoU) with device-side updates.

Equivalent of reference metrics.py:6-151, replacing sklearn's
``confusion_matrix`` (a host-side C loop forcing a GPU->CPU sync every
step, trainer.py:394-398) with a one-hot scatter-add computed inside the
compiled step. The host accumulates only a CxC integer matrix per batch.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix_device(
    ground_truth: Array, prediction: Array, num_classes: int, sample_weight=None
) -> Array:
    """CxC confusion matrix (rows = truth, cols = prediction) on device.

    Lowered as C^2 masked reductions instead of a scatter-add: XLA's
    serialized scatter over millions of voxels cost 18 ms/step on v5e
    (round-2 trace, fusion.9); plain boolean-product reductions are
    bandwidth-bound VPU work that fuses with the surrounding step.

    ``sample_weight`` (N,) of 1/0 excludes padded samples' voxels
    (pad-and-mask batches); inputs are then (N, *spatial).
    """
    if sample_weight is not None:
        n = ground_truth.shape[0]
        mask = (sample_weight > 0).reshape((n,) + (1,) * (ground_truth.ndim - 1))
        mask = jnp.broadcast_to(mask, ground_truth.shape).reshape(-1)
    gt = ground_truth.reshape(-1).astype(jnp.int32)
    pr = prediction.reshape(-1).astype(jnp.int32)
    if num_classes > 8:
        # one-hot contraction rides the MXU for wide class counts.
        # Accumulate in int32 (preferred_element_type): an fp32 contraction
        # would silently lose counts past 2^24 voxels per cell (e.g. a
        # 144^3 batch >= 6), and TPU default matmul precision would apply.
        gh = jax.nn.one_hot(gt, num_classes, dtype=jnp.int8)
        ph = jax.nn.one_hot(pr, num_classes, dtype=jnp.int8)
        if sample_weight is not None:
            gh = gh * mask[:, None].astype(jnp.int8)
        return jnp.einsum(
            "vi,vj->ij", gh, ph, preferred_element_type=jnp.int32
        )
    rows = []
    for i in range(num_classes):
        gi = (gt == i) if sample_weight is None else ((gt == i) & mask)
        rows.append(
            [jnp.sum(gi & (pr == j), dtype=jnp.int32) for j in range(num_classes)]
        )
    return jnp.array(rows, dtype=jnp.int32)


class _RunningBase:
    def __init__(self, labels: Sequence[int], ignore_label: int = 0):
        self.labels = list(labels)
        self.ignore_label = ignore_label
        self.overall_confusion_matrix: Optional[np.ndarray] = None

    def update_matrix(self, ground_truth, prediction):
        gt = np.asarray(ground_truth)
        if (gt == self.ignore_label).all():
            return
        cm = np.asarray(
            confusion_matrix_device(
                jnp.asarray(ground_truth), jnp.asarray(prediction), len(self.labels)
            )
        ).astype(np.int64)
        if self.overall_confusion_matrix is None:
            self.overall_confusion_matrix = cm
        else:
            self.overall_confusion_matrix += cm

    def update_from_matrix(self, cm) -> None:
        """Accumulate a precomputed CxC matrix (e.g. returned by a jit step)."""
        cm = np.asarray(cm).astype(np.int64)
        if self.overall_confusion_matrix is None:
            self.overall_confusion_matrix = cm
        else:
            self.overall_confusion_matrix += cm

    def init_op(self):
        self.overall_confusion_matrix = None


class RunningDice(_RunningBase):
    """Cumulative dice from a running confusion matrix (ref metrics.py:82-151)."""

    def compute_dice(self, smooth: float = 1e-5):
        if self.overall_confusion_matrix is None:
            return 0.0, []
        cm = self.overall_confusion_matrix
        inter = np.diag(cm)
        union = cm.sum(axis=1) + cm.sum(axis=0)
        dice = (2 * inter + smooth) / (union.astype(np.float32) + smooth)
        dice_list = [round(float(c), 4) for c in dice]
        return float(np.mean(dice[1:])), dice_list


class RunningConfusionMatrix(_RunningBase):
    """Cumulative mIoU (ref metrics.py:6-76)."""

    def compute_mIoU(self, smooth: float = 1e-5):
        if self.overall_confusion_matrix is None:
            return 0.0, []
        cm = self.overall_confusion_matrix
        inter = np.diag(cm)
        union = cm.sum(axis=1) + cm.sum(axis=0) - inter
        iou = (inter + smooth) / (union.astype(np.float32) + smooth)
        iou_list = [round(float(c), 4) for c in iou]
        return float(np.mean(iou)), iou_list


class AverageMeter:
    """Running average (ref trainer.py:871-888)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
