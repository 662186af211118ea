"""In-loop batch dice metrics, computed ON DEVICE.

Equivalent to reference trainer.py:891-945 but fully vectorized and
jit-able: the reference's per-step ``.detach().cpu().numpy()`` + Python
class loop (trainer.py:394-398) serializes the accelerator every step; we
keep the whole reduction on device and transfer one scalar.

Semantic notes vs the reference ``compute_dice``:
- classes absent from BOTH argmax maps keep dice 1.0 (the reference's
  ``continue`` leaves the np.ones initializer in place);
- the reference rounds each class dice to 4 decimals before averaging —
  a cosmetic <5e-5 perturbation we do not replicate on device;
- smooth=1e-5 makes NaNs impossible so nanmean == mean.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def binary_dice(
    predict: Array, target: Array, smooth: float = 1e-5, sample_weight=None
) -> Array:
    """Hard dice over flattened per-sample masks, mean over batch.

    ``sample_weight`` (N,) of 1/0 excludes padded samples from the mean
    (pad-and-mask batches; see train/loop.py::SemanticSeg._put_batch).
    """
    p = predict.reshape(predict.shape[0], -1).astype(jnp.float32)
    t = target.reshape(target.shape[0], -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    union = jnp.sum(p + t, axis=1)
    dice = (2.0 * inter + smooth) / (union + smooth)
    if sample_weight is None:
        return jnp.mean(dice)
    w = sample_weight.astype(jnp.float32)
    return jnp.sum(dice * w) / jnp.maximum(jnp.sum(w), 1.0)


def compute_dice(
    logits: Array, target: Array, ignore_index: int = 0, sample_weight=None
) -> Array:
    """Mean over non-background classes of hard argmax dice.

    logits/target: (N, *spatial, C) channels-last; target one-hot.
    """
    num_classes = logits.shape[-1]
    pred_lab = jnp.argmax(logits, axis=-1)
    targ_lab = jnp.argmax(target, axis=-1)
    wmask = None
    if sample_weight is not None:
        wmask = (sample_weight > 0).reshape(
            (-1,) + (1,) * (pred_lab.ndim - 1)
        )

    def class_dice(i):
        p = (pred_lab == i)
        t = (targ_lab == i)
        if wmask is not None:
            p, t = p & wmask, t & wmask
        p, t = p.astype(jnp.float32), t.astype(jnp.float32)
        present = jnp.logical_or(jnp.any(p > 0), jnp.any(t > 0))
        d = binary_dice(p, t, sample_weight=sample_weight)
        return jnp.where(present, d, 1.0)

    dices = jnp.stack([class_dice(i) for i in range(num_classes)])
    keep = jnp.arange(num_classes) != ignore_index
    return jnp.sum(jnp.where(keep, dices, 0.0)) / jnp.maximum(jnp.sum(keep), 1)
