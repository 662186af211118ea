"""Train state, optimizer factory, and LR schedules.

Optimizer semantics match the reference (trainer.py:793-858):
- Adam/AdamW/SGD-nesterov with weight decay EXCLUDED for 1-D params and
  biases (trainer.py:804-819). torch's Adam applies *coupled* L2 (decay
  added to the gradient before the moment updates), so the optax chain
  places ``add_decayed_weights`` before ``scale_by_adam``; AdamW is
  decoupled as in torch.
- Schedules replicate torch semantics stepping per *epoch*:
  poly (1-e/E)^0.9 (trainer.py:1012-1031), MultiStepLR, CosineAnnealingLR,
  CosineAnnealingWarmRestarts(T_0=5, T_mult=2), ReduceLROnPlateau
  (mode='min', patience=5, factor 0.1).

The learning rate is injected as a hyperparameter so the compiled update
step is reused across epochs (no recompilation when the LR changes).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    model_state: Any  # non-param variable collections (e.g. batch_stats)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, model_state=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            model_state=self.model_state if model_state is None else model_state,
        )

    @classmethod
    def create(cls, apply_fn, params, tx, model_state=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            model_state={} if model_state is None else model_state,
            tx=tx,
            apply_fn=apply_fn,
        )

    def variables(self) -> dict:
        return {"params": self.params, **self.model_state}


def decay_mask(params) -> Any:
    """True (decay) for >1-D kernels; False for biases/norm scales.

    Mirrors reference ``set_weight_decay`` (trainer.py:804-819): no decay
    for params with len(shape)==1 or name ending in '.bias'. Our param
    trees name biases 'bias', and all norm scales/biases are 1-D, so the
    rank test subsumes the name test.
    """
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def get_optimizer(
    name: str,
    lr: float,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """Build the optax chain; LR is an injected hyperparam (set per-epoch)."""
    name = name.lower()

    def make(learning_rate):
        if name == "adam":
            # torch Adam: coupled L2 then adam moments
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=decay_mask),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale(-learning_rate),
            )
        if name == "adamw":
            return optax.chain(
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(weight_decay, mask=decay_mask),
                optax.scale(-learning_rate),
            )
        if name == "sgd":
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=decay_mask),
                optax.trace(decay=momentum, nesterov=True),
                optax.scale(-learning_rate),
            )
        raise ValueError(f"unknown optimizer {name!r}")

    return optax.inject_hyperparams(make)(learning_rate=lr)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Overwrite the injected LR hyperparam in-place (no recompilation).

    The replacement scalar is placed with the OLD scalar's sharding: a
    fresh uncommitted array would change the compiled train step's input
    layout and force a full recompile at the next epoch (multi-minute at
    real scale — caught by
    test_pad_and_mask_no_extra_compiles_across_epochs).
    """
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    old = hp.get("learning_rate")
    new = jnp.asarray(lr, jnp.float32)
    if isinstance(old, jax.Array) and hasattr(old, "sharding"):
        new = jax.device_put(new, old.sharding)
    hp["learning_rate"] = new
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


def current_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


# ---------------------------------------------------------------------------
# Per-epoch LR schedules (torch-semantics)
# ---------------------------------------------------------------------------

class LRScheduler:
    """Stateful per-epoch scheduler. ``step(metric)`` returns the new LR."""

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.last_epoch = -1

    def step(self, metric: Optional[float] = None) -> float:
        self.last_epoch += 1
        return self._lr(self.last_epoch, metric)

    def _lr(self, epoch: int, metric):
        raise NotImplementedError


class PolyLR(LRScheduler):
    """lr * (1 - e/E)^0.9, per reference PolyLR (trainer.py:1012-1031)."""

    def __init__(self, base_lr, max_epochs, ck_epoch=0, exponent=0.9):
        super().__init__(base_lr)
        self.max_epochs = max_epochs
        self.ck_epoch = ck_epoch
        self.exponent = exponent
        self._last = base_lr

    def _lr(self, epoch, metric):
        if epoch > self.max_epochs:
            return self._last
        self._last = self.base_lr * (
            1 - (epoch - self.ck_epoch) / (self.max_epochs - self.ck_epoch)
        ) ** self.exponent
        return self._last


class MultiStepLR(LRScheduler):
    def __init__(self, base_lr, milestones, gamma=0.1):
        super().__init__(base_lr)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def _lr(self, epoch, metric):
        n = sum(1 for m in self.milestones if m <= epoch)
        return self.base_lr * (self.gamma**n)


class CosineAnnealingLR(LRScheduler):
    def __init__(self, base_lr, T_max, eta_min=0.0):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min

    def _lr(self, epoch, metric):
        return (
            self.eta_min
            + (self.base_lr - self.eta_min)
            * (1 + math.cos(math.pi * epoch / self.T_max))
            / 2
        )


class CosineAnnealingWarmRestarts(LRScheduler):
    def __init__(self, base_lr, T_0=5, T_mult=2, eta_min=0.0):
        super().__init__(base_lr)
        self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min

    def _lr(self, epoch, metric):
        T_i, t = self.T_0, epoch
        while t >= T_i:
            t -= T_i
            T_i *= self.T_mult
        return (
            self.eta_min
            + (self.base_lr - self.eta_min) * (1 + math.cos(math.pi * t / T_i)) / 2
        )


class ReduceLROnPlateau(LRScheduler):
    """mode='min', patience=5, factor=0.1 (trainer.py:844-846)."""

    def __init__(self, base_lr, patience=5, factor=0.1, mode="min"):
        super().__init__(base_lr)
        self.patience = patience
        self.factor = factor
        self.mode = mode
        self.best = None
        self.bad = 0
        self.lr = base_lr

    def _lr(self, epoch, metric):
        if metric is None:
            return self.lr
        better = self.best is None or (
            metric < self.best if self.mode == "min" else metric > self.best
        )
        if better:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr *= self.factor
                self.bad = 0
        return self.lr


def get_lr_scheduler(
    name: Optional[str],
    base_lr: float,
    n_epoch: int = 100,
    milestones=(50, 80),
    gamma: float = 0.1,
    T_max: int = 5,
) -> Optional[LRScheduler]:
    """Factory mirroring reference dispatch (trainer.py:843-858)."""
    if name is None:
        return None
    if name == "poly_lr":
        return PolyLR(base_lr, max_epochs=n_epoch)
    if name == "MultiStepLR":
        return MultiStepLR(base_lr, milestones, gamma)
    if name == "CosineAnnealingLR":
        return CosineAnnealingLR(base_lr, T_max)
    if name == "CosineAnnealingWarmRestarts":
        return CosineAnnealingWarmRestarts(base_lr, 5, 2)
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(base_lr)
    raise ValueError(f"unknown lr scheduler {name!r}")
