"""Dice-parity rung for the PRODUCTION configuration (VERDICT r4 item 2).

Same 100-step paired aug+PolyLR protocol as parity_fullscale.py — same
initial weights, paired augmentation draws, Adam(wd 1e-4) + deep-
supervision FocalLoss, reference model scale nf=32/depth=24 — but OUR
side runs the SHIPPED config users actually get
(configs/config.py defaults on TPU):

  - bf16 compute, fp32 params/loss        (use_fp16=True)
  - s2d auto  -> level 0 space-to-depth packed (models/hdenseformer.py)
  - norm_barrier auto -> ON on TPU        (utils/flags.py)
  - fused InstanceNorm+ReLU custom VJP    (ops/fused_norm.py, default)

against the fp32 torch reference on this host's CPU. parity_fullscale.py
deliberately ran fp32-vs-fp32 to isolate framework numerics; THIS rung
closes the remaining gap to BASELINE's bar: dice parity of the shipped
thing. Dropout is 0 on both sides (dropout draws cannot be paired across
frameworks; it is not one of the knobs under test).

The reference patch is 144^3, but the torch side costs 243.9 s/step on
this host's CPU (PARITY.md) = 6.8 h for 100 steps; per VERDICT r4 item 2
the rung runs at 64^3 AND 32^3 instead, both recorded.

Run: python baselines/parity_production.py [patch_edge ...]   (default: 64 32)
Results recorded in PARITY.md (round 5).
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def run_patch(edge: int) -> dict:
    import random as _random

    import torch

    from reference_util import add_reference_to_path
    from test_training_trajectory import (
        _make_volumes,
        _our_pipeline,
        _ref_pipeline,
    )

    add_reference_to_path()
    from models.HDenseFormer import HDenseFormer as RefHDF
    from loss.cross_entropy import FocalLoss as RefFocal
    from loss.combine_loss import DeepSuperloss as RefDS

    import jax
    import jax.numpy as jnp
    import optax

    from hdf_mapping import map_hdenseformer_weights
    from hdenseformer_tpu.losses import get_loss
    from hdenseformer_tpu.models.hdenseformer import HDenseFormer
    from hdenseformer_tpu.train.loop import make_train_step
    from hdenseformer_tpu.train.state import PolyLR, TrainState, set_learning_rate

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    in_ch, n_cls, nf, depth = 2, 2, 32, 24
    patch = (edge,) * 3
    size = tuple(e + max(8, e // 4) for e in patch)
    n_epochs, steps_per_epoch, bsz = 20, 5, 2
    lr = 1e-2  # same protocol note as parity_fullscale.py

    vols = _make_volumes(8, size, in_ch, n_cls)
    val_vols = _make_volumes(8, patch, in_ch, n_cls, seed=7)

    ref = RefHDF(in_channels=in_ch, n_cls=n_cls, n_filters=nf,
                 image_size=patch, transformer_depth=depth)
    ref.eval()
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}

    ref_run = _ref_pipeline(patch)
    our_run = _our_pipeline(patch)

    def make_batches(run):
        batches = []
        for step_i in range(n_epochs * steps_per_epoch):
            imgs, labs = [], []
            for b in range(bsz):
                s = 1000 + step_i * 17 + b
                _random.seed(s)
                np.random.seed(s)
                vi = _random.randrange(len(vols))
                img, lab = run(*vols[vi])
                oh = np.stack([1.0 - lab, lab], 0).astype(np.float32)
                imgs.append(img)
                labs.append(oh)
            batches.append((np.stack(imgs), np.stack(labs)))
        return batches

    batches_t = make_batches(ref_run)
    batches_j = make_batches(our_run)

    def np_dice(logits_ncdhw, lab_onehot):
        pred = np.argmax(logits_ncdhw, 1)
        tgt = np.argmax(lab_onehot, 1)
        inter = np.sum((pred == 1) & (tgt == 1))
        den = np.sum(pred == 1) + np.sum(tgt == 1)
        return (2.0 * inter + 1e-5) / (den + 1e-5)

    class RefPolyLR(torch.optim.lr_scheduler._LRScheduler):
        """Restatement of reference trainer.py:1012-1031."""

        def __init__(self, optimizer, max_epochs, ck_epoch=0, exponent=0.9):
            self.max_epochs = max_epochs
            self.ck_epoch = ck_epoch
            self.exponent = exponent
            super().__init__(optimizer, -1)

        def get_lr(self):
            if self.last_epoch > self.max_epochs:
                return [g["lr"] for g in self.optimizer.param_groups]
            frac = (self.last_epoch - self.ck_epoch) / (
                self.max_epochs - self.ck_epoch
            )
            return [b * (1 - frac) ** self.exponent for b in self.base_lrs]

    # --- reference training (torch fp32, this host's CPU) ------------------
    crit_t = RefDS(criterion=RefFocal(reduction="sum"))
    opt = torch.optim.Adam(ref.parameters(), lr=lr, weight_decay=1e-4)
    sched_t = RefPolyLR(opt, max_epochs=n_epochs)
    losses_t = []
    t0 = time.perf_counter()
    it = iter(batches_t)
    for epoch in range(n_epochs):
        for _ in range(steps_per_epoch):
            img, lab = next(it)
            out = ref(torch.from_numpy(img))
            loss = crit_t(out, torch.from_numpy(lab))
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses_t.append(float(loss.detach()))
        sched_t.step()
        print(f"[torch {edge}^3] epoch {epoch + 1}/{n_epochs} "
              f"loss {losses_t[-1]:.4f} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
    torch_s = time.perf_counter() - t0
    with torch.no_grad():
        dice_t = float(np.mean([
            np_dice(ref(torch.from_numpy(iv[None]))[0].numpy(),
                    np.stack([1 - lv, lv], 0)[None])
            for iv, lv in val_vols
        ]))

    # --- our training (JAX TPU, PRODUCTION config) --------------------------
    assert jax.default_backend() in ("tpu", "axon"), jax.devices()
    from hdenseformer_tpu.utils.flags import norm_barrier_enabled

    assert norm_barrier_enabled(), "auto barrier must be ON on TPU"
    model = HDenseFormer(in_channels=in_ch, n_cls=n_cls, n_filters=nf,
                         image_size=patch, transformer_depth=depth,
                         dropout=0.0, dtype=jnp.bfloat16, remat=False,
                         s2d=None)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1,) + patch + (in_ch,)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = map_hdenseformer_weights(sd, params, in_ch, depth)
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        )
    )(learning_rate=lr)
    state = TrainState.create(
        apply_fn=model.apply,
        params=jax.tree_util.tree_map(jnp.asarray, params),
        tx=tx, model_state={},
    )
    crit_j = get_loss("FocalLoss", use_ds=True)
    step = make_train_step(crit_j, n_cls)
    sched_j = PolyLR(lr, max_epochs=n_epochs)
    key = jax.random.PRNGKey(0)
    losses_j = []
    t0 = time.perf_counter()
    it = iter(batches_j)
    for epoch in range(n_epochs):
        state = set_learning_rate(state, sched_j.step())
        for _ in range(steps_per_epoch):
            img, lab = next(it)
            batch = {
                "image": jnp.asarray(np.moveaxis(img, 1, -1)),
                "label": jnp.asarray(np.moveaxis(lab, 1, -1)),
            }
            state, m = step(state, batch, key)
            losses_j.append(float(m["loss"]))
        print(f"[tpu   {edge}^3] epoch {epoch + 1}/{n_epochs} "
              f"loss {losses_j[-1]:.4f} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
    tpu_s = time.perf_counter() - t0
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           rngs={"dropout": key}))
    dice_j = float(np.mean([
        np_dice(
            np.moveaxis(np.asarray(
                fwd(state.params, jnp.asarray(np.moveaxis(iv, 0, -1))[None])[0]
            ), -1, 1),
            np.stack([1 - lv, lv], 0)[None],
        )
        for iv, lv in val_vols
    ]))

    rel = np.abs(np.asarray(losses_j) - np.asarray(losses_t)) / np.maximum(
        np.abs(np.asarray(losses_t)), 1e-6
    )
    res = {
        "config": "production: bf16 + s2d auto + norm_barrier auto + fused-norm VJP",
        "nf": nf, "depth": depth, "patch": list(patch),
        "steps": len(losses_t),
        "loss_rel_err_mean": round(float(rel.mean()), 5),
        "loss_rel_err_max": round(float(rel.max()), 5),
        "dice_torch_cpu_fp32": round(dice_t, 5),
        "dice_jax_tpu_production": round(dice_j, 5),
        "dice_abs_delta": round(abs(dice_j - dice_t), 5),
        "within_baseline_bar": bool(abs(dice_j - dice_t) < 5e-3),
        "torch_wall_s": round(torch_s, 1),
        "tpu_wall_s": round(tpu_s, 1),
        "losses_torch_first5": [round(v, 4) for v in losses_t[:5]],
        "losses_jax_first5": [round(v, 4) for v in losses_j[:5]],
        "losses_torch_last5": [round(v, 4) for v in losses_t[-5:]],
        "losses_jax_last5": [round(v, 4) for v in losses_j[-5:]],
    }
    print(json.dumps(res), flush=True)
    return res


def main():
    edges = [int(a) for a in sys.argv[1:]] or [64, 32]
    out = {}
    for e in edges:
        out[f"patch{e}"] = run_patch(e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
