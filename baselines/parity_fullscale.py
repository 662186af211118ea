"""Full-scale Dice-parity rung (VERDICT r3 item 8).

Repeats the tests/test_training_trajectory.py 70-step aug+PolyLR
protocol — same weights, paired augmentation draws, Adam(wd 1e-4) +
deep-supervision FocalLoss + per-epoch PolyLR — at the REFERENCE model
scale (n_filters=32, transformer_depth=24; reference config.py:120,
models/HDenseFormer.py:257) instead of the CPU-suite's nf=4/depth-8,
with OUR side running on the real TPU chip and the reference side in
torch on this host's CPU. Patch stays 32^3 so the torch side finishes
in minutes. fp32 both sides (isolates framework/hardware numerics from
bf16 policy). This is the closest achievable approximation to
BASELINE's real-dataset converged-dice 0.5% bar on this machine.

Run: python baselines/parity_fullscale.py
Results recorded in PARITY.md (round 4).
"""
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def main():
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
    size, patch = (44, 44, 44), (32, 32, 32)
    # 100 steps / 8 val volumes: run to the converged dice plateau, where
    # BASELINE's 0.5% bar is defined — at 70 steps (mid-convergence) and 4
    # val volumes the in-suite protocol measured a 0.0061 dice gap purely
    # from per-volume variance (tests/test_training_trajectory.py r4 note)
    n_epochs, steps_per_epoch, bsz = 20, 5, 2
    lr = 1e-2  # hotter than the reference recipe so 100 decaying-LR steps
    # converge from the all-foreground init; parity is LR-agnostic (same
    # reasoning as the in-suite protocol)

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
        """Restatement of reference trainer.py:1012-1031 (the trainer
        module imports torchvision, absent here)."""

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

    # --- reference training (torch, this host's CPU) -----------------------
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
        print(f"[torch] epoch {epoch + 1}/{n_epochs} loss {losses_t[-1]:.4f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    torch_s = time.perf_counter() - t0
    with torch.no_grad():
        dice_t = float(np.mean([
            np_dice(ref(torch.from_numpy(iv[None]))[0].numpy(),
                    np.stack([1 - lv, lv], 0)[None])
            for iv, lv in val_vols
        ]))

    # --- our training (JAX, the real TPU chip, fp32) -----------------------
    assert jax.default_backend() in ("tpu", "axon"), jax.devices()
    model = HDenseFormer(in_channels=in_ch, n_cls=n_cls, n_filters=nf,
                         image_size=patch, transformer_depth=depth, dropout=0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1,) + patch + (in_ch,)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = map_hdenseformer_weights(sd, params, in_ch, depth)
    # torch Adam applies wd to ALL params: replicate (no decay mask)
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
        print(f"[tpu]   epoch {epoch + 1}/{n_epochs} loss {losses_j[-1]:.4f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
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
    print(json.dumps({
        "nf": nf, "depth": depth, "patch": patch, "steps": len(losses_t),
        "loss_rel_err_mean": round(float(rel.mean()), 5),
        "loss_rel_err_max": round(float(rel.max()), 5),
        "dice_torch_cpu": round(dice_t, 5),
        "dice_jax_tpu": round(dice_j, 5),
        "dice_abs_delta": round(abs(dice_j - dice_t), 5),
        "within_baseline_bar": bool(abs(dice_j - dice_t) < 5e-3),
        "torch_wall_s": round(torch_s, 1),
        "tpu_wall_s": round(tpu_s, 1),
        "losses_torch_first5": [round(v, 4) for v in losses_t[:5]],
        "losses_jax_first5": [round(v, 4) for v in losses_j[:5]],
        "losses_torch_last5": [round(v, 4) for v in losses_t[-5:]],
        "losses_jax_last5": [round(v, 4) for v in losses_j[-5:]],
    }))


if __name__ == "__main__":
    main()
