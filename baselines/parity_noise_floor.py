"""Trajectory-noise floor for the production dice-parity rung.

parity_production.py compares OUR bf16 production config against the
fp32 torch reference over 100 paired steps and judges the END dice. But
bf16 rounding is a per-step perturbation of ~1e-3 relative magnitude,
and at lr 1e-2 over 100 steps the protocol may be chaotic: ANY
perturbation of that size — even within pure fp32 torch — could grow to
the observed dice delta. This control measures exactly that Lyapunov
growth with NO second framework in the loop:

  arm A: the reference torch fp32 run (identical to parity_production)
  arm B: the SAME torch fp32 run with every weight multiplied by
         (1 + 1e-3 * u), u ~ U(-1, 1)  — one bf16-rounding-sized kick at
         step 0, then bit-identical fp32 math and identical batches.

|dice_A - dice_B| is the protocol's intrinsic noise floor: a
cross-framework dice delta at or below it cannot be attributed to the
framework. Recorded next to the parity_production rows in PARITY.md.

Run: python baselines/parity_noise_floor.py [patch_edge]   (default: 32)
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
    edge = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import random as _random

    import torch

    from reference_util import add_reference_to_path

    add_reference_to_path()
    from models.HDenseFormer import HDenseFormer as RefHDF
    from loss.cross_entropy import FocalLoss as RefFocal
    from loss.combine_loss import DeepSuperloss as RefDS

    from test_training_trajectory import _make_volumes, _ref_pipeline

    sys.path.insert(0, os.path.join(_ROOT, "baselines"))
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    in_ch, n_cls, nf, depth = 2, 2, 32, 24
    patch = (edge,) * 3
    size = tuple(e + max(8, e // 4) for e in patch)
    n_epochs, steps_per_epoch, bsz = 20, 5, 2
    lr = 1e-2

    vols = _make_volumes(8, size, in_ch, n_cls)
    val_vols = _make_volumes(8, patch, in_ch, n_cls, seed=7)

    ref = RefHDF(in_channels=in_ch, n_cls=n_cls, n_filters=nf,
                 image_size=patch, transformer_depth=depth)
    ref.eval()
    sd0 = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    ref_run = _ref_pipeline(patch)

    def make_batches():
        batches = []
        for step_i in range(n_epochs * steps_per_epoch):
            imgs, labs = [], []
            for b in range(bsz):
                s = 1000 + step_i * 17 + b
                _random.seed(s)
                np.random.seed(s)
                vi = _random.randrange(len(vols))
                img, lab = ref_run(*vols[vi])
                oh = np.stack([1.0 - lab, lab], 0).astype(np.float32)
                imgs.append(img)
                labs.append(oh)
            batches.append((np.stack(imgs), np.stack(labs)))
        return batches

    def np_dice(logits_ncdhw, lab_onehot):
        pred = np.argmax(logits_ncdhw, 1)
        tgt = np.argmax(lab_onehot, 1)
        inter = np.sum((pred == 1) & (tgt == 1))
        den = np.sum(pred == 1) + np.sum(tgt == 1)
        return (2.0 * inter + 1e-5) / (den + 1e-5)

    class RefPolyLR(torch.optim.lr_scheduler._LRScheduler):
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

    def train(perturb: bool) -> dict:
        sd = {k: v.clone() for k, v in sd0.items()}
        if perturb:
            g = torch.Generator().manual_seed(123)
            for k, v in sd.items():
                if v.is_floating_point():
                    u = torch.rand(v.shape, generator=g) * 2.0 - 1.0
                    sd[k] = v * (1.0 + 1e-3 * u)
        net = RefHDF(in_channels=in_ch, n_cls=n_cls, n_filters=nf,
                     image_size=patch, transformer_depth=depth)
        net.load_state_dict(sd)
        net.eval()
        crit = RefDS(criterion=RefFocal(reduction="sum"))
        opt = torch.optim.Adam(net.parameters(), lr=lr, weight_decay=1e-4)
        sched = RefPolyLR(opt, max_epochs=n_epochs)
        losses = []
        t0 = time.perf_counter()
        it = iter(make_batches())
        for epoch in range(n_epochs):
            for _ in range(steps_per_epoch):
                img, lab = next(it)
                out = net(torch.from_numpy(img))
                loss = crit(out, torch.from_numpy(lab))
                opt.zero_grad()
                loss.backward()
                opt.step()
                losses.append(float(loss.detach()))
            sched.step()
            print(f"[{'perturbed' if perturb else 'baseline '} {edge}^3] "
                  f"epoch {epoch + 1}/{n_epochs} loss {losses[-1]:.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        with torch.no_grad():
            dice = float(np.mean([
                np_dice(net(torch.from_numpy(iv[None]))[0].numpy(),
                        np.stack([1 - lv, lv], 0)[None])
                for iv, lv in val_vols
            ]))
        return {"dice": dice, "losses_last5": [round(v, 4) for v in losses[-5:]]}

    a = train(False)
    b = train(True)
    res = {
        "patch": list(patch),
        "perturbation": "w *= 1 + 1e-3*U(-1,1) at step 0, fp32 both arms",
        "dice_baseline": round(a["dice"], 5),
        "dice_perturbed": round(b["dice"], 5),
        "noise_floor_dice_delta": round(abs(a["dice"] - b["dice"]), 5),
        "losses_last5_baseline": a["losses_last5"],
        "losses_last5_perturbed": b["losses_last5"],
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
