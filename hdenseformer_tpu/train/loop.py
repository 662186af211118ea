"""Training engine: pure compiled train/eval steps + the SemanticSeg driver.

Re-design of the reference trainer (trainer.py:29-486) as a functional
TPU program:
- ONE jitted train step (forward + loss + grads + optimizer + batch dice +
  confusion matrix) compiled over a ``('data',)`` mesh — batch sharded,
  params replicated, gradient all-reduce inserted by XLA over ICI. The
  reference's per-step ``.cpu().numpy()`` + sklearn sync (trainer.py:394-398)
  becomes an on-device scatter-add returning one small CxC matrix.
- Deterministic PRNG: dropout keys are ``fold_in(base, step)``.
- bf16 compute / fp32 params replaces CUDA AMP (``use_fp16`` flag maps to
  bf16; no loss scaling needed on TPU).
- EarlyStopping (patience 30 on val_dice, trainer.py:266-269), poly LR
  by default, best-val-dice checkpointing with metric-encoded filenames
  and newest-3 retention — identical control flow to the reference.

The public surface (class name, constructor knobs, trainer() kwargs)
matches the reference so configs map 1:1.
"""
from __future__ import annotations

import math
import os
import shutil
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hdenseformer_tpu.data.augment2d import (
    RandomAdjust2D,
    RandomDistort2D,
    RandomErase2D,
    RandomFlip2D,
    RandomNoise2D,
    RandomRotate2D,
    RandomZoom2D,
)
from hdenseformer_tpu.data.augment3d import (
    RandomCrop3D,
    RandomFlip3D,
    RandomTranslationRotationZoom3D,
)
from hdenseformer_tpu.data.pipeline import BatchLoader, SegDataset
from hdenseformer_tpu.data.transforms import (
    Compose,
    CropResize,
    MRNormalize,
    PETandCTNormalize,
    ToOneHot,
    TruncAndNormalize,
)
from hdenseformer_tpu.losses import get_loss
from hdenseformer_tpu.metrics.batch import compute_dice
from hdenseformer_tpu.metrics.running import AverageMeter, RunningDice, confusion_matrix_device
from hdenseformer_tpu.models import get_net
from hdenseformer_tpu.parallel.mesh import make_mesh, shard_batch
from hdenseformer_tpu.utils.flags import set_norm_barrier, set_shift_pack
from hdenseformer_tpu.train.checkpoint import (
    dfs_remove_weight,
    load_checkpoint,
    metric_filename,
    save_checkpoint,
)
from hdenseformer_tpu.train.logging import MetricsWriter
from hdenseformer_tpu.train.state import (
    TrainState,
    current_learning_rate,
    get_lr_scheduler,
    get_optimizer,
    set_learning_rate,
)
from hdenseformer_tpu.utils import count_params, set_process_title


class EarlyStopping:
    """Request a training stop after ``patience`` epochs without improvement.

    Behavioral contract matches the reference trainer (trainer.py:948-1008
    — same knobs, same stop condition: strictly-better-than ``best + delta``
    resets the counter); the implementation is original, tracking a single
    signed score so min/max modes share one code path.
    """

    def __init__(self, patience=10, verbose=True, delta=0, monitor="val_loss", op_type="min"):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.monitor = monitor
        self.op_type = op_type
        self.sign = -1.0 if op_type == "min" else 1.0
        self.counter = 0
        self.best_score = None  # signed: higher is always better
        self.best_value = None  # raw metric value of the best epoch
        self.early_stop = False

    def __call__(self, value):
        value = float(value)
        score = self.sign * value
        improved = self.best_score is None or score >= self.best_score + self.delta
        if not improved:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            self.early_stop = self.counter >= self.patience
            return
        if self.verbose:
            prev = float("inf") * -self.sign if self.best_value is None else self.best_value
            print(f"{self.monitor} optimized ({prev:.6f} --> {value:.6f}). Saving model ...")
        self.best_score, self.best_value, self.counter = score, value, 0


def pad_and_mask_batch(batch, batch_size: int, mesh):
    """Pad-and-mask batch sharding: every batch is padded (with cyclic
    repeats of its real samples) to ONE fixed size — the nominal batch
    size rounded up to the device count — plus a ``weight`` vector of
    1/0 masking the padding out of loss, dice and confusion matrix.

    No samples are ever dropped, the compiled step sees a single static
    shape for the whole run (no per-remainder recompiles, no replicated
    execution — the reference simply drops or duplicates via its sampler,
    trainer.py:300-321), and the masked math equals the unpadded
    computation exactly (see losses.losses sample_weight). Module-level so
    ``__graft_entry__.dryrun_multichip`` exercises the exact production
    sharding path.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    b = batch["image"].shape[0]
    pad_to = -(-max(batch_size, b) // n_dev) * n_dev
    w = np.zeros((pad_to,), np.float32)
    w[:b] = 1.0
    if b < pad_to:
        idx = np.arange(pad_to) % b
        batch = {k: np.asarray(v)[idx] for k, v in batch.items()}
    batch = dict(batch)
    batch["weight"] = w
    return shard_batch(mesh, batch)


def make_train_step(criterion, num_classes: int, augment_fn=None):
    """Build the compiled train step: grads + update + on-device metrics.

    With ``augment_fn(key, image, int_label) -> (image, onehot_label)`` the
    batched augmentation pipeline runs INSIDE the compiled step on device
    (data/augment_jax.py) — the host only ships raw voxels.
    """
    return partial(jax.jit, donate_argnums=(0,))(
        _train_step_fn(criterion, num_classes, augment_fn)
    )


def make_multi_train_step(criterion, num_classes: int, augment_fn=None):
    """Scan-of-steps: run K chained optimizer steps in ONE device dispatch.

    Takes a super-batch whose leaves have a leading step axis K
    ({'image': (K, B, ...), 'label': (K, B, ...)}) and scans the train
    step over it. One dispatch per K steps amortizes host/runtime launch
    overhead (~20% of the 0.43s step on this setup) and lets XLA overlap
    the steps' epilogues. Returns (state, stacked metrics).
    """
    single = _train_step_fn(criterion, num_classes, augment_fn)

    @partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batches: Dict, dropout_rng: jax.Array):
        def body(st, batch):
            st, m = single(st, batch, dropout_rng)
            return st, m

        return jax.lax.scan(body, state, batches)

    return multi_step


def _train_step_fn(criterion, num_classes: int, augment_fn=None):
    """Un-jitted train step body (shared by single and scanned variants)."""

    def train_step(state: TrainState, batch: Dict, dropout_rng: jax.Array):
        rng = jax.random.fold_in(dropout_rng, state.step)
        sw = batch.get("weight")  # (N,) 1/0 pad-and-mask vector, or None
        if augment_fn is not None:
            aug_rng = jax.random.fold_in(jax.random.fold_in(dropout_rng, 777), state.step)
            image, label = augment_fn(aug_rng, batch["image"], batch["label"])
            batch = {"image": image, "label": label}
            if sw is not None:
                batch["weight"] = sw
        mutable = list(state.model_state.keys())

        def loss_fn(params):
            if mutable:
                outs, new_model_state = state.apply_fn(
                    {"params": params, **state.model_state},
                    batch["image"],
                    train=True,
                    rngs={"dropout": rng},
                    mutable=mutable,
                )
            else:
                outs = state.apply_fn(
                    {"params": params}, batch["image"], train=True,
                    rngs={"dropout": rng},
                )
                new_model_state = {}
            loss = criterion(outs, batch["label"], sample_weight=sw)
            logits = outs[0] if isinstance(outs, (list, tuple)) else outs
            return loss, (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, model_state=dict(new_model_state))
        logits = logits.astype(jnp.float32)
        dice = compute_dice(logits, batch["label"], sample_weight=sw)
        cm = confusion_matrix_device(
            jnp.argmax(batch["label"], -1), jnp.argmax(logits, -1), num_classes,
            sample_weight=sw,
        )
        return state, {"loss": loss.astype(jnp.float32), "dice": dice, "cm": cm}

    return train_step


def make_eval_step(criterion, num_classes: int):
    @jax.jit
    def eval_step(state: TrainState, batch: Dict):
        sw = batch.get("weight")
        outs = state.apply_fn(state.variables(), batch["image"], train=False)
        loss = criterion(outs, batch["label"], sample_weight=sw)
        logits = outs[0] if isinstance(outs, (list, tuple)) else outs
        logits = logits.astype(jnp.float32)
        dice = compute_dice(logits, batch["label"], sample_weight=sw)
        cm = confusion_matrix_device(
            jnp.argmax(batch["label"], -1), jnp.argmax(logits, -1), num_classes,
            sample_weight=sw,
        )
        return {"loss": loss.astype(jnp.float32), "dice": dice, "cm": cm}

    return eval_step


class SemanticSeg:
    """Training / evaluation / inference driver (public parity: trainer.py:29).

    Same constructor knobs as the reference INIT_TRAINER dict; ``device``
    becomes an optional device-count selector for the data mesh
    (None = all local devices).
    """

    def __init__(
        self,
        net_name=None,
        encoder_name=None,
        lr=1e-3,
        n_epoch=1,
        channels=1,
        num_classes=2,
        roi_number=1,
        scale=None,
        input_shape=None,
        crop=48,
        batch_size=6,
        num_workers=0,
        device=None,
        pre_trained=False,
        ex_pre_trained=False,
        ckpt_point=True,
        weight_path=None,
        weight_decay=0.0,
        momentum=0.95,
        gamma=0.1,
        milestones=(40, 80),
        T_max=5,
        topk=50,
        use_fp16=True,
        transform_3d=None,
        transform_2d=None,
        patch_size=(128, 256, 256),
        step_size=(64, 128, 128),
        transformer_depth=18,
        key_touple=("ct", "seg"),
        seed=0,
        use_pallas=None,
        device_augment=False,
        remat=True,
        s2d=None,
        norm_barrier=None,
        shift_pack=None,
    ):
        # performance knobs resolved once, before any trace (utils/flags.py).
        # None = keep the import-time env-resolved value (HDF_NORM_BARRIER /
        # HDF_SHIFT_PACK), so env overrides are honored on trainer entry.
        if norm_barrier is not None:
            set_norm_barrier(norm_barrier)
        if shift_pack is not None:
            set_shift_pack(shift_pack)
        self.net_name = net_name
        self.encoder_name = encoder_name
        self.lr = lr
        self.n_epoch = n_epoch
        self.channels = channels
        self.num_classes = num_classes
        self.roi_number = roi_number
        self.scale = scale
        self.input_shape = tuple(input_shape) if input_shape else None
        self.crop = crop
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.device = device
        self.pre_trained = pre_trained
        self.ex_pre_trained = ex_pre_trained
        self.ckpt_point = ckpt_point
        self.weight_path = weight_path
        self.start_epoch = 0
        self.global_step = 0
        self.metrics_threshold = 0.0
        self.weight_decay = weight_decay
        self.momentum = momentum
        self.gamma = gamma
        self.milestones = list(milestones)
        self.T_max = T_max
        self.topk = topk
        self.use_fp16 = use_fp16  # bf16 compute on TPU
        self.patch_size = tuple(patch_size)
        self.step_size = tuple(step_size)
        self.transformer_depth = transformer_depth
        self.key_touple = tuple(key_touple)
        self.seed = seed
        self.device_augment = device_augment

        if self.roi_number is not None:
            assert self.num_classes == 2, (
                "num_classes must be set to 2 for binary segmentation"
            )

        compute_dtype = jnp.bfloat16 if use_fp16 else None
        self.model = get_net(
            net_name,
            channels=channels,
            num_classes=num_classes,
            input_shape=self.input_shape,
            transformer_depth=transformer_depth,
            encoder_name=encoder_name,
            dtype=compute_dtype,
            use_pallas=use_pallas,
            remat=remat,
            s2d=s2d,
        )

        # indexed transform tables, numbering identical to trainer.py:128-176
        # (the 3D table only exists for 3-d patch sizes; 2D runs never
        # index it — guards against 2-d --input-shape flowing into
        # RandomCrop3D like in the reference's always-built lists)
        patch3d = self.patch_size if len(self.patch_size) == 3 else (1, 1, 1)
        self.transform_list_3d = [
            RandomCrop3D(patch3d),  # 1
            PETandCTNormalize(),  # 2
            CropResize(dim=self.input_shape, num_class=num_classes, crop=crop, channel=channels),  # 3
            RandomTranslationRotationZoom3D(mode="tr", num_class=num_classes),  # 4
            RandomFlip3D(mode="hv"),  # 5
            ToOneHot(num_class=num_classes, input_channel=channels),  # 6
            TruncAndNormalize(scale=self.scale),  # 7
            MRNormalize(),  # 8
        ]
        self.transform_list_2d = [
            MRNormalize(),  # 1
            CropResize(dim=self.input_shape, num_class=num_classes, crop=crop, channel=channels),  # 2
            RandomErase2D(scale_flag=False),  # 3
            RandomZoom2D(),  # 4
            RandomDistort2D(),  # 5
            RandomRotate2D(),  # 6
            RandomFlip2D(mode="hv"),  # 7
            RandomAdjust2D(),  # 8
            RandomNoise2D(),  # 9
            ToOneHot(num_class=num_classes, input_channel=channels),  # 10
            TruncAndNormalize(scale=self.scale),  # 11
        ]
        transform_3d = transform_3d or []
        transform_2d = transform_2d or []
        self.train_transform_3d = [self.transform_list_3d[i - 1] for i in transform_3d]
        self.val_transform_3d = [
            self.transform_list_3d[i - 1] for i in transform_3d if i in [1, 2, 3, 6]
        ]
        self.train_transform_2d = [self.transform_list_2d[i - 1] for i in transform_2d]
        self.val_transform_2d = [
            self.transform_list_2d[i - 1] for i in transform_2d if i in [1, 2, 10]
        ]

        self._params_template = None

    # -- model state ------------------------------------------------------
    def _example_input(self, batch: int = 1) -> jnp.ndarray:
        shape = (batch,) + self.input_shape + (self.channels,)
        return jnp.zeros(shape, jnp.float32)

    def init_variables(self):
        return self.model.init(
            {"params": jax.random.PRNGKey(self.seed)}, self._example_input()
        )

    def _load_encoder_pretrained(self, variables):
        """``ex_pre_trained`` = the reference's smp
        ``encoder_weights='imagenet'`` path (trainer.py:706-739). Offline
        TPU environments cannot download checkpoints, so the knob must be
        a local path to a torchvision-format ResNet state dict
        (.pth via torch, or .npz); ``True`` raises loudly instead of
        silently training from scratch.
        """
        if self.net_name not in ("unet", "unet++", "deeplabv3+"):
            raise ValueError(
                "ex_pre_trained applies to the smp-style 2D baselines "
                "(unet/unet++/deeplabv3+)"
            )
        if not isinstance(self.ex_pre_trained, str):
            raise ValueError(
                "ex_pre_trained=True would download imagenet weights in the "
                "reference; this offline build needs a local checkpoint: pass "
                "ex_pre_trained='/path/to/resnet-imagenet.{pth,npz}'"
            )
        from hdenseformer_tpu.models.unet2d import load_torch_resnet_encoder

        path = self.ex_pre_trained
        if path.endswith(".npz"):
            sd = dict(np.load(path))
        else:
            import torch

            sd = {
                k: v.detach().cpu().numpy()
                for k, v in torch.load(path, map_location="cpu").items()
            }
        return load_torch_resnet_encoder(variables, sd)

    def build_state(self, optimizer: str = "Adam", variables=None) -> TrainState:
        if variables is None:
            variables = self.init_variables()
        if self.ex_pre_trained:
            variables = self._load_encoder_pretrained(variables)
        variables = dict(variables)
        params = variables.pop("params")
        tx = get_optimizer(
            optimizer, self.lr, weight_decay=self.weight_decay, momentum=self.momentum
        )
        return TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx, model_state=variables
        )

    def load_pretrained(self, state: TrainState, weight_path: str, ckpt_point=True):
        template = {
            "epoch": np.int64(0),
            "step": np.int64(0),
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
        }
        if state.model_state:
            template["model_state"] = jax.device_get(state.model_state)
        ckpt = load_checkpoint(weight_path, template=template)
        state = state.replace(params=ckpt["params"])
        if "model_state" in ckpt and ckpt["model_state"]:
            state = state.replace(model_state=ckpt["model_state"])
        if ckpt_point:
            self.start_epoch = int(ckpt["epoch"]) + 1
            if "opt_state" in ckpt and ckpt["opt_state"] is not None:
                state = state.replace(
                    opt_state=ckpt["opt_state"], step=jnp.asarray(int(ckpt["step"]))
                )
        return state

    # -- training ---------------------------------------------------------
    def trainer(
        self,
        train_path: Sequence[str],
        val_path: Sequence[str],
        cur_fold: int,
        output_dir=None,
        log_dir=None,
        optimizer="Adam",
        loss_fun="Cross_Entropy",
        class_weight=None,
        lr_scheduler=None,
        use_ds=False,
        n_devices: Optional[int] = None,
    ) -> Dict[str, Any]:
        output_dir = os.path.join(output_dir, f"fold{cur_fold}")
        log_dir = os.path.join(log_dir, f"fold{cur_fold}")
        for d in (log_dir, output_dir):
            if os.path.exists(d) and not self.pre_trained:
                shutil.rmtree(d)
            os.makedirs(d, exist_ok=True)

        writer = MetricsWriter(log_dir)
        mesh = make_mesh(n_devices)
        criterion = get_loss(
            loss_fun, class_weight=class_weight, topk=self.topk, use_ds=use_ds
        )

        state = self.build_state(optimizer)
        if self.pre_trained and self.weight_path:
            state = self.load_pretrained(state, self.weight_path, self.ckpt_point)
        n_params = count_params(state.params)
        print(f"{self.net_name}: {n_params/1e6:.3f} M params")

        is_3d = len(self.input_shape) > 2
        augment_fn = None
        if self.device_augment:
            if not is_3d:
                raise ValueError("device_augment currently supports the 3D pipeline")
            from hdenseformer_tpu.data.augment_jax import augment_batch_3d

            patch = self.patch_size
            ncls = self.num_classes

            def augment_fn(key, image, label):
                return augment_batch_3d(key, image, label, patch, num_classes=ncls)

        train_step = make_train_step(criterion, self.num_classes, augment_fn=augment_fn)
        eval_step = make_eval_step(criterion, self.num_classes)
        dropout_rng = jax.random.PRNGKey(self.seed)

        # commit the fresh state to the mesh (replicated) up front: an
        # uncommitted initial state compiles the train step a SECOND time
        # once the first step's output comes back mesh-committed — a dead
        # multi-minute compile at real scale
        from hdenseformer_tpu.parallel.mesh import replicated_sharding

        state = jax.device_put(state, replicated_sharding(mesh))

        if self.device_augment:
            from hdenseformer_tpu.data.transforms import RawChannelsLast

            train_tfm = Compose([RawChannelsLast()])
        else:
            train_tfm = Compose(self.train_transform_3d if is_3d else self.train_transform_2d)
        val_tfm = Compose(self.val_transform_3d if is_3d else self.val_transform_2d)
        train_ds = SegDataset(
            train_path, roi_number=self.roi_number, num_class=self.num_classes,
            transform=train_tfm, img_key=self.key_touple[0], lab_key=self.key_touple[1],
        )
        val_ds = SegDataset(
            val_path, roi_number=self.roi_number, num_class=self.num_classes,
            transform=val_tfm, img_key=self.key_touple[0], lab_key=self.key_touple[1],
        )
        # No samples are ever dropped on multi-device runs: every batch is
        # padded-and-masked to one fixed sharded shape (see _put_batch),
        # so train/val metrics are identical for any device count.
        train_loader = BatchLoader(
            train_ds, self.batch_size, shuffle=True,
            num_workers=self.num_workers, seed=self.seed, drop_last=False,
        )
        val_loader = BatchLoader(
            val_ds, self.batch_size, shuffle=False,
            num_workers=self.num_workers, seed=self.seed, drop_last=False,
        )
        self.global_step = self.start_epoch * math.ceil(len(train_path) / self.batch_size)

        sched = get_lr_scheduler(
            lr_scheduler, self.lr, n_epoch=self.n_epoch,
            milestones=self.milestones, gamma=self.gamma, T_max=self.T_max,
        )
        early_stopping = EarlyStopping(
            patience=30, verbose=True, monitor="val_dice", op_type="max"
        )
        history = {"train_loss": [], "val_loss": [], "train_dice": [], "val_dice": [],
                   "train_run_dice": [], "val_run_dice": []}
        prev_val_loss = None

        for epoch in range(self.start_epoch, self.n_epoch):
            set_process_title(f"{self.net_name}: {epoch}/{self.n_epoch}")
            if sched is not None:
                lr_now = sched.step(prev_val_loss)
                state = set_learning_rate(state, lr_now)

            state, tr = self._run_epoch(
                state, train_loader, train_step, epoch, mesh, dropout_rng, train=True
            )
            _, va = self._run_epoch(
                state, val_loader, eval_step, epoch, mesh, dropout_rng, train=False
            )
            prev_val_loss = va["loss"]

            print(
                f"epoch:{epoch}/{self.n_epoch},train_loss:{tr['loss']:.5f},val_loss:{va['loss']:.5f}"
            )
            print(
                f"epoch:{epoch}/{self.n_epoch},train_dice:{tr['dice']:.5f},"
                f"train_run_dice:{tr['run_dice']:.5f},val_dice:{va['dice']:.5f},"
                f"val_run_dice:{va['run_dice']:.5f}"
            )
            writer.add_scalars("data/loss", {"train": tr["loss"], "val": va["loss"]}, epoch)
            writer.add_scalars("data/dice", {"train": tr["dice"], "val": va["dice"]}, epoch)
            writer.add_scalars(
                "data/run_dice", {"train": tr["run_dice"], "val": va["run_dice"]}, epoch
            )
            writer.add_scalar("data/lr", current_learning_rate(state), epoch)
            for k in history:
                src, key = (tr, k[6:]) if k.startswith("train_") else (va, k[4:])
                history[k].append(src[key])

            early_stopping(va["dice"])
            if va["dice"] > self.metrics_threshold:
                self.metrics_threshold = va["dice"]
                fname = metric_filename(
                    epoch, tr["loss"], tr["dice"], tr["run_dice"],
                    va["loss"], va["dice"], va["run_dice"],
                )
                save_path = os.path.join(output_dir, fname)
                print(f"Save as: {fname}")
                save_checkpoint(
                    save_path, state.params, state.opt_state, epoch,
                    int(state.step), model_state=state.model_state,
                    async_save=True,
                )
            if early_stopping.early_stop:
                print("Early stopping")
                break

        writer.close()
        from hdenseformer_tpu.train.checkpoint import wait_for_async_saves

        wait_for_async_saves()
        dfs_remove_weight(output_dir, retain=3)
        self.state = state
        return history

    def _put_batch(self, batch, mesh):
        return pad_and_mask_batch(batch, self.batch_size, mesh)

    def _run_epoch(self, state, loader, step_fn, epoch, mesh, dropout_rng, train: bool):
        loss_meter, dice_meter = AverageMeter(), AverageMeter()
        run_dice = RunningDice(labels=range(self.num_classes), ignore_label=-1)
        # Metrics stay on device until drained (every 10 global steps, to
        # match the reference's print cadence, and at epoch end) — the hot
        # loop never blocks on a host sync, so dispatch runs ahead of the
        # device. (The reference syncs every step, trainer.py:394-398.)
        pending: List = []

        def drain():
            if not pending:
                return
            for n, fetched in zip(
                [p[0] for p in pending], jax.device_get([p[1] for p in pending])
            ):
                loss_meter.update(float(fetched["loss"]), n)
                dice_meter.update(float(fetched["dice"]), n)
                run_dice.update_from_matrix(fetched["cm"])
            pending.clear()

        for step, batch in enumerate(loader.epoch(epoch)):
            n = batch["image"].shape[0]
            batch = self._put_batch(batch, mesh)
            if train:
                state, metrics = step_fn(state, batch, dropout_rng)
            else:
                metrics = step_fn(state, batch)
            pending.append((n, metrics))
            if train:
                if self.global_step % 10 == 0:
                    drain()
                    rd, dice_list = run_dice.compute_dice()
                    print("Category Dice: ", dice_list)
                    print(
                        f"epoch:{epoch}/{self.n_epoch},step:{step},"
                        f"train_loss:{loss_meter.val:.5f},train_dice:{dice_meter.val:.5f},"
                        f"run_dice:{rd:.5f},lr:{current_learning_rate(state)}"
                    )
                self.global_step += 1
        drain()
        rd = run_dice.compute_dice()[0]
        return state, {"loss": loss_meter.avg, "dice": dice_meter.avg, "run_dice": rd}

    # -- inference --------------------------------------------------------
    def inference_slidingwindow(
        self,
        test_path,
        save_path,
        state=None,
        variables=None,
        window_batch: int = 8,
        use_gaussian: bool = False,
        mesh=None,
        save_nii: bool = False,
    ):
        from hdenseformer_tpu.infer.sliding import inference_slidingwindow

        if variables is None:
            if state is None:
                state = getattr(self, "state", None)
            if state is None:
                if not self.weight_path:
                    raise ValueError("no parameters available for inference")
                state = self.build_state()
                state = self.load_pretrained(state, self.weight_path, ckpt_point=False)
            variables = state.variables()
        return inference_slidingwindow(
            self.model, variables, test_path, save_path,
            num_classes=self.num_classes,
            patch_size=self.patch_size, step_size=self.step_size,
            img_key=self.key_touple[0],
            window_batch=window_batch, use_gaussian=use_gaussian,
            mesh=mesh, save_nii=save_nii,
        )
