"""Checkpoint manager: metric-encoded filenames, best-k retention, resume.

Mirrors the reference conventions so checkpoint selection tooling maps 1:1
(trainer.py:314-338, utils.py:213-255):
- saved when val_dice improves the running best;
- filename encodes epoch + the six epoch metrics, ``epoch={..}-...ckpt``;
- ``get_weight_path`` picks the max-epoch file by parsing the prefix;
- ``dfs_remove_weight`` keeps the newest ``retain`` files per leaf dir.

Unlike the reference (which drops optimizer state on resume,
trainer.py:259-261 commented out), checkpoints here carry params AND
optimizer state + step, so resume is lossless. Serialization is flax
msgpack (host-independent, works for sharded trees via device_get).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    epoch: int = 0,
    step: int = 0,
    model_state: Any = None,
    extra: Optional[Dict] = None,
    async_save: bool = False,
) -> None:
    """Serialize a training snapshot.

    ``async_save=True`` performs the device->host transfer synchronously
    (cheap) but serialization + disk write on a background thread so the
    train loop is not blocked on IO (the orbax-style async pattern,
    SURVEY.md §5.3); call ``wait_for_async_saves()`` before reading the
    files back.
    """
    payload = {
        "epoch": np.int64(epoch),
        "step": np.int64(step),
        "params": jax.device_get(params),
    }
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    if model_state:
        payload["model_state"] = jax.device_get(model_state)
    if extra:
        payload["extra"] = extra
    os.makedirs(os.path.dirname(path), exist_ok=True)

    def _write():
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(payload))
        os.replace(tmp, path)

    if async_save:
        import threading

        t = threading.Thread(target=_write, daemon=True)
        t.start()
        _ASYNC_SAVES.append(t)
    else:
        _write()


_ASYNC_SAVES: list = []


def wait_for_async_saves() -> None:
    """Join all outstanding async checkpoint writes."""
    while _ASYNC_SAVES:
        _ASYNC_SAVES.pop().join()


def load_checkpoint(path: str, template: Optional[Dict] = None) -> Dict:
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def metric_filename(
    epoch: int,
    train_loss: float,
    train_dice: float,
    train_run_dice: float,
    val_loss: float,
    val_dice: float,
    val_run_dice: float,
) -> str:
    """Reference filename format (trainer.py:331-333), .ckpt extension."""
    return (
        f"epoch={epoch}-train_loss={train_loss:.5f}-train_dice:={train_dice:.5f}"
        f"-train_run_dice={train_run_dice:.5f}-val_loss={val_loss:.5f}"
        f"-val_dice={val_dice:.5f}-val_run_dice={val_run_dice:.5f}.ckpt"
    )


def _epoch_of(filename: str) -> int:
    return int(filename.split("-")[0].split("=")[-1])


def get_weight_path(ckpt_path: str) -> Optional[str]:
    """Max-epoch checkpoint in a directory (ref utils.py:225-235)."""
    if not os.path.isdir(ckpt_path):
        return None
    files = os.listdir(ckpt_path)
    if not files:
        return None
    files.sort(key=_epoch_of)
    return os.path.join(ckpt_path, files[-1])


def get_weight_list(ckpt_path: str):
    """Newest checkpoint per fold subdir (ref utils.py:213-222)."""
    out = []
    for fold in os.scandir(ckpt_path):
        if fold.is_dir():
            files = sorted(os.listdir(fold.path), key=_epoch_of)
            if files:
                out.append(os.path.join(fold.path, files[-1]))
    out.sort(key=lambda x: x.split(os.sep)[-2])
    return out


def remove_weight_path(ckpt_path: str, retain: int = 3) -> None:
    if not os.path.isdir(ckpt_path):
        return
    files = os.listdir(ckpt_path)
    if len(files) >= retain:
        files.sort(key=_epoch_of)
        for f in files[:-retain]:
            os.remove(os.path.join(ckpt_path, f))


def dfs_remove_weight(ckpt_path: str, retain: int = 3) -> None:
    """Recursively retain the newest ``retain`` ckpts per leaf (ref utils.py:249-255)."""
    for sub in os.scandir(ckpt_path):
        if sub.is_dir():
            dfs_remove_weight(sub.path, retain)
        else:
            remove_weight_path(ckpt_path, retain)
            break
