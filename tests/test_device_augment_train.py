"""End-to-end training with in-step device-side augmentation."""
import numpy as np

from fixtures import make_dataset_dir

from hdenseformer_tpu.train.loop import SemanticSeg


def test_train_with_device_augment(tmp_path):
    paths = make_dataset_dir(
        str(tmp_path / "data"), n_cases=4, shape=(16, 16, 16), channels=2,
        num_classes=2,
    )
    seg = SemanticSeg(
        net_name="HDenseFormer_16",
        lr=1e-3,
        n_epoch=2,
        channels=2,
        num_classes=2,
        roi_number=None,
        input_shape=(16, 16, 16),
        crop=0,
        batch_size=2,
        num_workers=2,
        transform_3d=[1, 2, 4, 5, 6],
        transformer_depth=8,
        use_fp16=False,
        patch_size=(16, 16, 16),
        device_augment=True,
    )
    history = seg.trainer(
        train_path=paths[:2],
        val_path=paths[2:],
        cur_fold=1,
        output_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "log"),
        optimizer="Adam",
        loss_fun="FocalLoss",
        lr_scheduler="poly_lr",
        use_ds=True,
        n_devices=1,
    )
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])
