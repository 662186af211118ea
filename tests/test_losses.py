"""Golden tests: loss library vs the reference PyTorch implementations.

The reference repo is imported read-only as a numerical oracle.
Channel-axis convention differs (reference: NCHW / ours: channels-last);
tests transpose at the boundary.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from hdenseformer_tpu.losses import (  # noqa: E402
    binary_dice_loss,
    dice_loss,
    cross_entropy_loss,
    focal_loss,
    fl_loss,
    ce_plus_dice,
    fl_plus_dice,
    deep_supervision_loss,
    get_loss,
)
from reference_util import reference_available, add_reference_to_path  # noqa: E402

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def make_pair(rng, shape_nchw, num_classes):
    """Random logits + random one-hot target in NCHW layout."""
    logits = rng.randn(*shape_nchw).astype(np.float32)
    labels = rng.randint(0, num_classes, size=(shape_nchw[0],) + shape_nchw[2:])
    onehot = np.eye(num_classes, dtype=np.float32)[labels]  # (..., C)
    onehot_nchw = np.moveaxis(onehot, -1, 1)
    return logits, onehot_nchw


def cl(x_nchw):
    return jnp.asarray(np.moveaxis(x_nchw, 1, -1))


@needs_ref
class TestVsReference:
    @classmethod
    def setup_class(cls):
        add_reference_to_path()

    def test_binary_dice(self, rng):
        from loss.dice_loss import BinaryDiceLoss

        p = np.abs(rng.rand(4, 37).astype(np.float32))
        t = (rng.rand(4, 37) > 0.5).astype(np.float32)
        for reduction in ["mean", "sum", "topk"]:
            ref = BinaryDiceLoss(reduction=reduction)(
                torch.from_numpy(p), torch.from_numpy(t)
            ).item()
            got = float(binary_dice_loss(jnp.asarray(p), jnp.asarray(t), reduction=reduction))
            assert got == pytest.approx(ref, rel=1e-5), reduction

    @pytest.mark.parametrize("ignore_index", [None, 0])
    def test_dice_loss(self, rng, ignore_index):
        from loss.dice_loss import DiceLoss

        logits, target = make_pair(rng, (2, 3, 8, 8), 3)
        ref = DiceLoss(ignore_index=ignore_index, p=1)(
            torch.from_numpy(logits), torch.from_numpy(target)
        ).item()
        got = float(dice_loss(cl(logits), cl(target), ignore_index=ignore_index))
        assert got == pytest.approx(ref, rel=1e-5)

    def test_cross_entropy(self, rng):
        from loss.cross_entropy import CrossentropyLoss

        logits, target = make_pair(rng, (2, 4, 6, 6, 6), 4)
        ref = CrossentropyLoss()(
            torch.from_numpy(logits), torch.from_numpy(target)
        ).item()
        got = float(cross_entropy_loss(cl(logits), cl(target)))
        assert got == pytest.approx(ref, rel=1e-5)

    def test_cross_entropy_weighted(self, rng):
        from loss.cross_entropy import CrossentropyLoss

        logits, target = make_pair(rng, (2, 3, 8, 8), 3)
        w = np.array([0.2, 1.0, 2.0], dtype=np.float32)
        ref = CrossentropyLoss(weight=torch.from_numpy(w))(
            torch.from_numpy(logits), torch.from_numpy(target)
        ).item()
        got = float(cross_entropy_loss(cl(logits), cl(target), weight=w))
        assert got == pytest.approx(ref, rel=1e-5)

    @pytest.mark.parametrize("reduction", ["sum", "mean"])
    def test_focal(self, rng, reduction):
        from loss.cross_entropy import FocalLoss

        logits, target = make_pair(rng, (2, 2, 16, 16), 2)
        ref = FocalLoss(reduction=reduction)(
            torch.from_numpy(logits), torch.from_numpy(target)
        ).item()
        got = float(focal_loss(cl(logits), cl(target), reduction=reduction))
        assert got == pytest.approx(ref, rel=1e-4)

    def test_fl_loss(self, rng):
        from loss.cross_entropy import FLLoss

        logits, target = make_pair(rng, (2, 2, 12, 12), 2)
        ref = FLLoss()(torch.from_numpy(logits), torch.from_numpy(target)).item()
        got = float(fl_loss(cl(logits), cl(target)))
        assert got == pytest.approx(ref, rel=1e-4)

    def test_ce_plus_dice(self, rng):
        from loss.combine_loss import CEPlusDice

        logits, target = make_pair(rng, (2, 3, 8, 8), 3)
        ref = CEPlusDice(ignore_index=0)(
            torch.from_numpy(logits), torch.from_numpy(target)
        ).item()
        got = float(ce_plus_dice(cl(logits), cl(target), ignore_index=0))
        assert got == pytest.approx(ref, rel=1e-5)

    def test_fl_plus_dice(self, rng):
        from loss.combine_loss import FLPlusDice

        logits, target = make_pair(rng, (2, 3, 8, 8), 3)
        ref = FLPlusDice(ignore_index=0)(
            torch.from_numpy(logits), torch.from_numpy(target)
        ).item()
        got = float(fl_plus_dice(cl(logits), cl(target), ignore_index=0))
        assert got == pytest.approx(ref, rel=1e-4)

    def test_deep_supervision(self, rng):
        from loss.combine_loss import DeepSuperloss, CEPlusDice

        num_classes = 3
        shapes = [(2, 3, 16, 16), (2, 3, 8, 8), (2, 3, 4, 4), (2, 3, 2, 2)]
        outs = [rng.randn(*s).astype(np.float32) for s in shapes]
        _, target = make_pair(rng, shapes[0], num_classes)

        ref = DeepSuperloss(criterion=CEPlusDice(ignore_index=0))(
            [torch.from_numpy(o) for o in outs], torch.from_numpy(target)
        ).item()
        from functools import partial

        base = partial(ce_plus_dice, ignore_index=0)
        got = float(deep_supervision_loss(base, [cl(o) for o in outs], cl(target)))
        assert got == pytest.approx(ref, rel=1e-5)


def test_get_loss_factory_smoke(rng):
    logits, target = make_pair(rng, (2, 2, 8, 8), 2)
    for name in ["Cross_Entropy", "TopKLoss", "FocalLoss", "DiceLoss", "CEPlusDice", "FLPlusDice"]:
        fn = get_loss(name)
        v = float(fn(cl(logits), cl(target)))
        assert np.isfinite(v), name
    ds = get_loss("FocalLoss", use_ds=True)
    outs = [cl(logits), cl(logits[:, :, ::2, ::2])]
    assert np.isfinite(float(ds(outs, cl(target))))


def test_topk_loss_subset_of_ce(rng):
    # top-10% CE mean must be >= overall CE mean
    from hdenseformer_tpu.losses import topk_loss

    logits, target = make_pair(rng, (2, 3, 16, 16), 3)
    full = float(cross_entropy_loss(cl(logits), cl(target)))
    top = float(topk_loss(cl(logits), cl(target), k=10))
    assert top >= full
