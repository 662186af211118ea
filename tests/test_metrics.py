"""Metrics: golden tests vs sklearn/reference semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from hdenseformer_tpu.metrics import (
    binary_dice,
    compute_dice,
    confusion_matrix_device,
    RunningDice,
    RunningConfusionMatrix,
    cal_score,
    multi_dice,
)
from hdenseformer_tpu.metrics.eval3d import cal_asd


def test_confusion_matrix_matches_sklearn(rng):
    from sklearn.metrics import confusion_matrix

    gt = rng.randint(0, 4, size=1000)
    pr = rng.randint(0, 4, size=1000)
    ref = confusion_matrix(gt, pr, labels=range(4))
    got = np.asarray(confusion_matrix_device(jnp.asarray(gt), jnp.asarray(pr), 4))
    np.testing.assert_array_equal(got, ref)


def test_running_dice_matches_manual(rng):
    rd = RunningDice(labels=range(3), ignore_label=-1)
    gts, prs = [], []
    for _ in range(3):
        gt = rng.randint(0, 3, size=(2, 16, 16))
        pr = rng.randint(0, 3, size=(2, 16, 16))
        rd.update_matrix(gt, pr)
        gts.append(gt.ravel())
        prs.append(pr.ravel())
    gt = np.concatenate(gts)
    pr = np.concatenate(prs)
    mean_dice, dice_list = rd.compute_dice()
    # manual
    smooth = 1e-5
    dices = []
    for c in range(3):
        inter = np.sum((gt == c) & (pr == c))
        union = np.sum(gt == c) + np.sum(pr == c)
        dices.append((2 * inter + smooth) / (union + smooth))
    assert mean_dice == pytest.approx(np.mean(dices[1:]), abs=1e-6)
    assert dice_list == [round(float(d), 4) for d in dices]


def test_running_miou(rng):
    rc = RunningConfusionMatrix(labels=range(2), ignore_label=-1)
    gt = rng.randint(0, 2, size=500)
    pr = rng.randint(0, 2, size=500)
    rc.update_matrix(gt, pr)
    miou, _ = rc.compute_mIoU()
    inter0 = np.sum((gt == 0) & (pr == 0))
    inter1 = np.sum((gt == 1) & (pr == 1))
    u0 = np.sum(gt == 0) + np.sum(pr == 0) - inter0
    u1 = np.sum(gt == 1) + np.sum(pr == 1) - inter1
    exp = np.mean([(inter0 + 1e-5) / (u0 + 1e-5), (inter1 + 1e-5) / (u1 + 1e-5)])
    assert miou == pytest.approx(exp, abs=1e-6)


def test_compute_dice_perfect():
    lab = np.zeros((1, 8, 8), np.int64)
    lab[:, 2:5, 2:5] = 1
    onehot = np.eye(2, dtype=np.float32)[lab]
    logits = (onehot - 0.5) * 10
    d = float(compute_dice(jnp.asarray(logits), jnp.asarray(onehot)))
    assert d == pytest.approx(1.0, abs=1e-4)


def test_compute_dice_absent_class_counts_as_one(rng):
    # class 1 absent from both -> dice stays 1.0 (reference `continue` path)
    lab = np.zeros((1, 8, 8), np.int64)
    onehot = np.eye(2, dtype=np.float32)[lab]
    logits = (onehot - 0.5) * 10
    d = float(compute_dice(jnp.asarray(logits), jnp.asarray(onehot)))
    assert d == pytest.approx(1.0, abs=1e-4)


def test_cal_score_overlap_exact():
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[2:6, 2:6, 2:6] = True
    b[3:7, 3:7, 3:7] = True
    r = cal_score(a, b)
    tp = np.sum(a & b)
    assert r["Dice"] == pytest.approx(2 * tp / (a.sum() + b.sum()))
    assert r["Jaccard"] == pytest.approx(tp / np.sum(a | b))
    assert r["FalseNegativeError"] == pytest.approx((b.sum() - tp) / b.sum())
    assert r["FalsePositiveError"] == pytest.approx((a.sum() - tp) / a.sum())


def test_hd95_identical_masks_zero():
    a = np.zeros((12, 12, 12), bool)
    a[3:8, 3:8, 3:8] = True
    r = cal_score(a, a)
    assert r["HausdorffDistance"] == 0.0
    assert r["HausdorffDistance95"] == 0.0


def test_hd_shifted_boxes():
    a = np.zeros((20, 20, 20), bool)
    b = np.zeros((20, 20, 20), bool)
    a[5:10, 5:10, 5:10] = True
    b[7:12, 5:10, 5:10] = True  # shifted by 2 along axis 0
    r = cal_score(a, b)
    assert r["HausdorffDistance"] == pytest.approx(2.0)


def test_hd_empty_mask_nan():
    a = np.zeros((8, 8, 8), bool)
    b = np.zeros((8, 8, 8), bool)
    b[2:4, 2:4, 2:4] = True
    r = cal_score(a, b)
    assert np.isnan(r["HausdorffDistance95"])


def test_multi_dice_multiclass():
    gt = np.zeros((12, 12, 12), np.uint8)
    gt[2:6, 2:6, 2:6] = 1
    gt[7:10, 7:10, 7:10] = 2
    per_class, mean = multi_dice(gt, gt, 2)
    assert per_class == [1.0, 1.0]
    assert mean == 1.0


def test_asd_symmetric_shift():
    a = np.zeros((20, 20, 20), bool)
    b = np.zeros((20, 20, 20), bool)
    a[5:10, 5:10, 5:10] = True
    b[5:10, 5:10, 5:10] = True
    assert cal_asd(a, b) == 0.0
