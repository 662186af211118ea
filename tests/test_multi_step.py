"""Scan-of-steps training: K chained steps in one dispatch == K single steps."""
import numpy as np

import jax
import jax.numpy as jnp

from hdenseformer_tpu.losses import get_loss
from hdenseformer_tpu.models import get_net
from hdenseformer_tpu.train.loop import make_multi_train_step, make_train_step
from hdenseformer_tpu.train.state import TrainState, get_optimizer


def _setup():
    model = get_net(
        "HDenseFormer_2D_16", channels=2, num_classes=2, input_shape=(16, 16),
        transformer_depth=8,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 2))
    v = model.init({"params": rng}, x)
    tx = get_optimizer("Adam", 1e-3, weight_decay=1e-4)
    state = TrainState.create(apply_fn=model.apply, params=v["params"], tx=tx, model_state={})
    crit = get_loss("FocalLoss", use_ds=True)
    return state, crit, rng


def _batches(k):
    r = np.random.RandomState(0)
    imgs = r.randn(k, 2, 16, 16, 2).astype(np.float32)
    labs = np.zeros((k, 2, 16, 16, 2), np.float32)
    labs[..., 0] = 1
    labs[:, :, 4:10, 4:10, 1] = 1
    labs[:, :, 4:10, 4:10, 0] = 0
    return jnp.asarray(imgs), jnp.asarray(labs)


def test_multi_step_matches_sequential():
    K = 3
    imgs, labs = _batches(K)

    state_a, crit, rng = _setup()
    single = make_train_step(crit, 2)
    losses_seq = []
    for i in range(K):
        state_a, m = single(state_a, {"image": imgs[i], "label": labs[i]}, rng)
        losses_seq.append(float(m["loss"]))

    state_b, crit, rng = _setup()
    multi = make_multi_train_step(crit, 2)
    state_b, ms = multi(state_b, {"image": imgs, "label": labs}, rng)
    losses_scan = [float(v) for v in np.asarray(ms["loss"])]

    np.testing.assert_allclose(losses_scan, losses_seq, rtol=1e-5, atol=1e-6)
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    # scanned vs unscanned compilations reassociate fp reductions; Adam's
    # early-step normalization (update ~ +-lr regardless of grad magnitude)
    # amplifies those last-ulp differences to O(lr) per step, so parameters
    # agree only to ~K*lr. Losses matching exactly above is the real check.
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-2)
    assert int(state_b.step) == K
