"""2D per-slice volumetric prediction (eval.py-parity path)."""
import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from hdenseformer_tpu.infer.slices import predict_case_2d, eval_dir_2d
from fixtures import make_dataset_dir


class Thresh2D(nn.Module):
    """Logits = sign of channel-0 (input in [0,1] after MRNormalize)."""

    @nn.compact
    def __call__(self, x, train=False):
        fg = (x[..., :1] - 0.5) * 20.0
        return jnp.concatenate([-fg, fg], axis=-1)


def test_predict_case_2d_shapes():
    rng = np.random.RandomState(0)
    image = rng.rand(3, 5, 24, 24).astype(np.float32)  # (C, D, H, W)
    pred = predict_case_2d(
        Thresh2D(), {}, image, input_shape=(16, 16), num_classes=2, channels=3,
        slice_batch=4,
    )
    assert pred.shape == (5, 24, 24)
    assert set(np.unique(pred)) <= {0, 1}


def test_eval_dir_2d(tmp_path):
    make_dataset_dir(str(tmp_path / "h5"), n_cases=2, shape=(4, 16, 16), channels=3)
    outs = eval_dir_2d(
        Thresh2D(), {}, str(tmp_path / "h5"), str(tmp_path / "out"),
        input_shape=(16, 16), num_classes=2, channels=3,
    )
    assert len(outs) == 2
    pred = np.load(outs[0])
    assert pred.shape == (4, 16, 16)
