"""Golden tests: resize/pool primitives vs torch F.interpolate semantics."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from hdenseformer_tpu.ops import resize_nearest, resize_linear, upsample_linear, max_pool  # noqa: E402


def to_channels_last(x_nchw):
    # (N, C, *sp) -> (N, *sp, C)
    return np.moveaxis(x_nchw, 1, -1)


def to_nchw(x_nlast):
    return np.moveaxis(np.asarray(x_nlast), -1, 1)


@pytest.mark.parametrize("in_size,out_size", [((8, 8), (4, 4)), ((9, 7), (4, 3)), ((4, 4), (6, 10))])
def test_nearest_2d_matches_torch(rng, in_size, out_size):
    x = rng.randn(2, 3, *in_size).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), out_size, mode="nearest").numpy()
    got = to_nchw(resize_nearest(jnp.asarray(to_channels_last(x)), out_size))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.parametrize("in_size,out_size", [((8, 8, 8), (4, 4, 4)), ((6, 5, 7), (3, 2, 3)), ((3, 3, 3), (5, 6, 7))])
def test_nearest_3d_matches_torch(rng, in_size, out_size):
    x = rng.randn(1, 2, *in_size).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), out_size, mode="nearest").numpy()
    got = to_nchw(resize_nearest(jnp.asarray(to_channels_last(x)), out_size))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.parametrize("in_size,out_size", [((8, 8, 8), (16, 16, 16)), ((5, 6, 7), (9, 9, 9)), ((8, 8, 8), (4, 4, 4))])
def test_trilinear_matches_torch(rng, in_size, out_size):
    x = rng.randn(1, 2, *in_size).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), out_size, mode="trilinear", align_corners=False
    ).numpy()
    got = to_nchw(resize_linear(jnp.asarray(to_channels_last(x)), out_size))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_upsample_scale2_matches_torch(rng):
    x = rng.randn(2, 3, 5, 6, 7).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="trilinear", align_corners=False
    ).numpy()
    got = to_nchw(upsample_linear(jnp.asarray(to_channels_last(x)), 2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_2d_matches_torch(rng):
    x = rng.randn(2, 3, 12, 10).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), (24, 20), mode="bilinear", align_corners=False
    ).numpy()
    got = to_nchw(resize_linear(jnp.asarray(to_channels_last(x)), (24, 20)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.randn(2, 4, 8, 8, 8).astype(np.float32)
    ref = F.max_pool3d(torch.from_numpy(x), 2, 2).numpy()
    got = to_nchw(max_pool(jnp.asarray(to_channels_last(x)), 2, 2))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.parametrize("in_size,out_size", [((8, 8, 8), (16, 16, 16)), ((5, 6, 7), (9, 9, 9)), ((8, 8, 8), (4, 4, 4)), ((12, 10), (24, 20))])
def test_matrix_resize_matches_torch(rng, in_size, out_size):
    from hdenseformer_tpu.ops.resize import resize_linear_matrix

    x = rng.randn(2, 3, *in_size).astype(np.float32)
    mode = "trilinear" if len(in_size) == 3 else "bilinear"
    ref = F.interpolate(
        torch.from_numpy(x), out_size, mode=mode, align_corners=False
    ).numpy()
    got = to_nchw(resize_linear_matrix(jnp.asarray(to_channels_last(x)), out_size))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_max_pool_gradient_matches_torch_on_ties(rng):
    """The reshape-max pooling's custom VJP must route the gradient to
    the FIRST max in flat row-major window order exactly like torch
    (and like the previous select-and-scatter lowering) — ties are
    ubiquitous after ReLU, so all-ties-share-dy semantics would diverge
    (ops/resize.py::_max_pool_ws_bwd)."""
    import jax

    for shape in [(2, 3, 8, 8, 8), (1, 4, 9, 7, 10), (2, 5, 12, 10), (1, 2, 4, 4)]:
        nsp = len(shape) - 2
        # quantized relu-like values: many exact ties, including zeros
        x = np.maximum(rng.randn(*shape), 0).round(0).astype(np.float32)
        xt = torch.tensor(x, requires_grad=True)
        pool = F.max_pool3d if nsp == 3 else F.max_pool2d
        yt = pool(xt, 2, 2)
        gy = rng.randn(*yt.shape).astype(np.float32)
        yt.backward(torch.tensor(gy))

        y, vjp = jax.vjp(max_pool, jnp.asarray(to_channels_last(x)))
        np.testing.assert_array_equal(to_nchw(y), yt.detach().numpy())
        (gj,) = vjp(jnp.asarray(to_channels_last(gy)))
        np.testing.assert_array_equal(
            to_nchw(gj), xt.grad.numpy(), err_msg=str(shape)
        )
