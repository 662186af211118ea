"""Space-to-depth packed ops: exact equivalence vs fine-grid references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hdenseformer_tpu.ops.s2d import (
    concat_packed,
    conv1_packed,
    conv3_packed,
    conv_transpose_packed,
    expand_kernel,
    instance_norm_relu_packed,
    max_pool_packed,
    pack,
    plain_to_shifted,
    unpack,
)


def _dn(nsp):
    return ("NDHWC", "DHWIO", "NDHWC") if nsp == 3 else ("NHWC", "HWIO", "NHWC")


@pytest.mark.parametrize("nsp", [2, 3])
def test_pack_unpack_roundtrip(nsp):
    rng = np.random.RandomState(0)
    shape = (2,) + (8,) * nsp + (5,)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    np.testing.assert_array_equal(unpack(pack(x)), x)


@pytest.mark.parametrize("nsp", [2, 3])
def test_conv3_packed_matches_fine(nsp):
    rng = np.random.RandomState(1)
    C, Co, D = 4, 6, 12
    x = jnp.asarray(rng.randn(2, *(D,) * nsp, C).astype(np.float32))
    w = jnp.asarray(rng.randn(*(3,) * nsp, C, Co).astype(np.float32) * 0.2)
    ref = jax.lax.conv_general_dilated(
        x, w, (1,) * nsp, [(1, 1)] * nsp, dimension_numbers=_dn(nsp)
    )
    got = unpack(conv3_packed(pack(x), w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_plain_to_shifted_boundary_is_same_padding():
    """Shifted cell 0 / last cell carry zeros == the fine conv's SAME pad."""
    x = jnp.ones((1, 4, 4, 4, 1), jnp.float32)
    xs = plain_to_shifted(pack(x))
    assert xs.shape == (1, 3, 3, 3, 8)
    # corner cell (0,0,0): block p reads source cell -p, so only the
    # p=(0,0,0) block is interior (position-preserving layout)
    corner = np.asarray(xs[0, 0, 0, 0])
    assert corner[0] == 1.0 and corner[1:].sum() == 0.0


def test_conv_transpose_packed_matches_equiv():
    """k3 s2 p1 op1 ConvTranspose == packed coarse k2 conv."""
    from hdenseformer_tpu.models.layers import ConvTranspose

    rng = np.random.RandomState(2)
    C, Co, G = 5, 4, 6
    x = jnp.asarray(rng.randn(1, G, G, G, C).astype(np.float32))
    mod = ConvTranspose(Co, 3, 2, 1, 1)
    variables = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(variables, x)  # (1, 2G, 2G, 2G, Co)
    w = variables["params"]["kernel"]
    b = variables["params"]["bias"]
    got = unpack(conv_transpose_packed(x, w, bias=b))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_max_pool_packed_matches_fine():
    from hdenseformer_tpu.ops.resize import max_pool

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 3).astype(np.float32))
    np.testing.assert_array_equal(max_pool_packed(pack(x)), max_pool(x))


def test_instance_norm_relu_packed_matches_fine():
    from hdenseformer_tpu.ops.instance_norm import xla_instance_norm_relu

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 3).astype(np.float32))
    scale = jnp.asarray(rng.rand(3).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(3).astype(np.float32))
    ref = xla_instance_norm_relu(x, scale, bias)
    got = unpack(instance_norm_relu_packed(pack(x), scale, bias))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_conv1_packed_matches_fine():
    rng = np.random.RandomState(5)
    C, Co = 6, 2
    x = jnp.asarray(rng.randn(1, 8, 8, 8, C).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 1, C, Co).astype(np.float32))
    b = jnp.asarray(rng.randn(Co).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID", dimension_numbers=_dn(3)
    ) + b
    got = unpack(conv1_packed(pack(x), w, bias=b))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_concat_packed_matches_fine():
    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.randn(1, 4, 4, 4, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 4, 4, 4, 5).astype(np.float32))
    ref = jnp.concatenate([a, b], axis=-1)
    got = unpack(concat_packed([pack(a), pack(b)]))
    np.testing.assert_array_equal(got, ref)


def test_packed_chain_grad_flows():
    """Autodiff through the packed stage (conv-IN-relu-pool) is finite."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 2, 4).astype(np.float32) * 0.2)

    def f(w):
        y = conv3_packed(pack(x), w)
        y = instance_norm_relu_packed(y)
        return jnp.sum(max_pool_packed(y) ** 2)

    g = jax.grad(f)(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_upsample2x_packed_matches_fine():
    from hdenseformer_tpu.ops.resize import upsample_linear
    from hdenseformer_tpu.ops.s2d import upsample2x_packed

    rng = np.random.RandomState(8)
    for nsp in (2, 3):
        x = jnp.asarray(rng.randn(2, *(6,) * nsp, 5).astype(np.float32))
        ref = pack(upsample_linear(x, 2))
        got = upsample2x_packed(x)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# shift-free conv pair: plain->shifted (p2s) and shifted->plain (s2p)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nsp", [2, 3])
def test_conv3_p2s_matches_shifted_fine(nsp):
    """p2s output (after pad-slot masking) == plain_to_shifted(fine conv)."""
    from hdenseformer_tpu.ops.s2d import apply_shifted_mask, conv3_packed_p2s

    rng = np.random.RandomState(7)
    C, Co, D = 3, 5, 12
    x = jnp.asarray(rng.randn(2, *(D,) * nsp, C).astype(np.float32))
    w = jnp.asarray(rng.randn(*(3,) * nsp, C, Co).astype(np.float32) * 0.2)
    ref = plain_to_shifted(
        pack(
            jax.lax.conv_general_dilated(
                x, w, (1,) * nsp, [(1, 1)] * nsp, dimension_numbers=_dn(nsp)
            )
        )
    )
    got = apply_shifted_mask(conv3_packed_p2s(pack(x), w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nsp", [2, 3])
def test_conv3_s2p_on_shifted_input_matches_fine(nsp):
    """s2p on a plain_to_shifted input == conv3_packed (which shifts itself)."""
    from hdenseformer_tpu.ops.s2d import conv3_packed_s2p

    rng = np.random.RandomState(8)
    C, Co, D = 4, 4, 10
    x = jnp.asarray(rng.randn(1, *(D,) * nsp, C).astype(np.float32))
    w = jnp.asarray(rng.randn(*(3,) * nsp, C, Co).astype(np.float32) * 0.2)
    xp = pack(x)
    np.testing.assert_allclose(
        conv3_packed_s2p(plain_to_shifted(xp), w),
        conv3_packed(xp, w),
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.parametrize("nsp", [2, 3])
def test_p2s_s2p_chain_equals_two_fine_convs(nsp):
    """conv(p2s) -> mask -> conv(s2p) == two fine SAME convs, grads incl."""
    from hdenseformer_tpu.ops.s2d import (
        apply_shifted_mask,
        conv3_packed_p2s,
        conv3_packed_s2p,
    )

    rng = np.random.RandomState(9)
    C, Cm, Co, D = 3, 6, 4, 8
    x = jnp.asarray(rng.randn(2, *(D,) * nsp, C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(*(3,) * nsp, C, Cm).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.randn(*(3,) * nsp, Cm, Co).astype(np.float32) * 0.2)

    def fine(x, w1, w2):
        y = jax.lax.conv_general_dilated(
            x, w1, (1,) * nsp, [(1, 1)] * nsp, dimension_numbers=_dn(nsp)
        )
        return jax.lax.conv_general_dilated(
            y, w2, (1,) * nsp, [(1, 1)] * nsp, dimension_numbers=_dn(nsp)
        )

    def packed(x, w1, w2):
        ys = apply_shifted_mask(conv3_packed_p2s(pack(x), w1))
        return unpack(conv3_packed_s2p(ys, w2))

    np.testing.assert_allclose(
        packed(x, w1, w2), fine(x, w1, w2), rtol=1e-4, atol=1e-4
    )
    loss_f = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
    gf = jax.grad(loss_f(fine), argnums=(0, 1, 2))(x, w1, w2)
    gp = jax.grad(loss_f(packed), argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-3)


def test_shifted_mask_factors_match_plain_to_shifted_zeros():
    """The factored mask zeroes exactly the slots plain_to_shifted pads."""
    from hdenseformer_tpu.ops.s2d import apply_shifted_mask

    x = jnp.asarray(np.ones((1, 6, 6, 6, 2), np.float32))
    xs = plain_to_shifted(pack(x))  # zeros exactly at pad slots
    ones = jnp.ones_like(xs)
    mask = apply_shifted_mask(ones)
    np.testing.assert_array_equal(np.asarray(mask) != 0, np.asarray(xs) != 0)


# ---------------------------------------------------------------------------
# partial-rank packing (``dims`` subsets): the 64-channel-level form
# ---------------------------------------------------------------------------

PARTIAL_DIMS = [(2,), (0,), (1, 2), (0, 2), (0, 1, 2)]


@pytest.mark.parametrize("dims", PARTIAL_DIMS)
def test_partial_pack_unpack_roundtrip(dims):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 8, 4, 5).astype(np.float32))
    np.testing.assert_array_equal(unpack(pack(x, dims), dims), x)


def test_pack_last_dim_is_contiguous_reshape():
    """Last-dim-only packing == a plain reshape (zero data movement)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 6, 3).astype(np.float32)
    got = np.asarray(pack(jnp.asarray(x), (2,)))
    np.testing.assert_array_equal(got, x.reshape(2, 4, 4, 3, 6))


@pytest.mark.parametrize("dims", PARTIAL_DIMS)
def test_partial_p2s_s2p_chain_equals_two_fine_convs(dims):
    from hdenseformer_tpu.ops.s2d import (
        apply_shifted_mask,
        conv3_packed_p2s,
        conv3_packed_s2p,
    )

    rng = np.random.RandomState(9)
    C, Cm, Co = 3, 6, 4
    x = jnp.asarray(rng.randn(2, 6, 8, 4, C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 3, C, Cm).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.randn(3, 3, 3, Cm, Co).astype(np.float32) * 0.2)

    def fine(x, w1, w2):
        y = jax.lax.conv_general_dilated(
            x, w1, (1,) * 3, [(1, 1)] * 3, dimension_numbers=_dn(3)
        )
        return jax.lax.conv_general_dilated(
            y, w2, (1,) * 3, [(1, 1)] * 3, dimension_numbers=_dn(3)
        )

    def packed(x, w1, w2):
        ys = apply_shifted_mask(conv3_packed_p2s(pack(x, dims), w1, dims=dims), dims=dims)
        return unpack(conv3_packed_s2p(ys, w2, dims=dims), dims)

    np.testing.assert_allclose(
        packed(x, w1, w2), fine(x, w1, w2), rtol=1e-4, atol=1e-4
    )
    loss_f = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
    gf = jax.grad(loss_f(fine), argnums=(0, 1, 2))(x, w1, w2)
    gp = jax.grad(loss_f(packed), argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("dims", PARTIAL_DIMS)
def test_partial_conv3_and_conv1_match_fine(dims):
    rng = np.random.RandomState(3)
    C, Co = 3, 5
    x = jnp.asarray(rng.randn(2, 6, 8, 4, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, C, Co).astype(np.float32) * 0.2)
    ref = jax.lax.conv_general_dilated(
        x, w, (1,) * 3, [(1, 1)] * 3, dimension_numbers=_dn(3)
    )
    got = unpack(conv3_packed(pack(x, dims), w, dims=dims), dims)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    w1 = jnp.asarray(rng.randn(1, 1, 1, C, Co).astype(np.float32))
    ref1 = jax.lax.conv_general_dilated(
        x, w1, (1,) * 3, [(0, 0)] * 3, dimension_numbers=_dn(3)
    )
    got1 = unpack(conv1_packed(pack(x, dims), w1, dims=dims), dims)
    np.testing.assert_allclose(got1, ref1, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dims", PARTIAL_DIMS)
def test_partial_pool_transpose_upsample_concat_match_fine(dims):
    from hdenseformer_tpu.ops.resize import max_pool
    from hdenseformer_tpu.ops.s2d import upsample2x_packed

    rng = np.random.RandomState(4)
    C, Co = 3, 4
    x = jnp.asarray(rng.randn(2, 6, 8, 4, C).astype(np.float32))
    # maxpool
    np.testing.assert_array_equal(max_pool_packed(pack(x, dims), dims), max_pool(x))
    # conv transpose (equivalent-conv form, k3 s2 p1 op1)
    wt = jnp.asarray(rng.randn(3, 3, 3, C, Co).astype(np.float32) * 0.2)
    ref_ct = jax.lax.conv_general_dilated(
        x, wt, (1,) * 3, [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=_dn(3),
    )
    got_ct = unpack(conv_transpose_packed(x, wt, dims=dims), dims)
    np.testing.assert_allclose(got_ct, ref_ct, rtol=1e-4, atol=1e-4)
    # upsample2x (vs jax.image, the exact half-pixel reference)
    up_ref = pack(
        jax.image.resize(
            x, (2, 12, 16, 8, C), method="linear", antialias=False
        ),
        dims,
    )
    np.testing.assert_allclose(
        upsample2x_packed(x, dims), up_ref, rtol=1e-4, atol=1e-5
    )
    # concat
    y = jnp.asarray(rng.randn(2, 6, 8, 4, Co).astype(np.float32))
    ref_cat = pack(jnp.concatenate([x, y], axis=-1), dims)
    got_cat = concat_packed([pack(x, dims), pack(y, dims)], dims)
    np.testing.assert_array_equal(got_cat, ref_cat)


@pytest.mark.parametrize("dims", [(2,), (0, 1, 2)])
def test_partial_shifted_instance_norm_matches_fine(dims):
    """p2s -> fused IN+ReLU(shifted dims) -> s2p == fine conv-IN-conv."""
    from hdenseformer_tpu.ops.fused_norm import instance_norm_relu
    from hdenseformer_tpu.ops.s2d import conv3_packed_p2s, conv3_packed_s2p

    rng = np.random.RandomState(5)
    C, Cm, Co = 3, 6, 4
    x = jnp.asarray(rng.randn(2, 6, 8, 4, C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 3, C, Cm).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.randn(3, 3, 3, Cm, Co).astype(np.float32) * 0.2)
    scale = jnp.asarray(rng.randn(Cm).astype(np.float32))
    bias = jnp.asarray(rng.randn(Cm).astype(np.float32))
    parity = 2 ** len(dims)

    def fine(w1):
        y = jax.lax.conv_general_dilated(
            x, w1, (1,) * 3, [(1, 1)] * 3, dimension_numbers=_dn(3)
        )
        m = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
        v = jnp.mean(jnp.square(y - m), axis=(1, 2, 3), keepdims=True)
        z = jnp.maximum((y - m) * jax.lax.rsqrt(v + 1e-5) * scale + bias, 0.0)
        return jax.lax.conv_general_dilated(
            z, w2, (1,) * 3, [(1, 1)] * 3, dimension_numbers=_dn(3)
        )

    def packed(w1):
        ys = conv3_packed_p2s(pack(x, dims), w1, dims=dims)
        n = instance_norm_relu(ys, scale, bias, 1e-5, True, parity, dims)
        return unpack(conv3_packed_s2p(n, w2, dims=dims), dims)

    np.testing.assert_allclose(packed(w1), fine(w1), rtol=1e-4, atol=1e-4)
    gf = jax.grad(lambda w: jnp.sum(fine(w) ** 2))(w1)
    gp = jax.grad(lambda w: jnp.sum(packed(w) ** 2))(w1)
    np.testing.assert_allclose(gp, gf, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# round-5 ops: generalized odd-k expansion, strided conv, k2 transpose, GN
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [5, 7])
@pytest.mark.parametrize("nsp", [2, 3])
def test_convk_p2s_matches_shifted_fine(k, nsp):
    """Odd-k (5/7) plain->shifted conv == plain_to_shifted(fine SAME conv)
    — the packed lowering for k7 stems (VERDICT r4 item 5)."""
    from hdenseformer_tpu.ops.s2d import apply_shifted_mask, convk_packed_p2s

    rng = np.random.RandomState(11)
    C, Co, D = 3, 4, 12
    x = jnp.asarray(rng.randn(2, *(D,) * nsp, C).astype(np.float32))
    w = jnp.asarray(rng.randn(*(k,) * nsp, C, Co).astype(np.float32) * 0.1)
    half = (k - 1) // 2
    ref = plain_to_shifted(
        pack(
            jax.lax.conv_general_dilated(
                x, w, (1,) * nsp, [(half, half)] * nsp, dimension_numbers=_dn(nsp)
            )
        )
    )
    got = apply_shifted_mask(convk_packed_p2s(pack(x), w))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("nsp", [2, 3])
def test_conv_s2_packed_matches_fine(k, nsp):
    """Stride-2 SAME k conv consumed from packed-plain == fine s2 conv
    (the TransBTS EnDown lowering)."""
    from hdenseformer_tpu.ops.s2d import conv_s2_packed

    rng = np.random.RandomState(12)
    C, Co, D = 3, 4, 12
    x = jnp.asarray(rng.randn(2, *(D,) * nsp, C).astype(np.float32))
    w = jnp.asarray(rng.randn(*(k,) * nsp, C, Co).astype(np.float32) * 0.1)
    half = (k - 1) // 2
    ref = jax.lax.conv_general_dilated(
        x, w, (2,) * nsp, [(half, half)] * nsp, dimension_numbers=_dn(nsp)
    )
    got = conv_s2_packed(pack(x), w)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv_s2_packed_partial_rank():
    from hdenseformer_tpu.ops.s2d import conv_s2_packed

    rng = np.random.RandomState(13)
    nsp, C, Co, D = 3, 3, 4, 12
    dims = (1, 2)
    x = jnp.asarray(rng.randn(2, *(D,) * nsp, C).astype(np.float32))
    w = jnp.asarray(rng.randn(*(3,) * nsp, C, Co).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (2,) * nsp, [(1, 1)] * nsp, dimension_numbers=_dn(nsp)
    )
    got = conv_s2_packed(pack(x, dims), w, dims=dims)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose2_packed_matches_torch_equiv():
    """k2 s2 ConvTranspose with packed output == the fine module + pack."""
    from hdenseformer_tpu.models.layers import ConvTranspose

    rng = np.random.RandomState(14)
    x = jnp.asarray(rng.randn(2, 6, 6, 6, 5).astype(np.float32))
    fine = ConvTranspose(4, 2, 2)
    v = fine.init(jax.random.PRNGKey(0), x)
    ref = pack(fine.apply(v, x))
    packed = ConvTranspose(4, 2, 2, packed_out=True)
    got = packed.apply(v, x)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shifted", [False, True])
def test_group_norm_relu_packed_matches_fine(shifted):
    """Packed GroupNorm(+affine+ReLU) == torch-style fine GroupNorm."""
    from flax import linen as nn

    from hdenseformer_tpu.ops.s2d import group_norm_relu_packed

    rng = np.random.RandomState(15)
    C, G, D = 8, 4, 8
    x = jnp.asarray(rng.randn(2, D, D, D, C).astype(np.float32))
    scale = jnp.asarray(rng.randn(C).astype(np.float32))
    bias = jnp.asarray(rng.randn(C).astype(np.float32))
    gn = nn.GroupNorm(num_groups=G, epsilon=1e-5, use_bias=True, use_scale=True)
    v = {"params": {"scale": scale, "bias": bias}}
    ref = jnp.maximum(gn.apply(v, x), 0.0)
    if shifted:
        xs = plain_to_shifted(pack(x))
        got_s = group_norm_relu_packed(
            xs, scale, bias, num_groups=G, shifted=True
        )
        # compare interior (drop the shifted pad slots): shifted cell j
        # block p = fine 2j - p; reconstruct fine via the transpose map
        from hdenseformer_tpu.ops.s2d import apply_shifted_mask

        ref_s = plain_to_shifted(pack(ref))
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(apply_shifted_mask(ref_s)),
            rtol=2e-4, atol=2e-4,
        )
    else:
        got = unpack(group_norm_relu_packed(pack(x), scale, bias, num_groups=G))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_transbts_s2d_matches_fine():
    """TransBTS packed execution (s2d levels 0-1) == fine at f32: same
    param tree, same outputs, same batch_stats updates (VERDICT r4 item
    4 — the zoo lever applied to TransBTS)."""
    from hdenseformer_tpu.models import get_net

    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 2).astype(np.float32))
    fine = get_net("TransBTS", channels=2, num_classes=2,
                   input_shape=(16, 16, 16), s2d=False)
    packed = get_net("TransBTS", channels=2, num_classes=2,
                     input_shape=(16, 16, 16), s2d=True)
    v = fine.init({"params": jax.random.PRNGKey(0)}, x)
    vp = packed.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
    ref = fine.apply(v, x)
    got = packed.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4)
    # train mode: batch_stats bookkeeping must match across layouts
    rngs = {"dropout": jax.random.PRNGKey(2)}
    ref_t, mf = fine.apply(v, x, train=True, rngs=rngs, mutable=["batch_stats"])
    got_t, mp = packed.apply(v, x, train=True, rngs=rngs, mutable=["batch_stats"])
    flat_f = jax.tree_util.tree_leaves_with_path(mf["batch_stats"])
    flat_p = {jax.tree_util.keystr(k): v2 for k, v2 in
              jax.tree_util.tree_leaves_with_path(mp["batch_stats"])}
    for k, v2 in flat_f:
        np.testing.assert_allclose(
            np.asarray(flat_p[jax.tree_util.keystr(k)]), np.asarray(v2),
            rtol=1e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k),
        )
