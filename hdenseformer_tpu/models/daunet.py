"""DAUNet: 3D UNet with Depth-Attention / Squeeze-Excitation variants.

Parity target: reference models/DAUNet.py:6-338. Channels-last flax with
the same structure: generic ``DAUNet`` skeleton (width [32..512], per-level
depth = init_depth / 2^k) with pluggable double-conv builders:
- 'da':     conv-bn-relu, conv-bn -> DepthAttention -> relu (ref :45-70)
- 'se':     ... -> SELayer -> relu (ref :103-128)
- 'da_se':  ... -> DepthAttention -> SELayer -> relu (ref :73-100)
- 'res_da_se': residual variant with 1x1 downsample (ref :131-165)
- 'plain':  stem double conv (ref :168-185)

TPU notes: DepthAttention's AdaptiveAvgPool3d((depth,1,1)) (ref :10) is a
mean over (H, W) plus adaptive 1-D pooling over D (identity when the
feature depth already equals the configured depth); the gating MLPs are
matmuls that fuse cleanly. Upsampling uses align_corners=True trilinear
(ref :213) implemented as dense per-axis interpolation matrices (MXU).

Divergence note: the reference pads the upsampled tensor with
``F.pad([diffD..., diffH..., diffW...])`` (ref :227-229), but torch's
F.pad consumes pads last-dim-first, so the reference actually applies the
D-diff to W etc. — only symmetric for cubic volumes. We implement the
evident intent (each dim padded by its own diff).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hdenseformer_tpu.models.layers import BatchNorm, Conv, ConvTranspose, Dense
from hdenseformer_tpu.ops.resize import max_pool, upsample_linear_align_corners

Array = jax.Array


def _adaptive_avg_depth(x: Array, target_d: int) -> Array:
    """AdaptiveAvgPool over the D axis of (B, D, C) to target_d bins."""
    b, d, c = x.shape
    if d == target_d:
        return x
    out = []
    for i in range(target_d):
        lo = (i * d) // target_d
        hi = -(-((i + 1) * d) // target_d)
        out.append(jnp.mean(x[:, lo:hi], axis=1))
    return jnp.stack(out, axis=1)


class DepthAttention(nn.Module):
    """Depth-wise squeeze gating (ref DAUNet.py:6-22).

    Pools (H, W), flattens (C, D) torch-order, passes through a
    C*D -> D -> C*D sigmoid MLP, gates x per (channel, depth).
    """

    depth: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, d, h, w, c = x.shape
        y = jnp.mean(x, axis=(2, 3))  # (B, D, C)
        y = _adaptive_avg_depth(y, self.depth)  # (B, depth, C)
        y_t = y.transpose(0, 2, 1).reshape(b, c * self.depth)  # torch (C,D) order
        hidden = (c * self.depth) // c  # reduction = channel -> hidden = depth
        y_t = nn.relu(Dense(hidden, dtype=self.dtype, name="fc1")(y_t))
        y_t = jax.nn.sigmoid(Dense(c * self.depth, dtype=self.dtype, name="fc2")(y_t))
        gate = y_t.reshape(b, c, self.depth).transpose(0, 2, 1)  # (B, depth, C)
        if self.depth != d:
            gate = _adaptive_avg_depth(gate, d)
        return x * gate[:, :, None, None, :]


class SELayer(nn.Module):
    """Global squeeze-excitation (ref DAUNet.py:26-41)."""

    reduction: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        y = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # (B, C)
        y = nn.relu(Dense(c // self.reduction, dtype=self.dtype, name="fc1")(y))
        y = jax.nn.sigmoid(Dense(c, dtype=self.dtype, name="fc2")(y))
        return x * y.reshape(y.shape[0], *([1] * (x.ndim - 2)), c)


class DoubleConv(nn.Module):
    """(conv-BN-ReLU) x2 with optional DA/SE/residual (ref DAUNet.py:45-185)."""

    out_channels: int
    mid_channels: Optional[int] = None
    depth: Optional[int] = None
    use_da: bool = False
    use_se: bool = False
    residual: bool = False
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mid = self.mid_channels or self.out_channels
        h = Conv(mid, 3, 1, 1, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(use_running_average=not self.train, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(self.out_channels, 3, 1, 1, dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(use_running_average=not self.train, name="bn2")(h)
        if self.use_da:
            h = DepthAttention(depth=self.depth, dtype=self.dtype, name="da")(h)
        if self.use_se:
            h = SELayer(dtype=self.dtype, name="se")(h)
        if self.residual:
            res = x
            if x.shape[-1] != self.out_channels:
                res = Conv(self.out_channels, 1, dtype=self.dtype, name="downsample")(x)
            h = h + res
        return nn.relu(h)


_BUILDERS = {
    "plain": dict(use_da=False, use_se=False, residual=False),
    "da": dict(use_da=True, use_se=False, residual=False),
    "se": dict(use_da=False, use_se=True, residual=False),
    "da_se": dict(use_da=True, use_se=True, residual=False),
    "res_da_se": dict(use_da=True, use_se=True, residual=True),
}


class DAUNet(nn.Module):
    """Generic DA/SE UNet skeleton (ref DAUNet.py:246-282)."""

    n_classes: int = 2
    width: Tuple[int, ...] = (32, 64, 128, 256, 512)
    depths: Tuple[int, ...] = (128, 64, 32, 16, 8)
    conv_builder: str = "da"
    bilinear: bool = True
    dropout_flag: bool = True
    dtype: Optional[jnp.dtype] = None
    # maxpool lowering pinned per-model to its measured best: the round-4
    # same-process A/B at 144^3 bf16 had this model FASTER with
    # reduce_window (405.7 vs 420.4 ms/step reshape,
    # baselines/ab_r4_zoo.py) — the opposite of the flagship.
    pool_mode: str = "reduce_window"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        w = self.width
        dp = self.depths
        kw = _BUILDERS[self.conv_builder]
        factor = 2 if self.bilinear else 1

        def block(out_ch, depth, name, mid=None, builder_kw=None):
            return DoubleConv(
                out_channels=out_ch, mid_channels=mid, depth=depth, train=train,
                dtype=self.dtype, name=name, **(builder_kw or kw),
            )

        def pool(t):
            return max_pool(t, mode=self.pool_mode)

        x1 = block(w[0], dp[0], "inc", builder_kw=_BUILDERS["plain"])(x)
        x2 = block(w[1], dp[1], "down1")(pool(x1))
        x3 = block(w[2], dp[2], "down2")(pool(x2))
        x4 = block(w[3], dp[3], "down3")(pool(x3))
        x5 = block(w[4] // factor, dp[4], "down4")(pool(x4))

        def up(x_small, skip, out_ch, depth, name):
            if self.bilinear:
                u = upsample_linear_align_corners(x_small, 2)
            else:
                u = ConvTranspose(
                    x_small.shape[-1] // 2, 2, 2, dtype=self.dtype, name=f"{name}_up"
                )(x_small)
            # pad to skip's spatial size (intended reference behavior)
            pads = [(0, 0)]
            for i in range(1, u.ndim - 1):
                diff = skip.shape[i] - u.shape[i]
                pads.append((diff // 2, diff - diff // 2))
            pads.append((0, 0))
            if any(p != (0, 0) for p in pads):
                u = jnp.pad(u, pads)
            cat = jnp.concatenate([skip, u], axis=-1)
            mid = cat.shape[-1] // 2 if self.bilinear else None
            return block(out_ch, depth, name, mid=mid)(cat)

        y = up(x5, x4, w[3] // factor, dp[3], "up1")
        y = up(y, x3, w[2] // factor, dp[2], "up2")
        y = up(y, x2, w[1] // factor, dp[1], "up3")
        y = up(y, x1, w[0], dp[0], "up4")
        if self.dropout_flag:
            y = nn.Dropout(0.5, deterministic=not train)(y)
        return Conv(self.n_classes, 1, name="outc")(y.astype(jnp.float32))


def _make(conv_builder: str, init_depth: int, n_channels: int, n_classes: int, dtype=None, **kw):
    del n_channels  # inferred from input, kept for API parity
    depths = tuple(init_depth // (2**k) for k in range(5))
    return DAUNet(
        n_classes=n_classes, depths=depths, conv_builder=conv_builder, dtype=dtype, **kw
    )


def da_unet(init_depth=128, n_channels=1, n_classes=2, dtype=None, **kw):
    return _make("da", init_depth, n_channels, n_classes, dtype, **kw)


def se_unet(init_depth=128, n_channels=1, n_classes=2, dtype=None, **kw):
    return _make("se", init_depth, n_channels, n_classes, dtype, **kw)


def da_se_unet(init_depth=128, n_channels=1, n_classes=2, dtype=None, **kw):
    return _make("da_se", init_depth, n_channels, n_classes, dtype, **kw)


def res_da_se_unet(init_depth=128, n_channels=1, n_classes=2, dtype=None, **kw):
    return _make("res_da_se", init_depth, n_channels, n_classes, dtype, **kw)
