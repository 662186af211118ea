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

    ``packed=True`` accepts an s2d packed-plain tensor (ops/s2d.py):
    the (H, W) pool regroups the tiny per-packed-channel means back to
    fine channels, the MLP is unchanged (same params as the fine path),
    and the per-(depth, channel) gate is laid out into the parity blocks
    (block p reads the gate at fine depth 2j + p's D-parity bit).
    """

    depth: int
    dtype: Optional[jnp.dtype] = None
    packed: bool = False
    packed_dims: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.packed:
            from hdenseformer_tpu.ops.s2d import _pdims

            dims = _pdims(x.ndim - 2, self.packed_dims)
            npk = len(dims)
            f = 2**npk
            b, dc = x.shape[0], x.shape[1]
            c = x.shape[-1] // f
            d = dc * (2 if 0 in dims else 1)
            # fine mean over (H, W) == mean over coarse (H, W) and their
            # parity bits, per (coarse D, D-parity, channel)
            y = jnp.mean(x, axis=tuple(range(2, x.ndim - 1)))  # (B, Dc, f*C)
            y = y.reshape((b, dc) + (2,) * npk + (c,))
            hw_axes = tuple(2 + j for j, dd in enumerate(dims) if dd != 0)
            if hw_axes:
                y = jnp.mean(y, axis=hw_axes)
            y = y.reshape(b, d, c)  # D-parity (if any) interleaves into D
        else:
            b, d = x.shape[0], x.shape[1]
            c = x.shape[-1]
            y = jnp.mean(x, axis=tuple(range(2, x.ndim - 1)))  # (B, D, C)
        y = _adaptive_avg_depth(y, self.depth)  # (B, depth, C)
        y_t = y.transpose(0, 2, 1).reshape(b, c * self.depth)  # torch (C,D) order
        hidden = (c * self.depth) // c  # reduction = channel -> hidden = depth
        y_t = nn.relu(Dense(hidden, dtype=self.dtype, name="fc1")(y_t))
        y_t = jax.nn.sigmoid(Dense(c * self.depth, dtype=self.dtype, name="fc2")(y_t))
        gate = y_t.reshape(b, c, self.depth).transpose(0, 2, 1)  # (B, depth, C)
        if self.depth != d:
            gate = _adaptive_avg_depth(gate, d)
        if not self.packed:
            return x * gate[:, :, None, None, :]
        from hdenseformer_tpu.ops.s2d import _pdims

        dims = _pdims(x.ndim - 2, self.packed_dims)
        npk = len(dims)
        f = 2**npk
        dc = x.shape[1]
        if 0 in dims:
            dbit = dims.index(0)  # position of D's parity bit (dim order)
            gm = gate.reshape(b, dc, 2, c)
            blocks = [
                gm[:, :, (m >> (npk - 1 - dbit)) & 1, :] for m in range(f)
            ]
        else:
            blocks = [gate] * f
        gate_p = jnp.concatenate(blocks, axis=-1)
        shape = (b, dc) + (1,) * (x.ndim - 3) + (f * c,)
        return x * gate_p.reshape(shape)


class SELayer(nn.Module):
    """Global squeeze-excitation (ref DAUNet.py:26-41).

    ``packed=True``: the global mean regroups per-packed-channel means to
    fine channels (parity-major blocks, ops/s2d.py); the gate tiles back.
    Same params/shapes as the fine path.
    """

    reduction: int = 16
    dtype: Optional[jnp.dtype] = None
    packed: bool = False
    packed_dims: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = 1
        if self.packed:
            from hdenseformer_tpu.ops.s2d import _pdims

            f = 2 ** len(_pdims(x.ndim - 2, self.packed_dims))
        c = x.shape[-1] // f
        y = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # (B, f*C)
        if f > 1:
            y = jnp.mean(y.reshape(-1, f, c), axis=1)  # (B, C)
        y = nn.relu(Dense(c // self.reduction, dtype=self.dtype, name="fc1")(y))
        y = jax.nn.sigmoid(Dense(c, dtype=self.dtype, name="fc2")(y))
        if f > 1:
            y = jnp.tile(y, (1, f))
        return x * y.reshape(y.shape[0], *([1] * (x.ndim - 2)), f * c)


class DoubleConv(nn.Module):
    """(conv-BN-ReLU) x2 with optional DA/SE/residual (ref DAUNet.py:45-185).

    ``packed=True`` executes the block in the s2d packed layout
    (ops/s2d.py; same math, MXU-aligned channels on TPU): the shift-free
    conv pair conv('out') -> BN(shifted)+ReLU -> conv('in') -> BN, with
    layout-aware DA/SE gating. Input and output are packed-plain. Same
    param tree as the fine path. The mixed-precision policy differs in
    one place: the fine path's BN returns f32 activations (flax
    ``dtype=float32``) where the packed path keeps the input dtype — the
    packed-vs-fine equivalence is exact at f32 (tests/test_packed_bn.py).
    """

    out_channels: int
    mid_channels: Optional[int] = None
    depth: Optional[int] = None
    use_da: bool = False
    use_se: bool = False
    residual: bool = False
    train: bool = False
    dtype: Optional[jnp.dtype] = None
    packed: bool = False
    packed_dims: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mid = self.mid_channels or self.out_channels
        if self.packed:
            pd = self.packed_dims
            h = Conv(
                mid, 3, 1, 1, dtype=self.dtype, packed=True,
                packed_shift="out", packed_dims=pd, name="conv1",
            )(x)
            h = BatchNorm(
                use_running_average=not self.train, packed=True,
                packed_dims=pd, shifted=True, fuse_relu=True, name="bn1",
            )(h)
            h = Conv(
                self.out_channels, 3, 1, 1, dtype=self.dtype, packed=True,
                packed_shift="in", packed_dims=pd, name="conv2",
            )(h)
            h = BatchNorm(
                use_running_average=not self.train, packed=True,
                packed_dims=pd, name="bn2",
            )(h)
            if self.use_da:
                h = DepthAttention(
                    depth=self.depth, dtype=self.dtype, packed=True,
                    packed_dims=pd, name="da",
                )(h)
            if self.use_se:
                h = SELayer(
                    dtype=self.dtype, packed=True, packed_dims=pd, name="se"
                )(h)
            if self.residual:
                from hdenseformer_tpu.ops.s2d import _pdims

                f = 2 ** len(_pdims(x.ndim - 2, pd))
                res = x
                if x.shape[-1] != f * self.out_channels:
                    res = Conv(
                        self.out_channels, 1, dtype=self.dtype, packed=True,
                        packed_dims=pd, name="downsample",
                    )(x)
                h = h + res
            return nn.relu(h)
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
    # space-to-depth packed execution of level 0 (the full-resolution
    # 32-channel level — sub-MXU-lane on TPU, the same lever as the
    # flagship's s2d auto policy). None = auto: pack when width[0] <= 32,
    # the input is 3D, there is no residual builder, and the input's
    # spatial dims are even. True/False force it.
    s2d: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        w = self.width
        dp = self.depths
        kw = _BUILDERS[self.conv_builder]
        factor = 2 if self.bilinear else 1
        if self.s2d is None:
            pk0 = (
                w[0] <= 32
                and x.ndim == 5
                and not kw.get("residual", False)
                and all(s % 2 == 0 for s in x.shape[1:-1])
            )
        else:
            pk0 = bool(self.s2d)

        def block(out_ch, depth, name, mid=None, builder_kw=None, packed=False):
            return DoubleConv(
                out_channels=out_ch, mid_channels=mid, depth=depth, train=train,
                dtype=self.dtype, name=name, packed=packed, **(builder_kw or kw),
            )

        def pool(t):
            return max_pool(t, mode=self.pool_mode)

        if pk0:
            from hdenseformer_tpu.ops.s2d import (
                concat_packed,
                max_pool_packed,
                pack,
                unpack,
            )

            x1p = block(w[0], dp[0], "inc", builder_kw=_BUILDERS["plain"],
                        packed=True)(pack(x))
            x1_pooled = max_pool_packed(x1p)
        else:
            x1 = block(w[0], dp[0], "inc", builder_kw=_BUILDERS["plain"])(x)
            x1_pooled = pool(x1)
        x2 = block(w[1], dp[1], "down1")(x1_pooled)
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
        if pk0:
            # level-0 decoder in packed space: the skip never left it
            if self.bilinear:
                u = upsample_linear_align_corners(y, 2)
            else:
                u = ConvTranspose(
                    y.shape[-1] // 2, 2, 2, dtype=self.dtype, name="up4_up"
                )(y)
            mid = (w[0] + u.shape[-1]) // 2 if self.bilinear else None
            cat_p = concat_packed([x1p, pack(u)])
            y = block(w[0], dp[0], "up4", mid=mid, packed=True)(cat_p)
            if self.dropout_flag:
                y = nn.Dropout(0.5, deterministic=not train)(y)
            logits = Conv(self.n_classes, 1, packed=True, name="outc")(
                y.astype(jnp.float32)
            )
            return unpack(logits)
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
