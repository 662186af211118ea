"""Hecktor20Top1: SE-normalized deep 5-level UNet with additive vision heads.

Parity target: reference models/Hecktor20Top1/{model.py,layers.py} —
``FastSmoothSENormDeepUNet_supervision_skip_no_drop``:
- FastSmoothSENorm: InstanceNorm3d(no affine) scaled by sigmoid SE gamma
  and shifted by tanh SE beta (layers.py:21-45);
- FastSmoothSeNormConv3d: conv -> relu -> SENorm (layers.py:48-58);
- RESseNormConv3d: residual with 1x1 SENorm conv when widths differ
  (layers.py:61-75);
- decoder with ConvTranspose(k3,s2,p1,op1) skips and multi-scale
  *additive* vision heads sv2..sv4 merged before the last block
  (model.py:62-85).

Channels-last flax; fp32 head.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hdenseformer_tpu.models.layers import Conv, ConvTranspose, InstanceNorm
from hdenseformer_tpu.ops.resize import max_pool, upsample_linear

Array = jax.Array


class SEWeights(nn.Module):
    """Global-mean squeeze -> 1x1 conv MLP (ref layers.py:22-33).

    ``packed=True``: the input is s2d packed-plain (ops/s2d.py); the
    global mean regroups the per-packed-channel means back to fine
    channels so the MLP (same params as the fine path) sees the exact
    fine-grid pooled vector. Returns the per-FINE-channel excitation
    (B, 1,..,1, C) — the caller lays it into parity blocks.
    """

    in_channels: int
    reduction: int = 2
    dtype: Optional[jnp.dtype] = None
    packed: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pooled = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
        if self.packed:
            f = pooled.shape[-1] // self.in_channels
            pooled = jnp.mean(
                pooled.reshape(pooled.shape[:-1] + (f, self.in_channels)), axis=-2
            )
        h = Conv(self.in_channels // self.reduction, 1, dtype=self.dtype, name="conv1")(pooled)
        h = nn.relu(h)
        return Conv(self.in_channels, 1, dtype=self.dtype, name="conv2")(h)


class FastSmoothSENorm(nn.Module):
    """IN(no affine) * sigmoid(gamma(x)) + tanh(beta(x)) (ref layers.py:21-45).

    ``packed=True`` operates on the s2d packed-plain layout: the
    InstanceNorm pools statistics per original channel over
    (spatial, parity) (ops/fused_norm.py parity mode) and the SE gates
    tile across the parity blocks (parity-major layout).
    """

    in_channels: int
    reduction: int = 2
    dtype: Optional[jnp.dtype] = None
    packed: bool = False
    packed_dims: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = jax.nn.sigmoid(
            SEWeights(self.in_channels, self.reduction, self.dtype,
                      packed=self.packed, name="gamma")(x)
        )
        beta = jnp.tanh(
            SEWeights(self.in_channels, self.reduction, self.dtype,
                      packed=self.packed, name="beta")(x)
        )
        normed = InstanceNorm(
            affine=False, packed=self.packed, packed_dims=self.packed_dims,
            name="norm",
        )(x)
        if self.packed:
            f = x.shape[-1] // self.in_channels
            gamma = jnp.tile(gamma, (1,) * (x.ndim - 1) + (f,))
            beta = jnp.tile(beta, (1,) * (x.ndim - 1) + (f,))
        return gamma * normed + beta


class FastSmoothSeNormConv(nn.Module):
    """conv -> relu -> SENorm (ref layers.py:48-58). ``packed=True`` runs
    the whole chain in the s2d packed-plain layout (k3 via conv3_packed,
    k1 via conv1_packed — ops/s2d.py)."""

    out_channels: int
    reduction: int = 2
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dtype: Optional[jnp.dtype] = None
    packed: bool = False
    packed_dims: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv(
            self.out_channels, self.kernel_size, self.strides, self.padding,
            use_bias=True, dtype=self.dtype, packed=self.packed,
            packed_dims=self.packed_dims, name="conv",
        )(x)
        x = nn.relu(x)
        return FastSmoothSENorm(
            self.out_channels, self.reduction, self.dtype,
            packed=self.packed, packed_dims=self.packed_dims, name="norm",
        )(x)


class RESseNormConv(nn.Module):
    """Residual SENorm conv (ref layers.py:61-75)."""

    out_channels: int
    reduction: int = 2
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dtype: Optional[jnp.dtype] = None
    packed: bool = False
    packed_dims: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = 1
        if self.packed:
            from hdenseformer_tpu.ops.s2d import _pdims

            f = 2 ** len(_pdims(x.ndim - 2, self.packed_dims))
        h = FastSmoothSeNormConv(
            self.out_channels, self.reduction, self.kernel_size, self.strides,
            self.padding, self.dtype, packed=self.packed,
            packed_dims=self.packed_dims, name="conv1",
        )(x)
        if x.shape[-1] != f * self.out_channels:
            res = FastSmoothSeNormConv(
                self.out_channels, self.reduction, 1, 1, 0, self.dtype,
                packed=self.packed, packed_dims=self.packed_dims,
                name="res_conv",
            )(x)
        else:
            res = x
        return h + res


class VisionUp(nn.Module):
    """1x1 SENorm conv + trilinear x scale upsample (ref layers.py:78-87).

    ``packed_out=True`` (scale 2 only) emits the upsampled output
    directly in packed-plain layout (ops/s2d.py::upsample2x_packed);
    larger scales upsample on the fine grid and the caller packs.
    ``packed_in`` (a dims tuple) accepts a packed input: the 1x1 SENorm
    conv runs packed, then unpacks (a FREE contiguous reshape when the
    dims are last-dim-only) before the fine-grid upsample.
    """

    out_channels: int
    scale: int
    reduction: int = 2
    dtype: Optional[jnp.dtype] = None
    packed_out: bool = False
    packed_in: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = FastSmoothSeNormConv(
            self.out_channels, self.reduction, 1, 1, 0, self.dtype,
            packed=self.packed_in is not None, packed_dims=self.packed_in,
            name="conv",
        )(x)
        if self.packed_in is not None:
            from hdenseformer_tpu.ops.s2d import unpack

            x = unpack(x, self.packed_in)
        if self.packed_out:
            from hdenseformer_tpu.ops.s2d import pack, upsample2x_packed

            if self.scale == 2:
                return upsample2x_packed(x)
            return pack(upsample_linear(x, self.scale))
        return upsample_linear(x, self.scale)


class Hecktor20Top1(nn.Module):
    """The full model (ref model.py:7-85). Returns single logits array.

    ``s2d`` packs level 1 (the full-resolution n_filters-channel level —
    sub-MXU-lane on TPU) into the space-to-depth layout (ops/s2d.py):
    EVERYTHING at full resolution runs packed — the k7 stem (round 5:
    VALID k4 coarse on the shifted packing, ops/s2d.py::convk_packed),
    block_1_2_left, upconv_1, the right blocks, the vision-head merge,
    and the 1x1 head. None = auto (pack when 3D, even dims,
    n_filters <= 32).
    """

    in_channels: int
    n_cls: int
    n_filters: int = 32
    reduction: int = 2
    dtype: Optional[jnp.dtype] = None
    # checkpoint every conv block: at 144^3 batch 1 the stored residuals
    # exceed the 16 GB chip (17.67G measured); remat fits it
    remat: bool = False
    s2d: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        nf = self.n_filters
        r = self.reduction
        dt = self.dtype
        Res = nn.remat(RESseNormConv) if self.remat else RESseNormConv
        Sen = (
            nn.remat(FastSmoothSeNormConv) if self.remat else FastSmoothSeNormConv
        )
        # level-1 (full-res) packing: bool; level-2 (2nf): a dims tuple
        # (partial-rank, e.g. (2,) = last-dim 64->128 lanes at 4/3x
        # redundancy) — selectable via a dict s2d={1: True, 2: (2,)}
        pk2 = None
        if isinstance(self.s2d, dict):
            pk = bool(self.s2d.get(1, False))
            spec2 = self.s2d.get(2, None)
            if spec2:
                pk2 = (
                    tuple(range(x.ndim - 2)) if spec2 is True else tuple(spec2)
                )
        elif self.s2d is None:
            pk = (
                nf <= 32
                and x.ndim == 5
                and all(s % 2 == 0 for s in x.shape[1:-1])
            )
        else:
            pk = bool(self.s2d)
        if pk2 is not None and not (
            pk
            and all((x.shape[1 + d] // 2) % 2 == 0 for d in pk2)
        ):
            pk2 = None  # level-2 grid must be even on the packed dims

        def res(out, name, k=3, p=1, packed=False, dims=None):
            return Res(out, r, k, 1, p, dt, packed=packed, packed_dims=dims,
                       name=name)

        def sen(out, name, packed=False, dims=None):
            return Sen(out, r, 3, 1, 1, dt, packed=packed, packed_dims=dims,
                       name=name)

        if pk:
            from hdenseformer_tpu.ops.s2d import (
                concat_packed,
                max_pool_packed,
                pack,
                unpack,
            )

            # the k7 stem runs packed too (round 5): k7 == VALID k4 coarse
            # on the shifted packing (ops/s2d.py::convk_packed, 1.49x tap
            # redundancy vs k3's 2.37x) — the fine k7 at in_channels=2 was
            # MXU-starved AND cost a full-res pack relayout after it
            ds0p = res(nf, "block_1_1_left", k=7, p=3, packed=True)(pack(x))
            ds0p = res(nf, "block_1_2_left", packed=True)(ds0p)
            h = max_pool_packed(ds0p)
        else:
            ds0 = res(nf, "block_1_1_left", k=7, p=3)(x)
            ds0 = res(nf, "block_1_2_left")(ds0)
            h = max_pool(ds0)
        if pk2 is not None:
            # last-dim pack/unpack are contiguous reshapes (free)
            h = pack(h, pk2)
            for i in range(1, 4):
                h = res(2 * nf, f"block_2_{i}_left", packed=True, dims=pk2)(h)
            ds1 = h
            h = max_pool_packed(ds1, pk2)
        else:
            for i in range(1, 4):
                h = res(2 * nf, f"block_2_{i}_left")(h)
            ds1 = h
            h = max_pool(ds1)
        for i in range(1, 4):
            h = res(4 * nf, f"block_3_{i}_left")(h)
        ds2 = h
        h = max_pool(ds2)
        for i in range(1, 4):
            h = res(8 * nf, f"block_4_{i}_left")(h)
        ds3 = h
        h = max_pool(ds3)
        for i in range(1, 4):
            h = res(16 * nf, f"block_5_{i}_left")(h)

        h = jnp.concatenate(
            [ConvTranspose(8 * nf, 3, 2, 1, 1, dtype=dt, name="upconv_4")(h), ds3], -1
        )
        h = sen(8 * nf, "block_4_1_right")(h)
        h = sen(8 * nf, "block_4_2_right")(h)
        sv4 = VisionUp(nf, 8, r, dt, packed_out=pk, name="vision_4")(h)

        h = jnp.concatenate(
            [ConvTranspose(4 * nf, 3, 2, 1, 1, dtype=dt, name="upconv_3")(h), ds2], -1
        )
        h = sen(4 * nf, "block_3_1_right")(h)
        h = sen(4 * nf, "block_3_2_right")(h)
        sv3 = VisionUp(nf, 4, r, dt, packed_out=pk, name="vision_3")(h)

        if pk2 is not None:
            up2 = ConvTranspose(
                2 * nf, 3, 2, 1, 1, dtype=dt, packed_out=True,
                packed_dims=pk2, name="upconv_2",
            )(h)
            h = concat_packed([up2, ds1], pk2)
            h = sen(2 * nf, "block_2_1_right", packed=True, dims=pk2)(h)
            h = sen(2 * nf, "block_2_2_right", packed=True, dims=pk2)(h)
            sv2 = VisionUp(nf, 2, r, dt, packed_out=pk, packed_in=pk2,
                           name="vision_2")(h)
            from hdenseformer_tpu.ops.s2d import unpack as _unpack

            h = _unpack(h, pk2)  # free reshape; upconv_1 reads fine grid
        else:
            h = jnp.concatenate(
                [ConvTranspose(2 * nf, 3, 2, 1, 1, dtype=dt, name="upconv_2")(h), ds1], -1
            )
            h = sen(2 * nf, "block_2_1_right")(h)
            h = sen(2 * nf, "block_2_2_right")(h)
            sv2 = VisionUp(nf, 2, r, dt, packed_out=pk, name="vision_2")(h)

        if pk:
            up1 = ConvTranspose(
                nf, 3, 2, 1, 1, dtype=dt, packed_out=True, name="upconv_1"
            )(h)
            hp = concat_packed([up1, ds0p])
            hp = sen(nf, "block_1_1_right", packed=True)(hp)
            hp = hp + sv4 + sv3 + sv2
            hp = sen(nf, "block_1_2_right", packed=True)(hp)
            logits = Conv(self.n_cls, 1, packed=True, name="conv1x1")(
                hp.astype(jnp.float32)
            )
            return unpack(logits)
        h = jnp.concatenate(
            [ConvTranspose(nf, 3, 2, 1, 1, dtype=dt, name="upconv_1")(h), ds0], -1
        )
        h = sen(nf, "block_1_1_right")(h)
        h = h + sv4 + sv3 + sv2
        h = sen(nf, "block_1_2_right")(h)
        return Conv(self.n_cls, 1, name="conv1x1")(h.astype(jnp.float32))


def hecktertop1(in_channels, n_cls, dtype=None, remat=False, s2d=None):
    return Hecktor20Top1(
        in_channels=in_channels, n_cls=n_cls, n_filters=32, dtype=dtype,
        remat=remat, s2d=s2d,
    )
