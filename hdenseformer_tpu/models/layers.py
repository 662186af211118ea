"""Shared flax building blocks with PyTorch-compatible initialization.

All modules are channels-last (``(N, *spatial, C)``) so XLA lays convs out
for the MXU without transposes. Initialization matches torch defaults
(kaiming-uniform a=sqrt(5) kernels, U(±1/sqrt(fan_in)) biases) because the
parity target is converged val dice against the reference training recipe
(SURVEY.md §7.3 "Dice parity").

Compute dtype is configurable (`dtype=bf16` for TPU speed) while params
stay fp32; normalization statistics are always computed in fp32.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array
Dtype = jnp.dtype

# torch kaiming_uniform(a=sqrt(5)): U(-b, b), b = sqrt(6/((1+5) fan_in)) = sqrt(1/fan_in)
kaiming_uniform_torch = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def uniform_bound_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _tup(v: Union[int, Sequence[int]], n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _dim_numbers(nsp: int):
    if nsp == 2:
        return ("NHWC", "HWIO", "NHWC")
    if nsp == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    if nsp == 1:
        return ("NWC", "WIO", "NWC")
    raise ValueError(f"unsupported spatial rank {nsp}")


class Conv(nn.Module):
    """Channels-last conv matching ``torch.nn.ConvNd`` defaults.

    Integer ``padding`` is symmetric per-dim zero padding like torch.

    ``packed=True`` runs the conv in the space-to-depth packed layout
    (ops/s2d.py): input/output are packed-plain (channel-major), the
    kernel parameter keeps its fine-grid shape, and only SAME 3^d
    (stride 1) or 1^d convs are supported. Exact same math, MXU-aligned.

    ``packed_shift`` (k3 packed only) selects the shift-free conv pair:
    ``'out'`` consumes packed-plain and EMITS the packed-SHIFTED layout
    (conv3_packed_p2s — the consumer must mask the pad slots, which
    InstanceNorm(shifted=True) does); ``'in'`` consumes packed-shifted
    and emits packed-plain (conv3_packed_s2p). Chaining 'out' -> norm ->
    'in' executes two fine SAME convs with zero shift materializations.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Optional[Dtype] = None
    packed: bool = False
    packed_shift: Optional[str] = None  # None | 'out' | 'in'
    # which spatial dims are packed (None = all); packing only the last
    # dim runs the partial-rank 2x-channel form (ops/s2d.py module doc)
    packed_dims: Optional[Tuple[int, ...]] = None
    # emit f32 with f32 MXU accumulation while reading the activation in
    # its (bf16) compute dtype — for logits heads, where casting the
    # full-resolution input to f32 first costs a materialized copy
    out_f32: bool = False
    # lower a non-overlapping patchify conv (kernel == stride, padding 0,
    # e.g. the ViT patch embed) as block-reshape + ONE matmul instead of
    # a strided conv: XLA's conv lowering at in_ch=1/k16 pays ~13 ms/step
    # of layout copies at 144^3 (round-3 trace) that the matmul avoids.
    # Parameter shapes/names are identical to the conv form.
    as_matmul: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nsp = x.ndim - 2
        k = _tup(self.kernel_size, nsp)
        s = _tup(self.strides, nsp)
        p = _tup(self.padding, nsp)
        d = _tup(self.dilation, nsp)
        if self.packed:
            from hdenseformer_tpu.ops.s2d import (
                _pdims,
                conv1_packed,
                conv3_packed_s2p,
                conv_s2_packed,
                convk_packed,
                convk_packed_p2s,
            )

            pdims = _pdims(nsp, self.packed_dims)
            f = 2 ** len(pdims)
            in_ch = x.shape[-1] // f
            assert self.feature_group_count == 1 and s in ((1,) * nsp, (2,) * nsp)
            assert all(ki % 2 == 1 for ki in k) and len(set(k)) == 1
            # packed convs implement SAME padding ((k-1)/2; conv1 padding-0)
            # by construction; anything else would be silently miscomputed
            assert p == (k[0] // 2,) * nsp, (
                f"packed conv{k[0]} requires padding={k[0] // 2}, got {p}"
            )
            assert self.packed_shift in (None, "out", "in")
            assert self.packed_shift is None or (k[0] >= 3 and s == (1,) * nsp)
            assert self.packed_shift != "in" or k[0] == 3
            fan_in = in_ch * int(np.prod(k))
            kernel = self.param(
                "kernel", kaiming_uniform_torch, k + (in_ch, self.features),
                jnp.float32,
            )
            bias = (
                self.param(
                    "bias", uniform_bound_init(1.0 / math.sqrt(fan_in)),
                    (self.features,), jnp.float32,
                )
                if self.use_bias
                else None
            )
            dtype = self.dtype or x.dtype
            if s == (2,) * nsp:
                # stride-2 downsample consumed from packed-plain, emitting
                # the UNPACKED coarse grid (TransBTS EnDown)
                assert self.packed_shift is None
                return conv_s2_packed(x, kernel, bias=bias, dtype=dtype, dims=pdims)
            if k[0] == 1:
                return conv1_packed(x, kernel, bias=bias, dims=pdims)
            conv = {
                None: convk_packed,  # odd k >= 3 (k3 fast path inside)
                "out": convk_packed_p2s,
                "in": conv3_packed_s2p,
            }[self.packed_shift]
            y = conv(x, kernel, dtype=dtype, dims=pdims)
            if bias is not None:
                # 'out': bias lands on pad slots too; the consumer's
                # shifted-aware norm masks them before use
                y = y + jnp.tile(bias.astype(y.dtype), f)  # parity-major
            return y
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.feature_group_count) * int(np.prod(k))
        kernel = self.param(
            "kernel",
            kaiming_uniform_torch,
            k + (in_ch // self.feature_group_count, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        if self.out_f32:
            from hdenseformer_tpu.ops.s2d import dot_f32out

            assert k == (1,) * nsp and s == (1,) * nsp and p == (0,) * nsp
            assert self.feature_group_count == 1
            y = dot_f32out(
                x.astype(dtype), kernel.reshape(in_ch, self.features).astype(dtype)
            )
        elif self.as_matmul:
            assert k == s and p == (0,) * nsp and d == (1,) * nsp
            assert self.feature_group_count == 1
            g = tuple(si // ki for si, ki in zip(x.shape[1:-1], k))
            shape = (x.shape[0],)
            for gi, ki in zip(g, k):
                shape += (gi, ki)
            shape += (in_ch,)
            t = x.reshape(shape)
            # (n, g0, k0, g1, k1, ..., c) -> (n, g..., k..., c)
            perm = (
                (0,)
                + tuple(1 + 2 * i for i in range(nsp))
                + tuple(2 + 2 * i for i in range(nsp))
                + (1 + 2 * nsp,)
            )
            t = t.transpose(perm).reshape(
                (x.shape[0],) + g + (int(np.prod(k)) * in_ch,)
            )
            # kernel (k..., in, out) row-major flatten matches the token
            # (k..., in) flatten above
            w = kernel.reshape(int(np.prod(k)) * in_ch, self.features)
            y = jnp.dot(t.astype(dtype), w.astype(dtype))
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=s,
                padding=[(pi, pi) for pi in p],
                rhs_dilation=d,
                dimension_numbers=_dim_numbers(nsp),
                feature_group_count=self.feature_group_count,
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                uniform_bound_init(1.0 / math.sqrt(fan_in)),
                (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose(nn.Module):
    """Channels-last transposed conv matching ``torch.nn.ConvTransposeNd``.

    Output size = (in-1)*stride - 2*padding + kernel + output_padding,
    implemented as an input-dilated conv (lhs_dilation=stride) with
    per-side padding (k-1-p, k-1-p+output_padding). The stored kernel is
    the *equivalent-conv* kernel: to import torch weights W[in,out,*k],
    spatially flip and transpose to (*k, in, out).

    Init matches torch: torch computes fan_in on W[in,out,*k] as
    out_channels * prod(k) (dim-1 times receptive field).
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    output_padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    packed_out: bool = False  # k3 s2 p1 op1 only: emit s2d-packed output
    packed_dims: Optional[Tuple[int, ...]] = None  # None = all spatial dims

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nsp = x.ndim - 2
        k = _tup(self.kernel_size, nsp)
        s = _tup(self.strides, nsp)
        p = _tup(self.padding, nsp)
        op = _tup(self.output_padding, nsp)
        in_ch = x.shape[-1]
        fan_in = self.features * int(np.prod(k))  # torch's fan for ConvTranspose
        bound = math.sqrt(1.0 / fan_in)
        kernel = self.param(
            "kernel",
            uniform_bound_init(math.sqrt(3.0) * bound),  # kaiming_uniform(a=sqrt5)
            k + (in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        if self.packed_out:
            from hdenseformer_tpu.ops.s2d import (
                conv_transpose2_packed,
                conv_transpose_packed,
            )

            bias = (
                self.param(
                    "bias", uniform_bound_init(bound), (self.features,), jnp.float32
                )
                if self.use_bias
                else None
            )
            if k == (2,) * nsp:
                # k2 s2: one tap per fine output == a single matmul
                assert s == (2,) * nsp and p == (0,) * nsp and op == (0,) * nsp
                return conv_transpose2_packed(
                    x, kernel, bias=bias, dtype=dtype, dims=self.packed_dims
                )
            assert k == (3,) * nsp and s == (2,) * nsp
            assert p == (1,) * nsp and op == (1,) * nsp
            return conv_transpose_packed(
                x, kernel, bias=bias, dtype=dtype, dims=self.packed_dims
            )
        pad = [(ki - 1 - pi, ki - 1 - pi + opi) for ki, pi, opi in zip(k, p, op)]
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1,) * nsp,
            padding=pad,
            lhs_dilation=s,
            dimension_numbers=_dim_numbers(nsp),
        )
        if self.use_bias:
            bias = self.param(
                "bias", uniform_bound_init(bound), (self.features,), jnp.float32
            )
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module):
    """torch.nn.Linear-initialized dense layer (params fp32, compute dtype of x)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", kaiming_uniform_torch, (in_ch, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param(
                "bias",
                uniform_bound_init(1.0 / math.sqrt(in_ch)),
                (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(dtype)
        return y


class InstanceNorm(nn.Module):
    """InstanceNorm over spatial dims per (sample, channel), torch semantics.

    torch InstanceNorm uses biased variance, eps=1e-5, and (with
    track_running_stats=False, the reference default) batch statistics at
    both train and eval time — so this is a pure function. Statistics in
    fp32 regardless of input dtype.

    Default path is ``ops/fused_norm.instance_norm_relu``: a custom_vjp
    whose forward is plain fusable XLA (so the normalize+relu still melts
    into the conv epilogue) but whose only tensor residual is the bf16
    input — under autodiff XLA instead saved a full-resolution fp32
    ``x.astype(f32)`` copy and re-traversed it in several unfused passes
    (~72 ms of the round-3 144^3 train step, baselines/profile_notes.md).

    A fused Pallas kernel also exists (ops/instance_norm.py; 2.5x vs XLA
    when benchmarked STANDALONE at 144^3 x 32ch) but is benchmark-gated
    OFF in-model (it regressed the end-to-end step 2x). Set
    ``use_pallas=True`` explicitly to re-evaluate on new hardware.
    """

    affine: bool = True
    epsilon: float = 1e-5
    fuse_relu: bool = False
    use_pallas: Optional[bool] = None
    packed: bool = False  # input is s2d packed-plain (ops/s2d.py)
    packed_dims: Optional[Tuple[int, ...]] = None  # None = all spatial dims
    # input is s2d packed-SHIFTED (conv3_packed_p2s output): stats exclude
    # the pad slots and the output re-zeroes them, so it feeds directly
    # into a Conv(packed_shift='in')
    shifted: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from hdenseformer_tpu.ops.fused_norm import instance_norm_relu as fused
        from hdenseformer_tpu.ops.s2d import _pdims

        assert not self.shifted or self.packed
        pdims = _pdims(x.ndim - 2, self.packed_dims) if self.packed else ()
        parity = 2 ** len(pdims) if self.packed else 1
        ch = x.shape[-1] // parity
        scale = bias = None
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = False  # benchmark-gated OFF (see class docstring)
        if (
            use_pallas
            and not self.packed
            and jax.default_backend() == "tpu"
            and x.ndim >= 3
        ):
            from hdenseformer_tpu.ops.instance_norm import instance_norm_relu

            return instance_norm_relu(
                x, scale, bias, self.epsilon, relu=self.fuse_relu, use_pallas=True
            ).astype(x.dtype)

        return fused(
            x, scale, bias, self.epsilon, relu=self.fuse_relu, parity=parity,
            shifted=pdims if self.shifted else False,
        )


class LayerNorm(nn.Module):
    """LayerNorm with torch eps=1e-5 and fp32 statistics."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ch = x.shape[-1]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        return (y * scale + bias).astype(x.dtype)


class _PackedBatchNorm(nn.Module):
    """Train/eval BatchNorm over the FINE grid of an s2d packed tensor
    (ops/s2d.py): statistics per original channel pool over (batch,
    spatial, parity[, minus the shifted layout's pad slots]).

    Same param/variable names and shapes as ``flax.linen.BatchNorm``
    (scale/bias params, batch_stats mean/var of shape (C,)) so the packed
    and fine executions of a model share one checkpoint tree. Train-mode
    normalize runs through the fused custom-VJP
    (ops/fused_norm.py, ``batch_pooled=True``); running stats follow
    torch bookkeeping (momentum 0.1, UNBIASED variance stored).
    """

    use_running_average: bool = False
    epsilon: float = 1e-5
    momentum: float = 0.9
    packed_dims: Optional[Tuple[int, ...]] = None
    shifted: bool = False  # input is packed-SHIFTED (conv3_packed_p2s)
    fuse_relu: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from hdenseformer_tpu.ops.fused_norm import (
            instance_norm_relu as fused,
            pooled_stats,
        )
        from hdenseformer_tpu.ops.s2d import _pdims, apply_shifted_mask

        pdims = _pdims(x.ndim - 2, self.packed_dims)
        parity = 2 ** len(pdims)
        ch = x.shape[-1] // parity
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((ch,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((ch,), jnp.float32)
        )
        spec = pdims if self.shifted else False
        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            g = jnp.tile(inv * scale, (parity,))
            b = jnp.tile(bias - ra_mean.value * inv * scale, (parity,))
            shape = (1,) * (x.ndim - 1) + (parity * ch,)
            y = x.astype(jnp.float32) * g.reshape(shape) + b.reshape(shape)
            if self.fuse_relu:
                y = jnp.maximum(y, 0.0)
            if self.shifted:
                y = apply_shifted_mask(y, dims=pdims)
            return y.astype(x.dtype)
        y = fused(
            x, scale, bias, self.epsilon, relu=self.fuse_relu, parity=parity,
            shifted=spec, batch_pooled=True,
        )
        if not self.is_initializing():
            mean_b, var_b, m = pooled_stats(x, parity, spec)
            mom = 1.0 - self.momentum  # torch momentum (0.1)
            ra_mean.value = self.momentum * ra_mean.value + mom * mean_b
            ra_var.value = (
                self.momentum * ra_var.value + mom * var_b * (m / (m - 1))
            )
        return y


class _TorchBatchNorm(nn.Module):
    """Fine-grid BatchNorm with torch running-stat bookkeeping
    (momentum 0.1, UNBIASED running variance — torch BatchNorm3d
    semantics, reference models/DAUNet.py:49-56), matching
    ``_PackedBatchNorm`` so the packed and fine executions of one model
    write identical ``batch_stats`` from identical batches (ADVICE r4).
    Same param/variable names and shapes as ``flax.linen.BatchNorm``;
    normalization itself uses the biased batch variance, as torch does.
    Computes and returns float32, like the previous flax path.
    """

    use_running_average: bool = False
    epsilon: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((ch,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((ch,), jnp.float32)
        )
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x32, axis=axes)
            var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                m = 1.0
                for a in axes:
                    m *= x.shape[a]
                # torch refuses m == 1 ("Expected more than 1 value per
                # channel"); we store the biased var (0) instead of inf
                unbias = m / (m - 1.0) if m > 1 else 1.0
                mom = 1.0 - self.momentum  # torch momentum (0.1)
                ra_mean.value = self.momentum * ra_mean.value + mom * mean
                ra_var.value = (
                    self.momentum * ra_var.value + mom * var * unbias
                )
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x32 - mean) * (inv * scale) + bias


class BatchNorm(nn.Module):
    """BatchNorm with torch defaults (eps=1e-5, momentum 0.1 ≡ flax 0.9).

    ``packed=True`` accepts an s2d packed tensor (ops/s2d.py) and
    normalizes over the fine grid it encodes; ``shifted=True`` marks the
    packed-SHIFTED layout (pad slots excluded from stats, re-zeroed in
    the output — the conv3_packed_p2s -> norm -> conv3_packed_s2p chain).
    The packed module registers under the same auto-name ("BatchNorm_0")
    with the same param/variable names as the fine path, so both
    executions share one checkpoint tree.
    """

    use_running_average: bool = False
    epsilon: float = 1e-5
    momentum: float = 0.9
    packed: bool = False
    packed_dims: Optional[Tuple[int, ...]] = None
    shifted: bool = False
    fuse_relu: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.packed:
            return _PackedBatchNorm(
                use_running_average=self.use_running_average,
                epsilon=self.epsilon,
                momentum=self.momentum,
                packed_dims=self.packed_dims,
                shifted=self.shifted,
                fuse_relu=self.fuse_relu,
                name="BatchNorm_0",
            )(x)
        assert not self.shifted and not self.fuse_relu
        return _TorchBatchNorm(
            use_running_average=self.use_running_average,
            epsilon=self.epsilon,
            momentum=self.momentum,
            name="BatchNorm_0",
        )(x)


class BasicConv(nn.Module):
    """Conv(bias=False) + InstanceNorm(affine) + ReLU.

    Reference BasicConv3d / BasicConv2d (models/HDenseFormer.py:148-159).
    On TPU the norm+affine+relu epilogue runs as the fused Pallas kernel
    (ops/instance_norm.py, 2.5x vs the XLA reduce+normalize passes); the
    parameter tree is identical either way ('norm' scale/bias).
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None
    packed: bool = False  # s2d packed-plain in/out (ops/s2d.py)
    packed_dims: Optional[Tuple[int, ...]] = None  # None = all spatial dims
    # packed k3 shift-free pair (ops/s2d.py): 'out' emits the half-shifted
    # layout (the norm masks its pad slots), 'in' consumes it. Chain a
    # shift='out' block into a shift='in' block to run two fine SAME convs
    # with zero shift materializations.
    shift: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv(
            self.features,
            self.kernel_size,
            self.strides,
            self.padding,
            use_bias=False,
            dtype=self.dtype,
            packed=self.packed,
            packed_shift=self.shift,
            packed_dims=self.packed_dims,
            name="conv",
        )(x)
        return InstanceNorm(
            affine=True, fuse_relu=True, use_pallas=self.use_pallas,
            packed=self.packed, packed_dims=self.packed_dims,
            shifted=self.shift == "out", name="norm",
        )(x)


class UpConv(nn.Module):
    """Conv3x3 + InstanceNorm(no affine) + ReLU + linear x2 upsample.

    Reference UpConv (models/HDenseFormer.py:162-175).
    """

    features: int
    scale: int = 2
    dtype: Optional[Dtype] = None
    packed_out: bool = False  # scale 2 only: emit s2d packed-plain output
    packed_dims: Optional[Tuple[int, ...]] = None  # None = all spatial dims

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from hdenseformer_tpu.ops.resize import upsample_linear

        x = Conv(self.features, 3, 1, 1, use_bias=True, dtype=self.dtype, name="conv")(x)
        x = InstanceNorm(affine=False, fuse_relu=True, name="norm")(x)
        if self.packed_out:
            from hdenseformer_tpu.ops.s2d import upsample2x_packed

            assert self.scale == 2
            return upsample2x_packed(x, dims=self.packed_dims)
        return upsample_linear(x, self.scale)


def gelu_exact(x: Array) -> Array:
    """torch.nn.GELU default: exact erf formulation."""
    return nn.gelu(x, approximate=False)
