"""TransBTS: 3D UNet encoder + transformer bottleneck + conv decoder.

Parity target: reference models/TransBTS/ (4 files):
- UNet encoder: InitConv(dropout3d 0.2) + GroupNorm(8)-ReLU-Conv residual
  EnBlocks with strided-conv downsampling to 1/8 grid at 128 channels
  (Unet_skipconnection.py:21-111);
- bottleneck: BN+ReLU, 3x3 conv to embedding_dim=512, flatten to tokens,
  learned zero-init positional encoding, 4 transformer layers
  (heads 8, mlp 4096, dropout 0.1) with intermediate capture
  (TransBTS_downsample8x_skipconnection.py:81-113, Transformer.py:87-119);
- decoder: EnBlock1/2 squeeze 512->128, three DeUp_Cat (1x1 conv +
  ConvTranspose(k2,s2) + skip concat + 1x1) + residual DeBlocks, 1x1 head
  (TransBTS_downsample8x_skipconnection.py:192-235).

The decoder consumes the LAST transformer intermediate (key 'Z4' == the
final layer output before the pre-head LayerNorm — the reference computes
pre_head_ln but decode() uses intmd_x['7'],
TransBTS_downsample8x_skipconnection.py:111, 219).

Divergence note (documented, not replicated): the reference calls
``F.dropout3d(y, 0.2)`` in InitConv with torch's functional default
``training=True`` — dropout stays ON at eval (Unet_skipconnection.py:30).
We gate it on ``train`` like every other dropout.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hdenseformer_tpu.models.layers import BatchNorm, Conv, ConvTranspose, Dense, LayerNorm, gelu_exact

Array = jax.Array


class GroupNorm(nn.Module):
    """torch GroupNorm(8, C) equivalent, fp32 stats."""

    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=jnp.float32
        )(x)


class EnBlock(nn.Module):
    """GN-ReLU-Conv x2 + residual (ref Unet_skipconnection.py:35-56)."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = GroupNorm(name="bn1")(x)
        h = nn.relu(h)
        h = Conv(self.channels, 3, 1, 1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(name="bn2")(h)
        h = nn.relu(h)
        h = Conv(self.channels, 3, 1, 1, dtype=self.dtype, name="conv2")(h)
        return h + x


class UnetEncoder(nn.Module):
    """4-level encoder to 1/8 grid (ref Unet_skipconnection.py:71-111)."""

    base_channels: int = 16
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        bc = self.base_channels
        x = Conv(bc, 3, 1, 1, dtype=self.dtype, name="InitConv")(x)
        # channel-wise (feature-map) dropout like torch dropout3d
        if train and self.dropout > 0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.dropout, (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
            )
            x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)

        x1_1 = EnBlock(bc, self.dtype, name="EnBlock1")(x)
        h = Conv(bc * 2, 3, 2, 1, dtype=self.dtype, name="EnDown1")(x1_1)
        h = EnBlock(bc * 2, self.dtype, name="EnBlock2_1")(h)
        x2_1 = EnBlock(bc * 2, self.dtype, name="EnBlock2_2")(h)
        h = Conv(bc * 4, 3, 2, 1, dtype=self.dtype, name="EnDown2")(x2_1)
        h = EnBlock(bc * 4, self.dtype, name="EnBlock3_1")(h)
        x3_1 = EnBlock(bc * 4, self.dtype, name="EnBlock3_2")(h)
        h = Conv(bc * 8, 3, 2, 1, dtype=self.dtype, name="EnDown3")(x3_1)
        for i in range(1, 5):
            h = EnBlock(bc * 8, self.dtype, name=f"EnBlock4_{i}")(h)
        return x1_1, x2_1, x3_1, h


class SelfAttention(nn.Module):
    """Standard MHA (ref Transformer.py:5-39)."""

    dim: int
    heads: int = 8
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, n, c = x.shape
        hd = self.dim // self.heads
        qkv = Dense(self.dim * 3, use_bias=False, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * hd**-0.5, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class TransBTSModel(nn.Module):
    """Full BTS model -> single logits array (ref :157-235)."""

    n_channels: int = 2
    num_classes: int = 2
    img_dim: int = 144
    patch_dim: int = 8
    embedding_dim: int = 512
    num_heads: int = 8
    num_layers: int = 4
    hidden_dim: int = 4096
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        det = not train
        dt = self.dtype
        ed = self.embedding_dim

        x1_1, x2_1, x3_1, h = UnetEncoder(16, 0.2, dt, name="Unet")(x, train=train)
        h = BatchNorm(use_running_average=det, name="bn")(h)
        h = nn.relu(h)
        h = Conv(ed, 3, 1, 1, dtype=dt, name="conv_x")(h)
        b = h.shape[0]
        grid = h.shape[1:-1]
        tokens = h.reshape(b, -1, ed)

        pos = self.param(
            "position_embeddings", nn.initializers.zeros, (tokens.shape[1], ed), jnp.float32
        )
        tokens = tokens + pos.astype(tokens.dtype)[None]
        tokens = nn.Dropout(self.dropout_rate, deterministic=det)(tokens)

        inter = None
        for i in range(self.num_layers):
            a = LayerNorm(name=f"attn_norm_{i}")(tokens)
            a = SelfAttention(
                ed, self.num_heads, self.attn_dropout_rate, dt, name=f"attn_{i}"
            )(a, deterministic=det)
            a = nn.Dropout(self.dropout_rate, deterministic=det)(a)
            tokens = tokens + a
            f = LayerNorm(name=f"ff_norm_{i}")(tokens)
            f = Dense(self.hidden_dim, dtype=dt, name=f"ff_fc1_{i}")(f)
            f = gelu_exact(f)
            f = nn.Dropout(self.dropout_rate, deterministic=det)(f)
            f = Dense(ed, dtype=dt, name=f"ff_fc2_{i}")(f)
            f = nn.Dropout(self.dropout_rate, deterministic=det)(f)
            tokens = tokens + f
            inter = tokens  # 'Z4' == last layer output, pre-LN (ref :219)

        # decoder (ref :207-235)
        x8 = inter.reshape(b, *grid, ed)
        # EnBlock1: squeeze 512 -> 128
        y = Conv(ed // 4, 3, 1, 1, dtype=dt, name="Enblock8_1_conv1")(x8)
        y = BatchNorm(use_running_average=det, name="Enblock8_1_bn1")(y)
        y = nn.relu(y)
        y = Conv(ed // 4, 3, 1, 1, dtype=dt, name="Enblock8_1_conv2")(y)
        y = BatchNorm(use_running_average=det, name="Enblock8_1_bn2")(y)
        y = nn.relu(y)
        # EnBlock2: residual
        z = Conv(ed // 4, 3, 1, 1, dtype=dt, name="Enblock8_2_conv1")(y)
        z = BatchNorm(use_running_average=det, name="Enblock8_2_bn1")(z)
        z = nn.relu(z)
        z = Conv(ed // 4, 3, 1, 1, dtype=dt, name="Enblock8_2_conv2")(z)
        z = BatchNorm(use_running_average=det, name="Enblock8_2_bn2")(z)
        z = nn.relu(z)
        y = z + y

        def deup(h_in, skip, out_ch, name):
            h1 = Conv(out_ch, 1, dtype=dt, name=f"{name}_conv1")(h_in)
            h1 = ConvTranspose(out_ch, 2, 2, dtype=dt, name=f"{name}_conv2")(h1)
            h1 = jnp.concatenate([skip, h1], axis=-1)
            return Conv(out_ch, 1, dtype=dt, name=f"{name}_conv3")(h1)

        def deblock(h_in, name):
            ch = h_in.shape[-1]
            h1 = Conv(ch, 3, 1, 1, dtype=dt, name=f"{name}_conv1")(h_in)
            h1 = BatchNorm(use_running_average=det, name=f"{name}_bn1")(h1)
            h1 = nn.relu(h1)
            h1 = Conv(ch, 3, 1, 1, dtype=dt, name=f"{name}_conv2")(h1)
            h1 = BatchNorm(use_running_average=det, name=f"{name}_bn2")(h1)
            h1 = nn.relu(h1)
            return h1 + h_in

        y = deblock(deup(y, x3_1, ed // 8, "DeUp4"), "DeBlock4")
        y = deblock(deup(y, x2_1, ed // 16, "DeUp3"), "DeBlock3")
        y = deblock(deup(y, x1_1, ed // 32, "DeUp2"), "DeBlock2")
        return Conv(self.num_classes, 1, name="endconv")(y.astype(jnp.float32))


def TransBTS(n_channels=2, num_classes=2, img_dim=144, dtype=None):
    """Factory matching the reference signature (ref :322-342)."""
    return TransBTSModel(
        n_channels=n_channels, num_classes=num_classes, img_dim=img_dim, dtype=dtype
    )
