"""UNETR: ViT encoder with UNet-style decoder taps (Hatamizadeh et al.).

Parity target: reference models/UNETR.py (a MONAI-based UNETR: 12-layer
ViT, hidden 768 / mlp 3072 / 12 heads / 16^3 patches, perceptron patch
embedding, skip taps at ViT layers 3/6/9, UnetrBasic/PrUp/Up decoder
blocks with residual conv blocks, instance norm). The MONAI blocks are
re-implemented in flax (channels-last):
- ``UnetResBlock``: conv(bias=False)-IN(affine)-leakyrelu(0.01) x2 + 1x1
  residual (monai 0.6-era dynunet_block semantics, the monai generation
  the reference's UNETR import comes from — its get_norm_layer passes
  affine=True for 'instance');
- ``UnetrPrUpBlock`` with conv_block=False (the reference's setting,
  models/UNETR.py:104-139): a plain ladder of ConvTranspose(k2,s2,
  bias=False) — res_block is ignored when conv_block is False;
- ``UnetrUpBlock``: ConvTranspose(bias=False) + skip concat + res block;
- ViT 'perceptron' patch embedding = non-overlapping patch flatten in
  (p1 p2 p3 c) order + Linear, learned pos-emb (trunc-normal 0.02),
  qkv projection bias-free, out-proj/MLP with bias, exact GELU.

Numerically verified by weight-copy forward parity against an in-test
torch oracle restating the monai block math (tests/test_unetr_parity.py).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hdenseformer_tpu.models.layers import Conv, ConvTranspose, Dense, InstanceNorm, LayerNorm, gelu_exact

Array = jax.Array


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class UnetResBlock(nn.Module):
    """conv-IN-lrelu x2 with 1x1 residual (monai dynunet_block semantics)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = self.kernel_size // 2
        h = Conv(self.out_channels, self.kernel_size, self.stride, p,
                 use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = InstanceNorm(affine=True, name="norm1")(h)
        h = _leaky(h)
        h = Conv(self.out_channels, self.kernel_size, 1, p,
                 use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = InstanceNorm(affine=True, name="norm2")(h)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            res = Conv(self.out_channels, 1, self.stride, 0,
                       use_bias=False, dtype=self.dtype, name="conv3")(x)
            res = InstanceNorm(affine=True, name="norm3")(res)
        else:
            res = x
        return _leaky(h + res)


class ViTBlock(nn.Module):
    hidden: int
    mlp_dim: int
    heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, n, c = x.shape
        hd = self.hidden // self.heads
        h = LayerNorm(name="norm1")(x)
        qkv = Dense(self.hidden * 3, use_bias=False, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * hd**-0.5, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = Dense(self.hidden, dtype=self.dtype, name="proj")(out)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(out)
        h = LayerNorm(name="norm2")(x)
        h = Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class UNETR(nn.Module):
    """UNETR (ref models/UNETR.py:21-218), channels-last, list-free output."""

    in_channels: int
    out_channels: int
    img_size: Tuple[int, ...] = (96, 96, 96)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        det = not train
        dt = self.dtype
        fs = self.feature_size
        patch = 16
        nsp = x.ndim - 2
        grid = tuple(s // patch for s in x.shape[1:-1])
        b = x.shape[0]

        # perceptron patch embedding: (16^d * C) -> hidden
        # (monai rearrange 'b c (h p1) (w p2) (d p3) -> b (h w d) (p1 p2 p3 c)')
        h = x
        for axis in range(nsp):
            pos = 1 + 2 * axis  # each split inserts an axis before the next
            h = h.reshape(
                h.shape[:pos] + (h.shape[pos] // patch, patch) + h.shape[pos + 1:]
            )
        # (B, g0, p, g1, p, g2, p, C) -> (B, g0, g1, g2, p, p, p, C)
        perm = (
            [0]
            + [1 + 2 * i for i in range(nsp)]
            + [2 + 2 * i for i in range(nsp)]
            + [1 + 2 * nsp]
        )
        h = h.transpose(perm)
        tokens = h.reshape(b, int(np.prod(grid)), patch**nsp * self.in_channels)
        tokens = Dense(self.hidden_size, dtype=dt, name="patch_embed")(tokens)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (tokens.shape[1], self.hidden_size),
            jnp.float32,
        )
        tokens = tokens + pos.astype(tokens.dtype)[None]
        tokens = nn.Dropout(self.dropout_rate, deterministic=det)(tokens)

        hidden_states = []
        for i in range(self.num_layers):
            tokens = ViTBlock(
                self.hidden_size, self.mlp_dim, self.num_heads,
                self.dropout_rate, dt, name=f"vit_{i}",
            )(tokens, deterministic=det)
            hidden_states.append(tokens)
        vit_out = LayerNorm(name="vit_norm")(tokens)

        def proj(t):
            return t.reshape(b, *grid, self.hidden_size)

        enc1 = UnetResBlock(fs, dtype=dt, name="encoder1")(x)

        def prup(t, out_ch, num_layer, name):
            # conv_block=False (ref models/UNETR.py:104-139): the ladder is
            # transp_conv_init + num_layer plain transposed convs, no
            # conv/res blocks; dynunet get_conv_layer convs carry no bias.
            h2 = ConvTranspose(out_ch, 2, 2, use_bias=False, dtype=dt,
                               name=f"{name}_up0")(t)
            for j in range(num_layer):
                h2 = ConvTranspose(out_ch, 2, 2, use_bias=False, dtype=dt,
                                   name=f"{name}_up{j+1}")(h2)
            return h2

        enc2 = prup(proj(hidden_states[3]), fs * 2, 2, "encoder2")
        enc3 = prup(proj(hidden_states[6]), fs * 4, 1, "encoder3")
        enc4 = prup(proj(hidden_states[9]), fs * 8, 0, "encoder4")

        def up(t, skip, out_ch, name):
            h2 = ConvTranspose(out_ch, 2, 2, use_bias=False, dtype=dt,
                               name=f"{name}_up")(t)
            h2 = jnp.concatenate([h2, skip], axis=-1)
            return UnetResBlock(out_ch, dtype=dt, name=f"{name}_res")(h2)

        dec4 = proj(vit_out)
        dec3 = up(dec4, enc4, fs * 8, "decoder5")
        dec2 = up(dec3, enc3, fs * 4, "decoder4")
        dec1 = up(dec2, enc2, fs * 2, "decoder3")
        out = up(dec1, enc1, fs, "decoder2")
        return Conv(self.out_channels, 1, name="out")(out.astype(jnp.float32))
