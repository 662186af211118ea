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


class _PackedGroupNorm(nn.Module):
    """GroupNorm over the fine grid of an s2d packed tensor (same param
    names/shapes as ``flax.linen.GroupNorm`` so both executions share one
    checkpoint tree; ops/s2d.py::group_norm_relu_packed)."""

    num_groups: int = 8
    epsilon: float = 1e-5
    fuse_relu: bool = False
    shifted: bool = False
    packed_dims: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from hdenseformer_tpu.ops.s2d import _pdims, group_norm_relu_packed

        f = 2 ** len(_pdims(x.ndim - 2, self.packed_dims))
        c = x.shape[-1] // f
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_relu_packed(
            x, scale, bias, num_groups=self.num_groups, epsilon=self.epsilon,
            relu=self.fuse_relu, dims=self.packed_dims, shifted=self.shifted,
        )


class GroupNorm(nn.Module):
    """torch GroupNorm(8, C) equivalent, fp32 stats."""

    num_groups: int = 8
    epsilon: float = 1e-5
    packed: bool = False
    packed_dims: Optional[Tuple[int, ...]] = None
    shifted: bool = False
    fuse_relu: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.packed:
            return _PackedGroupNorm(
                num_groups=self.num_groups, epsilon=self.epsilon,
                fuse_relu=self.fuse_relu, shifted=self.shifted,
                packed_dims=self.packed_dims, name="GroupNorm_0",
            )(x)
        assert not self.shifted and not self.fuse_relu
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=jnp.float32
        )(x)


class EnBlock(nn.Module):
    """GN-ReLU-Conv x2 + residual (ref Unet_skipconnection.py:35-56).

    ``packed=True`` runs the block in the s2d packed layout with the
    shift-free conv pair: GN+ReLU (packed-plain) -> conv1 'out' (emits
    packed-SHIFTED) -> GN+ReLU (shifted, pad slots masked) -> conv2 'in'
    (back to packed-plain) -> + x. Same param tree as the fine path."""

    channels: int
    dtype: Optional[jnp.dtype] = None
    packed: bool = False
    packed_dims: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.packed:
            pd = self.packed_dims
            h = GroupNorm(packed=True, packed_dims=pd, fuse_relu=True,
                          name="bn1")(x)
            h = Conv(self.channels, 3, 1, 1, dtype=self.dtype, packed=True,
                     packed_shift="out", packed_dims=pd, name="conv1")(h)
            h = GroupNorm(packed=True, packed_dims=pd, fuse_relu=True,
                          shifted=True, name="bn2")(h)
            h = Conv(self.channels, 3, 1, 1, dtype=self.dtype, packed=True,
                     packed_shift="in", packed_dims=pd, name="conv2")(h)
            return h + x
        h = GroupNorm(name="bn1")(x)
        h = nn.relu(h)
        h = Conv(self.channels, 3, 1, 1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(name="bn2")(h)
        h = nn.relu(h)
        h = Conv(self.channels, 3, 1, 1, dtype=self.dtype, name="conv2")(h)
        return h + x


class UnetEncoder(nn.Module):
    """4-level encoder to 1/8 grid (ref Unet_skipconnection.py:71-111).

    ``pk`` selects s2d packing per level (None or a dims tuple for levels
    0..1, the 16/32-channel sub-MXU-lane levels): packed levels run the
    whole GN-ReLU-conv chain in packed space; the strided EnDown conv
    consumes packed-plain and emits the next level's (unpacked) fine
    grid (ops/s2d.py::conv_s2_packed). Returned skips are PACKED for
    packed levels (the decoder consumes them packed)."""

    base_channels: int = 16
    dropout: float = 0.2
    dtype: Optional[jnp.dtype] = None
    pk: Tuple[Optional[Tuple[int, ...]], ...] = (None, None)

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        from hdenseformer_tpu.ops.s2d import pack

        bc = self.base_channels
        pk0, pk1 = self.pk
        x = Conv(bc, 3, 1, 1, dtype=self.dtype, packed=pk0 is not None,
                 packed_dims=pk0, name="InitConv")(pack(x, pk0) if pk0 else x)
        # channel-wise (feature-map) dropout like torch dropout3d; in the
        # packed layout the per-channel mask tiles across parity blocks
        if train and self.dropout > 0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.dropout,
                (x.shape[0],) + (1,) * (x.ndim - 2) + (bc,),
            )
            if pk0 is not None:
                keep = jnp.tile(keep, (1,) * (x.ndim - 1) + (x.shape[-1] // bc,))
            x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)

        x1_1 = EnBlock(bc, self.dtype, packed=pk0 is not None,
                       packed_dims=pk0, name="EnBlock1")(x)
        h = Conv(bc * 2, 3, 2, 1, dtype=self.dtype, packed=pk0 is not None,
                 packed_dims=pk0, name="EnDown1")(x1_1)
        if pk1:
            h = pack(h, pk1)
        h = EnBlock(bc * 2, self.dtype, packed=pk1 is not None,
                    packed_dims=pk1, name="EnBlock2_1")(h)
        x2_1 = EnBlock(bc * 2, self.dtype, packed=pk1 is not None,
                       packed_dims=pk1, name="EnBlock2_2")(h)
        h = Conv(bc * 4, 3, 2, 1, dtype=self.dtype, packed=pk1 is not None,
                 packed_dims=pk1, name="EnDown2")(x2_1)
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
    # space-to-depth packed execution of the 16/32-channel levels
    # (ops/s2d.py — exact same math, MXU-aligned). None = auto: full-rank
    # pack levels 0 (16ch, full res) and 1 (32ch, 1/2) when their fine
    # grids are even (the same sub-128-lane profile where packing bought
    # 1.96-2.45x elsewhere, VERDICT r4 item 4). False = off. True =
    # force. A dict {level: True | dims-tuple} selects rank per level.
    s2d: Optional[bool] = None

    def _lvl_dims(self, lvl: int, sp: Tuple[int, ...]):
        nsp = len(sp)
        use = self.s2d if self.s2d is not None else True
        if isinstance(use, dict):
            spec = use.get(lvl, False)
        elif isinstance(use, (tuple, list)):
            spec = lvl in use
        else:
            spec = bool(use)
        if spec is False:
            return None
        dims = tuple(range(nsp)) if spec is True else tuple(spec)
        fine = [s // (2 ** lvl) for s in sp]
        ok = all(
            fine[i] > 0 and fine[i] % 2 == 0 and sp[i] % (2 ** lvl) == 0
            for i in dims
        )
        return dims if ok else None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        det = not train
        dt = self.dtype
        ed = self.embedding_dim
        sp = x.shape[1:-1]
        pk = (self._lvl_dims(0, sp), self._lvl_dims(1, sp))

        x1_1, x2_1, x3_1, h = UnetEncoder(16, 0.2, dt, pk, name="Unet")(x, train=train)
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

        def deup(h_in, skip, out_ch, name, dims=None):
            """1x1 squeeze + ConvTranspose(k2,s2) + skip concat + 1x1.

            ``dims`` (full-rank only): the upsample emits its fine output
            directly in the packed layout (a single matmul,
            ops/s2d.py::conv_transpose2_packed), the skip arrives packed
            from the encoder, and both 1x1 convs run as packed matmuls —
            zero fine-grid relayouts in the whole DeUp."""
            h1 = Conv(out_ch, 1, dtype=dt, name=f"{name}_conv1")(h_in)
            if dims is not None:
                from hdenseformer_tpu.ops.s2d import concat_packed

                h1 = ConvTranspose(out_ch, 2, 2, dtype=dt, packed_out=True,
                                   packed_dims=dims, name=f"{name}_conv2")(h1)
                h1 = concat_packed([skip, h1], dims)
                return Conv(out_ch, 1, dtype=dt, packed=True,
                            packed_dims=dims, name=f"{name}_conv3")(h1)
            h1 = ConvTranspose(out_ch, 2, 2, dtype=dt, name=f"{name}_conv2")(h1)
            h1 = jnp.concatenate([skip, h1], axis=-1)
            return Conv(out_ch, 1, dtype=dt, name=f"{name}_conv3")(h1)

        def deblock(h_in, name, dims=None):
            ch_f = 2 ** len(dims) if dims is not None else 1
            ch = h_in.shape[-1] // ch_f
            if dims is not None:
                h1 = Conv(ch, 3, 1, 1, dtype=dt, packed=True,
                          packed_shift="out", packed_dims=dims,
                          name=f"{name}_conv1")(h_in)
                h1 = BatchNorm(use_running_average=det, packed=True,
                               packed_dims=dims, shifted=True, fuse_relu=True,
                               name=f"{name}_bn1")(h1)
                h1 = Conv(ch, 3, 1, 1, dtype=dt, packed=True,
                          packed_shift="in", packed_dims=dims,
                          name=f"{name}_conv2")(h1)
                h1 = BatchNorm(use_running_average=det, packed=True,
                               packed_dims=dims, fuse_relu=True,
                               name=f"{name}_bn2")(h1)
                return h1 + h_in
            h1 = Conv(ch, 3, 1, 1, dtype=dt, name=f"{name}_conv1")(h_in)
            h1 = BatchNorm(use_running_average=det, name=f"{name}_bn1")(h1)
            h1 = nn.relu(h1)
            h1 = Conv(ch, 3, 1, 1, dtype=dt, name=f"{name}_conv2")(h1)
            h1 = BatchNorm(use_running_average=det, name=f"{name}_bn2")(h1)
            h1 = nn.relu(h1)
            return h1 + h_in

        # conv_transpose2_packed is full-rank only: a packed DeUp needs
        # its level packed over ALL spatial dims
        nsp = len(sp)
        pk_up = tuple(d if (d is not None and len(d) == nsp) else None for d in pk)
        y = deblock(deup(y, x3_1, ed // 8, "DeUp4"), "DeBlock4")
        from hdenseformer_tpu.ops.s2d import unpack

        if pk[1] is not None and pk_up[1] is None:
            x2_1 = unpack(x2_1, pk[1])  # partial-rank skip: consume fine
        y = deblock(deup(y, x2_1, ed // 16, "DeUp3", pk_up[1]), "DeBlock3", pk_up[1])
        if pk_up[1] is not None:
            y = unpack(y, pk_up[1])  # DeUp2's transpose reads the fine grid
        if pk[0] is not None and pk_up[0] is None:
            x1_1 = unpack(x1_1, pk[0])
        y = deblock(deup(y, x1_1, ed // 32, "DeUp2", pk_up[0]), "DeBlock2", pk_up[0])
        if pk_up[0] is not None:
            logits = Conv(self.num_classes, 1, packed=True,
                          packed_dims=pk_up[0], name="endconv")(
                y.astype(jnp.float32)
            )
            return unpack(logits, pk_up[0])
        return Conv(self.num_classes, 1, name="endconv")(y.astype(jnp.float32))


def TransBTS(n_channels=2, num_classes=2, img_dim=144, dtype=None, s2d=None):
    """Factory matching the reference signature (ref :322-342)."""
    return TransBTSModel(
        n_channels=n_channels, num_classes=num_classes, img_dim=img_dim,
        dtype=dtype, s2d=s2d,
    )
