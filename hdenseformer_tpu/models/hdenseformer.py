"""H-DenseFormer, dimension-generic (2D/3D), TPU-first flax implementation.

Architecture parity target: reference models/HDenseFormer.py (3D) and
models/HDenseFormer_2D.py (2D) — a hybrid CNN+transformer where each input
modality runs through a densely-connected transformer over 16^d-patch
tokens, whose multi-scale upsampled maps are *added* into a 4-level UNet
encoder, with a ConvTranspose decoder and 4 deep-supervision heads.

TPU-first design departures from the reference (same math, better mapping):
- One dimension-generic module serves 2D and 3D (the reference duplicates
  ~250 LoC per rank).
- The per-modality transformer paths (reference: Python loop over separate
  nn.Modules, models/HDenseFormer.py:230) are evaluated as ONE batched
  computation via ``nn.vmap`` with stacked per-modality parameters — the
  tiny per-modality matmuls (729 tokens x growth 32) fuse into larger MXU
  ops and compile once.
- Channels-last layout throughout; fp32 params with optional bf16 compute.
- Token re-gridding is a reshape (the reference's nearest interpolate at
  models/HDenseFormer.py:145 is an identity at matching sizes; we apply the
  same nearest resize only when shapes differ).

Deep-supervision output: list [full-res, 1/2, 1/4, 1/8] logits, channels
last — ordering identical to reference (models/HDenseFormer.py:246-255).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hdenseformer_tpu.models.layers import (
    BasicConv,
    Conv,
    ConvTranspose,
    Dense,
    LayerNorm,
    UpConv,
    gelu_exact,
)
from hdenseformer_tpu.ops.resize import max_pool, resize_nearest

Array = jax.Array


class DenseForward(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout (ref HDenseFormer.py:33-44)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class DenseAttention(nn.Module):
    """Multi-head self-attention at tiny width (ref HDenseFormer.py:47-75).

    dim=growth_rate(32), heads=8 => head_dim=4: bandwidth-bound, so the
    fp32 softmax is fused by XLA; a Pallas fused qkv+softmax+out kernel can
    be swapped in via ops/ once profitable (kernels are benchmark-gated).
    """

    dim: int
    heads: int = 8
    dim_head: int = 4
    dropout: float = 0.0
    use_pallas: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        from hdenseformer_tpu.ops.dense_attention import dense_attention

        inner = self.heads * self.dim_head
        b, n, _ = x.shape
        qkv = Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        out = dense_attention(q, k, v, use_pallas=self.use_pallas)
        out = out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, n, inner)
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        if project_out:
            out = Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class DensePreConvAttentionBlock(nn.Module):
    """Densely-connected attention block (ref HDenseFormer.py:78-101).

    Each of ``depth`` inner layers squeezes the concatenated feature list
    to growth_rate with a Linear, applies PreNorm attention and PreNorm
    DenseForward with residuals, and appends a fresh feature map.
    """

    out_channels: int
    growth_rate: int = 32
    depth: int = 4
    heads: int = 8
    dropout: float = 0.5
    use_pallas: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        g = self.growth_rate
        mlp_dim = g * 2
        features = [x]
        for i in range(self.depth):
            cat = jnp.concatenate(features, axis=-1)
            y = Dense(g, dtype=self.dtype, name=f"squeeze_{i}")(cat)
            attn_norm = LayerNorm(name=f"attn_norm_{i}")
            attn = DenseAttention(
                dim=g,
                heads=self.heads,
                dim_head=g // self.heads,
                dropout=self.dropout,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"attn_{i}",
            )
            y = attn(attn_norm(y), deterministic=deterministic) + y
            ff_norm = LayerNorm(name=f"ff_norm_{i}")
            ff = DenseForward(
                mlp_dim, g, dropout=self.dropout, dtype=self.dtype, name=f"ff_{i}"
            )
            y = ff(ff_norm(y), deterministic=deterministic) + y
            # the reference re-applies the same PreNorm'd FF to the updated
            # stream to produce the appended feature (HDenseFormer.py:98)
            features.append(ff(ff_norm(y), deterministic=deterministic))
            x = y
        cat = jnp.concatenate(features, axis=-1)
        return DenseForward(
            mlp_dim,
            self.out_channels,
            dropout=self.dropout,
            dtype=self.dtype,
            name="out_layer",
        )(cat, deterministic=deterministic)


class DenseTransformerBlock(nn.Module):
    """Patch-embed + dense transformer stack + token re-gridding.

    Ref HDenseFormer.py:104-145. ``image_size`` is the model's configured
    input spatial size (2- or 3-tuple); tokens live on the /patch grid.
    """

    out_channels: int
    image_size: Tuple[int, ...]
    patch_size: int = 16
    depth: int = 6  # number of outer dense blocks (= transformer_depth // 4)
    growth_rate: int = 32
    heads: int = 8
    dropout: float = 0.5
    use_pallas: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        grid = tuple(s // self.patch_size for s in self.image_size)
        num_patches = int(np.prod(grid))
        x = Conv(
            self.out_channels,
            self.patch_size,
            self.patch_size,
            padding=0,
            dtype=self.dtype,
            as_matmul=True,  # patchify == unfold + matmul (see Conv)
            name="patch_embed",
        )(x)
        b = x.shape[0]
        actual_grid = x.shape[1:-1]
        x = x.reshape(b, -1, self.out_channels)  # (B, N, C) row-major == torch flatten(2)
        pos = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (num_patches, self.out_channels),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)[None]
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        for i in range(self.depth):
            x = DensePreConvAttentionBlock(
                out_channels=self.out_channels,
                growth_rate=self.growth_rate,
                heads=self.heads,
                dropout=self.dropout,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic=deterministic)
        x = x.reshape(b, *actual_grid, self.out_channels)
        if actual_grid != grid:
            x = resize_nearest(x, grid)
        return x


class HDenseFormer(nn.Module):
    """Hybrid densely-connected transformer + UNet (ref HDenseFormer.py:177-255).

    Input  (N, *spatial, in_channels); output: list of 4 deep-supervision
    logits [(N, *spatial, n_cls), /2, /4, /8].
    """

    in_channels: int
    n_cls: int
    n_filters: int
    image_size: Tuple[int, ...] = (144, 144, 144)
    transformer_depth: int = 12
    dropout: float = 0.5
    use_pallas: Optional[bool] = None
    remat: bool = True
    dtype: Optional[jnp.dtype] = None
    # space-to-depth packed execution of the narrow-channel UNet levels
    # (ops/s2d.py — exact same math, MXU-aligned on TPU). None = auto:
    # 3D packs the <= 32-channel levels PARTIAL-RANK over (H, W) —
    # 32ch x 2^2 = exactly the 128 MXU lanes at 1.78x tap redundancy
    # (48/27), vs full-rank's 256 lanes at 2.37x (64/27). Measured
    # round-5 same-process A/B at 144^3 b1 depth24: partial (1,2)
    # 230.4 ms/step vs full-rank 267.6 (1.16x, baselines/
    # ab_r5_flagship.py); 2D keeps full-rank (both dims = 128 lanes).
    # Full-rank at 64ch loses (PARITY.md round-2) and last-dim
    # partial-rank at 64ch measured neutral (round-3/round-5 l1w), so
    # deeper levels stay fine. True = full-rank pack every even-dim
    # level with < 128 channels. False = off. A tuple of level indices
    # full-rank packs exactly those levels. A dict {level: True |
    # dims-tuple} selects the packing rank per level explicitly
    # (e.g. {0: True, 1: (2,)} = full at L0, last-dim partial at L1).
    s2d: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> list[Array]:
        det = not train
        nf = self.n_filters
        dt = self.dtype

        # space-to-depth packing decisions (see `s2d` field): a UNet level
        # runs packed when it is narrower than the 128 MXU lanes and the
        # packed dims of its fine grid are even.
        sp = x.shape[1:-1]
        nsp = len(sp)
        use_s2d = self.s2d if self.s2d is not None else True

        def lvl_dims(lvl: int):
            """None (fine grid) or the tuple of packed dims for a level."""
            ch = (2 ** lvl) * nf
            if isinstance(use_s2d, dict):
                spec = use_s2d.get(lvl, False)
            elif isinstance(use_s2d, (tuple, list)):
                spec = lvl in use_s2d  # explicit level selection, full rank
            elif self.s2d is None:
                # auto (measured v5e, see field comment): 3D partial-rank
                # (H, W) at <= 32ch — exactly 128 lanes; 2D full-rank
                spec = (
                    False if ch > 32
                    else ((1, 2) if nsp == 3 else True)
                )
            else:
                spec = bool(use_s2d)
            if spec is False or ch >= 128:
                return None
            dims = tuple(range(nsp)) if spec is True else tuple(spec)
            fine = [s // (2 ** lvl) for s in sp]
            ok = all(
                fine[i] > 0 and fine[i] % 2 == 0 and sp[i] % (2 ** lvl) == 0
                for i in dims
            )
            return dims if ok else None

        pk = [lvl_dims(i) for i in range(3)]
        # rematerialization: at 144^3 the stored conv activations exceed a
        # single chip's HBM for the backward pass at batch >= 2;
        # remat=True checkpoints every block (fits batch 2, ~2.8x step
        # time), remat="encoder" checkpoints only the encoder/up-path,
        # remat="levels" checkpoints only the two full/half-resolution
        # UNet levels (the 144^3/72^3 activations that dominate memory,
        # ~6% of the FLOPs recompute), remat=False stores everything
        # (fastest; fits batch 1 at 144^3 on 16GB).
        lvl_remat = self.remat == "levels"
        if self.remat is True:
            BasicConvM = BasicConvEnc = nn.remat(BasicConv)
            UpConvM = nn.remat(UpConv)
            ConvTransposeM = nn.remat(ConvTranspose)
            TransBlock = nn.remat(DenseTransformerBlock, static_argnums=(2,))
        elif self.remat == "encoder":
            BasicConvEnc = nn.remat(BasicConv)
            UpConvM = nn.remat(UpConv)
            TransBlock = nn.remat(DenseTransformerBlock, static_argnums=(2,))
            BasicConvM, ConvTransposeM = BasicConv, ConvTranspose
        else:  # False or "levels" (level selection happens per enc/dec level)
            BasicConvM = BasicConvEnc = BasicConv
            UpConvM, ConvTransposeM = UpConv, ConvTranspose
            TransBlock = DenseTransformerBlock

        # --- per-modality dense transformer paths, batched with vmap ------
        # (C_mod, N, *sp, 1): each modality through its own parameter bank,
        # evaluated as a single stacked computation.
        stacked = jnp.moveaxis(x, -1, 0)[..., None]
        VTrans = nn.vmap(
            TransBlock,
            in_axes=(0, None),
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        outs = VTrans(
            out_channels=4 * nf,
            image_size=self.image_size,
            patch_size=16,
            depth=self.transformer_depth // 4,
            dropout=self.dropout,
            use_pallas=self.use_pallas,
            dtype=dt,
            name="attns",
        )(stacked, det)
        # (C_mod, N, *g, 4nf) -> (N, *g, C_mod * 4nf), modality-major channels
        attnall = jnp.moveaxis(outs, 0, -2)
        attnall = attnall.reshape(attnall.shape[:-2] + (-1,))

        attnout = UpConvM(8 * nf, dtype=dt, name="deep_conv")(attnall)  # 1/8
        at1 = UpConvM(4 * nf, dtype=dt, name="up1")(attnout)  # 1/4
        # at2 feeds both up3 (fine-grid conv input) and the level-1 fusion
        # add, so it stays fine-grid; level 1's pack of it is a contiguous
        # reshape when pk[1] is last-dim-only. up3's full-resolution output
        # is only consumed by the level-0 fusion add: emit it packed
        # directly, skipping the fine-grid interpolation + repack.
        at2 = UpConvM(2 * nf, dtype=dt, name="up2")(at1)  # 1/2
        at3 = UpConvM(
            1 * nf, dtype=dt, packed_out=pk[0] is not None, packed_dims=pk[0],
            name="up3",
        )(at2)  # 1/1

        # --- UNet encoder with additive transformer fusion ----------------
        # Narrow-channel levels run space-to-depth packed (ops/s2d.py):
        # identical math in an MXU-aligned 8x-channel layout; maxpool is a
        # channel-axis max whose output is the next level's (unpacked)
        # fine grid. Levels with >= 128 channels are already lane-full.
        from hdenseformer_tpu.ops.s2d import concat_packed, max_pool_packed, pack, unpack

        def enc_level(h, ats, lvl, ch, n1, n2, ats_packed=False):
            """One encoder level: conv x2 (+transformer fusion), skip + pool.

            Packed levels run the shift-free conv pair: the first conv
            emits the half-SHIFTED layout, its norm masks the pad slots,
            and the second conv consumes it directly — zero shift
            materializations (ops/s2d.py::conv3_packed_p2s/_s2p)."""
            Blk = nn.remat(BasicConv) if (lvl_remat and lvl <= 1) else BasicConvEnc
            dims = pk[lvl]
            if dims:
                hp = pack(h, dims)
                d = Blk(ch, dtype=dt, packed=True, packed_dims=dims,
                        shift="out", name=n1)(hp)
                d = Blk(ch, dtype=dt, packed=True, packed_dims=dims,
                        shift="in", name=n2)(d)
                d = d + (ats if ats_packed else pack(ats, dims))
                return d, max_pool_packed(d, dims)
            d = Blk(ch, dtype=dt, name=n1)(h)
            d = Blk(ch, dtype=dt, name=n2)(d)
            d = d + ats
            return d, max_pool(d)

        ds0, h = enc_level(x, at3, 0, nf, "block_1_1_left", "block_1_2_left",
                           ats_packed=pk[0] is not None)
        ds1, h = enc_level(h, at2, 1, 2 * nf, "block_2_1_left", "block_2_2_left")
        ds2, h = enc_level(h, at1, 2, 4 * nf, "block_3_1_left", "block_3_2_left")
        y = BasicConvEnc(8 * nf, dtype=dt, name="block_4_1_left")(h)
        y = BasicConvEnc(8 * nf, dtype=dt, name="block_4_2_left")(y)
        y = y + attnout

        # --- decoder with deep-supervision heads --------------------------
        # heads read the bf16 activations directly and emit f32 via MXU
        # f32 accumulation (Conv.out_f32 / ops.s2d.conv1_packed) — an
        # explicit f32 cast of the full-resolution inputs cost a
        # materialized copy (round-3 trace, baselines/profile_notes.md)
        out3 = Conv(self.n_cls, 1, out_f32=True, name="head_d3")(y)

        def dec_level(y, skip, lvl, ch, up_name, n1, n2, head_name):
            """One decoder level: transposed-conv upsample, skip concat,
            conv x2, deep-supervision head. Returns (y_unpacked, head)."""
            sel = lvl_remat and lvl <= 1
            Blk = nn.remat(BasicConv) if sel else BasicConvM
            CT = nn.remat(ConvTranspose) if sel else ConvTransposeM
            dims = pk[lvl]
            if dims:
                up = CT(
                    ch, 3, 2, 1, 1, dtype=dt, packed_out=True,
                    packed_dims=dims, name=up_name,
                )(y)
                yd = concat_packed([up, skip], dims)
                yd = Blk(ch, dtype=dt, packed=True, packed_dims=dims,
                         shift="out", name=n1)(yd)
                yd = Blk(ch, dtype=dt, packed=True, packed_dims=dims,
                         shift="in", name=n2)(yd)
                head = unpack(
                    Conv(self.n_cls, 1, packed=True, packed_dims=dims,
                         name=head_name)(yd),
                    dims,
                )
                return unpack(yd, dims), head
            yd = jnp.concatenate(
                [CT(ch, 3, 2, 1, 1, dtype=dt, name=up_name)(y), skip],
                axis=-1,
            )
            yd = Blk(ch, dtype=dt, name=n1)(yd)
            yd = Blk(ch, dtype=dt, name=n2)(yd)
            head = Conv(self.n_cls, 1, out_f32=True, name=head_name)(yd)
            return yd, head

        y, out2 = dec_level(y, ds2, 2, 4 * nf, "upconv_3",
                            "block_3_1_right", "block_3_2_right", "head_d2")
        y, out1 = dec_level(y, ds1, 1, 2 * nf, "upconv_2",
                            "block_2_1_right", "block_2_2_right", "head_d1")
        y, out0 = dec_level(y, ds0, 0, nf, "upconv_1",
                            "block_1_1_right", "block_1_2_right", "head")
        return [out0, out1, out2, out3]


def HDenseFormer_32(in_channels, n_cls, image_size, transformer_depth, **kw):
    return HDenseFormer(
        in_channels=in_channels,
        n_cls=n_cls,
        n_filters=32,
        image_size=tuple(image_size),
        transformer_depth=transformer_depth,
        **kw,
    )


def HDenseFormer_16(in_channels, n_cls, image_size, transformer_depth, **kw):
    return HDenseFormer(
        in_channels=in_channels,
        n_cls=n_cls,
        n_filters=16,
        image_size=tuple(image_size),
        transformer_depth=transformer_depth,
        **kw,
    )


# 2D variants are the same module with a 2-tuple image size
def HDenseFormer_2D_32(in_channels, n_cls, image_size, transformer_depth, **kw):
    assert len(tuple(image_size)) == 2
    return HDenseFormer_32(in_channels, n_cls, image_size, transformer_depth, **kw)


def HDenseFormer_2D_16(in_channels, n_cls, image_size, transformer_depth, **kw):
    assert len(tuple(image_size)) == 2
    return HDenseFormer_16(in_channels, n_cls, image_size, transformer_depth, **kw)
