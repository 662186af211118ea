"""2D encoder-decoder baselines: unet / unet++ / deeplabv3+ with ResNet encoders.

Capability-equivalent of the reference's segmentation_models_pytorch usage
(trainer.py:704-739): same net_name/encoder_name strings, ResNet-18/50
encoders trained from scratch, optional aux classification head (smp
``aux_params={"classes": n-1}``), returning ``[masks, class_logits]``.

Architectural semantics follow the smp implementations:
- Unet decoder: x2 nearest upsample + skip concat + (conv3x3-BN-ReLU)x2,
  decoder channels (256,128,64,32,16);
- Unet++ : nested dense decoder grid over the same blocks;
- DeepLabV3+: output-stride-16 encoder (layer4 dilated), ASPP with rates
  (12,24,36) + image pooling, 1/4-skip through a 48-ch 1x1, separable
  3x3 fuse, x4 bilinear upsample head;
- aux head: global average pool + dropout + linear.

All channels-last flax; BatchNorm uses torch momentum/eps.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hdenseformer_tpu.models.layers import BatchNorm, Conv, Dense
from hdenseformer_tpu.ops.resize import max_pool, resize_linear, resize_nearest, upsample_linear

Array = jax.Array


class ConvBnRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.dilation * (self.kernel // 2)
        h = Conv(self.features, self.kernel, self.stride, pad, dilation=self.dilation,
                 use_bias=False, dtype=self.dtype, name="conv")(x)
        h = BatchNorm(use_running_average=not self.train, name="bn")(h)
        return nn.relu(h)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = Conv(self.features, 3, self.stride, self.dilation, dilation=self.dilation,
                 use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(use_running_average=not self.train, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(self.features, 3, 1, self.dilation, dilation=self.dilation,
                 use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(use_running_average=not self.train, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            res = Conv(self.features, 1, self.stride, 0, use_bias=False,
                       dtype=self.dtype, name="downsample_conv")(x)
            res = BatchNorm(use_running_average=not self.train, name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(h + res)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4*features
    stride: int = 1
    dilation: int = 1
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.features * 4
        h = Conv(self.features, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(use_running_average=not self.train, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(self.features, 3, self.stride, self.dilation, dilation=self.dilation,
                 use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(use_running_average=not self.train, name="bn2")(h)
        h = nn.relu(h)
        h = Conv(out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = BatchNorm(use_running_average=not self.train, name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            res = Conv(out_ch, 1, self.stride, 0, use_bias=False, dtype=self.dtype,
                       name="downsample_conv")(x)
            res = BatchNorm(use_running_average=not self.train, name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(h + res)


_RESNETS = {
    "resnet18": dict(block=BasicBlock, layers=(2, 2, 2, 2), widths=(64, 128, 256, 512), expansion=1),
    "resnet34": dict(block=BasicBlock, layers=(3, 4, 6, 3), widths=(64, 128, 256, 512), expansion=1),
    "resnet50": dict(block=Bottleneck, layers=(3, 4, 6, 3), widths=(64, 128, 256, 512), expansion=4),
}


class ResNetEncoder(nn.Module):
    """ResNet backbone returning smp-style pyramid features.

    Features: [input, conv1 (1/2), layer1 (1/4), layer2 (1/8),
    layer3 (1/16), layer4 (1/32 or dilated 1/16 for output_stride=16)].
    """

    encoder_name: str = "resnet18"
    output_stride: int = 32
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array):
        spec = _RESNETS[self.encoder_name]
        block_cls, layers, widths = spec["block"], spec["layers"], spec["widths"]
        feats = [x]
        h = Conv(64, 7, 2, 3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(use_running_average=not self.train, name="bn1")(h)
        h = nn.relu(h)
        feats.append(h)  # 1/2
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = max_pool(h, 3, 2)  # 1/4 with torch padding=1
        for stage, (n_blocks, width) in enumerate(zip(layers, widths)):
            stride = 1 if stage == 0 else 2
            dilation = 1
            if self.output_stride == 16 and stage == 3:
                stride, dilation = 1, 2
            for b in range(n_blocks):
                h = block_cls(
                    width,
                    stride=stride if b == 0 else 1,
                    dilation=dilation,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"layer{stage+1}_{b}",
                )(h)
            feats.append(h)
        return feats


class DecoderBlock(nn.Module):
    features: int
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, skip: Optional[Array] = None) -> Array:
        target = tuple(s * 2 for s in x.shape[1:-1])
        x = resize_nearest(x, target)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBnRelu(self.features, 3, train=self.train, dtype=self.dtype, name="conv1")(x)
        x = ConvBnRelu(self.features, 3, train=self.train, dtype=self.dtype, name="conv2")(x)
        return x


class ClassificationHead(nn.Module):
    classes: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pooled = jnp.mean(x, axis=(1, 2))
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        return Dense(self.classes, name="fc")(pooled.astype(jnp.float32))


class Unet2D(nn.Module):
    encoder_name: str = "resnet18"
    classes: int = 2
    aux_classes: Optional[int] = None
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        feats = ResNetEncoder(self.encoder_name, train=train, dtype=self.dtype,
                              name="encoder")(x)
        head_in = feats[-1]
        skips = feats[:-1][::-1]  # [1/16, 1/8, 1/4, 1/2, input]
        h = head_in
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) - 1 else None  # last block: no skip to raw input? smp uses None only beyond features
            # smp passes skips = features[1:-1][::-1] + None padding
            if i == len(self.decoder_channels) - 1:
                skip = None
            h = DecoderBlock(ch, train=train, dtype=self.dtype, name=f"decoder_{i}")(h, skip)
        masks = Conv(self.classes, 3, 1, 1, name="seg_head")(h.astype(jnp.float32))
        if self.aux_classes:
            labels = ClassificationHead(self.aux_classes, name="cls_head")(head_in, train)
            return [masks, labels]
        return masks


class UnetPlusPlus2D(nn.Module):
    encoder_name: str = "resnet18"
    classes: int = 2
    aux_classes: Optional[int] = None
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        feats = ResNetEncoder(self.encoder_name, train=train, dtype=self.dtype,
                              name="encoder")(x)
        head_in = feats[-1]
        # nested dense grid: x[i][j]; x[i][0] = encoder feature at depth i
        enc = feats[1:]  # depths 0..4 (1/2 .. 1/32)
        depth = len(enc) - 1
        grid = {(i, 0): enc[i] for i in range(len(enc))}
        for j in range(1, depth + 1):
            for i in range(depth - j + 1):
                below = grid[(i + 1, j - 1)]
                ups = resize_nearest(below, tuple(s * 2 for s in below.shape[1:-1]))
                cats = [grid[(i, k)] for k in range(j)] + [ups]
                h = jnp.concatenate(cats, axis=-1)
                ch = self.decoder_channels[depth - 1 - i] if depth - 1 - i < len(self.decoder_channels) else self.decoder_channels[-1]
                h = ConvBnRelu(ch, 3, train=train, dtype=self.dtype, name=f"x_{i}_{j}_c1")(h)
                h = ConvBnRelu(ch, 3, train=train, dtype=self.dtype, name=f"x_{i}_{j}_c2")(h)
                grid[(i, j)] = h
        top = grid[(0, depth)]
        top = resize_nearest(top, tuple(s * 2 for s in top.shape[1:-1]))
        top = ConvBnRelu(self.decoder_channels[-1], 3, train=train, dtype=self.dtype,
                         name="final_conv")(top)
        masks = Conv(self.classes, 3, 1, 1, name="seg_head")(top.astype(jnp.float32))
        if self.aux_classes:
            labels = ClassificationHead(self.aux_classes, name="cls_head")(head_in, train)
            return [masks, labels]
        return masks


class ASPP(nn.Module):
    features: int = 256
    rates: Tuple[int, ...] = (12, 24, 36)
    train: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        branches = [ConvBnRelu(self.features, 1, train=self.train, dtype=self.dtype,
                               name="b0")(x)]
        for i, r in enumerate(self.rates):
            branches.append(
                ConvBnRelu(self.features, 3, dilation=r, train=self.train,
                           dtype=self.dtype, name=f"b{i+1}")(x)
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBnRelu(self.features, 1, train=self.train, dtype=self.dtype,
                            name="pool_conv")(pooled)
        pooled = jnp.broadcast_to(pooled, x.shape[:-1] + (self.features,))
        branches.append(pooled)
        h = jnp.concatenate(branches, axis=-1)
        h = ConvBnRelu(self.features, 1, train=self.train, dtype=self.dtype,
                       name="project")(h)
        return h


class DeepLabV3Plus2D(nn.Module):
    encoder_name: str = "resnet18"
    classes: int = 2
    aux_classes: Optional[int] = None
    decoder_channels: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        feats = ResNetEncoder(self.encoder_name, output_stride=16, train=train,
                              dtype=self.dtype, name="encoder")(x)
        head_in = feats[-1]
        aspp = ASPP(self.decoder_channels, train=train, dtype=self.dtype,
                    name="aspp")(head_in)
        low = feats[2]  # 1/4
        low = ConvBnRelu(48, 1, train=train, dtype=self.dtype, name="low_proj")(low)
        aspp_up = resize_linear(aspp, low.shape[1:-1])
        h = jnp.concatenate([aspp_up, low], axis=-1)
        h = ConvBnRelu(self.decoder_channels, 3, train=train, dtype=self.dtype,
                       name="fuse1")(h)
        h = ConvBnRelu(self.decoder_channels, 3, train=train, dtype=self.dtype,
                       name="fuse2")(h)
        masks = Conv(self.classes, 1, name="seg_head")(h.astype(jnp.float32))
        masks = resize_linear(masks, x.shape[1:-1])
        if self.aux_classes:
            labels = ClassificationHead(self.aux_classes, name="cls_head")(head_in, train)
            return [masks, labels]
        return masks


def load_torch_resnet_encoder(variables, state_dict, encoder: str = "encoder"):
    """Port a torchvision/smp-format ResNet state dict (e.g. imagenet
    weights) into the flax encoder — the reference's
    ``ex_pre_trained -> encoder_weights='imagenet'`` path
    (trainer.py:706-739), done offline from a local checkpoint.

    ``state_dict`` maps torchvision names (``conv1.weight``, ``bn1.*``,
    ``layer{s}.{b}.conv{i}.weight``, ``layer{s}.{b}.downsample.{0,1}.*``)
    to arrays; extra keys (``fc.*``) are ignored. Conv kernels are
    transposed (O,I,kh,kw)->(kh,kw,I,O); BatchNorm running statistics go
    into the ``batch_stats`` collection. If the checkpoint's conv1 input
    width differs from the model's (imagenet RGB vs CT/PET channels), the
    kernel is channel-averaged and repeated, smp's ``patch_first_conv``
    adaptation. Returns a new ``variables`` dict.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    variables = dict(variables)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    enc_p, enc_s = params[encoder], stats[encoder]

    def conv_w(w):
        return np.transpose(w, (2, 3, 1, 0)).astype(np.float32)

    def set_bn(tree_p, tree_s, prefix):
        tree_p["BatchNorm_0"]["scale"] = sd[prefix + ".weight"].astype(np.float32)
        tree_p["BatchNorm_0"]["bias"] = sd[prefix + ".bias"].astype(np.float32)
        tree_s["BatchNorm_0"]["mean"] = sd[prefix + ".running_mean"].astype(np.float32)
        tree_s["BatchNorm_0"]["var"] = sd[prefix + ".running_var"].astype(np.float32)

    w = conv_w(sd["conv1.weight"])
    want = enc_p["conv1"]["kernel"].shape[2]
    if w.shape[2] != want:
        w = np.repeat(w.mean(axis=2, keepdims=True), want, axis=2)
    enc_p["conv1"]["kernel"] = w
    set_bn(enc_p["bn1"], enc_s["bn1"], "bn1")
    for key in enc_p:
        if not key.startswith("layer"):
            continue
        stage, b = key[len("layer"):].split("_")
        t = f"layer{stage}.{b}"
        blk_p, blk_s = enc_p[key], enc_s[key]
        for i in (1, 2, 3):
            if f"conv{i}" in blk_p:
                blk_p[f"conv{i}"]["kernel"] = conv_w(sd[f"{t}.conv{i}.weight"])
                set_bn(blk_p[f"bn{i}"], blk_s[f"bn{i}"], f"{t}.bn{i}")
        if "downsample_conv" in blk_p:
            blk_p["downsample_conv"]["kernel"] = conv_w(sd[f"{t}.downsample.0.weight"])
            set_bn(blk_p["downsample_bn"], blk_s["downsample_bn"], f"{t}.downsample.1")
    variables["params"] = params
    if stats:
        variables["batch_stats"] = stats
    return variables


def get_2d_net(net_name, encoder_name, in_channels, classes, aux_classes=None, dtype=None):
    del in_channels  # channels-last models infer input width
    if encoder_name not in _RESNETS:
        raise ValueError(f"unknown encoder {encoder_name!r}; options {sorted(_RESNETS)}")
    if net_name == "unet":
        return Unet2D(encoder_name, classes, aux_classes, dtype=dtype)
    if net_name == "unet++":
        return UnetPlusPlus2D(encoder_name, classes, aux_classes, dtype=dtype)
    if net_name == "deeplabv3+":
        return DeepLabV3Plus2D(encoder_name, classes, aux_classes, dtype=dtype)
    raise ValueError(f"unknown 2d net {net_name!r}")
