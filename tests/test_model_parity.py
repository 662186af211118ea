"""Weight-copy forward parity vs the reference torch implementations.

Complements test_hdenseformer.py's flagship parity: DAUNet, Hecktor20Top1
and the 2D HDenseFormer are built in torch (reference, read-only import),
weights are mapped into the flax trees, and outputs compared in eval mode.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_util import reference_available, add_reference_to_path

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _t2j_conv(w):
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def _t2j_convT(w):
    nd = w.ndim - 2
    w = np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))
    return np.flip(w, axis=tuple(range(nd))).copy()


def _cl(x_nchw):
    return jnp.asarray(np.moveaxis(x_nchw, 1, -1))


def _nchw(x_cl):
    return np.moveaxis(np.asarray(x_cl), -1, 1)


@needs_ref
def test_hecktor20top1_parity():
    add_reference_to_path()
    from models.Hecktor20Top1.model import FastSmoothSENormDeepUNet_supervision_skip_no_drop as RefNet

    from hdenseformer_tpu.models.hecktor20top1 import Hecktor20Top1

    torch.manual_seed(0)
    nf = 4
    ref = RefNet(in_channels=2, n_cls=2, n_filters=nf).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # torch-parity pins the fine path; packed(s2d)-vs-fine equivalence has
    # its own test (test_packed_bn.py::test_hecktor_s2d_matches_fine)
    model = Hecktor20Top1(in_channels=2, n_cls=2, n_filters=nf, s2d=False)
    x = jnp.zeros((1, 32, 32, 32, 2))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    def load_senorm_conv(tree, prefix):
        tree["conv"]["kernel"] = _t2j_conv(sd[f"{prefix}.conv.weight"])
        tree["conv"]["bias"] = sd[f"{prefix}.conv.bias"]
        for gw in ("gamma", "beta"):
            tree["norm"][gw]["conv1"]["kernel"] = _t2j_conv(sd[f"{prefix}.norm.{gw}.conv1.weight"])
            tree["norm"][gw]["conv1"]["bias"] = sd[f"{prefix}.norm.{gw}.conv1.bias"]
            tree["norm"][gw]["conv2"]["kernel"] = _t2j_conv(sd[f"{prefix}.norm.{gw}.conv2.weight"])
            tree["norm"][gw]["conv2"]["bias"] = sd[f"{prefix}.norm.{gw}.conv2.bias"]

    # residual encoder blocks
    for lvl, blocks in [(1, 2), (2, 3), (3, 3), (4, 3), (5, 3)]:
        for b in range(1, blocks + 1):
            name = f"block_{lvl}_{b}_left"
            load_senorm_conv(params[name]["conv1"], f"{name}.conv1")
            if f"{name}.res_conv.conv.weight" in sd:
                load_senorm_conv(params[name]["res_conv"], f"{name}.res_conv")
    # decoder
    for k in (1, 2, 3, 4):
        params[f"upconv_{k}"]["kernel"] = _t2j_convT(sd[f"upconv_{k}.weight"])
        params[f"upconv_{k}"]["bias"] = sd[f"upconv_{k}.bias"]
    for lvl, blocks in [(1, 2), (2, 2), (3, 2), (4, 2)]:
        for b in range(1, blocks + 1):
            name = f"block_{lvl}_{b}_right"
            load_senorm_conv(params[name], name)
    for v in (2, 3, 4):
        load_senorm_conv(params[f"vision_{v}"]["conv"], f"vision_{v}.conv")
    params["conv1x1"]["kernel"] = _t2j_conv(sd["conv1x1.weight"])
    params["conv1x1"]["bias"] = sd["conv1x1.bias"]

    rng = np.random.RandomState(1)
    xin = rng.randn(1, 2, 32, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(xin)).numpy()
    got = _nchw(model.apply({"params": params}, _cl(xin)))
    # fp accumulation through 13 SE-norm blocks + x8 trilinear upsample
    # leaves ~1% of logits within 1e-3 absolute; structural mismatches
    # would be O(1) everywhere.
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=1.5e-3)


@needs_ref
def test_daunet_parity():
    add_reference_to_path()
    from models.DAUNet import da_unet as ref_da_unet

    from hdenseformer_tpu.models.daunet import da_unet

    torch.manual_seed(0)
    size = 32
    ref = ref_da_unet(init_depth=size, n_channels=1, n_classes=2).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}

    model = da_unet(init_depth=size, n_channels=1, n_classes=2)
    x = jnp.zeros((1, size, size, size, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    batch_stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def load_bn(ptree, btree, prefix):
        # our BatchNorm nests a flax BatchNorm module named 'BatchNorm_0'
        inner_p = ptree["BatchNorm_0"]
        inner_b = btree["BatchNorm_0"]
        inner_p["scale"] = sd[f"{prefix}.weight"]
        inner_p["bias"] = sd[f"{prefix}.bias"]
        inner_b["mean"] = sd[f"{prefix}.running_mean"]
        inner_b["var"] = sd[f"{prefix}.running_var"]

    def load_double(pname, bname, ref_prefix, conv_names=("conv1", "conv2"),
                    bn_names=("bn1", "bn2"), da=False):
        pt, bt = params[pname], batch_stats[pname]
        for cn, refc in zip(("conv1", "conv2"), conv_names):
            pt[cn]["kernel"] = _t2j_conv(sd[f"{ref_prefix}.{refc}.weight"])
            pt[cn]["bias"] = sd[f"{ref_prefix}.{refc}.bias"]
        for bn, refb in zip(("bn1", "bn2"), bn_names):
            load_bn(pt[bn], bt[bn], f"{ref_prefix}.{refb}")
        if da:
            pt["da"]["fc1"]["kernel"] = sd[f"{ref_prefix}.da.fc.0.weight"].T
            pt["da"]["fc1"]["bias"] = sd[f"{ref_prefix}.da.fc.0.bias"]
            pt["da"]["fc2"]["kernel"] = sd[f"{ref_prefix}.da.fc.2.weight"].T
            pt["da"]["fc2"]["bias"] = sd[f"{ref_prefix}.da.fc.2.bias"]

    # stem: plain DoubleConv (Sequential indices 0,3 convs / 1,4 bns)
    pt, bt = params["inc"], batch_stats["inc"]
    pt["conv1"]["kernel"] = _t2j_conv(sd["inc.double_conv.0.weight"])
    pt["conv1"]["bias"] = sd["inc.double_conv.0.bias"]
    pt["conv2"]["kernel"] = _t2j_conv(sd["inc.double_conv.3.weight"])
    pt["conv2"]["bias"] = sd["inc.double_conv.3.bias"]
    load_bn(pt["bn1"], bt["bn1"], "inc.double_conv.1")
    load_bn(pt["bn2"], bt["bn2"], "inc.double_conv.4")

    for k in (1, 2, 3, 4):
        load_double(f"down{k}", None, f"down{k}.maxpool_conv.1", da=True)
        load_double(f"up{k}", None, f"up{k}.conv", da=True)
    params["outc"]["kernel"] = _t2j_conv(sd["outc.conv.weight"])
    params["outc"]["bias"] = sd["outc.conv.bias"]

    rng = np.random.RandomState(3)
    xin = rng.randn(1, 1, size, size, size).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(xin)).numpy()
    got = _nchw(
        model.apply({"params": params, "batch_stats": batch_stats}, _cl(xin))
    )
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=5e-4)


@needs_ref
def test_hdenseformer_2d_parity():
    add_reference_to_path()
    from models.HDenseFormer_2D import HDenseFormer_2D as Ref2D

    from hdenseformer_tpu.models.hdenseformer import HDenseFormer

    torch.manual_seed(0)
    in_ch, nf, depth = 3, 4, 8
    size = (32, 32)
    ref = Ref2D(in_channels=in_ch, n_cls=2, n_filters=nf, image_size=size,
                transformer_depth=depth).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = HDenseFormer(in_channels=in_ch, n_cls=2, n_filters=nf,
                         image_size=size, transformer_depth=depth)
    x = jnp.zeros((1,) + size + (in_ch,))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    attns = params["attns"]

    def stack(fn):
        return np.stack([fn(m) for m in range(in_ch)])

    attns["patch_embed"]["kernel"] = stack(
        lambda m: _t2j_conv(sd[f"attns.{m}.patch_embeddings.weight"]))
    attns["patch_embed"]["bias"] = stack(lambda m: sd[f"attns.{m}.patch_embeddings.bias"])
    attns["pos_embed"] = stack(lambda m: sd[f"attns.{m}.position_embeddings"][0])
    for i in range(depth // 4):
        blk = attns[f"block_{i}"]
        for j in range(4):
            base = f"blocks.{i}.0.layers.{j}"
            blk[f"squeeze_{j}"]["kernel"] = stack(lambda m: sd[f"attns.{m}.{base}.0.weight"].T)
            blk[f"squeeze_{j}"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.0.bias"])
            blk[f"attn_norm_{j}"]["scale"] = stack(lambda m: sd[f"attns.{m}.{base}.1.norm.weight"])
            blk[f"attn_norm_{j}"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.1.norm.bias"])
            blk[f"attn_{j}"]["to_qkv"]["kernel"] = stack(lambda m: sd[f"attns.{m}.{base}.1.fn.to_qkv.weight"].T)
            blk[f"attn_{j}"]["to_out"]["kernel"] = stack(lambda m: sd[f"attns.{m}.{base}.1.fn.to_out.0.weight"].T)
            blk[f"attn_{j}"]["to_out"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.1.fn.to_out.0.bias"])
            blk[f"ff_norm_{j}"]["scale"] = stack(lambda m: sd[f"attns.{m}.{base}.2.norm.weight"])
            blk[f"ff_norm_{j}"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.2.norm.bias"])
            blk[f"ff_{j}"]["fc1"]["kernel"] = stack(lambda m: sd[f"attns.{m}.{base}.2.fn.net.0.weight"].T)
            blk[f"ff_{j}"]["fc1"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.2.fn.net.0.bias"])
            blk[f"ff_{j}"]["fc2"]["kernel"] = stack(lambda m: sd[f"attns.{m}.{base}.2.fn.net.3.weight"].T)
            blk[f"ff_{j}"]["fc2"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.2.fn.net.3.bias"])
        blk["out_layer"]["fc1"]["kernel"] = stack(lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.0.weight"].T)
        blk["out_layer"]["fc1"]["bias"] = stack(lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.0.bias"])
        blk["out_layer"]["fc2"]["kernel"] = stack(lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.3.weight"].T)
        blk["out_layer"]["fc2"]["bias"] = stack(lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.3.bias"])

    for name in ["deep_conv", "up1", "up2", "up3"]:
        params[name]["conv"]["kernel"] = _t2j_conv(sd[f"{name}.double_conv.0.weight"])
        params[name]["conv"]["bias"] = sd[f"{name}.double_conv.0.bias"]
    for name in [f"block_{a}_{b}_{side}" for a in (1, 2, 3, 4) for b in (1, 2)
                 for side in ("left", "right") if not (a == 4 and side == "right")]:
        params[name]["conv"]["kernel"] = _t2j_conv(sd[f"{name}.conv.weight"])
        params[name]["norm"]["scale"] = sd[f"{name}.norm.weight"]
        params[name]["norm"]["bias"] = sd[f"{name}.norm.bias"]
    for k in (1, 2, 3):
        params[f"upconv_{k}"]["kernel"] = _t2j_convT(sd[f"upconv_{k}.weight"])
        params[f"upconv_{k}"]["bias"] = sd[f"upconv_{k}.bias"]
    for ours, theirs in [("head", "conv1x1"), ("head_d1", "conv1x1_d1"),
                         ("head_d2", "conv1x1_d2"), ("head_d3", "conv1x1_d3")]:
        params[ours]["kernel"] = _t2j_conv(sd[f"{theirs}.weight"])
        params[ours]["bias"] = sd[f"{theirs}.bias"]

    rng = np.random.RandomState(2)
    xin = rng.randn(1, in_ch, *size).astype(np.float32)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in ref(torch.from_numpy(xin))]
    got_outs = model.apply({"params": params}, _cl(xin))
    for r, g in zip(ref_outs, got_outs):
        np.testing.assert_allclose(_nchw(g), r, rtol=2e-3, atol=2e-4)


@needs_ref
def test_transbts_parity():
    add_reference_to_path()
    from models.TransBTS.TransBTS_downsample8x_skipconnection import TransBTS as RefFactory

    from hdenseformer_tpu.models.transbts import TransBTSModel

    torch.manual_seed(0)
    img_dim = 32
    _, ref = RefFactory(n_channels=2, num_classes=2, img_dim=img_dim,
                        _conv_repr=True, _pe_type="learned")
    ref = ref.eval()
    # the reference's InitConv calls F.dropout3d with torch's functional
    # default training=True, i.e. dropout stays ACTIVE in eval
    # (Unet_skipconnection.py:30) — a documented bug we gate on `train`.
    # Disable it for a deterministic comparison.
    ref.Unet.InitConv.dropout = 0.0
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}

    model = TransBTSModel(n_channels=2, num_classes=2, img_dim=img_dim)
    x = jnp.zeros((1, img_dim, img_dim, img_dim, 2))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    bstats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def bn(ptree, btree, prefix):
        inner_p = ptree["BatchNorm_0"]
        inner_b = btree["BatchNorm_0"]
        inner_p["scale"] = sd[f"{prefix}.weight"]
        inner_p["bias"] = sd[f"{prefix}.bias"]
        inner_b["mean"] = sd[f"{prefix}.running_mean"]
        inner_b["var"] = sd[f"{prefix}.running_var"]

    def gn(tree, prefix):
        tree["GroupNorm_0"]["scale"] = sd[f"{prefix}.weight"]
        tree["GroupNorm_0"]["bias"] = sd[f"{prefix}.bias"]

    def conv(tree, prefix):
        tree["kernel"] = _t2j_conv(sd[f"{prefix}.weight"])
        if f"{prefix}.bias" in sd:
            tree["bias"] = sd[f"{prefix}.bias"]

    # UNet encoder
    U = params["Unet"]
    conv(U["InitConv"], "Unet.InitConv.conv")
    enblocks = (["EnBlock1", "EnBlock2_1", "EnBlock2_2", "EnBlock3_1", "EnBlock3_2"]
                + [f"EnBlock4_{i}" for i in range(1, 5)])
    for name in enblocks:
        gn(U[name]["bn1"], f"Unet.{name}.bn1")
        gn(U[name]["bn2"], f"Unet.{name}.bn2")
        conv(U[name]["conv1"], f"Unet.{name}.conv1")
        conv(U[name]["conv2"], f"Unet.{name}.conv2")
    for k in (1, 2, 3):
        conv(U[f"EnDown{k}"], f"Unet.EnDown{k}.conv")

    # bottleneck
    bn(params["bn"], bstats["bn"], "bn")
    conv(params["conv_x"], "conv_x")
    params["position_embeddings"] = sd["position_encoding.position_embeddings"][0]
    for i in range(4):
        base_a = f"transformer.net.{2*i}.fn.fn"       # Residual(PreNormDrop(attn))
        base_f = f"transformer.net.{2*i+1}.fn.fn"     # Residual(PreNorm(ff))
        params[f"attn_norm_{i}"]["scale"] = sd[f"transformer.net.{2*i}.fn.norm.weight"]
        params[f"attn_norm_{i}"]["bias"] = sd[f"transformer.net.{2*i}.fn.norm.bias"]
        params[f"attn_{i}"]["qkv"]["kernel"] = sd[f"{base_a}.qkv.weight"].T
        params[f"attn_{i}"]["proj"]["kernel"] = sd[f"{base_a}.proj.weight"].T
        params[f"attn_{i}"]["proj"]["bias"] = sd[f"{base_a}.proj.bias"]
        params[f"ff_norm_{i}"]["scale"] = sd[f"transformer.net.{2*i+1}.fn.norm.weight"]
        params[f"ff_norm_{i}"]["bias"] = sd[f"transformer.net.{2*i+1}.fn.norm.bias"]
        params[f"ff_fc1_{i}"]["kernel"] = sd[f"{base_f}.net.0.weight"].T
        params[f"ff_fc1_{i}"]["bias"] = sd[f"{base_f}.net.0.bias"]
        params[f"ff_fc2_{i}"]["kernel"] = sd[f"{base_f}.net.3.weight"].T
        params[f"ff_fc2_{i}"]["bias"] = sd[f"{base_f}.net.3.bias"]

    # decoder
    for blk, our in [("Enblock8_1", "Enblock8_1"), ("Enblock8_2", "Enblock8_2")]:
        conv(params[f"{our}_conv1"], f"{blk}.conv1")
        conv(params[f"{our}_conv2"], f"{blk}.conv2")
        bn(params[f"{our}_bn1"], bstats[f"{our}_bn1"], f"{blk}.bn1")
        bn(params[f"{our}_bn2"], bstats[f"{our}_bn2"], f"{blk}.bn2")
    for k in (4, 3, 2):
        conv(params[f"DeUp{k}_conv1"], f"DeUp{k}.conv1")
        params[f"DeUp{k}_conv2"]["kernel"] = _t2j_convT(sd[f"DeUp{k}.conv2.weight"])
        params[f"DeUp{k}_conv2"]["bias"] = sd[f"DeUp{k}.conv2.bias"]
        conv(params[f"DeUp{k}_conv3"], f"DeUp{k}.conv3")
        conv(params[f"DeBlock{k}_conv1"], f"DeBlock{k}.conv1")
        conv(params[f"DeBlock{k}_conv2"], f"DeBlock{k}.conv2")
        bn(params[f"DeBlock{k}_bn1"], bstats[f"DeBlock{k}_bn1"], f"DeBlock{k}.bn1")
        bn(params[f"DeBlock{k}_bn2"], bstats[f"DeBlock{k}_bn2"], f"DeBlock{k}.bn2")
    conv(params["endconv"], "endconv")

    rng = np.random.RandomState(4)
    xin = rng.randn(1, 2, img_dim, img_dim, img_dim).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(xin)).numpy()
    got = _nchw(model.apply({"params": params, "batch_stats": bstats}, _cl(xin)))
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=1e-3)
