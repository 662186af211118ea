"""Shared torch->flax weight mapping for HDenseFormer parity tests."""
import numpy as np


def t2j_conv(w):
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def t2j_convT(w):
    nd = w.ndim - 2
    w = np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))
    return np.flip(w, axis=tuple(range(nd))).copy()


def map_hdenseformer_weights(sd, params, in_ch: int, depth: int):
    """Copy a reference HDenseFormer state_dict into our param tree (in place)."""
    attns = params["attns"]

    def stack(fn):
        return np.stack([fn(m) for m in range(in_ch)])

    attns["patch_embed"]["kernel"] = stack(
        lambda m: t2j_conv(sd[f"attns.{m}.patch_embeddings.weight"])
    )
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
            blk[f"attn_{j}"]["to_qkv"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.1.fn.to_qkv.weight"].T)
            blk[f"attn_{j}"]["to_out"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.1.fn.to_out.0.weight"].T)
            blk[f"attn_{j}"]["to_out"]["bias"] = stack(
                lambda m: sd[f"attns.{m}.{base}.1.fn.to_out.0.bias"])
            blk[f"ff_norm_{j}"]["scale"] = stack(lambda m: sd[f"attns.{m}.{base}.2.norm.weight"])
            blk[f"ff_norm_{j}"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.2.norm.bias"])
            blk[f"ff_{j}"]["fc1"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.2.fn.net.0.weight"].T)
            blk[f"ff_{j}"]["fc1"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.2.fn.net.0.bias"])
            blk[f"ff_{j}"]["fc2"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.2.fn.net.3.weight"].T)
            blk[f"ff_{j}"]["fc2"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.2.fn.net.3.bias"])
        blk["out_layer"]["fc1"]["kernel"] = stack(
            lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.0.weight"].T)
        blk["out_layer"]["fc1"]["bias"] = stack(
            lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.0.bias"])
        blk["out_layer"]["fc2"]["kernel"] = stack(
            lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.3.weight"].T)
        blk["out_layer"]["fc2"]["bias"] = stack(
            lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.3.bias"])

    for name in ["deep_conv", "up1", "up2", "up3"]:
        params[name]["conv"]["kernel"] = t2j_conv(sd[f"{name}.double_conv.0.weight"])
        params[name]["conv"]["bias"] = sd[f"{name}.double_conv.0.bias"]

    for name in [f"block_{a}_{b}_{side}" for a in (1, 2, 3, 4) for b in (1, 2)
                 for side in ("left", "right") if not (a == 4 and side == "right")]:
        params[name]["conv"]["kernel"] = t2j_conv(sd[f"{name}.conv.weight"])
        params[name]["norm"]["scale"] = sd[f"{name}.norm.weight"]
        params[name]["norm"]["bias"] = sd[f"{name}.norm.bias"]

    for k in (1, 2, 3):
        params[f"upconv_{k}"]["kernel"] = t2j_convT(sd[f"upconv_{k}.weight"])
        params[f"upconv_{k}"]["bias"] = sd[f"upconv_{k}.bias"]

    for ours, theirs in [("head", "conv1x1"), ("head_d1", "conv1x1_d1"),
                         ("head_d2", "conv1x1_d2"), ("head_d3", "conv1x1_d3")]:
        params[ours]["kernel"] = t2j_conv(sd[f"{theirs}.weight"])
        params[ours]["bias"] = sd[f"{theirs}.bias"]
    return params
