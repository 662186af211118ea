"""UNETR weight-copy forward parity vs an in-test torch oracle.

The reference's UNETR (models/UNETR.py:21-218) builds on monai's ViT and
Unetr{Basic,PrUp,Up}Block / UnetOutBlock. monai is not available in this
environment, so the oracle below RESTATES the monai block math in plain
torch, following the monai-0.6-era dynunet semantics the reference's
import generation uses:

- ViT 'perceptron' patch embedding: rearrange
  ``b c (h p1) (w p2) (d p3) -> b (h w d) (p1 p2 p3 c)`` + Linear(+bias),
  learned position embeddings, no cls token (classification=False);
- TransformerBlock: x += SABlock(LN(x)); x += MLP(LN(x)); SABlock qkv
  Linear bias-free with feature layout (qkv, heads, head_dim), scale
  head_dim**-0.5, out-proj Linear with bias; MLP Linear-GELU(exact)-Linear;
  final LayerNorm; hidden-state taps AFTER blocks 3/6/9
  (reference models/UNETR.py:203-218);
- UnetResBlock: conv3(bias=False)-IN(affine=True)-lrelu(0.01), conv3-IN,
  1x1(bias=False)+IN residual when channels change, lrelu after add;
- UnetrPrUpBlock with conv_block=False (the reference's setting): plain
  ConvTranspose3d(k2,s2,bias=False) ladder;
- UnetrUpBlock: ConvTranspose3d(k2,s2,bias=False), concat(up, skip),
  UnetResBlock;
- UnetOutBlock: 1x1x1 conv WITH bias.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from test_model_parity import _t2j_conv, _t2j_convT, _cl, _nchw


class OracleSABlock(tnn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.heads = heads
        self.hd = hidden // heads
        self.qkv = tnn.Linear(hidden, hidden * 3, bias=False)
        self.out_proj = tnn.Linear(hidden, hidden)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, self.hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.einsum("bhid,bhjd->bhij", q, k) * self.hd**-0.5
        att = att.softmax(dim=-1)
        y = torch.einsum("bhij,bhjd->bhid", att, v)
        y = y.permute(0, 2, 1, 3).reshape(b, n, c)
        return self.out_proj(y)


class OracleViTBlock(tnn.Module):
    def __init__(self, hidden, mlp_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(hidden)
        self.attn = OracleSABlock(hidden, heads)
        self.norm2 = tnn.LayerNorm(hidden)
        self.fc1 = tnn.Linear(hidden, mlp_dim)
        self.fc2 = tnn.Linear(mlp_dim, hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.fc2(tnn.functional.gelu(self.fc1(self.norm2(x))))
        return x + h


class OracleResBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv3d(cin, cout, 3, 1, 1, bias=False)
        self.norm1 = tnn.InstanceNorm3d(cout, affine=True)
        self.conv2 = tnn.Conv3d(cout, cout, 3, 1, 1, bias=False)
        self.norm2 = tnn.InstanceNorm3d(cout, affine=True)
        self.downsample = cin != cout
        if self.downsample:
            self.conv3 = tnn.Conv3d(cin, cout, 1, 1, 0, bias=False)
            self.norm3 = tnn.InstanceNorm3d(cout, affine=True)
        self.lrelu = tnn.LeakyReLU(0.01)

    def forward(self, x):
        out = self.lrelu(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        res = self.norm3(self.conv3(x)) if self.downsample else x
        return self.lrelu(out + res)


class OracleUNETR(tnn.Module):
    def __init__(self, cin, cout, img=(32, 32, 32), fs=8, hidden=48, mlp=96, heads=6):
        super().__init__()
        self.patch = 16
        self.hidden = hidden
        self.grid = tuple(s // self.patch for s in img)
        n_tok = int(np.prod(self.grid))
        self.patch_embed = tnn.Linear(self.patch**3 * cin, hidden)
        self.pos_embed = tnn.Parameter(torch.zeros(1, n_tok, hidden))
        tnn.init.trunc_normal_(self.pos_embed, std=0.02)
        self.blocks = tnn.ModuleList(
            [OracleViTBlock(hidden, mlp, heads) for _ in range(12)]
        )
        self.vit_norm = tnn.LayerNorm(hidden)
        self.encoder1 = OracleResBlock(cin, fs)

        def ladder(n, cout_):
            mods = [tnn.ConvTranspose3d(hidden, cout_, 2, 2, bias=False)]
            mods += [tnn.ConvTranspose3d(cout_, cout_, 2, 2, bias=False) for _ in range(n)]
            return tnn.Sequential(*mods)

        self.encoder2 = ladder(2, fs * 2)
        self.encoder3 = ladder(1, fs * 4)
        self.encoder4 = ladder(0, fs * 8)
        self.dec5_up = tnn.ConvTranspose3d(hidden, fs * 8, 2, 2, bias=False)
        self.dec5_res = OracleResBlock(fs * 16, fs * 8)
        self.dec4_up = tnn.ConvTranspose3d(fs * 8, fs * 4, 2, 2, bias=False)
        self.dec4_res = OracleResBlock(fs * 8, fs * 4)
        self.dec3_up = tnn.ConvTranspose3d(fs * 4, fs * 2, 2, 2, bias=False)
        self.dec3_res = OracleResBlock(fs * 4, fs * 2)
        self.dec2_up = tnn.ConvTranspose3d(fs * 2, fs, 2, 2, bias=False)
        self.dec2_res = OracleResBlock(fs * 2, fs)
        self.out = tnn.Conv3d(fs, cout, 1, bias=True)

    def tokens(self, x):
        # b c (h p1) (w p2) (d p3) -> b (h w d) (p1 p2 p3 c)
        b, c = x.shape[:2]
        g, p = self.grid, self.patch
        x = x.reshape(b, c, g[0], p, g[1], p, g[2], p)
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1)  # b h w d p1 p2 p3 c
        return x.reshape(b, int(np.prod(g)), p**3 * c)

    def proj_feat(self, t):
        b = t.shape[0]
        t = t.reshape(b, *self.grid, self.hidden)
        return t.permute(0, 4, 1, 2, 3).contiguous()

    def forward(self, x_in):
        t = self.patch_embed(self.tokens(x_in)) + self.pos_embed
        hidden_states = []
        for blk in self.blocks:
            t = blk(t)
            hidden_states.append(t)
        t = self.vit_norm(t)
        enc1 = self.encoder1(x_in)
        enc2 = self.encoder2(self.proj_feat(hidden_states[3]))
        enc3 = self.encoder3(self.proj_feat(hidden_states[6]))
        enc4 = self.encoder4(self.proj_feat(hidden_states[9]))
        dec4 = self.proj_feat(t)
        d = self.dec5_res(torch.cat((self.dec5_up(dec4), enc4), 1))
        d = self.dec4_res(torch.cat((self.dec4_up(d), enc3), 1))
        d = self.dec3_res(torch.cat((self.dec3_up(d), enc2), 1))
        d = self.dec2_res(torch.cat((self.dec2_up(d), enc1), 1))
        return self.out(d)


def _load_res(tree, mod):
    tree["conv1"]["kernel"] = _t2j_conv(mod.conv1.weight.detach().numpy())
    tree["norm1"]["scale"] = mod.norm1.weight.detach().numpy()
    tree["norm1"]["bias"] = mod.norm1.bias.detach().numpy()
    tree["conv2"]["kernel"] = _t2j_conv(mod.conv2.weight.detach().numpy())
    tree["norm2"]["scale"] = mod.norm2.weight.detach().numpy()
    tree["norm2"]["bias"] = mod.norm2.bias.detach().numpy()
    if mod.downsample:
        tree["conv3"]["kernel"] = _t2j_conv(mod.conv3.weight.detach().numpy())
        tree["norm3"]["scale"] = mod.norm3.weight.detach().numpy()
        tree["norm3"]["bias"] = mod.norm3.bias.detach().numpy()


def test_unetr_weight_copy_parity():
    from hdenseformer_tpu.models.unetr import UNETR

    torch.manual_seed(0)
    cin, cout, fs, hidden, mlp, heads = 2, 3, 8, 48, 96, 6
    img = (32, 32, 32)
    oracle = OracleUNETR(cin, cout, img, fs, hidden, mlp, heads).eval()

    model = UNETR(
        in_channels=cin, out_channels=cout, img_size=img, feature_size=fs,
        hidden_size=hidden, mlp_dim=mlp, num_heads=heads,
    )
    rng = np.random.RandomState(1)
    x = rng.randn(1, cin, *img).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, _cl(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    params["patch_embed"]["kernel"] = oracle.patch_embed.weight.detach().numpy().T
    params["patch_embed"]["bias"] = oracle.patch_embed.bias.detach().numpy()
    params["pos_embed"] = oracle.pos_embed.detach().numpy()[0]
    for i, blk in enumerate(oracle.blocks):
        t = params[f"vit_{i}"]
        t["norm1"]["scale"] = blk.norm1.weight.detach().numpy()
        t["norm1"]["bias"] = blk.norm1.bias.detach().numpy()
        t["qkv"]["kernel"] = blk.attn.qkv.weight.detach().numpy().T
        t["proj"]["kernel"] = blk.attn.out_proj.weight.detach().numpy().T
        t["proj"]["bias"] = blk.attn.out_proj.bias.detach().numpy()
        t["norm2"]["scale"] = blk.norm2.weight.detach().numpy()
        t["norm2"]["bias"] = blk.norm2.bias.detach().numpy()
        t["fc1"]["kernel"] = blk.fc1.weight.detach().numpy().T
        t["fc1"]["bias"] = blk.fc1.bias.detach().numpy()
        t["fc2"]["kernel"] = blk.fc2.weight.detach().numpy().T
        t["fc2"]["bias"] = blk.fc2.bias.detach().numpy()
    params["vit_norm"]["scale"] = oracle.vit_norm.weight.detach().numpy()
    params["vit_norm"]["bias"] = oracle.vit_norm.bias.detach().numpy()

    _load_res(params["encoder1"], oracle.encoder1)
    for name, ladder in [("encoder2", oracle.encoder2),
                         ("encoder3", oracle.encoder3),
                         ("encoder4", oracle.encoder4)]:
        for j, m in enumerate(ladder):
            params[f"{name}_up{j}"]["kernel"] = _t2j_convT(m.weight.detach().numpy())
    for name, up, res in [("decoder5", oracle.dec5_up, oracle.dec5_res),
                          ("decoder4", oracle.dec4_up, oracle.dec4_res),
                          ("decoder3", oracle.dec3_up, oracle.dec3_res),
                          ("decoder2", oracle.dec2_up, oracle.dec2_res)]:
        params[f"{name}_up"]["kernel"] = _t2j_convT(up.weight.detach().numpy())
        _load_res(params[f"{name}_res"], res)
    params["out"]["kernel"] = _t2j_conv(oracle.out.weight.detach().numpy())
    params["out"]["bias"] = oracle.out.bias.detach().numpy()

    with torch.no_grad():
        y_ref = oracle(torch.from_numpy(x)).numpy()
    y = _nchw(model.apply({"params": params}, _cl(x), train=False))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
