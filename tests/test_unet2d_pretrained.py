"""Pretrained-encoder port for the smp-style 2D baselines.

The reference's ``ex_pre_trained`` makes smp download imagenet ResNet
weights (trainer.py:706-739). This build ports a local torchvision-format
state dict instead (models/unet2d.py:load_torch_resnet_encoder). The
oracle below is a plain-torch ResNet-18 with exact torchvision attribute
naming, so its ``state_dict()`` keys are the torchvision/imagenet ones —
loading real imagenet weights goes through the identical code path.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from test_model_parity import _cl, _nchw


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        res = self.downsample(x) if self.downsample is not None else x
        return self.relu(h + res)


class TorchResNet18(tnn.Module):
    """torchvision.models.resnet18 topology + attribute naming."""

    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths, cin = (64, 128, 256, 512), 64
        for s, w in enumerate(widths):
            stride = 1 if s == 0 else 2
            blocks = [TorchBasicBlock(cin, w, stride), TorchBasicBlock(w, w, 1)]
            setattr(self, f"layer{s+1}", tnn.Sequential(*blocks))
            cin = w
        self.fc = tnn.Linear(512, 1000)  # present in imagenet ckpts, ignored

    def features(self, x):
        feats = [x]
        h = self.relu(self.bn1(self.conv1(x)))
        feats.append(h)
        h = self.maxpool(h)
        for s in range(4):
            h = getattr(self, f"layer{s+1}")(h)
            feats.append(h)
        return feats


def _randomize_running_stats(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(np.abs(rng.randn(n)).astype(np.float32) + 0.5))


def test_resnet18_encoder_port_parity():
    from hdenseformer_tpu.models.unet2d import ResNetEncoder, load_torch_resnet_encoder

    torch.manual_seed(0)
    oracle = TorchResNet18(in_ch=3).eval()
    rng = np.random.RandomState(0)
    with torch.no_grad():
        _randomize_running_stats(oracle, rng)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    enc = ResNetEncoder("resnet18")
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), _cl(x))
    # the loader expects the full-model layout ({'encoder': ...})
    wrapped = {
        "params": {"encoder": variables["params"]},
        "batch_stats": {"encoder": variables["batch_stats"]},
    }
    wrapped = load_torch_resnet_encoder(wrapped, sd)
    variables = {
        "params": wrapped["params"]["encoder"],
        "batch_stats": wrapped["batch_stats"]["encoder"],
    }

    with torch.no_grad():
        feats_ref = [f.numpy() for f in oracle.features(torch.from_numpy(x))]
    feats = enc.apply(variables, _cl(x))
    assert len(feats) == len(feats_ref)
    for f, fr in zip(feats, feats_ref):
        np.testing.assert_allclose(_nchw(f), fr, rtol=1e-4, atol=1e-4)


def test_channel_adapted_first_conv():
    """imagenet RGB conv1 adapted to a 2-channel CT/PET model input."""
    from hdenseformer_tpu.models.unet2d import ResNetEncoder, load_torch_resnet_encoder

    torch.manual_seed(1)
    oracle = TorchResNet18(in_ch=3).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    enc = ResNetEncoder("resnet18")
    x = np.random.RandomState(1).randn(1, 2, 32, 32).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), _cl(x))
    wrapped = {
        "params": {"encoder": variables["params"]},
        "batch_stats": {"encoder": variables["batch_stats"]},
    }
    wrapped = load_torch_resnet_encoder(wrapped, sd)
    k = wrapped["params"]["encoder"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 2, 64)
    ref_mean = sd["conv1.weight"].mean(axis=1).transpose(1, 2, 0)
    np.testing.assert_allclose(k[..., 0, :], ref_mean, rtol=1e-6)


def test_ex_pre_trained_bool_raises():
    from hdenseformer_tpu.train.loop import SemanticSeg

    seg = SemanticSeg(
        net_name="unet", encoder_name="resnet18", channels=2, num_classes=2,
        roi_number=None, input_shape=(32, 32), batch_size=1,
        ex_pre_trained=True, use_fp16=False,
    )
    with pytest.raises(ValueError, match="local checkpoint"):
        seg.build_state()


def test_ex_pre_trained_npz_roundtrip(tmp_path):
    """End to end: save a torchvision-format dict as .npz, build_state
    loads it into the unet encoder."""
    from hdenseformer_tpu.train.loop import SemanticSeg

    torch.manual_seed(2)
    oracle = TorchResNet18(in_ch=3)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    p = tmp_path / "resnet18.npz"
    np.savez(str(p), **sd)

    seg = SemanticSeg(
        net_name="unet", encoder_name="resnet18", channels=2, num_classes=2,
        roi_number=None, input_shape=(32, 32), batch_size=1,
        ex_pre_trained=str(p), use_fp16=False,
    )
    state = seg.build_state()
    got = np.asarray(state.params["encoder"]["layer1_0"]["conv1"]["kernel"])
    want = sd["layer1.0.conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resnet34_encoder_wired():
    """resnet34 is a first-class encoder choice (ref trainer.py:706-739
    accepts any smp encoder name)."""
    from hdenseformer_tpu.models.unet2d import get_2d_net

    model = get_2d_net("unet", "resnet34", in_channels=2, classes=2)
    x = jnp.zeros((1, 64, 64, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x, train=False, mutable=False)
    assert y.shape == (1, 64, 64, 2)
    # 34 has (3,4,6,3) blocks
    assert "layer2_3" in variables["params"]["encoder"]
