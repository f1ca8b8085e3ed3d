"""Fairseq AV-HuBERT weight conversion parity.

There is no HF implementation of AV-HuBERT and fairseq is not in this
environment, so the oracle here is a torch module graph built to fairseq's
exact class layout and state-dict key names (facebookresearch/av_hubert:
avhubert/hubert.py AVHubertModel, avhubert/resnet.py ResEncoder) running
the video-only ``extract_finetune`` semantics: zero audio features,
modality fuse (concat or add), post-fuse LayerNorm, optional
post_extract_proj, then the wav2vec2-style transformer. The synthetic
state dict this oracle produces is byte-for-byte the format a real
fairseq ``.pt`` carries under its ``model`` key.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from avsr_tpu.core.config import AVHubertConfig  # noqa: E402
from avsr_tpu.models.avhubert import (  # noqa: E402
    avhubert_apply,
    convert_fairseq_avhubert,
    load_fairseq_checkpoint,
)

D, HEADS, LAYERS = 32, 4, 2
WIDTHS, DEPTHS = (8, 16, 24, 32), (1, 1, 1, 1)
SIZE, T = 32, 4
POS_K, POS_G = 16, 4


def _cfg(stable_ln: bool) -> AVHubertConfig:
    return AVHubertConfig(
        image_size=SIZE, frontend_channels=8, trunk_widths=WIDTHS,
        trunk_depths=DEPTHS, d_model=D, n_heads=HEADS, n_layers=LAYERS,
        ffn_mult=2, do_stable_layer_norm=stable_ln,
        pos_conv_kernel=POS_K, pos_conv_groups=POS_G)


class _BasicBlock(nn.Module):
    """av_hubert/resnet.py BasicBlock with relu_type='prelu'."""

    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_out)
        self.relu1 = nn.PReLU(c_out)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.relu2 = nn.PReLU(c_out)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu1(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu2(y + r)


class _Trunk(nn.Module):
    """av_hubert/resnet.py ResNet(BasicBlock, depths) — no 2D stem."""

    def __init__(self):
        super().__init__()
        c_in = WIDTHS[0]
        for si, (c_out, depth) in enumerate(zip(WIDTHS, DEPTHS)):
            blocks = []
            for li in range(depth):
                stride = (1 if si == 0 else 2) if li == 0 else 1
                blocks.append(_BasicBlock(c_in if li == 0 else c_out,
                                          c_out, stride))
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))
            c_in = c_out
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
        return self.avgpool(x).flatten(1)


class _ResEncoder(nn.Module):
    """av_hubert/resnet.py ResEncoder: 3D stem + per-frame trunk."""

    def __init__(self):
        super().__init__()
        c = WIDTHS[0]
        self.frontend3D = nn.Sequential(
            nn.Conv3d(1, c, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            nn.BatchNorm3d(c), nn.PReLU(c),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)))
        self.trunk = _Trunk()

    def forward(self, x):                      # [B, 1, T, H, W]
        x = self.frontend3D(x)
        b, c, t = x.shape[:3]
        x = x.transpose(1, 2).reshape(b * t, c, *x.shape[3:])
        return self.trunk(x).reshape(b, t, -1)   # [B, T, 512-like]


class _SubModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.resnet = _ResEncoder()
        self.proj = nn.Linear(WIDTHS[-1], D)

    def forward(self, x):
        return self.proj(self.resnet(x))          # [B, T, D]


class _EncLayer(nn.Module):
    """fairseq TransformerSentenceEncoderLayer key layout."""

    def __init__(self):
        super().__init__()
        self.self_attn = nn.Module()
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            setattr(self.self_attn, n, nn.Linear(D, D))
        self.self_attn_layer_norm = nn.LayerNorm(D)
        self.fc1 = nn.Linear(D, D * 2)
        self.fc2 = nn.Linear(D * 2, D)
        self.final_layer_norm = nn.LayerNorm(D)

    def _attn(self, x):                           # [B, T, D]
        B, T_, _ = x.shape
        hd = D // HEADS

        def split(proj, v):
            return proj(v).reshape(B, T_, HEADS, hd).transpose(1, 2)

        q = split(self.self_attn.q_proj, x) * hd ** -0.5
        k = split(self.self_attn.k_proj, x)
        v = split(self.self_attn.v_proj, x)
        a = torch.softmax(q @ k.transpose(-1, -2), dim=-1) @ v
        return self.self_attn.out_proj(
            a.transpose(1, 2).reshape(B, T_, D))

    def forward(self, x, layer_norm_first):
        if layer_norm_first:
            x = x + self._attn(self.self_attn_layer_norm(x))
            h = self.final_layer_norm(x)
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        x = self.self_attn_layer_norm(x + self._attn(x))
        h = self.fc2(torch.nn.functional.gelu(self.fc1(x)))
        return self.final_layer_norm(x + h)


class _Encoder(nn.Module):
    """fairseq TransformerEncoder: weight-normed pos conv + layers."""

    def __init__(self, layer_norm_first):
        super().__init__()
        conv = nn.Conv1d(D, D, POS_K, padding=POS_K // 2, groups=POS_G)
        self.pos_conv = nn.Sequential(
            torch.nn.utils.weight_norm(conv, name="weight", dim=2))
        self.layers = nn.ModuleList(_EncLayer() for _ in range(LAYERS))
        self.layer_norm = nn.LayerNorm(D)
        self.layer_norm_first = layer_norm_first

    def forward(self, x):                         # [B, T, D]
        p = self.pos_conv[0](x.transpose(1, 2))
        if POS_K % 2 == 0:                        # fairseq SamePad
            p = p[:, :, :-1]
        x = x + torch.nn.functional.gelu(p).transpose(1, 2)
        if not self.layer_norm_first:
            x = self.layer_norm(x)
        for layer in self.layers:
            x = layer(x, self.layer_norm_first)
        if self.layer_norm_first:
            x = self.layer_norm(x)
        return x


class _AVHubertOracle(nn.Module):
    """AVHubertModel key layout, video-only extract_finetune forward."""

    def __init__(self, fuse, layer_norm_first):
        super().__init__()
        self.fuse = fuse
        embed = 2 * D if fuse == "concat" else D
        self.feature_extractor_video = _SubModel()
        self.layer_norm = nn.LayerNorm(embed)
        if embed != D:
            self.post_extract_proj = nn.Linear(embed, D)
        self.encoder = _Encoder(layer_norm_first)

    def forward(self, video):                     # [B, 1, T, H, W]
        v = self.feature_extractor_video(video)   # [B, T, D]
        a = torch.zeros_like(v)                    # video-only: zero audio
        if self.fuse == "concat":
            f = torch.cat([a, v], dim=-1)          # audio first (hubert.py)
        else:
            f = a + v
        f = self.layer_norm(f)
        if hasattr(self, "post_extract_proj"):
            f = self.post_extract_proj(f)
        return self.encoder(f)


def _randomize(model: nn.Module) -> None:
    g = torch.Generator().manual_seed(0)
    sd = model.state_dict()
    for k, t in sd.items():
        if k.endswith("running_var"):
            t.copy_(torch.rand(t.shape, generator=g) + 0.5)
        elif k.endswith("num_batches_tracked"):
            continue
        else:
            t.copy_(torch.randn(t.shape, generator=g) * 0.05)
    model.load_state_dict(sd)


@pytest.mark.parametrize("fuse,stable_ln", [("concat", False),
                                            ("add", True)])
@pytest.mark.slow   # 20.6s measured r05 — >20s fast-tier policy
def test_fairseq_avhubert_conversion_parity(fuse, stable_ln):
    oracle = _AVHubertOracle(fuse, stable_ln).eval()
    _randomize(oracle)
    gray = torch.randn(1, 1, T, SIZE, SIZE,
                       generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = oracle(gray).numpy()

    cfg = _cfg(stable_ln)
    params = convert_fairseq_avhubert(
        {k: v for k, v in oracle.state_dict().items()}, cfg)
    # our apply takes RGB [B, T, 3, S, S] and averages channels to gray
    rgb = gray[:, 0][:, :, None].repeat(1, 1, 3, 1, 1).numpy()
    out = avhubert_apply(params, jnp.asarray(rgb), cfg)
    err = float(np.abs(np.asarray(out) - ref).max())
    assert err < 2e-4, f"fairseq avhubert parity: max|err|={err:.2e}"


def test_fairseq_checkpoint_loader_stubs_unpicklable_cfg(tmp_path):
    """A real fairseq .pt pickles an OmegaConf cfg next to the tensors;
    loading it must not require omegaconf/fairseq imports."""
    import importlib
    import sys
    import types

    mod = types.ModuleType("fake_omegaconf_pkg")
    exec("class FakeDictConfig:\n"
         "    def __init__(self):\n"
         "        self.foo = {'bar': 1}\n", mod.__dict__)
    FakeDictConfig = mod.FakeDictConfig
    sys.modules["fake_omegaconf_pkg"] = mod
    try:
        ckpt = {"model": {"w": torch.arange(4.0)},
                "cfg": FakeDictConfig(), "task_state": {}}
        path = tmp_path / "avhubert_base.pt"
        torch.save(ckpt, path)
    finally:
        del sys.modules["fake_omegaconf_pkg"]
    importlib.invalidate_caches()

    # plain torch.load now fails on the cfg object...
    with pytest.raises(Exception):
        torch.load(path, map_location="cpu", weights_only=False)
    # ...the permissive loader returns the model tensors regardless.
    sd = load_fairseq_checkpoint(str(path))
    assert list(sd) == ["w"]
    assert np.allclose(sd["w"].numpy(), np.arange(4.0))


@pytest.mark.slow   # 15.6s measured r05 — fast-tier budget policy
def test_convert_cli_avhubert_fairseq(tmp_path):
    """build_converted_params wires video_encoder=avhubert to the fairseq
    reader (ref config.py:55 declares the family, never implements it)."""
    oracle = _AVHubertOracle("concat", False).eval()
    _randomize(oracle)
    pt = tmp_path / "avhubert.pt"
    torch.save({"model": oracle.state_dict()}, pt)

    from avsr_tpu.cli.convert_hf import build_converted_params
    from avsr_tpu.core.config import load_config

    cfg = load_config(None, [
        "model.modality=video", "model.video_encoder=avhubert",
        f"model.video_encoder_path={pt}",
        f"model.avhubert.image_size={SIZE}",
        "model.avhubert.frontend_channels=8",
        f"model.avhubert.d_model={D}", f"model.avhubert.n_heads={HEADS}",
        f"model.avhubert.n_layers={LAYERS}", "model.avhubert.ffn_mult=2",
        f"model.avhubert.pos_conv_kernel={POS_K}",
        f"model.avhubert.pos_conv_groups={POS_G}",
        "model.llm.vocab_size=64", "model.llm.d_model=32",
        "model.llm.n_layers=1", "model.llm.n_heads=4",
        "model.llm.n_kv_heads=2", "model.llm.ffn_dim=64",
        "model.lora.use_lora=false",
    ])
    # trunk geometry via dataclass replace (tuple fields)
    import dataclasses
    m = dataclasses.replace(
        cfg.model, avhubert=dataclasses.replace(
            cfg.model.avhubert, trunk_widths=WIDTHS, trunk_depths=DEPTHS))
    cfg = dataclasses.replace(cfg, model=m)

    params, notes = build_converted_params(cfg)
    assert "avhubert" in notes
    assert "fuse_ln" in params["avhubert"]
    assert "post_proj" in params["avhubert"]    # concat fuse
