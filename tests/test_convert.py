"""Weight-converter tests: numerical forward parity between independent torch
replicas of the timm backbones (timm state_dict naming) and the flax
implementations loaded with converted weights.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from chess_vision_tpu.convert.timm_convert import (
    convert_convnext_backbone,
    convert_vit_backbone,
    resample_pos_embed,
)
from chess_vision_tpu.models.convnext import ConvNeXtV2Backbone
from chess_vision_tpu.models.vit_backbone import ViTBackbone
from flax import serialization


# --- torch mini-ViT with timm naming/structure (test oracle) ---------------

class TorchBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.heads = heads

    def forward(self, x):
        B, N, D = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv.unbind(2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(D // self.heads)
        h = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
        return x + h


class TorchViT(nn.Module):
    def __init__(self, img=64, patch=16, dim=64, depth=2, heads=4):
        super().__init__()
        g = img // patch
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + g * g, dim) * 0.02)
        self.blocks = nn.ModuleList(TorchBlock(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward_features(self, x):
        x = self.patch_embed.proj(x)
        x = x.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def test_vit_conversion_forward_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchViT().eval()
    sd = tmodel.state_dict()

    params = convert_vit_backbone(sd, target_grid=4)
    model = ViTBackbone(img_size=64, patch_size=16, embed_dim=64, depth=2,
                        num_heads=4)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

    # structural check via template restore
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)), train=False,
        )
    )
    restored = serialization.from_state_dict(template["params"], params)
    ours = model.apply({"params": restored}, jnp.asarray(x), train=False)

    with torch.no_grad():
        ref = tmodel.forward_features(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


# --- torch mini-ConvNeXtV2 with timm naming (test oracle) ------------------

class TorchGRN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(dim) * 0.02)
        self.bias = nn.Parameter(torch.randn(dim) * 0.02)

    def forward(self, x):  # channels-last
        gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.weight * (x * nx) + self.bias + x


class TorchCNBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.grn = TorchGRN(4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x):  # NCHW
        s = x
        x = self.conv_dw(x).permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.mlp.fc2(self.mlp.grn(F.gelu(self.mlp.fc1(x))))
        return s + x.permute(0, 3, 1, 2)


class TorchLN2d(nn.LayerNorm):
    def forward(self, x):  # NCHW
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class TorchConvNeXtV2(nn.Module):
    def __init__(self, depths=(1, 1, 2, 1), dims=(8, 16, 24, 32)):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, 4), TorchLN2d(dims[0], eps=1e-6)
        )
        self.stages = nn.ModuleList()
        for i, (d, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if i > 0:
                stage.downsample = nn.Sequential(
                    TorchLN2d(dims[i - 1], eps=1e-6),
                    nn.Conv2d(dims[i - 1], dim, 2, 2),
                )
            stage.blocks = nn.ModuleList(TorchCNBlock(dim) for _ in range(d))
            self.stages.append(stage)
        self.head = nn.Module()
        self.head.norm = TorchLN2d(dims[-1], eps=1e-6)

    def forward(self, x):
        x = self.stem(x)
        for i, stage in enumerate(self.stages):
            if i > 0:
                x = stage.downsample(x)
            for blk in stage.blocks:
                x = blk(x)
        return self.head.norm(x)


def test_convnext_conversion_forward_parity(rng):
    torch.manual_seed(0)
    depths, dims = (1, 1, 2, 1), (8, 16, 24, 32)
    tmodel = TorchConvNeXtV2(depths, dims).eval()

    params = convert_convnext_backbone(tmodel.state_dict(), depths=depths)
    model = ConvNeXtV2Backbone(depths=depths, dims=dims)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)), train=False,
        )
    )
    restored = serialization.from_state_dict(template["params"], params)
    ours = model.apply({"params": restored}, jnp.asarray(x), train=False)

    with torch.no_grad():
        ref = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_pos_embed_resample_identity_and_shape():
    pos = np.random.default_rng(0).normal(size=(1, 1 + 14 * 14, 32)).astype(
        np.float32
    )
    same = resample_pos_embed(pos, 14)
    np.testing.assert_array_equal(same, pos)
    up = resample_pos_embed(pos, 16)
    assert up.shape == (1, 1 + 16 * 16, 32)
    # CLS token untouched
    np.testing.assert_array_equal(up[:, 0], pos[:, 0])


def _mnv4_050_state_dict() -> dict:
    """Synthetic timm mobilenetv4_conv_small_050 state_dict: the full key
    space (efficientnet-builder names incl. num_batches_tracked and the
    post-pool conv_head) with random values."""
    from chess_vision_tpu.models.mobilenet import (
        _CONV_SMALL_ARCH,
        _round_channels,
    )

    w = 0.5
    sd = {}

    def add_bn(prefix, c):
        sd[prefix + ".weight"] = torch.randn(c).abs() + 0.5
        sd[prefix + ".bias"] = torch.randn(c)
        sd[prefix + ".running_mean"] = torch.randn(c)
        sd[prefix + ".running_var"] = torch.randn(c).abs() + 0.5
        sd[prefix + ".num_batches_tracked"] = torch.tensor(0)

    ch = _round_channels(32 * w)
    sd["conv_stem.weight"] = torch.randn(ch, 3, 3, 3)
    add_bn("bn1", ch)
    for si, stage in enumerate(_CONV_SMALL_ARCH):
        for bi, blk in enumerate(stage):
            t = f"blocks.{si}.{bi}"
            if blk[0] == "cn":
                _, k, s, c = blk
                out = _round_channels(c * w)
                sd[t + ".conv.weight"] = torch.randn(out, ch, k, k)
                add_bn(t + ".bn1", out)
                ch = out
            else:
                _, a, m, s, e, c = blk
                out = _round_channels(c * w)
                mid = _round_channels(ch * e)

                def add(sub, i_ch, o_ch, k, dw=False):
                    sd[f"{t}.{sub}.conv.weight"] = torch.randn(
                        o_ch, 1 if dw else i_ch, k, k
                    )
                    add_bn(f"{t}.{sub}.bn", o_ch)

                if a:
                    add("dw_start", ch, ch, a, dw=True)
                add("pw_exp", ch, mid, 1)
                if m:
                    add("dw_mid", mid, mid, m, dw=True)
                add("pw_proj", mid, out, 1)
                ch = out
    sd["conv_head.weight"] = torch.randn(1280, ch, 1, 1)
    sd["conv_head.bias"] = torch.randn(1280)
    return sd


def _paths(tree):
    return {
        "/".join(str(k.key) for k in path): tuple(leaf.shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_mobilenet_conversion_structural():
    """Synthesize a timm-style MNv4 state_dict from the arch table and check
    the converted tree matches the flax model's template exactly."""
    from chess_vision_tpu.convert.timm_convert import convert_mobilenet_backbone
    from chess_vision_tpu.models import abstract_variables, build_model

    sd = _mnv4_050_state_dict()
    params, stats = convert_mobilenet_backbone(sd)

    # wrap into a square-model-shaped check for the backbone subtree
    cfg = {"model": {"arch": "square", "input_size": 64,
                     "square_input_size": 32},
           "training": {"mixed_precision": False}}
    model = build_model(cfg)
    template = abstract_variables(model, 64)

    want = _paths(template["params"]["backbone"])
    got = _paths(params)
    assert want == got, (
        f"missing={sorted(set(want)-set(got))[:6]} "
        f"extra={sorted(set(got)-set(want))[:6]} "
        f"mismatch={[(k, want[k], got[k]) for k in sorted(set(want) & set(got)) if want[k] != got[k]][:6]}"
    )
    assert _paths(template["batch_stats"]["backbone"]) == _paths(stats)


# --- Full-size synthetic reference checkpoints ------------------------------
# No timm weights or reference checkpoints exist offline; these tests build
# state_dicts with the exact reference key space at FULL model size (ViT-B/16
# with 224-grid pos-embed needing resample to 256, ConvNeXtV2-Tiny,
# MobileNetV4-small-050 incl. conv_head) and prove the converter consumes
# them without KeyErrors and lands exactly on each flax model's init tree.


def _full_vit_backbone_sd(img=224, dim=768, depth=12, patch=16) -> dict:
    g = img // patch
    sd = {
        "patch_embed.proj.weight": torch.randn(dim, 3, patch, patch),
        "patch_embed.proj.bias": torch.randn(dim),
        "cls_token": torch.randn(1, 1, dim),
        "pos_embed": torch.randn(1, 1 + g * g, dim),
        "norm.weight": torch.randn(dim),
        "norm.bias": torch.randn(dim),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[b + ln + ".weight"] = torch.randn(dim)
            sd[b + ln + ".bias"] = torch.randn(dim)
        sd[b + "attn.qkv.weight"] = torch.randn(3 * dim, dim)
        sd[b + "attn.qkv.bias"] = torch.randn(3 * dim)
        sd[b + "attn.proj.weight"] = torch.randn(dim, dim)
        sd[b + "attn.proj.bias"] = torch.randn(dim)
        sd[b + "mlp.fc1.weight"] = torch.randn(4 * dim, dim)
        sd[b + "mlp.fc1.bias"] = torch.randn(4 * dim)
        sd[b + "mlp.fc2.weight"] = torch.randn(dim, 4 * dim)
        sd[b + "mlp.fc2.bias"] = torch.randn(dim)
    return sd


def _seq_linear(sd, name, out_f, in_f, conv=False, bare=False):
    """Reference head: nn.Sequential(Dropout, Linear/Conv1x1) at index 1,
    or a bare Linear (square model's turn/castling)."""
    key = name if bare else name + ".1"
    w = torch.randn(out_f, in_f, 1, 1) if conv else torch.randn(out_f, in_f)
    sd[key + ".weight"] = w
    sd[key + ".bias"] = torch.randn(out_f)


def _with_buffers(sd):
    sd["class_to_type"] = torch.tensor([0, 1, 2, 3, 4, 5, 6] * 2)[:13]
    sd["class_to_color"] = torch.tensor([0] + [1] * 6 + [2] * 6)
    return sd


def _reference_ckpt_roundtrip(sd, cfg):
    from chess_vision_tpu.convert.timm_convert import (
        _verify_against_model,
        convert_reference_model,
    )

    params, batch_stats = convert_reference_model(sd, cfg)
    _verify_against_model(params, batch_stats, cfg)  # raises on any mismatch


def test_full_size_reference_vit_roundtrip():
    """86M-param ViT-B/16 reference checkpoint key space, trained pos-embed
    at 224 (14x14) resampled to the 256-input 16x16 grid."""
    torch.manual_seed(0)
    sd = {"backbone." + k: v for k, v in _full_vit_backbone_sd(img=224).items()}
    d = 768
    for name, out in (("type_head", 7), ("color_head", 3),
                      ("turn_head", 1), ("castling_head", 4)):
        _seq_linear(sd, name, out, d)
    _with_buffers(sd)
    cfg = {"model": {"arch": "vit", "input_size": 256},
           "training": {"mixed_precision": False}}
    _reference_ckpt_roundtrip(sd, cfg)


def test_full_size_reference_cnn_roundtrip():
    """28M-param ConvNeXtV2-Tiny reference checkpoint key space (1x1 conv
    type/color heads, linear turn/castling heads)."""
    torch.manual_seed(0)
    backbone = TorchConvNeXtV2(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768))
    sd = {"backbone." + k: v for k, v in backbone.state_dict().items()}
    _seq_linear(sd, "type_head", 7, 768, conv=True)
    _seq_linear(sd, "color_head", 3, 768, conv=True)
    _seq_linear(sd, "turn_head", 1, 768)
    _seq_linear(sd, "castling_head", 4, 768)
    _with_buffers(sd)
    cfg = {"model": {"arch": "cnn", "input_size": 256},
           "training": {"mixed_precision": False}}
    _reference_ckpt_roundtrip(sd, cfg)


def test_full_size_reference_square_roundtrip():
    """2.9M-param ChessSquareCNN reference checkpoint key space: full
    MobileNetV4-small-050 backbone (conv_head included as in timm
    num_classes=0 state_dicts) + global_head MLP + bare turn/castling."""
    torch.manual_seed(0)
    sd = {"backbone." + k: v for k, v in _mnv4_050_state_dict().items()}
    feat = 480
    _seq_linear(sd, "type_head", 7, feat)
    _seq_linear(sd, "color_head", 3, feat)
    _seq_linear(sd, "global_head", 64, 64 * feat)  # Sequential index 1
    _seq_linear(sd, "turn_head", 1, 64, bare=True)
    _seq_linear(sd, "castling_head", 4, 64, bare=True)
    _with_buffers(sd)
    cfg = {"model": {"arch": "square", "input_size": 256,
                     "square_input_size": 64},
           "training": {"mixed_precision": False}}
    _reference_ckpt_roundtrip(sd, cfg)


def test_square_param_count_matches_reference():
    """Reference README.md:9-11 publishes ~2.9M params for the square model;
    the exact layout lands on 2,925,183 (timm MNv4-small-050 with unscaled
    1280 conv_head + heads over 480-dim pooled features)."""
    from chess_vision_tpu.models import (
        abstract_variables,
        build_model,
        param_count,
    )

    cfg = {"model": {"arch": "square", "input_size": 256,
                     "square_input_size": 64},
           "training": {"mixed_precision": False}}
    v = abstract_variables(build_model(cfg), 256)
    assert param_count(v["params"]) == 2_925_183
