"""Convert torch/timm checkpoints to this framework's parameter trees.

Two conversion surfaces:

1. Backbone conversion (pretrained init): a timm state_dict for one of the
   three reference backbones -> params for our flax backbone, saved as a
   pretrained/<name>.ckpt that train.py picks up (pretrained init is
   load-bearing for OOD accuracy — reference EXPERIMENT_RUNS.md:32-35).

2. Full-model conversion (parity evals): a reference training checkpoint
   (train.py:458-466 dict with "model" state_dict + "config") -> a complete
   framework checkpoint, enabling exact-FEN-agreement evaluation against the
   PyTorch reference (BASELINE.json north star).

Layout transforms: torch conv OIHW -> flax HWIO; depthwise conv OIHW (O=C,
I=1) -> flax HWIO with O=multiplier; linear (out,in) -> (in,out); LayerNorm/
BatchNorm keep vector shapes. ViT pos_embed trained at 224 (14x14 grid) is
bicubically resampled to the target grid, matching timm's
resample_abs_pos_embed behavior triggered by img_size=256 in the reference
(models/vit.py:57-63).

CLI:
    python -m chess_vision_tpu.convert.timm_convert \
        --torch-ckpt vit_weights.pth --arch vit --out pretrained/<name>.ckpt
    python -m chess_vision_tpu.convert.timm_convert \
        --reference-ckpt best.pth --out converted_best.ckpt
"""

from __future__ import annotations

import argparse
import re

import numpy as np


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(w) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(_t(w), (2, 3, 1, 0))


def _dwconv(w) -> np.ndarray:
    """torch depthwise conv (C,1,H,W) -> flax HWIO (H,W,1,C)."""
    return np.transpose(_t(w), (2, 3, 1, 0))


def _linear(w) -> np.ndarray:
    """torch linear (out,in) -> flax kernel (in,out)."""
    return np.transpose(_t(w), (1, 0))


def resample_pos_embed(pos: np.ndarray, new_grid: int) -> np.ndarray:
    """(1, 1+g^2, D) -> (1, 1+new_grid^2, D), bicubic like timm."""
    import torch
    import torch.nn.functional as F

    cls, patches = pos[:, :1], pos[:, 1:]
    g = int(round(np.sqrt(patches.shape[1])))
    if g == new_grid:
        return pos
    x = torch.from_numpy(patches.astype(np.float32)).reshape(1, g, g, -1)
    x = x.permute(0, 3, 1, 2)
    x = F.interpolate(x, size=(new_grid, new_grid), mode="bicubic",
                      antialias=False, align_corners=False)
    x = x.permute(0, 2, 3, 1).reshape(1, new_grid * new_grid, -1).numpy()
    return np.concatenate([cls, x], axis=1).astype(pos.dtype)


# ---------------------------------------------------------------------------
# ViT backbone: timm vit_base_patch16_224 names -> ViTBackbone params
# ---------------------------------------------------------------------------

def convert_vit_backbone(sd: dict, target_grid: int = 16) -> dict:
    p: dict = {}
    p["patch_embed"] = {
        "kernel": _conv(sd["patch_embed.proj.weight"]),
        "bias": _t(sd["patch_embed.proj.bias"]),
    }
    p["cls_token"] = _t(sd["cls_token"])
    p["pos_embed"] = resample_pos_embed(_t(sd["pos_embed"]), target_grid)
    p["norm"] = {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])}

    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        b = f"blocks.{i}."
        p[f"block{i}"] = {
            "norm1": {"scale": _t(sd[b + "norm1.weight"]),
                      "bias": _t(sd[b + "norm1.bias"])},
            "norm2": {"scale": _t(sd[b + "norm2.weight"]),
                      "bias": _t(sd[b + "norm2.bias"])},
            "attn": {
                "qkv": {"kernel": _linear(sd[b + "attn.qkv.weight"]),
                        "bias": _t(sd[b + "attn.qkv.bias"])},
                "proj": {"kernel": _linear(sd[b + "attn.proj.weight"]),
                         "bias": _t(sd[b + "attn.proj.bias"])},
            },
            "mlp": {
                "fc1": {"kernel": _linear(sd[b + "mlp.fc1.weight"]),
                        "bias": _t(sd[b + "mlp.fc1.bias"])},
                "fc2": {"kernel": _linear(sd[b + "mlp.fc2.weight"]),
                        "bias": _t(sd[b + "mlp.fc2.bias"])},
            },
        }
    return p


# ---------------------------------------------------------------------------
# ConvNeXtV2 backbone: timm convnextv2_tiny names -> ConvNeXtV2Backbone params
# ---------------------------------------------------------------------------

def convert_convnext_backbone(sd: dict, depths=(3, 3, 9, 3)) -> dict:
    p: dict = {
        "stem_conv": {"kernel": _conv(sd["stem.0.weight"]),
                      "bias": _t(sd["stem.0.bias"])},
        "stem_norm": {"scale": _t(sd["stem.1.weight"]),
                      "bias": _t(sd["stem.1.bias"])},
    }
    for s in range(1, 4):
        p[f"downsample{s}_norm"] = {
            "scale": _t(sd[f"stages.{s}.downsample.0.weight"]),
            "bias": _t(sd[f"stages.{s}.downsample.0.bias"]),
        }
        p[f"downsample{s}_conv"] = {
            "kernel": _conv(sd[f"stages.{s}.downsample.1.weight"]),
            "bias": _t(sd[f"stages.{s}.downsample.1.bias"]),
        }
    for s, depth in enumerate(depths):
        for j in range(depth):
            b = f"stages.{s}.blocks.{j}."
            grn_g = _t(sd[b + "mlp.grn.weight"]).reshape(-1)
            grn_b = _t(sd[b + "mlp.grn.bias"]).reshape(-1)
            p[f"stage{s}_block{j}"] = {
                "dwconv": {"kernel": _dwconv(sd[b + "conv_dw.weight"]),
                           "bias": _t(sd[b + "conv_dw.bias"])},
                "norm": {"scale": _t(sd[b + "norm.weight"]),
                         "bias": _t(sd[b + "norm.bias"])},
                "pwconv1": {"kernel": _linear(sd[b + "mlp.fc1.weight"]),
                            "bias": _t(sd[b + "mlp.fc1.bias"])},
                "grn": {"gamma": grn_g, "beta": grn_b},
                "pwconv2": {"kernel": _linear(sd[b + "mlp.fc2.weight"]),
                            "bias": _t(sd[b + "mlp.fc2.bias"])},
            }
    p["head_norm"] = {"scale": _t(sd["head.norm.weight"]),
                      "bias": _t(sd["head.norm.bias"])}
    return p


# ---------------------------------------------------------------------------
# MobileNetV4 backbone (timm efficientnet-builder naming). The stage table
# reproduces timm's mobilenetv4 conv_small arch_def; at 0.5 width with the
# unscaled 1280 conv_head the full ChessSquareCNN lands on 2,925,183 params,
# matching the reference's published ~2.9M (README.md:9-11) — the strongest
# offline check available (no timm to diff against in this environment).
# ---------------------------------------------------------------------------

def _convbn(sd: dict, conv_key: str, bn_key: str):
    params = {"conv": {"kernel": _conv(sd[conv_key])}}
    bn_params = {"scale": _t(sd[bn_key + ".weight"]),
                 "bias": _t(sd[bn_key + ".bias"])}
    bn_stats = {"mean": _t(sd[bn_key + ".running_mean"]),
                "var": _t(sd[bn_key + ".running_var"])}
    return params, bn_params, bn_stats


def convert_mobilenet_backbone(sd: dict) -> tuple[dict, dict]:
    """Returns (params, batch_stats)."""
    from chess_vision_tpu.models.mobilenet import _CONV_SMALL_ARCH

    params: dict = {}
    stats: dict = {}

    def put(name, conv_key, bn_key, dw=False):
        kernel = _dwconv(sd[conv_key]) if dw else _conv(sd[conv_key])
        params[name] = {
            "conv": {"kernel": kernel},
            "bn": {"scale": _t(sd[bn_key + ".weight"]),
                   "bias": _t(sd[bn_key + ".bias"])},
        }
        stats[name] = {"bn": {"mean": _t(sd[bn_key + ".running_mean"]),
                              "var": _t(sd[bn_key + ".running_var"])}}

    put("stem", "conv_stem.weight", "bn1")
    for si, stage in enumerate(_CONV_SMALL_ARCH):
        for bi, blk in enumerate(stage):
            name = f"stage{si}_block{bi}"
            t = f"blocks.{si}.{bi}."
            if blk[0] == "cn":
                put(name, t + "conv.weight", t + "bn1")
            else:
                sub_params: dict = {}
                sub_stats: dict = {}

                def put_sub(sub, conv_key, bn_key, dw=False):
                    kernel = _dwconv(sd[conv_key]) if dw else _conv(sd[conv_key])
                    sub_params[sub] = {
                        "conv": {"kernel": kernel},
                        "bn": {"scale": _t(sd[bn_key + ".weight"]),
                               "bias": _t(sd[bn_key + ".bias"])},
                    }
                    sub_stats[sub] = {
                        "bn": {"mean": _t(sd[bn_key + ".running_mean"]),
                               "var": _t(sd[bn_key + ".running_var"])}
                    }

                if blk[1]:  # dw_start
                    put_sub("dw_start", t + "dw_start.conv.weight",
                            t + "dw_start.bn", dw=True)
                put_sub("pw_exp", t + "pw_exp.conv.weight", t + "pw_exp.bn")
                if blk[2]:  # dw_mid
                    put_sub("dw_mid", t + "dw_mid.conv.weight",
                            t + "dw_mid.bn", dw=True)
                put_sub("pw_proj", t + "pw_proj.conv.weight", t + "pw_proj.bn")
                params[name] = sub_params
                stats[name] = sub_stats
    # timm conv_head: 1x1 Conv2d (O,I,1,1) with bias, applied post-pool —
    # our backbone implements it as a Dense over pooled features.
    params["conv_head"] = {
        "kernel": _linear(_t(sd["conv_head.weight"])[:, :, 0, 0]),
        "bias": _t(sd["conv_head.bias"]),
    }
    return params, stats


# ---------------------------------------------------------------------------
# Full reference-model conversion (heads included)
# ---------------------------------------------------------------------------

def _head(sd: dict, prefix: str) -> dict:
    """Reference heads are nn.Sequential(Dropout, Linear) -> index 1
    (reference models/vit.py:22-26); bare Linears have no index."""
    if prefix + ".weight" in sd:
        w, b = sd[prefix + ".weight"], sd[prefix + ".bias"]
    else:
        w, b = sd[prefix + ".1.weight"], sd[prefix + ".1.bias"]
    w = _t(w)
    if w.ndim == 4:  # 1x1 conv head (ChessCNN) -> dense over channels
        w = w[:, :, 0, 0]
    return {"kernel": _linear(w), "bias": _t(b)}


def convert_reference_model(sd: dict, cfg: dict) -> tuple[dict, dict]:
    """Reference ChessViT/ChessCNN/ChessSquareCNN state_dict -> (params,
    batch_stats) for the matching framework model."""
    arch = cfg["model"].get("arch", "vit")
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items()
        if k.startswith("backbone.")
    }
    batch_stats: dict = {}
    if arch == "vit":
        grid = (cfg["model"].get("input_size") or 224) // 16
        backbone = convert_vit_backbone(backbone_sd, target_grid=grid)
    elif arch == "cnn":
        backbone = convert_convnext_backbone(backbone_sd)
    elif arch == "square":
        backbone, bs = convert_mobilenet_backbone(backbone_sd)
        batch_stats = {"backbone": bs}
    else:
        raise ValueError(f"unknown arch {arch!r}")

    params = {
        "backbone": backbone,
        "type_head": _head(sd, "type_head"),
        "color_head": _head(sd, "color_head"),
        "turn_head": _head(sd, "turn_head"),
        "castling_head": _head(sd, "castling_head"),
    }
    if arch == "square":
        params["global_fc"] = _head(sd, "global_head.1")
        params["turn_head"] = _head(sd, "turn_head")
        params["castling_head"] = _head(sd, "castling_head")
    return params, batch_stats


def _verify_against_model(params: dict, batch_stats: dict, cfg: dict) -> None:
    """Structural check: converted tree must match the model's init tree."""
    import jax

    from chess_vision_tpu.models import abstract_variables, build_model

    model = build_model(cfg)
    size = cfg["model"].get("input_size") or 224
    template = abstract_variables(model, size)

    def paths(tree):
        return {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    want, got = paths(template["params"]), paths(params)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatched = sorted(
        k for k in set(want) & set(got) if tuple(want[k]) != tuple(got[k])
    )
    if missing or extra or mismatched:
        msg = []
        if missing:
            msg.append(f"missing: {missing[:8]}")
        if extra:
            msg.append(f"extra: {extra[:8]}")
        if mismatched:
            msg.append(
                f"shape mismatch: {[(k, want[k], got[k]) for k in mismatched[:8]]}"
            )
        raise ValueError("converted params do not match model: " + "; ".join(msg))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch-ckpt", help="raw timm backbone state_dict (.pth)")
    parser.add_argument("--reference-ckpt",
                        help="reference training checkpoint (.pth with model+config)")
    parser.add_argument("--arch", choices=["vit", "cnn", "square"], default="vit")
    parser.add_argument("--input-size", type=int, default=256)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import torch

    from chess_vision_tpu.utils.checkpoint import save_checkpoint

    if args.reference_ckpt:
        ckpt = torch.load(args.reference_ckpt, map_location="cpu",
                          weights_only=True)
        cfg = ckpt["config"]
        params, batch_stats = convert_reference_model(ckpt["model"], cfg)
        _verify_against_model(params, batch_stats, cfg)
        save_checkpoint(args.out, params, {}, batch_stats,
                        step=0, epoch=ckpt.get("epoch", 0),
                        best_val_acc=ckpt.get("best_val_acc", 0.0), config=cfg)
        print(f"converted reference checkpoint -> {args.out}")
        return

    sd = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    batch_stats: dict = {}
    if args.arch == "vit":
        params = convert_vit_backbone(sd, target_grid=args.input_size // 16)
    elif args.arch == "cnn":
        params = convert_convnext_backbone(sd)
    else:
        params, batch_stats = convert_mobilenet_backbone(sd)
    save_checkpoint(args.out, params, {}, batch_stats, step=0, epoch=0,
                    best_val_acc=0.0, config={"arch": args.arch})
    print(f"converted backbone -> {args.out}")


if __name__ == "__main__":
    main()
