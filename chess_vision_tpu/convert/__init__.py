"""Weight conversion: timm/torch checkpoints -> this framework's params.

`load_pretrained_backbone(variables, path)` loads a converted backbone
checkpoint (created by chess_vision_tpu.convert.timm_convert) into a model's
variables, replacing the backbone subtree.
"""

from __future__ import annotations


def load_pretrained_backbone(variables: dict, path: str) -> dict:
    from chess_vision_tpu.utils.checkpoint import load_checkpoint, restore_tree

    ckpt = load_checkpoint(path)
    params = dict(variables["params"])
    params["backbone"] = restore_tree(params["backbone"], ckpt["params"])
    out = dict(variables)
    out["params"] = params
    if ckpt.get("batch_stats") and "batch_stats" in variables:
        bs = dict(variables["batch_stats"])
        bs["backbone"] = restore_tree(bs["backbone"], ckpt["batch_stats"])
        out["batch_stats"] = bs
    return out
