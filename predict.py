#!/usr/bin/env python
"""Predict the FEN of a single board image (CLI parity with reference
predict.py: prints "<placement> <turn> <castling>")."""

from __future__ import annotations

import argparse


def main():
    from chess_vision_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from chess_vision_tpu.augment import preprocess_eval
    from chess_vision_tpu.config import get_data_config
    from chess_vision_tpu.fen import assemble_fen
    from chess_vision_tpu.models import abstract_variables, build_model
    from chess_vision_tpu.utils.checkpoint import load_checkpoint, restore_tree

    parser = argparse.ArgumentParser(description="Predict FEN from a board image")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--image", required=True)
    args = parser.parse_args()

    ckpt = load_checkpoint(args.checkpoint)
    cfg = ckpt["config"]
    model = build_model(cfg)
    input_size = cfg["model"].get("input_size") or 224

    variables = abstract_variables(model, input_size)
    params = restore_tree(variables["params"], ckpt["params"])
    batch_stats = restore_tree(
        variables.get("batch_stats", {}), ckpt.get("batch_stats", {})
    )

    img = Image.open(args.image).convert("RGB")
    if img.size != (input_size, input_size):
        img = img.resize((input_size, input_size), Image.BILINEAR)
    batch = jnp.asarray(np.asarray(img, np.uint8))[None]

    data_cfg = get_data_config(cfg["model"]["name"])

    def forward(p, bs, x):
        images = preprocess_eval(x, data_cfg["mean"], data_cfg["std"])
        vs = {"params": p}
        if bs:
            vs["batch_stats"] = bs
        return model.apply(vs, images, train=False)

    out = jax.jit(forward)(params, batch_stats, batch)
    preds = np.argmax(np.asarray(out["squares"]).reshape(64, 13), axis=-1)
    fen = assemble_fen(
        preds, float(out["turn"][0, 0]), np.asarray(out["castling"][0])
    )
    print(fen)


if __name__ == "__main__":
    main()
