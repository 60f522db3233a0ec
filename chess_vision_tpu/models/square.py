"""ChessSquareCNN: per-square MobileNetV4 classifier over overlapping crops.

Capability parity with reference models/square.py: 64 overlapping 1.5x crops
per board (here a matmul-based crop+resize op instead of a slice loop — see
ops/square_crop.py), a shared MobileNetV4-small backbone with pinned BN stats,
per-square type/color heads, and turn/castling from an MLP over the
concatenated per-square features.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from chess_vision_tpu.fen import NUM_PIECE_COLORS, NUM_PIECE_TYPES
from chess_vision_tpu.models.common import combine_type_color
from chess_vision_tpu.models.layers import global_avg_pool_nhwc
from chess_vision_tpu.models.mobilenet import MobileNetV4Backbone
from chess_vision_tpu.ops.square_crop import crop_squares


class ChessSquareCNN(nn.Module):
    square_overlap: float = 1.5
    square_input_size: int = 64
    head_dropout: float = 0.0
    pin_backbone_bn: bool = True  # reference semantics (models/square.py:80-89)
    # Feed per-square mean colors to the turn/castling heads (config key
    # model.turn_color_stats; off by default = reference-exact parameters).
    # The move-highlight cue those heads depend on is a low-frequency
    # background tint, and the shared backbone — trained almost entirely by
    # the per-square piece loss, which rewards style/background invariance —
    # learns features that discard it (measured turn acc ~0.55 in round 3).
    # 64x3 raw channel means taken BEFORE the backbone preserve the cue.
    turn_color_stats: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        det = not train

        crops = crop_squares(
            x, overlap=self.square_overlap, out_size=self.square_input_size
        )  # (B, 64, s, s, C)
        color_stats = crops.mean(axis=(2, 3)) if self.turn_color_stats \
            else None                                  # (B, 64, C)
        crops = crops.reshape((B * 64,) + crops.shape[2:])

        backbone = MobileNetV4Backbone(
            trainable_bn=not self.pin_backbone_bn, dtype=self.dtype,
            name="backbone",
        )
        # The conv_head embedding is unused (reference pools pre-head
        # features, models/square.py:86-88); XLA eliminates its compute.
        feat, _ = backbone(crops, train=train)         # (B*64, h, w, F)
        features = global_avg_pool_nhwc(feat)          # (B*64, F)

        drop = nn.Dropout(self.head_dropout)
        dropped = drop(features, deterministic=det)
        type_logits = nn.Dense(NUM_PIECE_TYPES, dtype=self.dtype,
                               name="type_head")(dropped)
        color_logits = nn.Dense(NUM_PIECE_COLORS, dtype=self.dtype,
                                name="color_head")(dropped)
        squares = combine_type_color(type_logits, color_logits)
        squares = squares.reshape(B, -1)               # (B, 832)

        # Global heads over concatenated per-square features.
        global_feat = features.reshape(B, -1)          # (B, 64*F)
        if color_stats is not None:
            global_feat = jnp.concatenate(
                [global_feat,
                 color_stats.reshape(B, -1).astype(global_feat.dtype)],
                axis=-1)                               # (B, 64*F + 192)
        global_feat = drop(global_feat, deterministic=det)
        global_feat = nn.Dense(64, dtype=self.dtype, name="global_fc")(global_feat)
        global_feat = nn.relu(global_feat)
        global_feat = drop(global_feat, deterministic=det)

        return {
            "squares": squares.astype(jnp.float32),
            "turn": nn.Dense(1, dtype=self.dtype, name="turn_head")(
                global_feat
            ).astype(jnp.float32),
            "castling": nn.Dense(4, dtype=self.dtype, name="castling_head")(
                global_feat
            ).astype(jnp.float32),
        }
