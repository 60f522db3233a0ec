"""ChessCNN: stride-32 ConvNeXtV2-Tiny with 1x1-conv piece heads.

Capability parity with reference models/cnn.py: 256x256 input -> native 8x8
feature map; per-square type/color heads are 1x1 convs (Dense over NHWC
channels); turn/castling read globally average-pooled features.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from chess_vision_tpu.fen import NUM_PIECE_COLORS, NUM_PIECE_TYPES
from chess_vision_tpu.models.common import combine_type_color
from chess_vision_tpu.models.convnext import ConvNeXtV2Backbone
from chess_vision_tpu.models.layers import (
    adaptive_avg_pool_nhwc,
    global_avg_pool_nhwc,
)


class ChessCNN(nn.Module):
    head_dropout: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = ConvNeXtV2Backbone(
            drop_path_rate=self.drop_path_rate, dtype=self.dtype, name="backbone"
        )(x, train=train)  # (B, H/32, W/32, C)
        B = features.shape[0]
        det = not train

        spatial = adaptive_avg_pool_nhwc(features, (8, 8))
        drop = nn.Dropout(self.head_dropout)
        spatial = drop(spatial, deterministic=det)
        # 1x1 convs == Dense over the channel axis in NHWC.
        type_logits = nn.Dense(NUM_PIECE_TYPES, dtype=self.dtype,
                               name="type_head")(spatial)
        color_logits = nn.Dense(NUM_PIECE_COLORS, dtype=self.dtype,
                                name="color_head")(spatial)
        squares = combine_type_color(type_logits, color_logits)

        pooled = global_avg_pool_nhwc(features)
        pooled = drop(pooled, deterministic=det)
        return {
            "squares": squares.reshape(B, -1).astype(jnp.float32),
            "turn": nn.Dense(1, dtype=self.dtype, name="turn_head")(
                pooled
            ).astype(jnp.float32),
            "castling": nn.Dense(4, dtype=self.dtype, name="castling_head")(
                pooled
            ).astype(jnp.float32),
        }
