"""ChessViT: ViT-B/16 with spatial token heads pooled to the 8x8 chess grid.

Capability parity with reference models/vit.py: CLS token feeds the turn and
castling heads; patch tokens are reshaped to the patch grid, adaptively
average-pooled to 8x8 (2x2 patches per square at 256px input), and classified
per square by additive type(7)+color(3) heads -> (B, 832) joint logits.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from chess_vision_tpu.fen import NUM_PIECE_COLORS, NUM_PIECE_TYPES
from chess_vision_tpu.models.common import combine_type_color
from chess_vision_tpu.models.layers import adaptive_avg_pool_nhwc
from chess_vision_tpu.models.vit_backbone import ViTBackbone


class ChessViT(nn.Module):
    img_size: int = 256
    head_dropout: float = 0.0
    drop_path_rate: float = 0.0
    remat: bool = True
    dtype: jnp.dtype = jnp.float32
    # Backbone size (default = ViT-B/16, the reference flagship). Overridable
    # via config (model.embed_dim/depth/num_heads/mlp_ratio) for fast CLI
    # smoke tests and small-variant experiments.
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ViTBackbone(
            img_size=self.img_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            drop_path_rate=self.drop_path_rate,
            remat=self.remat,
            dtype=self.dtype,
            name="backbone",
        )
        features = backbone(x, train=train)  # (B, 1+G^2, D)
        B = features.shape[0]
        G = backbone.grid_size
        D = features.shape[-1]

        cls_token = features[:, 0]
        patch_tokens = features[:, 1:].reshape(B, G, G, D)
        pooled = adaptive_avg_pool_nhwc(patch_tokens, (8, 8))  # (B, 8, 8, D)

        drop = nn.Dropout(self.head_dropout)
        det = not train
        pooled = drop(pooled, deterministic=det)
        type_logits = nn.Dense(NUM_PIECE_TYPES, dtype=self.dtype,
                               name="type_head")(pooled)
        color_logits = nn.Dense(NUM_PIECE_COLORS, dtype=self.dtype,
                                name="color_head")(pooled)
        squares = combine_type_color(type_logits, color_logits)  # (B, 8, 8, 13)

        cls_token = drop(cls_token, deterministic=det)
        return {
            "squares": squares.reshape(B, -1).astype(jnp.float32),
            "turn": nn.Dense(1, dtype=self.dtype, name="turn_head")(
                cls_token
            ).astype(jnp.float32),
            "castling": nn.Dense(4, dtype=self.dtype, name="castling_head")(
                cls_token
            ).astype(jnp.float32),
        }
