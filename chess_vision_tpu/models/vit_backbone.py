"""ViT-B/16 backbone (structure of timm's vit_base_patch16_224.augreg_in21k).

Reimplemented in flax for TPU: NHWC patch embedding, fused-QKV pre-norm blocks,
learnable position embeddings sized to the configured input resolution (the
timm->JAX converter interpolates 224-grid embeddings to other grids, mirroring
timm's resample_abs_pos_embed used at reference models/vit.py:57-63 when
img_size=256).

Returns the full token sequence after the final norm — the equivalent of
timm's forward_features, which the reference's ChessViT consumes
(reference models/vit.py:29).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from chess_vision_tpu.models.layers import TransformerBlock, trunc_normal_init


class ViTBackbone(nn.Module):
    img_size: int = 256
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    # Rematerialize blocks in the backward pass (jax.checkpoint): only block
    # inputs are saved as residuals, so training fits bigger batches — the
    # standard TPU trade of FLOPs for HBM. Without it, batch 256 at 256px
    # OOMs on v5e-16GB (per-block f32 attention scores in the VJP).
    # Values: True/"full" (save block inputs only), "attn_out" (additionally
    # save each block's attention output — the bwd then skips recomputing
    # the qkv dense + attention kernel forward at +(B, N, D) bf16 per block,
    # ~100 MB at B=128; the selective policy of VERDICT r3 #2), False (no
    # remat). Config key: model.remat.
    remat: bool | str = True
    dtype: jnp.dtype = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid_size * self.grid_size + 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) normalized images -> (B, 1 + grid^2, embed_dim)."""
        B = x.shape[0]
        # Patch embedding: 16x16 stride-16 conv == per-patch linear projection.
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="patch_embed",
        )(x)
        x = x.reshape(B, -1, self.embed_dim)  # (B, grid^2, D) row-major = timm order

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1,
        )

        pos_embed = self.param(
            "pos_embed", trunc_normal_init, (1, self.num_tokens, self.embed_dim)
        )
        x = x + pos_embed.astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)

        # Stochastic depth increases linearly with depth (timm convention).
        block_cls = TransformerBlock
        if self.remat and train:
            # prevent_cse=True (the default) is required here: without it XLA
            # hoists every block's recomputation to the front of the backward
            # pass and all 12 blocks' temporaries coexist — observed to OOM
            # exactly like no-remat. False is only safe under lax.scan.
            import jax as _jax

            policy = None
            if self.remat == "attn_out":
                policy = _jax.checkpoint_policies.save_only_these_names(
                    "vit_attn_out")
            block_cls = nn.remat(TransformerBlock, static_argnums=(2,),
                                 policy=policy)
        for i in range(self.depth):
            dp = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                drop_path=dp,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, not train)

        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
        return x
