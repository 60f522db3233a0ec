"""ConvNeXtV2 backbone (structure of timm's convnextv2_tiny.fcmae_ft_in22k_in1k).

NHWC throughout. The V2-specific piece is GRN inside each block (no layer
scale). With a 256x256 input the stride-32 trunk yields the 8x8 feature map
that aligns with the chess grid (reference models/cnn.py:13-16).

Output matches what the reference's ChessCNN consumes: timm with
num_classes=0, global_pool="" still applies the classifier head's LayerNorm
to the spatial map (NormMlpClassifierHead with fc=Identity), so `head_norm`
here mirrors that trailing norm (reference models/cnn.py:37 backbone(x)).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from chess_vision_tpu.models.layers import GRN, DropPath, trunc_normal_init


class ConvNeXtV2Block(nn.Module):
    dim: int
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        # 7x7 depthwise conv
        x = nn.Conv(
            self.dim, kernel_size=(7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, kernel_init=trunc_normal_init, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(dtype=self.dtype, name="grn")(x)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="pwconv2")(x)
        x = shortcut + DropPath(self.drop_path, name="drop_path")(x, deterministic)
        return x


class ConvNeXtV2Backbone(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return self.dims[-1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) -> (B, H/32, W/32, dims[-1]) normed feature map."""
        det = not train
        total_blocks = sum(self.depths)
        dp_rates = [
            self.drop_path_rate * i / max(total_blocks - 1, 1)
            for i in range(total_blocks)
        ]
        block_idx = 0
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage == 0:
                x = nn.Conv(dim, kernel_size=(4, 4), strides=(4, 4),
                            padding="VALID", dtype=self.dtype,
                            kernel_init=trunc_normal_init, name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                                 name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                                 name=f"downsample{stage}_norm")(x)
                x = nn.Conv(dim, kernel_size=(2, 2), strides=(2, 2),
                            padding="VALID", dtype=self.dtype,
                            kernel_init=trunc_normal_init,
                            name=f"downsample{stage}_conv")(x)
            for b in range(depth):
                x = ConvNeXtV2Block(
                    dim=dim, drop_path=dp_rates[block_idx],
                    norm_eps=self.norm_eps, dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, deterministic=det)
                block_idx += 1

        # timm classifier-head norm applied to the spatial map (see module doc).
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="head_norm")(x)
        return x
