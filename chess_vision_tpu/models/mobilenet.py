"""MobileNetV4-Conv-Small backbone at 0.5 width
(structure of timm's mobilenetv4_conv_small_050.e3000_r224_in1k).

Built from ConvBN blocks and MobileNetV4's Universal Inverted Bottleneck
(optional leading depthwise conv -> 1x1 expand -> optional mid depthwise conv
-> 1x1 project), ReLU activations, no squeeze-excite. Stage layout follows
timm's mobilenetv4 conv_small definition with channels scaled by 0.5 and
rounded to multiples of 8 (32->16, 96->48, 64->32, 128->64, 960->480), so
`num_features` (the pre-pool channel dim the reference's ChessSquareCNN reads
via backbone.num_features, reference models/square.py:130) is 480.

BatchNorm always runs with running statistics (inference mode): the reference
pins the square-model backbone in eval mode to preserve pretrained BN stats
(reference models/square.py:76-90), so stats live in the immutable
"batch_stats" collection and are never updated by training.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _round_channels(c: float, divisor: int = 8) -> int:
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:  # timm's make_divisible round-up guard
        new_c += divisor
    return new_c


class ConvBnAct(nn.Module):
    out_ch: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        x = nn.Conv(
            self.out_ch,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=use_running_average, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class UniversalInvertedResidual(nn.Module):
    """MobileNetV4 UIB block.

    dw_start (kernel a, no act) -> 1x1 expand (+act) -> dw_mid (kernel k, +act)
    -> 1x1 project (no act). The stride lives on dw_mid when present, else on
    dw_start. Residual connection when stride 1 and in_ch == out_ch.
    """

    out_ch: int
    expand_ratio: float
    dw_start: int = 0  # 0 = absent
    dw_mid: int = 0
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        in_ch = x.shape[-1]
        shortcut = x
        mid_ch = _round_channels(in_ch * self.expand_ratio)
        ura = use_running_average

        if self.dw_start:
            s = self.stride if not self.dw_mid else 1
            x = ConvBnAct(in_ch, self.dw_start, s, groups=in_ch, act=False,
                          dtype=self.dtype, name="dw_start")(x, ura)
        x = ConvBnAct(mid_ch, 1, 1, dtype=self.dtype, name="pw_exp")(x, ura)
        if self.dw_mid:
            x = ConvBnAct(mid_ch, self.dw_mid, self.stride, groups=mid_ch,
                          dtype=self.dtype, name="dw_mid")(x, ura)
        x = ConvBnAct(self.out_ch, 1, 1, act=False, dtype=self.dtype,
                      name="pw_proj")(x, ura)

        if self.stride == 1 and in_ch == self.out_ch:
            x = x + shortcut
        return x


# timm mobilenetv4 'conv_small' stage definition:
# each entry: (block_type, args...) with channels at 1.0x width.
#   ("cn", kernel, stride, out_ch)
#   ("uir", dw_start, dw_mid, stride, expand, out_ch)
_CONV_SMALL_ARCH = [
    [("cn", 3, 2, 32), ("cn", 1, 1, 32)],
    [("cn", 3, 2, 96), ("cn", 1, 1, 64)],
    [
        ("uir", 5, 5, 2, 3.0, 96),
        ("uir", 0, 3, 1, 2.0, 96),
        ("uir", 0, 3, 1, 2.0, 96),
        ("uir", 0, 3, 1, 2.0, 96),
        ("uir", 0, 3, 1, 2.0, 96),
        ("uir", 3, 0, 1, 4.0, 96),
    ],
    [
        ("uir", 3, 3, 2, 6.0, 128),
        ("uir", 5, 5, 1, 4.0, 128),
        ("uir", 0, 5, 1, 4.0, 128),
        ("uir", 0, 5, 1, 3.0, 128),
        ("uir", 0, 3, 1, 4.0, 128),
        ("uir", 0, 3, 1, 4.0, 128),
    ],
    [("cn", 1, 1, 960)],
]


class MobileNetV4Backbone(nn.Module):
    width_mult: float = 0.5
    stem_size: int = 32
    trainable_bn: bool = False  # False = reference pinned-eval BN semantics
    head_hidden_size: int = 1280  # timm conv_head width (NOT width-scaled)
    dtype: jnp.dtype = jnp.float32

    @property
    def num_features(self) -> int:
        return _round_channels(960 * self.width_mult)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) -> (features, head_embedding).

        features: (B, H/32, W/32, num_features) pre-pool map — what the
        reference's ChessSquareCNN consumes (forward_features + global_pool,
        reference models/square.py:86-88).

        head_embedding: (B, head_hidden_size) — timm's classifier embedding
        (global pool -> 1x1 conv_head with bias -> relu). The square model
        ignores it (XLA dead-code-eliminates the matmul), but the parameters
        exist so param count (2,925,183 total ChessSquareCNN ≈ the reference's
        2.9M, README.md:9-11) and converted timm state_dicts match exactly.

        With trainable_bn=False (default), BN always uses running stats —
        the reference's pinned-eval semantics, correct with pretrained
        stats. trainable_bn=True updates batch stats during training (the
        right choice for from-scratch training, where pinned random-init
        stats mean no normalization at all); callers must then apply the
        model with mutable=["batch_stats"].
        """
        ura = not (train and self.trainable_bn)
        w = self.width_mult
        x = ConvBnAct(_round_channels(self.stem_size * w), 3, 2,
                      dtype=self.dtype, name="stem")(x, ura)
        for si, stage in enumerate(_CONV_SMALL_ARCH):
            for bi, blk in enumerate(stage):
                name = f"stage{si}_block{bi}"
                if blk[0] == "cn":
                    _, k, s, c = blk
                    x = ConvBnAct(_round_channels(c * w), k, s,
                                  dtype=self.dtype, name=name)(x, ura)
                else:
                    _, a, m, s, e, c = blk
                    x = UniversalInvertedResidual(
                        out_ch=_round_channels(c * w), expand_ratio=e,
                        dw_start=a, dw_mid=m, stride=s,
                        dtype=self.dtype, name=name,
                    )(x, ura)
        pooled = jnp.mean(x, axis=(1, 2))
        head = nn.Dense(self.head_hidden_size, use_bias=True,
                        dtype=self.dtype, name="conv_head")(pooled)
        head = nn.relu(head)
        return x, head
