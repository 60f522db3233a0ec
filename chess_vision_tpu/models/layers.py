"""Shared flax building blocks for the backbone zoo.

All modules are NHWC (TPU-native layout) and take an optional compute dtype so
forward passes run in bfloat16 while parameters stay float32 (the TPU
equivalent of the reference's AMP autocast, reference train.py:144).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

# timm-style truncated-normal init used by ViT/ConvNeXt families.
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class DropPath(nn.Module):
    """Per-sample stochastic depth (drops the entire residual branch)."""

    rate: float = 0.0
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """Transformer MLP: Linear -> GELU -> Dropout -> Linear -> Dropout."""

    hidden_dim: int
    out_dim: int | None = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with a fused QKV projection.

    The fused qkv layout matches timm's ViT so converted checkpoints map
    one-to-one. Attention itself runs through the fused single-tile Pallas
    kernel (ops/attention.py) on TPU — XLA's lowering materializes the full
    f32 score tensor in HBM on this backend — with plain-XLA math on CPU and
    for the backward pass.
    """

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from chess_vision_tpu.ops.attention import fused_qkv_attention

        B, N, D = x.shape
        qkv = nn.Dense(3 * D, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        out = fused_qkv_attention(qkv, self.num_heads)
        # Named for the selective remat policy (vit_backbone.py remat=
        # "attn_out"): saving this one (B, N, D) bf16 tensor per block lets
        # the backward pass skip recomputing the attention forward chain
        # (qkv dense + Pallas kernel) while everything else still remats.
        out = checkpoint_name(out, "vit_attn_out")
        out = nn.Dense(D, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    """Pre-norm transformer block: x + attn(ln(x)); x + mlp(ln(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        D = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.num_heads, self.dropout, self.dtype, name="attn")(
            h, deterministic
        )
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        h = Mlp(int(D * self.mlp_ratio), D, self.dropout, self.dtype, name="mlp")(
            h, deterministic
        )
        x = x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        return x


class GRN(nn.Module):
    """Global Response Normalization (the ConvNeXtV2-specific layer).

    gx = ||x||_2 over spatial dims per channel; nx = gx / mean_c(gx);
    out = gamma * x * nx + beta + x.  Input NHWC.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        # Norm computed in float32 for stability, result cast back.
        xf = x.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        out = gamma * (xf * nx) + beta + xf
        return out.astype(x.dtype)


def make_pool_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """(out_size, in_size) row-stochastic matrix implementing torch's
    adaptive_avg_pool1d windows: start=floor(i*n/o), end=ceil((i+1)*n/o).

    Adaptive 2D average pooling then becomes two small matmuls
    (out = P @ x @ P^T), which XLA maps straight onto the MXU — the TPU-native
    replacement for the reference's F.adaptive_avg_pool2d
    (reference models/vit.py:36, models/cnn.py:38).
    """
    import numpy as np

    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)
        mat[i, start:end] = 1.0 / (end - start)
    return jnp.asarray(mat)


def adaptive_avg_pool_nhwc(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch-parity adaptive average pool for NHWC tensors via separable matmuls."""
    H, W = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (H, W) == (oh, ow):
        return x
    ph = make_pool_matrix(H, oh).astype(x.dtype)
    pw = make_pool_matrix(W, ow).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", ph, x)
    x = jnp.einsum("pw,bowc->bopc", pw, x)
    return x


def global_avg_pool_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2))
