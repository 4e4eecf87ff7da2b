"""ResNet trunk for the image adaptor (reference ofasys/module/resnet.py).

TPU-first: NHWC layout (XLA's native conv layout), bf16 matmul/conv with
fp32 norm statistics. Normalization is FrozenBatchNorm — affine params are
trainable, running statistics are imported constants (the reference trains
with (sync)BatchNorm but freezes it in most recipes,
adaptor/image_resnet.py:107-114; frozen stats keep the module a pure
function of params, which is what jit wants).

Only the first 3 stages run (the reference discards layer4: the adaptor
takes the stride-16 feature map).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

STAGE_BLOCKS = {
    "resnet50": (3, 4, 6),
    "resnet101": (3, 4, 23),
    "resnet152": (3, 8, 36),
}


class FrozenBatchNorm(nn.Module):
    """y = (x - mean) / sqrt(var + eps) * scale + bias with stored stats."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype))


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        norm = lambda f, name: FrozenBatchNorm(f, dtype=self.dtype, name=name)
        residual = x
        y = nn.relu(norm(self.features, "bn1")(conv(self.features, 1, 1, "conv1")(x)))
        y = nn.relu(norm(self.features, "bn2")(conv(self.features, 3, self.stride, "conv2")(y)))
        y = norm(self.features * 4, "bn3")(conv(self.features * 4, 1, 1, "conv3")(y))
        if self.drop_path_rate > 0.0:
            # stochastic depth (reference module/resnet.py:114,133 DropPath):
            # per-sample Bernoulli drop of the residual branch, scaled 1/keep
            y = nn.Dropout(self.drop_path_rate, broadcast_dims=(1, 2, 3))(
                y, deterministic=deterministic)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = norm(self.features * 4, "downsample_bn")(
                conv(self.features * 4, 1, self.stride, "downsample_conv")(x)
            )
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """3-stage ResNet trunk; input NHWC in [-1, 1]-ish normalized space,
    output (B, H/16, W/16, 1024)."""

    resnet_type: str = "resnet50"
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        blocks = STAGE_BLOCKS[self.resnet_type]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (feats, n) in enumerate(zip((64, 128, 256), blocks)):
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                x = Bottleneck(feats, stride, self.drop_path_rate, dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(x, deterministic=deterministic)
        return x
