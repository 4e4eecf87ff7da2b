"""GumbelVQ VQGAN (flax, inference-first) for discrete image tokens.

Counterpart of the reference's vendored taming-transformers GumbelVQ
(ofasys/module/taming/models/vqgan.py + preprocessor/tokenizer/vqgan.py:30-71):
256x256 RGB -> 32x32 grid of codes from an 8192-entry codebook (f8), and
back. NHWC, GroupNorm+swish conv blocks, single mid attention. Weights load
from an .npz converted from the released torch checkpoint
(utils/torch_import.py); random init still exercises the full pipeline.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv1")(swish(h))
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv2")(swish(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        attn = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(C), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class VqganEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_in")(x)
        for i, m in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * m, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = nn.Conv(self.ch * m, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        return nn.Conv(self.z_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_out")(swish(h))


class VqganDecoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 4)
    num_res_blocks: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        for i, m in reversed(list(enumerate(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * m, dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        return nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_out")(swish(h))


class GumbelVQ(nn.Module):
    n_embed: int = 8192
    embed_dim: int = 256
    ch_mult: Sequence[int] = (1, 1, 2, 4)
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = VqganEncoder(ch_mult=self.ch_mult, z_channels=self.embed_dim, dtype=self.dtype)
        self.decoder = VqganDecoder(ch_mult=self.ch_mult, dtype=self.dtype)
        # Gumbel quantizer: conv -> codebook logits; codebook embeds codes
        self.quant_proj = nn.Conv(self.n_embed, (1, 1), dtype=self.dtype)
        self.codebook = nn.Embed(self.n_embed, self.embed_dim, dtype=self.dtype)
        self.post_quant_proj = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)

    def encode_codes(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [-1, 1] -> (B, h*w) int32 codes (hard argmax)."""
        z = self.encoder(images)
        logits = self.quant_proj(z)
        codes = jnp.argmax(logits, axis=-1)
        B, h, w = codes.shape
        return codes.reshape(B, h * w).astype(jnp.int32)

    def decode_codes(self, codes: jax.Array, grid: Optional[int] = None) -> jax.Array:
        """(B, h*w) codes -> (B, H, W, 3) images in [-1, 1]."""
        B, n = codes.shape
        g = grid or int(np.sqrt(n))
        z = self.codebook(codes.reshape(B, g, g))
        z = self.post_quant_proj(z)
        return self.decoder(z)

    def __call__(self, images: jax.Array):
        codes = self.encode_codes(images)
        return self.decode_codes(codes)


class VQGANTokenizer:
    """Host-facing wrapper (reference preprocessor/tokenizer/vqgan.py:30-71):
    jitted encode/decode with optional pretrained weights."""

    def __init__(self, code_image_size: int = 256, n_embed: int = 8192,
                 weights_path: Optional[str] = None, seed: int = 0):
        self.model = GumbelVQ(n_embed=n_embed)
        self.code_image_size = code_image_size
        dummy = jnp.zeros((1, code_image_size, code_image_size, 3), jnp.float32)
        if weights_path:
            import pickle

            with np.load(weights_path, allow_pickle=True) as data:
                self.params = pickle.loads(data["params"].tobytes()) if "params" in data else dict(data)
        else:
            # init through the full encode+decode path so every submodule
            # (encoder, codebook, decoder) materializes its params
            self.params = jax.jit(
                lambda r: self.model.init(r, dummy)["params"]
            )(jax.random.PRNGKey(seed))
        self._encode = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x, method=self.model.encode_codes)
        )
        self._decode = jax.jit(
            lambda p, c: self.model.apply({"params": p}, c, method=self.model.decode_codes)
        )

    @property
    def codes_per_image(self) -> int:
        down = 2 ** (len(self.model.ch_mult) - 1)
        return (self.code_image_size // down) ** 2

    def encode(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) float in [0,1] -> (B, n_codes) int32."""
        x = jnp.asarray(images, jnp.float32) * 2.0 - 1.0
        return np.asarray(self._encode(self.params, x))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes -> (B, H, W, 3) float in [0,1]."""
        img = self._decode(self.params, jnp.asarray(codes, jnp.int32))
        return np.asarray(jnp.clip((img + 1.0) / 2.0, 0.0, 1.0))
