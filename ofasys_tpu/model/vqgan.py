"""GumbelVQ VQGAN (flax, inference-first) for discrete image tokens.

Counterpart of the reference's vendored taming-transformers GumbelVQ
(ofasys/module/taming/models/vqgan.py + preprocessor/tokenizer/vqgan.py:30-71):
256x256 RGB -> 32x32 grid of codes from an 8192-entry codebook (f8), and
back. NHWC, GroupNorm+swish conv blocks, attention at the configured
resolutions plus the mid stack (taming modules/diffusionmodules/model.py).

Structure matches the released gumbel_f8_8192 checkpoint exactly:
encoder -> quant_conv (z_channels->embed_dim 1x1) -> quantize.proj logits
-> codebook -> post_quant_conv (embed_dim->z_channels) -> decoder; the
encoder's Downsample pads asymmetrically ((0,1),(0,1)) like taming's
"no asymmetric padding in torch conv, must do it ourselves" path. Weights
load from the released torch checkpoint via
utils/torch_import.taming_to_flax_params, or from a converted .npz; random
init still exercises the full pipeline (zero-egress fallback).
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
    resolution: int = 256
    attn_resolutions: Sequence[int] = (32,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_in")(x)
        res = self.resolution
        for i, m in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * m, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
                if res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                # taming Downsample: asymmetric (0,1)x(0,1) zero pad + VALID
                # stride-2 conv (model.py:57-69)
                h = nn.Conv(self.ch * m, (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)],
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
                res //= 2
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        return nn.Conv(self.z_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_out")(swish(h))


class VqganDecoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 4)
    num_res_blocks: int = 2
    resolution: int = 256
    attn_resolutions: Sequence[int] = (32,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        res = self.resolution // 2 ** (len(self.ch_mult) - 1)
        for i, m in reversed(list(enumerate(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * m, dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
                if res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
                res *= 2
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        return nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv_out")(swish(h))


class GumbelVQ(nn.Module):
    n_embed: int = 8192
    embed_dim: int = 256
    z_channels: int = 256
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 4)
    num_res_blocks: int = 2
    resolution: int = 256
    attn_resolutions: Sequence[int] = (32,)
    dtype: Any = jnp.float32

    def setup(self):
        kw = dict(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            resolution=self.resolution, attn_resolutions=self.attn_resolutions,
            dtype=self.dtype,
        )
        self.encoder = VqganEncoder(z_channels=self.z_channels, **kw)
        self.decoder = VqganDecoder(**kw)
        # taming chain: quant_conv (z_channels -> embed_dim 1x1), then the
        # Gumbel quantizer's proj (-> codebook logits); decode goes codebook
        # -> post_quant_conv (embed_dim -> z_channels) -> decoder
        # (reference module/taming/models/vqgan.py:40-41,207-209,
        # modules/vqvae/quantize.py:143-144)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)
        self.quant_proj = nn.Conv(self.n_embed, (1, 1), dtype=self.dtype)
        self.codebook = nn.Embed(self.n_embed, self.embed_dim, dtype=self.dtype)
        self.post_quant_proj = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def encode_codes(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [-1, 1] -> (B, h*w) int32 codes (hard argmax).

        Known deviation: the reference's GumbelQuantize applies
        F.gumbel_softmax (i.e. adds gumbel NOISE) even in eval mode before
        its argmax (taming modules/vqvae/quantize.py:160), so token-level
        parity with the real reference tokenizer is inherently approximate —
        only this noiseless path is pinned by tests. Do not chase residual
        token diffs against a real taming checkpoint as a converter bug."""
        z = self.quant_conv(self.encoder(images))
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
    jitted encode/decode with optional pretrained weights.

    ``weights_path`` accepts either a converted .npz (pickled flax params) or
    a raw taming torch checkpoint (.pt/.ckpt), which is mapped through
    utils/torch_import.taming_to_flax_params on load."""

    def __init__(self, code_image_size: int = 256, n_embed: int = 8192,
                 weights_path: Optional[str] = None, seed: int = 0):
        self.model = GumbelVQ(n_embed=n_embed, resolution=code_image_size)
        self.code_image_size = code_image_size
        dummy = jnp.zeros((1, code_image_size, code_image_size, 3), jnp.float32)
        if weights_path and weights_path.endswith((".pt", ".ckpt", ".pth")):
            from ofasys_tpu.utils.torch_import import (
                check_converted_params, load_torch_checkpoint, taming_to_flax_params,
            )

            self.params = taming_to_flax_params(load_torch_checkpoint(weights_path))
            check_converted_params(self.params, self.model, dummy, "taming_to_flax_params")
        elif weights_path:
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
