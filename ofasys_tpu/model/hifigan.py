"""HiFi-GAN generator (vocoder) in flax
(reference ofasys/module/hifigan.py:115: the V1 generator used to vocode TTS
mel output; discriminators are training-time only and out of scope here).

Architecture: conv_pre -> [transposed-conv upsample -> multi-receptive-field
fusion (parallel residual dilated conv stacks)] x4 -> conv_post -> tanh.
Weights import from a converted torch checkpoint; Griffin-Lim remains the
hermetic fallback (preprocessor/audio.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class HifiGanConfig:
    num_mels: int = 80
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int
    dilations: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            pad = (self.kernel_size - 1) * d // 2
            h = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                        padding=[(pad, pad)], dtype=self.dtype, name=f"convs1_{i}")(lrelu(x))
            pad2 = (self.kernel_size - 1) // 2
            h = nn.Conv(self.channels, (self.kernel_size,), padding=[(pad2, pad2)],
                        dtype=self.dtype, name=f"convs2_{i}")(lrelu(h))
            x = x + h
        return x


class HifiGanGenerator(nn.Module):
    cfg: HifiGanConfig = field(default_factory=HifiGanConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """(B, T, num_mels) log-mel -> (B, T * prod(rates)) waveform."""
        cfg = self.cfg
        x = nn.Conv(cfg.upsample_initial_channel, (7,), padding=[(3, 3)],
                    dtype=self.dtype, name="conv_pre")(mel)
        for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            # the SAME-padding equivalence below requires even k - rate;
            # odd configs would silently misalign vs torch, so fail loudly
            assert (k - rate) % 2 == 0, (
                f"upsample stage {i}: kernel {k} - rate {rate} must be even "
                f"for ConvTranspose SAME-padding parity with torch"
            )
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            # SAME padding with a spatially-flipped kernel is exactly torch's
            # ConvTranspose1d(k, r, padding=(k-r)//2) for even k-r (measured
            # 6e-8 max delta); hifigan_to_flax_params does the flip on import
            x = nn.ConvTranspose(ch, (k,), strides=(rate,), padding="SAME",
                                 dtype=self.dtype, name=f"ups_{i}")(lrelu(x))
            acc = None
            for j, (ks, ds) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
                h = ResBlock1(ch, ks, ds, dtype=self.dtype, name=f"resblocks_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(cfg.resblock_kernel_sizes)
        # the reference's final activation is F.leaky_relu's default 0.01
        # slope, NOT the 0.1 used everywhere else (module/hifigan.py:158)
        x = nn.Conv(1, (7,), padding=[(3, 3)], dtype=self.dtype,
                    name="conv_post")(jax.nn.leaky_relu(x, 0.01))
        return jnp.tanh(x)[..., 0]


class HifiGanVocoder:
    """Host wrapper mirroring VQGANTokenizer: jitted mel -> waveform."""

    def __init__(self, cfg: Optional[HifiGanConfig] = None,
                 weights_path: Optional[str] = None, seed: int = 0):
        self.cfg = cfg or HifiGanConfig()
        self.model = HifiGanGenerator(self.cfg)
        dummy = jnp.zeros((1, 8, self.cfg.num_mels), jnp.float32)
        if weights_path and weights_path.endswith((".pt", ".ckpt", ".pth")):
            from ofasys_tpu.utils.torch_import import (
                check_converted_params, hifigan_to_flax_params, load_torch_checkpoint,
            )

            self.params = hifigan_to_flax_params(
                load_torch_checkpoint(weights_path),
                num_kernels=len(self.cfg.resblock_kernel_sizes),
            )
            check_converted_params(self.params, self.model, dummy, "hifigan_to_flax_params")
        elif weights_path:
            import pickle

            with np.load(weights_path, allow_pickle=True) as data:
                self.params = pickle.loads(data["params"].tobytes())
        else:
            self.params = jax.jit(lambda r: self.model.init(r, dummy)["params"])(
                jax.random.PRNGKey(seed)
            )
        self._apply = jax.jit(lambda p, m: self.model.apply({"params": p}, m))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.cfg.upsample_rates))

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        """(T, num_mels) or (B, T, num_mels) -> waveform(s)."""
        squeeze = mel.ndim == 2
        m = jnp.asarray(mel[None] if squeeze else mel, jnp.float32)
        wav = np.asarray(self._apply(self.params, m))
        return wav[0] if squeeze else wav
