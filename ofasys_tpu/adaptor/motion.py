"""Motion 6D adaptor (reference ofasys/adaptor/motion_6d.py, 129 LoC):
continuous-feature linear adaptor for the diffusion decoder. The diffusion
timestep arrives in the slot value as ``noise_level`` (reference
module/diffusion.py denoise_fn contract) and enters as a sinusoidal+MLP
embedding added to every frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.adaptor.base import AdaptorOutput, BaseAdaptor, BaseAdaptorConfig
from ofasys_tpu.configure import register_config
from ofasys_tpu.utils.pytree import SlotBatch


@dataclass
class Motion6dAdaptorConfig(BaseAdaptorConfig):
    feature_dim: int = 135      # 3 + 22 joints * 6
    time_embed_dim: int = 256


def sinusoidal_embedding(t: jax.Array, dim: int) -> jax.Array:
    """(B,) int timesteps -> (B, dim) sinusoidal features."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


@register_config("ofasys.adaptor", "motion_6d", Motion6dAdaptorConfig)
class Motion6dAdaptor(BaseAdaptor):
    def setup(self):
        self.out_proj_feat = nn.Dense(self.adaptor_cfg.feature_dim, dtype=jnp.float32,
                                      param_dtype=jnp.float32)

    @nn.compact
    def __call__(self, slot: SlotBatch, deterministic: bool = True) -> AdaptorOutput:
        acfg = self.adaptor_cfg
        value = slot.value["value"].astype(self.dtype)         # (B, T, F)
        masks = slot.value.get("masks")                        # (B, T) True=valid
        B, T, F = value.shape
        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="in_proj")(value)

        # always run the time branch so its params exist from init; without a
        # diffusion step the t=0 embedding acts as a learned constant
        noise_level = slot.value.get("noise_level")
        t = noise_level if noise_level is not None else jnp.zeros((B,), jnp.int32)
        te = sinusoidal_embedding(t, acfg.time_embed_dim)
        te = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="time_mlp1")(te)
        te = jax.nn.silu(te)
        te = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32, name="time_mlp2")(te)
        x = x + te[:, None, :]

        padding_mask = jnp.logical_not(masks) if masks is not None else jnp.zeros((B, T), bool)
        max_pos = self.cfg.max_target_positions
        pos_embed = nn.Embed(max_pos + 2, self.embed_dim, dtype=self.dtype,
                             embedding_init=nn.initializers.normal(0.02),
                             name="embed_positions")(jnp.arange(T)[None, :])
        out = AdaptorOutput(
            embed=x, padding_mask=padding_mask, pos_embed=pos_embed,
            rel_bucket=None, rel_tables=None, modal_id=slot.modality.value - 1,
        )
        return self.finish(slot, out, deterministic=deterministic)

    def forward_output(self, x: jax.Array, extra: Dict[str, Any], slot: SlotBatch):
        return self.out_proj_feat(x.astype(jnp.float32)), extra
