"""Gaussian diffusion in JAX (reference ofasys/module/diffusion.py:19-173,
which wraps huggingface diffusers DDPM/DDIM schedulers — here the published
math is implemented directly; no diffusers dependency).

Supports epsilon- and x0-prediction, linear/cosine beta schedules, SNR loss
weighting, DDPM ancestral and DDIM sampling as lax.fori_loop, and
classifier-free guidance via a caller-supplied unconditional branch.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(schedule: str, num_steps: int) -> np.ndarray:
    if schedule == "linear":
        return np.linspace(1e-4, 0.02, num_steps, dtype=np.float64)
    if schedule == "cosine":
        s = 0.008
        t = np.linspace(0, num_steps, num_steps + 1) / num_steps
        f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
        betas = 1.0 - f[1:] / f[:-1]
        return np.clip(betas, 0, 0.999)
    if schedule == "scaled_linear":  # stable-diffusion style
        return np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, num_steps, dtype=np.float64) ** 2
    raise ValueError(f"unknown beta schedule {schedule!r}")


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    num_steps: int = 1000
    schedule: str = "cosine"
    prediction_type: str = "epsilon"    # 'epsilon' | 'sample'
    snr_gamma: Optional[float] = None   # min-SNR loss weighting

    def __post_init__(self):
        betas = make_betas(self.schedule, self.num_steps)
        alphas_bar = np.cumprod(1.0 - betas)
        object.__setattr__(self, "_betas", jnp.asarray(betas, jnp.float32))
        object.__setattr__(self, "_alphas_bar", jnp.asarray(alphas_bar, jnp.float32))

    # ------------------------------------------------------------- training
    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """x_t = sqrt(a_bar_t) x0 + sqrt(1-a_bar_t) eps; t: (B,) int."""
        ab = self._alphas_bar[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return jnp.sqrt(ab).reshape(shape) * x0 + jnp.sqrt(1 - ab).reshape(shape) * noise

    def training_target(self, x0: jax.Array, noise: jax.Array) -> jax.Array:
        return noise if self.prediction_type == "epsilon" else x0

    def loss_weight(self, t: jax.Array) -> jax.Array:
        """Min-SNR-gamma weighting (Hang et al.); 1.0 when disabled."""
        if self.snr_gamma is None:
            return jnp.ones_like(t, jnp.float32)
        ab = self._alphas_bar[t]
        snr = ab / jnp.maximum(1 - ab, 1e-8)
        if self.prediction_type == "epsilon":
            return jnp.minimum(self.snr_gamma / jnp.maximum(snr, 1e-8), 1.0)
        return jnp.minimum(snr, self.snr_gamma) / jnp.maximum(snr, 1e-8)

    def to_x0(self, x_t: jax.Array, t: jax.Array, pred: jax.Array) -> jax.Array:
        if self.prediction_type == "sample":
            return pred
        ab = self._alphas_bar[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
        return (x_t - jnp.sqrt(1 - ab) * pred) / jnp.sqrt(jnp.maximum(ab, 1e-8))

    # ------------------------------------------------------------- sampling
    def ddim_sample(
        self,
        denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],  # (x_t, t(B,)) -> pred
        shape: Tuple[int, ...],
        rng: jax.Array,
        num_inference_steps: int = 50,
        eta: float = 0.0,
        guidance_weight: float = 0.0,
        uncond_denoise_fn: Optional[Callable] = None,
        clamp_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    ) -> jax.Array:
        """Deterministic DDIM (eta=0) / stochastic (eta>0) sampling loop as a
        fori_loop; optional classifier-free guidance
        (reference DiffusionWrapper.sample, module/diffusion.py:103)."""
        steps = np.linspace(self.num_steps - 1, 0, num_inference_steps).round().astype(np.int32)
        steps_next = np.concatenate([steps[1:], [-1]]).astype(np.int32)
        steps = jnp.asarray(steps)
        steps_next = jnp.asarray(steps_next)

        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape, jnp.float32)

        def body(i, carry):
            x, rng = carry
            t = steps[i]
            t_next = steps_next[i]
            tb = jnp.full((shape[0],), t, jnp.int32)
            pred = denoise_fn(x, tb)
            if guidance_weight > 0 and uncond_denoise_fn is not None:
                pred_u = uncond_denoise_fn(x, tb)
                pred = pred_u + (1.0 + guidance_weight) * (pred - pred_u)
            x0 = self.to_x0(x, tb, pred)
            if clamp_fn is not None:
                x0 = clamp_fn(x0)
            ab_t = self._alphas_bar[t]
            ab_next = jnp.where(t_next >= 0, self._alphas_bar[jnp.maximum(t_next, 0)], 1.0)
            eps = (x - jnp.sqrt(ab_t) * x0) / jnp.sqrt(jnp.maximum(1 - ab_t, 1e-8))
            sigma = eta * jnp.sqrt(jnp.maximum((1 - ab_next) / jnp.maximum(1 - ab_t, 1e-8), 0)
                                   * jnp.maximum(1 - ab_t / jnp.maximum(ab_next, 1e-8), 0))
            dir_xt = jnp.sqrt(jnp.maximum(1 - ab_next - sigma ** 2, 0.0)) * eps
            rng, nrng = jax.random.split(rng)
            noise = jax.random.normal(nrng, shape, jnp.float32)
            x_next = jnp.sqrt(ab_next) * x0 + dir_xt + sigma * noise
            return (x_next, rng)

        x, _ = jax.lax.fori_loop(0, len(steps), body, (x, rng))
        return x
