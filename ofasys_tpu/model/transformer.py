"""Unified transformer encoder/decoder (flax.linen).

TPU-first re-design of the reference stack (ofasys/model/transformer.py,
ofasys/module/transformer_layer.py, ofasys/module/multihead_attention.py):

  * batch-major (B, T, E) everywhere; matmuls in bf16 with fp32 accumulators.
  * relative-position bias is NOT materialized per layer up front: layers
    receive a static (T, T) bucket matrix plus stacked per-layer tables and
    gather the bias lazily right where attention consumes it.
  * incremental decoding uses an explicit KV-cache pytree (no module state),
    so the whole decode loop jits as a lax.while_loop.
  * normformer options of the reference ("unify" model defaults): pre-LN,
    scale_attn (post-attention LN), scale_fc (mid-FFN LN), scale_heads
    (per-head output scaling), scale_resids; q-scaling is
    (head_dim * attn_scale_factor) ** -0.5 with scale_factor=2
    (reference multihead_attention.py:54).

Parity-critical numerics: LayerNorm eps 1e-5 (torch default), exact
(erf-based) gelu (torch F.gelu default), fp32 softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.model.config import GeneralistModelConfig
from ofasys_tpu.ops.attention import causal_mask, dot_product_attention
from ofasys_tpu.ops.pallas_attention import flash_supported
from ofasys_tpu.ops.quant import QuantDense, int8_train_matmul


def _flash_available() -> bool:
    import jax as _jax

    return _jax.default_backend() in ("tpu", "axon")

LN_EPS = 1e-5


def _remat_policy(cfg: "GeneralistModelConfig"):
    """jax.checkpoint policy for cfg.remat:

    'full'  — save only layer inputs, recompute everything in the backward
              (max memory saving, +1 forward of FLOPs).
    'dots'  — save matmul (contraction) results, recompute the elementwise
              chains (LN, gelu, residual adds) in the backward: the standard
              transformer policy (dots_with_no_batch_dims_saveable). Costs
              almost no extra FLOPs (elementwise only) while cutting the
              saved-residual HBM traffic between forward and backward.
    """
    if cfg.remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None


def _maybe_remat(layer_cls, cfg: "GeneralistModelConfig", static_argnums):
    if cfg.remat == "full":
        return nn.remat(layer_cls, static_argnums=static_argnums)
    if cfg.remat == "dots":
        return nn.remat(
            layer_cls, static_argnums=static_argnums, policy=_remat_policy(cfg)
        )
    if cfg.remat != "none":
        raise ValueError(
            f"unknown remat mode {cfg.remat!r}; expected 'none', 'full' or 'dots'"
        )
    return layer_cls


def make_ln(cfg: "GeneralistModelConfig", dtype, name: str):
    """LayerNorm per cfg.ln_impl: 'xla' (nn.LayerNorm, compiler-fused),
    'hybrid' (XLA forward + Pallas backward), 'pallas' (Pallas both ways).
    All three share parameter names ('scale'/'bias'). Numerics: identical
    in f32; under bf16 compute, hybrid/pallas do the normalize+affine in
    f32 and round once at the end, while nn.LayerNorm(dtype=bf16) rounds
    intermediates to bf16 — a one-ulp-class divergence, not bitwise."""
    impl = getattr(cfg, "ln_impl", "xla")
    if impl in ("hybrid", "pallas"):
        from ofasys_tpu.ops.pallas_layernorm import FusedLayerNorm

        mode = "hybrid" if impl == "hybrid" else "fused"
        return FusedLayerNorm(epsilon=LN_EPS, dtype=dtype, mode=mode, name=name)
    if impl != "xla":
        raise ValueError(f"unknown ln_impl {impl!r}; expected 'xla', 'hybrid' or 'pallas'")
    return nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name=name)


def _is_moe_layer(cfg: "GeneralistModelConfig", i: int) -> bool:
    """Every moe_every_n-th layer (1-based) carries the MoE FFN."""
    return cfg.moe_experts > 0 and (i + 1) % max(cfg.moe_every_n, 1) == 0


def get_activation_fn(name: str) -> Callable:
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_fast" or name == "gelu_accurate":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    if name == "tanh":
        return jnp.tanh
    if name == "linear":
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")


def _make_bias_gather(bucket_np: np.ndarray, n_buckets: int, dtype):
    """All-layers bias gather with a GEMM-based backward.

    Forward: ONE gather ``tables[:, bucket]`` for the whole stack (the
    per-layer gathers cannot be CSE'd — each layer indexes a different
    table — so gathering stacked is itself a dedup win). Backward: instead
    of XLA's per-element scatter-add into the (n_buckets, H) tables (an
    xplane profile showed six ~1 ms scatter fusions per update running at
    ~3 GB/s — 0% of HBM peak), contract the bias cotangent against a
    one-hot bucket matrix on the MXU and scatter only the ~hundreds of
    COMPACT (actually-used) bucket rows back.
    """
    used, inv = np.unique(bucket_np, return_inverse=True)
    Tq, Tk = bucket_np.shape
    nbu = int(used.size)

    def _gather_impl(tables):                            # (L, nb, H)
        # transpose the TABLES (tiny: L x nb x H), not the gathered output:
        # indexing the minor axis of (L, H, nb) writes (L, H, Tq, Tk)
        # directly in the layout attention consumes. The previous
        # gather-then-transpose form lowered to a (Tq*Tk, L, H) row gather
        # at 12 GB/s (2% of HBM peak, r4 roofline) plus a full-size copy.
        tt = jnp.transpose(tables, (0, 2, 1))            # (L, H, nb)
        return tt[:, :, jnp.asarray(bucket_np)]          # (L, H, Tq, Tk)

    @jax.custom_vjp
    def gather(tables):
        return _gather_impl(tables)

    def fwd(tables):
        return _gather_impl(tables), None

    def bwd(_, g):                                       # g (L, H, Tq, Tk)
        L, H = g.shape[:2]
        g2 = g.reshape(L * H, Tq * Tk)
        onehot = (
            jnp.asarray(inv.reshape(-1).astype(np.int32))[:, None]
            == jnp.arange(nbu, dtype=jnp.int32)[None, :]
        )                                                # (Tq*Tk, nbu) exact 0/1
        dused = jax.lax.dot_general(
            g2.astype(jnp.bfloat16), onehot.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(L, H, nbu)
        dt = jnp.zeros((L, n_buckets, H), dtype).at[:, jnp.asarray(used)].add(
            jnp.transpose(dused, (0, 2, 1)).astype(dtype)
        )
        return (dt,)

    gather.defvjp(fwd, bwd)
    return gather


def gather_all_biases(tables: jax.Array, bucket: np.ndarray) -> jax.Array:
    """(n_tables, n_buckets, H) tables + static (Tq, Tk) bucket ->
    (n_tables, H, Tq, Tk), one gather for the whole layer stack.

    On TPU the backward runs as a one-hot GEMM (see _make_bias_gather);
    on CPU plain autodiff keeps exact scatter-add numerics for the
    parity suite (the GEMM rounds the cotangent to bf16)."""
    bucket_np = np.asarray(bucket)
    if jax.default_backend() in ("tpu", "axon"):
        return _make_bias_gather(bucket_np, tables.shape[1], tables.dtype)(tables)
    rel = tables[:, jnp.asarray(bucket_np)]
    return jnp.transpose(rel, (0, 3, 1, 2))


@dataclasses.dataclass(frozen=True)
class BiasSpec:
    """Lazy self-attention bias: per-layer relative tables + shared absolute
    position bias. ``bucket`` is a host-side constant (static per template);
    tables come from adaptor params.

    bucket: (T, T) int32 — indexes into the combined table's bucket axis
            (row 0 of the table is the zero/no-bias bucket).
    tables: (n_tables, n_buckets, H) — n_tables is 1 (shared) or n_layers.
    abs_bias: (B or 1, H, T, T) or None — abs-position q/k bias, layer-shared.
    """

    bucket: Optional[np.ndarray] = None
    tables: Optional[jax.Array] = None
    abs_bias: Optional[jax.Array] = None

    def stacked(self) -> Optional[jax.Array]:
        """(n_tables, H, Tq, Tk) relative biases for every layer, gathered
        ONCE per trace (cached on the instance — BiasSpec lives inside one
        forward trace). Training/eval paths route through this; incremental
        decoding keeps the O(rows) layer_bias_rows gather."""
        if self.tables is None or self.bucket is None:
            return None
        cached = getattr(self, "_stacked_cache", None)
        if cached is None:
            cached = gather_all_biases(self.tables, self.bucket)
            object.__setattr__(self, "_stacked_cache", cached)
        return cached

    def layer_bias(self, layer_idx: int, rows: Optional[slice] = None) -> Optional[jax.Array]:
        """Additive bias for one layer, shape (B|1, H, Tq, Tk). ``rows``
        selects query rows for incremental decoding."""
        out = None
        st = self.stacked()
        if st is not None:
            sel = st[min(layer_idx, st.shape[0] - 1)]
            if rows is not None:
                sel = sel[:, rows]
            out = sel[None]                        # (1, H, Tq, Tk)
        if self.abs_bias is not None:
            ab = self.abs_bias if rows is None else self.abs_bias[:, :, rows]
            out = ab if out is None else out + ab
        return out

    def layer_bias_rows(self, layer_idx: int, start: jax.Array, size: int) -> Optional[jax.Array]:
        """Decode-path bias: only ``size`` query rows starting at traced
        ``start`` — gathers O(size * Tk) instead of materializing the full
        (H, Tq, Tk) bias every step."""
        out = None
        if self.tables is not None and self.bucket is not None:
            n_tables = self.tables.shape[0]
            rows = jax.lax.dynamic_slice_in_dim(jnp.asarray(self.bucket), start, size, axis=0)
            rel = self.tables[min(layer_idx, n_tables - 1)][rows]   # (size, Tk, H)
            out = jnp.transpose(rel, (2, 0, 1))[None]               # (1, H, size, Tk)
        if self.abs_bias is not None:
            ab = jax.lax.dynamic_slice_in_dim(self.abs_bias, start, size, axis=2)
            out = ab if out is None else out + ab
        return out


class MultiheadAttention(nn.Module):
    """QKV attention with additive bias, per-head output scaling, and an
    explicit KV cache (reference module/multihead_attention.py:21-455)."""

    embed_dim: int
    num_heads: int
    scale_factor: float = 2.0
    scale_heads: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    # context parallelism (cfg.sequence_parallel): self-attention in the
    # training path routes through parallel.ring_attention over the
    # 'sequence' mesh axis when shapes divide; composes with data ('data',
    # 'fsdp' batch axes) and tensor ('tensor' head axis) parallelism
    mesh: Any = None
    seq_parallel: bool = False
    # int8 serving (ops/quant.py): how QuantDense consumes a 'qkern'
    # collection when one is supplied; inert during training
    qmode: str = "w8a8"
    # int8 quantized training (cfg.quant_training='fwd'): forward projections
    # contract on the int8 MXU with a straight-through bf16 backward; only
    # active on non-deterministic (training) calls so eval/decode stay exact
    qtrain: bool = False
    # cfg.attn_logits='compute': materialized (B,H,T,T) scores stored in the
    # compute dtype (softmax math stays fp32) — see model/config.py
    logits_compute: bool = False
    # cfg.fuse_qkv: projections of the same input run as ONE GEMM (the
    # kernels concatenate at compute time; param layout unchanged)
    fuse_qkv: bool = True
    # cfg.attn_layout: memory layout of q/k/v through the XLA dense path.
    # 'bhtd' transposes to the batched-matmul-native (B,H,T,D) form right at
    # the projection GEMMs (and back right before out_proj), so the layout
    # change fuses into the GEMM epilogues instead of XLA inserting copy
    # passes around the score matmuls
    attn_layout: str = "bthd"
    # cfg.attn_kernel: 'auto' | 'xla' | 'pallas' — short-sequence fused
    # Pallas attention on training-shape calls (see model/config.py)
    attn_kernel: str = "auto"

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                      # (B, Tq, E)
        key_value: Optional[jax.Array] = None, # (B, Tk, E); None = self-attn
        *,
        bias: Optional[jax.Array] = None,      # additive (B|1, H, Tq, Tk)
        mask: Optional[jax.Array] = None,      # bool keep-mask (B|1, 1|H, Tq, Tk)
        causal: bool = False,
        use_flash: bool = False,
        deterministic: bool = True,
        cache: Optional[Dict[str, jax.Array]] = None,
        static_kv: bool = False,
    ) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
        head_dim = self.embed_dim // self.num_heads
        scaling = float(head_dim * self.scale_factor) ** -0.5
        kv_in = query if key_value is None else key_value

        dense = lambda name: QuantDense(
            self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
            qmode=self.qmode, qtrain=self.qtrain and not deterministic, name=name,
        )
        def _proj(mods, x):
            """Projections of one input as a single fused GEMM (fuse_qkv):
            kernels concatenate along the output axis — the concat is
            loop-invariant so XLA hoists it out of decode while_loops — and
            the input is read once instead of len(mods) times. Falls back to
            per-projection calls under int8 serving (per-kernel scales live
            in 'qkern')."""
            if len(mods) == 1 or not self.fuse_qkv:
                return [m(x) for m in mods]
            pp = [m(x, return_params=True) for m in mods]
            if any(p is None for p in pp):
                return [m(x) for m in mods]
            w = jnp.concatenate([p[0] for p in pp], axis=-1)
            if self.qtrain and not deterministic:
                # int8 quantized training: per-out-channel weight scales of
                # the concatenated kernel equal the per-kernel ones, so the
                # fused forward is bit-identical to three separate calls
                y = int8_train_matmul(x.astype(self.dtype), w)
            else:
                y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
            if pp[0][1] is not None:
                y = y + jnp.concatenate([p[1] for p in pp]).astype(self.dtype)
            return jnp.split(y, len(mods), axis=-1)

        B, Tq = query.shape[:2]
        if cache is not None and static_kv:
            # cross-attention at decode time: k/v computed once, reused
            (q,) = _proj([dense("q_proj")], query)
            q = q.reshape(B, Tq, self.num_heads, head_dim)
            k, v = cache["k"], cache["v"]
        else:
            if key_value is None:
                q, k, v = _proj(
                    [dense("q_proj"), dense("k_proj"), dense("v_proj")], query
                )
            else:
                (q,) = _proj([dense("q_proj")], query)
                k, v = _proj([dense("k_proj"), dense("v_proj")], kv_in)
            q = q.reshape(B, Tq, self.num_heads, head_dim)
            k = k.reshape(B, kv_in.shape[1], self.num_heads, head_dim)
            v = v.reshape(B, kv_in.shape[1], self.num_heads, head_dim)
            if cache is not None:
                # incremental self-attention: write the new step(s) at cache index
                idx = cache["index"]
                k = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, idx, 0, 0))
                v = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, idx, 0, 0))
                cache = {"k": k, "v": v, "index": idx + Tq}
                # mask out not-yet-written cache positions; for multi-token
                # steps (speculative verify) each new row j may see only
                # cache + rows <= j, keeping the step causal within itself
                Tk = k.shape[1]
                row_limit = idx + 1 + jnp.arange(Tq)[:, None]       # (Tq, 1)
                valid = jnp.arange(Tk)[None, :] < row_limit          # (Tq, Tk)
                valid = valid[None, None]                            # (1, 1, Tq, Tk)
                mask = valid if mask is None else jnp.logical_and(mask, valid)

        dropout_rng = None
        dropout = self.dropout if not deterministic else 0.0
        if dropout > 0.0:
            dropout_rng = self.make_rng("dropout")
        Tq_, Tk_ = q.shape[1], k.shape[1]
        ring_ok = False
        if (self.seq_parallel and self.mesh is not None
                and "sequence" in self.mesh.shape and self.mesh.shape["sequence"] > 1):
            n_seq = self.mesh.shape["sequence"]
            dp = self.mesh.shape.get("data", 1) * self.mesh.shape.get("fsdp", 1)
            tp = self.mesh.shape.get("tensor", 1)
            ring_ok = (
                cache is None and key_value is None and dropout == 0.0
                and Tq_ == Tk_ and Tq_ % n_seq == 0
                and B % dp == 0 and self.num_heads % tp == 0
                and (mask is None or (mask.ndim == 4 and mask.shape[1] == 1
                                      and mask.shape[2] == 1 and mask.shape[0] == B))
            )
            if not ring_ok and cache is None and key_value is None:
                # the user asked for sequence parallelism and this IS a
                # training self-attention — falling back to dense replicates
                # the full (B, H, T, T) scores on every device, silently
                # defeating the feature (and likely OOMing at long T)
                import warnings

                warnings.warn(
                    "sequence_parallel requested but ring attention gate "
                    f"failed for self-attention (B={B}, T={Tq_}, "
                    f"heads={self.num_heads}, dropout={dropout}, "
                    f"mesh sequence={n_seq}, data*fsdp={dp}, tensor={tp}); "
                    "falling back to DENSE attention. Check divisibility "
                    "(T %% sequence, B %% data*fsdp, heads %% tensor) and "
                    "attention_dropout == 0.",
                    stacklevel=2,
                )
        flash_ok = (
            not ring_ok
            and use_flash and cache is None and dropout == 0.0
            and _flash_available() and flash_supported(Tq_, Tk_, head_dim, dropout)
            and (mask is None or (mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1))
        )
        if ring_ok:
            from ofasys_tpu.parallel.ring_attention import ring_attention

            x = ring_attention(
                q, k, v, self.mesh, scale=scaling, causal=causal,
                bias=bias, mask=mask,
                batch_axis=("data", "fsdp"), head_axis="tensor",
            ).astype(self.dtype)
        elif flash_ok:
            from ofasys_tpu.ops.pallas_attention import flash_attention

            # MEASURED WASH (r5): handing the kernel (B,H,T,D) via
            # layout='bhtd' with the transposes moved next to the
            # projection GEMMs changed nothing end-to-end at T=4096
            # (11.97 vs 11.95 samples/s) — XLA already fuses/overlaps the
            # relayouts it keeps. Plain layout stays for simplicity; the
            # wrapper's layout knob remains for callers that hold bhtd.
            x = flash_attention(
                q, k, v, bias=bias, mask=mask, scale=scaling, causal=causal
            ).astype(self.dtype)
        else:
            # short-sequence fused kernel (ops/pallas_dense_attention.py):
            # training-shape calls with batch-shared bias and padding-only
            # masks run one whole-T Pallas program per (b, h) — no score
            # HBM round-trip, no XLA layout copies around the score matmuls
            from ofasys_tpu.ops.pallas_dense_attention import (
                dense_attention, dense_supported,
            )

            bhtd = False
            dense_ok = (
                self.attn_kernel in ("auto", "pallas")
                and cache is None
                and (jax.default_backend() in ("tpu", "axon")
                     or self.attn_kernel == "pallas")
                and dense_supported(B, Tq_, Tk_, head_dim, self.num_heads, dropout)
                and (bias is None
                     or (bias.ndim == 4 and bias.shape[0] == 1
                         and bias.shape[2] == Tq_ and bias.shape[3] == Tk_))
                and (mask is None
                     or (mask.ndim == 4 and mask.shape[0] in (1, B)
                         and mask.shape[1] == 1 and mask.shape[2] == 1
                         and mask.shape[3] == Tk_))
            )
            if dense_ok:
                x = dense_attention(
                    q, k, v, bias=bias, mask=mask, scale=scaling, causal=causal
                ).astype(self.dtype)
            else:
                eff_mask = mask
                if causal:
                    from ofasys_tpu.ops.attention import causal_mask as _cm

                    cm = _cm(Tq_, Tk_)
                    eff_mask = cm if eff_mask is None else jnp.logical_and(eff_mask, cm)
                # gate on batch*rows (static at trace time): training-sized
                # calls win ~2% from GEMM-fused transposes; tiny serving
                # shapes (B=1 encoder inside a decode program) measured
                # ~2-3ms SLOWER with them, so they keep the plain layout
                bhtd = (self.attn_layout == "bhtd" and cache is None
                        and B * Tq_ >= 256)
                if bhtd:
                    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
                x = dot_product_attention(
                    q, k, v,
                    bias=bias, mask=eff_mask, scale=scaling,
                    dropout_rate=dropout, dropout_rng=dropout_rng,
                    dtype=self.dtype,
                    logits_dtype=self.dtype if self.logits_compute else None,
                    layout="bhtd" if bhtd else "bthd",
                )
                if bhtd:
                    # restore (B,T,H,D) for the epilogue (and the observer
                    # branch)
                    q, k = q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3)
                    x = x.transpose(0, 2, 1, 3)
        if self.is_mutable_collection("intermediates"):
            # observers (guided-attention loss) request probabilities by
            # making 'intermediates' mutable; this branch never traces in
            # normal training/decoding, so the extra softmax costs nothing
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk",
                (q * scaling).astype(jnp.float32), k.astype(jnp.float32),
            )
            if bias is not None:
                logits = logits + bias.astype(jnp.float32)
            obs_mask = mask
            if causal:
                from ofasys_tpu.ops.attention import causal_mask as _cm

                cm = _cm(Tq_, Tk_)
                obs_mask = cm if obs_mask is None else jnp.logical_and(obs_mask, cm)
            if obs_mask is not None:
                logits = jnp.where(obs_mask, logits, -1e9)
            self.sow("intermediates", "attn_probs", jax.nn.softmax(logits, axis=-1))

        if self.scale_heads:
            c_attn = self.param("c_attn", nn.initializers.ones, (self.num_heads,), jnp.float32)
            x = x * c_attn.astype(self.dtype)[None, None, :, None]
        x = x.reshape(B, Tq, self.embed_dim)
        x = dense("out_proj")(x)
        return x, cache

    @staticmethod
    def init_cache(batch: int, max_len: int, num_heads: int, head_dim: int, dtype=jnp.bfloat16):
        return {
            "k": jnp.zeros((batch, max_len, num_heads, head_dim), dtype),
            "v": jnp.zeros((batch, max_len, num_heads, head_dim), dtype),
            "index": jnp.zeros((), jnp.int32),
        }


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (reference module/droppath.py).
    ``rate`` may also be passed at call time as a traced scalar — required by
    the scan-over-layers path where per-layer rates ride through lax.scan."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        if rate is None:
            if self.rate == 0.0 or deterministic:
                return x
            keep = 1.0 - self.rate
        else:
            if deterministic:
                return x
            keep = 1.0 - rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        keep = jnp.asarray(keep, x.dtype)  # no bf16 -> fp32 promotion in scan carry
        return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


class FeedForward(nn.Module):
    """FFN with optional mid-LN (scale_fc) and per-modality experts.

    modal_ffn TPU design: slot spans in the concatenated sequence are static
    (they come from the task template), so expert routing is static slicing —
    each contiguous span runs through its modality's expert with zero
    dispatch overhead, instead of the reference's SparseDispatcher gather /
    scatter (module/transformer_layer.py:117-130).
    """

    cfg: GeneralistModelConfig
    ffn_dim: int
    embed_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        modal_spans: Optional[Tuple[Tuple[int, int, int], ...]] = None,
    ):
        act = get_activation_fn(self.cfg.activation_fn)
        dense = lambda feat, name: QuantDense(
            feat, dtype=self.dtype, param_dtype=jnp.float32,
            qmode=getattr(self.cfg, "quant_mode", "w8a8"),
            qtrain=(
                getattr(self.cfg, "quant_training", "none") == "fwd"
                and not deterministic
            ),
            name=name,
        )
        act_drop = nn.Dropout(self.cfg.activation_dropout)

        def run(x, fc1_name, fc2_name):
            h = act(dense(self.ffn_dim, fc1_name)(x))
            h = act_drop(h, deterministic=deterministic)
            if self.cfg.scale_fc:
                h = make_ln(self.cfg, self.dtype, fc2_name + "_ln")(h)
            return dense(self.embed_dim, fc2_name)(h)

        if not self.cfg.modal_ffn or not modal_spans:
            return run(x, "fc1", "fc2")
        outs = []
        for (start, end, modal_id) in modal_spans:
            seg = x[:, start:end]
            outs.append(run(seg, f"experts_fc1_{modal_id}", f"experts_fc2_{modal_id}"))
        return jnp.concatenate(outs, axis=1)


class MoEFeedForward(nn.Module):
    """Switch-style mixture-of-experts FFN (replaces the reference's
    BaseLayer, module/base_layer.py:16-142): top-1 routing with capacity,
    experts sharded over the mesh 'expert' axis with all_to_all dispatch
    (parallel/moe.py); dense einsum dispatch off-mesh. The load-balance aux
    loss is sown into the 'losses' collection — criteria add it with
    cfg.moe_aux_weight when training."""

    cfg: GeneralistModelConfig
    ffn_dim: int
    embed_dim: int
    dtype: Any = jnp.bfloat16
    mesh: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        from ofasys_tpu.parallel.moe import moe_ffn_dense, moe_ffn_sharded

        cfg = self.cfg
        E = cfg.moe_experts
        B, T, D = x.shape
        router_w = self.param("router", nn.initializers.normal(0.02), (D, E), jnp.float32)
        w1 = self.param("moe_w1", nn.initializers.lecun_normal(batch_axis=(0,)),
                        (E, D, self.ffn_dim), jnp.float32)
        w2 = self.param("moe_w2", nn.initializers.lecun_normal(batch_axis=(0,)),
                        (E, self.ffn_dim, D), jnp.float32)
        act = get_activation_fn(cfg.activation_fn)
        xs = x.reshape(B * T, D)
        ep = self.mesh.shape.get("expert", 1) if self.mesh is not None else 1
        if ep > 1 and E % ep == 0 and (B * T) % ep == 0:
            out, aux = moe_ffn_sharded(
                xs, router_w, w1, w2, self.mesh,
                capacity_factor=cfg.moe_capacity_factor, activation=act,
            )
        else:
            out, aux = moe_ffn_dense(
                xs, router_w, w1, w2,
                capacity_factor=cfg.moe_capacity_factor, activation=act,
            )
        self.sow("losses", "moe_aux", aux)
        return out.reshape(B, T, D).astype(self.dtype)


class TransformerEncoderLayer(nn.Module):
    """Pre-LN encoder block with normformer extras
    (reference module/transformer_layer.py:18-211)."""

    cfg: GeneralistModelConfig
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    mesh: Any = None           # for cfg.sequence_parallel ring attention
    use_moe: bool = False      # this layer's FFN is MoEFeedForward

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
        modal_spans=None,
        drop_path_rate=None,  # traced per-layer rate (scan-over-layers path)
    ):
        # args are positional (no *) so nn.remat can mark deterministic and
        # modal_spans static (jax.checkpoint rejects kwargs)
        cfg = self.cfg
        ln = lambda name: make_ln(self.cfg, self.dtype, name)
        dropout = nn.Dropout(cfg.dropout)
        drop_path = DropPath(self.drop_path_rate)
        dpr = drop_path_rate

        residual = x
        h = ln("self_attn_layer_norm")(x) if cfg.encoder.normalize_before else x
        h, _ = MultiheadAttention(
            cfg.encoder.embed_dim, cfg.encoder.attention_heads,
            scale_factor=cfg.attn_scale_factor, scale_heads=cfg.scale_heads,
            dropout=cfg.attention_dropout, dtype=self.dtype, name="self_attn",
            mesh=self.mesh, seq_parallel=getattr(cfg, "sequence_parallel", False),
            qmode=getattr(cfg, "quant_mode", "w8a8"),
            qtrain=getattr(cfg, "quant_training", "none") == "fwd",
            logits_compute=getattr(cfg, "attn_logits", "fp32") == "compute",
            fuse_qkv=getattr(cfg, "fuse_qkv", True),
            attn_layout=getattr(cfg, "attn_layout", "bthd"),
            attn_kernel=getattr(cfg, "attn_kernel", "auto"),
        )(h, bias=bias, mask=mask, use_flash=cfg.use_flash_attention,
          deterministic=deterministic)
        if cfg.scale_attn:
            h = ln("attn_ln")(h)
        h = dropout(h, deterministic=deterministic)
        x = residual + drop_path(h, deterministic=deterministic, rate=dpr)
        if not cfg.encoder.normalize_before:
            x = ln("self_attn_layer_norm")(x)

        residual = x
        h = ln("final_layer_norm")(x) if cfg.encoder.normalize_before else x
        if self.use_moe:
            h = MoEFeedForward(cfg, cfg.encoder.ffn_embed_dim, cfg.encoder.embed_dim,
                               dtype=self.dtype, mesh=self.mesh, name="moe_ffn")(h, deterministic)
        else:
            h = FeedForward(cfg, cfg.encoder.ffn_embed_dim, cfg.encoder.embed_dim,
                            dtype=self.dtype, name="ffn")(h, deterministic, modal_spans)
        h = dropout(h, deterministic=deterministic)
        if cfg.scale_resids:
            w_resid = self.param("w_resid", nn.initializers.ones, (cfg.encoder.embed_dim,), jnp.float32)
            residual = residual * w_resid.astype(self.dtype)
        x = residual + drop_path(h, deterministic=deterministic, rate=dpr)
        if not cfg.encoder.normalize_before:
            x = ln("final_layer_norm")(x)
        return x


class TransformerDecoderLayer(nn.Module):
    """Pre-LN decoder block: causal self-attention + cross-attention + FFN
    (reference module/transformer_layer.py:212+)."""

    cfg: GeneralistModelConfig
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    mesh: Any = None           # for cfg.sequence_parallel ring attention
    use_moe: bool = False      # this layer's FFN is MoEFeedForward

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoder_out: Optional[jax.Array] = None,
        self_mask: Optional[jax.Array] = None,
        self_bias: Optional[jax.Array] = None,
        cross_mask: Optional[jax.Array] = None,
        cross_bias: Optional[jax.Array] = None,
        deterministic: bool = True,
        cache: Optional[Dict[str, Any]] = None,
        modal_spans=None,
        full_context: bool = False,
        drop_path_rate=None,  # traced per-layer rate (scan-over-layers path)
    ):
        # positional (no *) so nn.remat can mark deterministic/modal_spans/
        # full_context static (jax.checkpoint rejects kwargs)
        cfg = self.cfg
        ln = lambda name: make_ln(self.cfg, self.dtype, name)
        dropout = nn.Dropout(cfg.dropout)
        drop_path = DropPath(self.drop_path_rate)
        dpr = drop_path_rate
        new_cache: Dict[str, Any] = {}

        residual = x
        h = ln("self_attn_layer_norm")(x) if cfg.decoder.normalize_before else x
        h, self_kv = MultiheadAttention(
            cfg.decoder.embed_dim, cfg.decoder.attention_heads,
            scale_factor=cfg.attn_scale_factor, scale_heads=cfg.scale_heads,
            dropout=cfg.attention_dropout, dtype=self.dtype, name="self_attn",
            mesh=self.mesh, seq_parallel=getattr(cfg, "sequence_parallel", False),
            qmode=getattr(cfg, "quant_mode", "w8a8"),
            qtrain=getattr(cfg, "quant_training", "none") == "fwd",
            logits_compute=getattr(cfg, "attn_logits", "fp32") == "compute",
            fuse_qkv=getattr(cfg, "fuse_qkv", True),
            attn_layout=getattr(cfg, "attn_layout", "bthd"),
            attn_kernel=getattr(cfg, "attn_kernel", "auto"),
        )(h, bias=self_bias, mask=self_mask, causal=(cache is None and not full_context),
          use_flash=cfg.use_flash_attention, deterministic=deterministic,
          cache=None if cache is None else cache["self"])
        if cache is not None:
            new_cache["self"] = self_kv
        if cfg.scale_attn:
            h = ln("self_attn_ln")(h)
        h = dropout(h, deterministic=deterministic)
        x = residual + drop_path(h, deterministic=deterministic, rate=dpr)
        if not cfg.decoder.normalize_before:
            x = ln("self_attn_layer_norm")(x)

        if encoder_out is not None:
            residual = x
            h = ln("encoder_attn_layer_norm")(x) if cfg.decoder.normalize_before else x
            h, cross_kv = MultiheadAttention(
                cfg.decoder.embed_dim, cfg.decoder.attention_heads,
                scale_factor=cfg.attn_scale_factor, scale_heads=cfg.scale_heads,
                dropout=cfg.attention_dropout, dtype=self.dtype, name="encoder_attn",
                qmode=getattr(cfg, "quant_mode", "w8a8"),
                qtrain=getattr(cfg, "quant_training", "none") == "fwd",
                logits_compute=getattr(cfg, "attn_logits", "fp32") == "compute",
            fuse_qkv=getattr(cfg, "fuse_qkv", True),
            attn_layout=getattr(cfg, "attn_layout", "bthd"),
            attn_kernel=getattr(cfg, "attn_kernel", "auto"),
            )(h, encoder_out, bias=cross_bias, mask=cross_mask,
              use_flash=cfg.use_flash_attention, deterministic=deterministic,
              cache=None if cache is None else cache.get("cross"), static_kv=True)
            if cache is not None and "cross" in cache:
                new_cache["cross"] = cache["cross"]
            if cfg.scale_attn:
                h = ln("cross_attn_ln")(h)
            h = dropout(h, deterministic=deterministic)
            x = residual + drop_path(h, deterministic=deterministic, rate=dpr)
            if not cfg.decoder.normalize_before:
                x = ln("encoder_attn_layer_norm")(x)

        residual = x
        h = ln("final_layer_norm")(x) if cfg.decoder.normalize_before else x
        if self.use_moe:
            h = MoEFeedForward(cfg, cfg.decoder.ffn_embed_dim, cfg.decoder.embed_dim,
                               dtype=self.dtype, mesh=self.mesh, name="moe_ffn")(h, deterministic)
        else:
            h = FeedForward(cfg, cfg.decoder.ffn_embed_dim, cfg.decoder.embed_dim,
                            dtype=self.dtype, name="ffn")(h, deterministic, modal_spans)
        h = dropout(h, deterministic=deterministic)
        if cfg.scale_resids:
            w_resid = self.param("w_resid", nn.initializers.ones, (cfg.decoder.embed_dim,), jnp.float32)
            residual = residual * w_resid.astype(self.dtype)
        x = residual + drop_path(h, deterministic=deterministic, rate=dpr)
        if not cfg.decoder.normalize_before:
            x = ln("final_layer_norm")(x)
        return x, (new_cache if cache is not None else None)



def _traced_layer_bias(stacked, abs_bias, i):
    """BiasSpec.layer_bias with a TRACED layer index (scan-over-layers path):
    dynamic-index one layer's slice out of the pre-stacked (L, H, Tq, Tk)
    biases (gathered once outside the scan — see BiasSpec.stacked)."""
    out = None
    if stacked is not None:
        sel = jax.lax.dynamic_index_in_dim(
            stacked, jnp.minimum(i, stacked.shape[0] - 1), 0, keepdims=False
        )
        out = sel[None]                                      # (1, H, Tq, Tk)
    if abs_bias is not None:
        out = abs_bias if out is None else out + abs_bias
    return out


class _EncoderScanBody(nn.Module):
    """One encoder layer as a lax.scan body: carry = activations; per-layer
    inputs = (layer index, drop-path rate). Params stack along a leading
    layer axis (variable_axes={'params': 0})."""

    cfg: GeneralistModelConfig
    deterministic: bool
    modal_spans: Any
    dtype: Any = jnp.bfloat16
    mesh: Any = None

    @nn.compact
    def __call__(self, x, xs, attn_mask, stacked_bias, abs_bias):
        i, dpr = xs
        bias = _traced_layer_bias(stacked_bias, abs_bias, i)
        layer_cls = _maybe_remat(TransformerEncoderLayer, self.cfg, (4, 5))
        layer = layer_cls(self.cfg, 0.0, dtype=self.dtype, mesh=self.mesh, name="layer")
        x = layer(x, attn_mask, bias, self.deterministic, self.modal_spans, dpr)
        return x, None


class _DecoderScanBody(nn.Module):
    """One decoder layer as a lax.scan body (training path only; incremental
    decode keeps the python loop + explicit per-layer cache)."""

    cfg: GeneralistModelConfig
    deterministic: bool
    modal_spans: Any
    full_context: bool
    dtype: Any = jnp.bfloat16
    mesh: Any = None

    @nn.compact
    def __call__(self, x, xs, encoder_out, self_mask, cross_mask, cross_bias,
                 stacked_bias, abs_bias):
        i, dpr = xs
        self_bias = _traced_layer_bias(stacked_bias, abs_bias, i)
        layer_cls = _maybe_remat(TransformerDecoderLayer, self.cfg, (7, 9, 10))
        layer = layer_cls(self.cfg, 0.0, dtype=self.dtype, mesh=self.mesh, name="layer")
        x, _ = layer(x, encoder_out, self_mask, self_bias, cross_mask, cross_bias,
                     self.deterministic, None, self.modal_spans, self.full_context, dpr)
        return x, None


class TransformerEncoder(nn.Module):
    """Layer stack over already-adapted embeddings
    (reference model/transformer.py:33-203; adaptors run outside)."""

    cfg: GeneralistModelConfig
    dtype: Any = jnp.bfloat16
    mesh: Any = None           # required when cfg.pipeline_stages > 1

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                 # (B, T, E) adapted embeddings
        padding_mask: jax.Array,      # (B, T) bool, True = valid
        bias_spec: Optional[BiasSpec] = None,
        deterministic: bool = True,
        modal_spans=None,
    ):
        cfg = self.cfg
        attn_mask = padding_mask[:, None, None, :]  # keys masked; queries padded rows are garbage-but-masked downstream
        n_layers = cfg.encoder.layers
        dpr = np.linspace(0.0, cfg.encode_drop_path_rate, n_layers)
        if cfg.pipeline_stages > 1 and cfg.scan_layers and not self.is_initializing():
            # GPipe over the 'pipe' mesh axis (parallel/pipeline.py): the
            # stacked layers_scan params are stage-sharded; microbatches
            # stream through stages via ppermute. Init still runs the plain
            # nn.scan path (identical param layout / checkpoints).
            from ofasys_tpu.parallel.pipeline import pipeline_stack

            if self.mesh is None:
                raise ValueError(
                    "pipeline_stages > 1 requires the device mesh: "
                    "model.initialize(..., mesh=mesh)"
                )
            stacked_bias = bias_spec.stacked() if bias_spec is not None else None
            abs_bias = bias_spec.abs_bias if bias_spec is not None else None
            stacked = self.variables["params"]["layers_scan"]["layer"]
            layer_mod = TransformerEncoderLayer(cfg, 0.0, dtype=self.dtype)
            rng = (self.make_rng("dropout")
                   if not deterministic and self.has_rng("dropout") else None)
            dpr_arr = jnp.asarray(dpr, jnp.float32)
            spans = modal_spans

            def layer_apply(lp, gi, m, x_mb, mm, bcast):
                sb, ab, dpr_a, key = bcast
                bias = _traced_layer_bias(sb, ab, gi)
                rngs = None
                if key is not None:
                    rngs = {"dropout": jax.random.fold_in(jax.random.fold_in(key, gi), m)}
                return layer_mod.apply(
                    {"params": lp}, x_mb, mm, bias, deterministic, spans,
                    dpr_a[gi], rngs=rngs,
                )

            if cfg.remat == "full":
                layer_apply = jax.checkpoint(layer_apply)
            elif cfg.remat == "dots":
                layer_apply = jax.checkpoint(layer_apply, policy=_remat_policy(cfg))
            x = pipeline_stack(
                self.mesh, layer_apply, stacked, x,
                micro_args=attn_mask,
                bcast_args=(stacked_bias, abs_bias, dpr_arr, rng),
                n_micro=cfg.pipeline_microbatches or cfg.pipeline_stages,
            )
        elif cfg.scan_layers:
            stacked_bias = bias_spec.stacked() if bias_spec is not None else None
            abs_bias = bias_spec.abs_bias if bias_spec is not None else None
            scan = nn.scan(
                _EncoderScanBody,
                variable_axes={"params": 0, "qkern": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
                length=n_layers,
            )(cfg, deterministic, modal_spans, dtype=self.dtype,
              mesh=self.mesh, name="layers_scan")
            xs = (jnp.arange(n_layers), jnp.asarray(dpr, jnp.float32))
            x, _ = scan(x, xs, attn_mask, stacked_bias, abs_bias)
        else:
            # deterministic and modal_spans are static python values
            layer_cls = _maybe_remat(TransformerEncoderLayer, cfg, (4, 5))
            p_drop = cfg.encoder.layerdrop if not deterministic else 0.0
            for i in range(n_layers):
                layer = layer_cls(cfg, drop_path_rate=float(dpr[i]), dtype=self.dtype,
                                  mesh=self.mesh, use_moe=_is_moe_layer(cfg, i),
                                  name=f"layers_{i}")
                bias = bias_spec.layer_bias(i) if bias_spec is not None else None
                y = layer(x, attn_mask, bias, deterministic, modal_spans)
                if p_drop > 0.0:
                    # LayerDrop (reference LayerDropModuleList): the whole
                    # layer is skipped with prob p at training time. The
                    # layer still computes (params must exist and shapes
                    # stay static); the select drops its contribution.
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(self.make_rng("dropout"), i), 1.0 - p_drop
                    )
                    y = jnp.where(keep, y, x)
                x = y
        if cfg.encoder.normalize_before:
            x = make_ln(self.cfg, self.dtype, "layer_norm")(x)
        return x


class TransformerDecoder(nn.Module):
    """Decoder stack; supports full-sequence (training) and incremental
    (generation) modes via the explicit cache
    (reference model/transformer.py:206-539)."""

    cfg: GeneralistModelConfig
    dtype: Any = jnp.bfloat16
    mesh: Any = None           # required when cfg.pipeline_stages > 1

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # (B, Tt, E) adapted target embeddings
        encoder_out: Optional[jax.Array],   # (B, Ts, E)
        *,
        self_padding_mask: Optional[jax.Array] = None,   # (B, Tt)
        encoder_padding_mask: Optional[jax.Array] = None, # (B, Ts)
        self_bias_spec: Optional[BiasSpec] = None,
        cross_bias: Optional[jax.Array] = None,           # (B|1, H, Tt, Ts)
        deterministic: bool = True,
        cache: Optional[Dict[str, Any]] = None,
        cache_index: Optional[jax.Array] = None,
        modal_spans=None,
        full_context: bool = False,
    ):
        cfg = self.cfg
        B, Tt = x.shape[:2]

        if cache is None:
            self_mask = None
            if self_padding_mask is not None:
                self_mask = self_padding_mask[:, None, None, :]
            rows = None
        else:
            # incremental: queries are the current step(s); keys = cache
            self_mask = None  # cache validity mask added inside MultiheadAttention
            rows = cache_index

        cross_mask = None
        if encoder_padding_mask is not None:
            cross_mask = encoder_padding_mask[:, None, None, :]

        n_layers = cfg.decoder.layers
        dpr = np.linspace(0.0, cfg.decode_drop_path_rate, n_layers)
        new_cache: Dict[str, Any] = {} if cache is not None else None
        if (cfg.pipeline_stages > 1 and cfg.scan_layers and cache is None
                and not self.is_initializing()):
            # GPipe training path (see encoder); incremental decode keeps the
            # sliced-stacked-params loop below
            from ofasys_tpu.parallel.pipeline import pipeline_stack

            if self.mesh is None:
                raise ValueError(
                    "pipeline_stages > 1 requires the device mesh: "
                    "model.initialize(..., mesh=mesh)"
                )
            spec = self_bias_spec
            stacked_bias = spec.stacked() if spec is not None else None
            abs_bias = spec.abs_bias if spec is not None else None
            stacked = self.variables["params"]["layers_scan"]["layer"]
            layer_mod = TransformerDecoderLayer(cfg, 0.0, dtype=self.dtype)
            rng = (self.make_rng("dropout")
                   if not deterministic and self.has_rng("dropout") else None)
            dpr_arr = jnp.asarray(dpr, jnp.float32)
            spans = modal_spans
            fc = full_context
            B = x.shape[0]
            # batch-major side inputs stream with the microbatches; batch-1
            # (shared) ones broadcast to every stage
            micro: Dict[str, jax.Array] = {}
            shared: Dict[str, jax.Array] = {}
            for k, v in (("eo", encoder_out), ("sm", self_mask),
                         ("cm", cross_mask), ("cb", cross_bias)):
                if v is not None:
                    (micro if v.shape[0] == B else shared)[k] = v

            def layer_apply(lp, gi, m, x_mb, mm, bcast):
                sb, ab, dpr_a, key, sh = bcast
                a = {**sh, **mm}
                self_bias = _traced_layer_bias(sb, ab, gi)
                rngs = None
                if key is not None:
                    rngs = {"dropout": jax.random.fold_in(jax.random.fold_in(key, gi), m)}
                y, _ = layer_mod.apply(
                    {"params": lp}, x_mb, a.get("eo"), a.get("sm"), self_bias,
                    a.get("cm"), a.get("cb"), deterministic, None, spans, fc,
                    dpr_a[gi], rngs=rngs,
                )
                return y

            if cfg.remat == "full":
                layer_apply = jax.checkpoint(layer_apply)
            elif cfg.remat == "dots":
                layer_apply = jax.checkpoint(layer_apply, policy=_remat_policy(cfg))
            x = pipeline_stack(
                self.mesh, layer_apply, stacked, x,
                micro_args=micro,
                bcast_args=(stacked_bias, abs_bias, dpr_arr, rng, shared),
                n_micro=cfg.pipeline_microbatches or cfg.pipeline_stages,
            )
        elif cfg.scan_layers and cache is None:
            spec = self_bias_spec
            stacked_bias = spec.stacked() if spec is not None else None
            abs_bias = spec.abs_bias if spec is not None else None
            scan = nn.scan(
                _DecoderScanBody,
                variable_axes={"params": 0, "qkern": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0,) + (nn.broadcast,) * 6,
                length=n_layers,
            )(cfg, deterministic, modal_spans, full_context, dtype=self.dtype,
              mesh=self.mesh, name="layers_scan")
            xs = (jnp.arange(n_layers), jnp.asarray(dpr, jnp.float32))
            x, _ = scan(x, xs, encoder_out, self_mask, cross_mask, cross_bias,
                        stacked_bias, abs_bias)
        elif cfg.scan_layers:
            # incremental decode with scan-trained (stacked) params: unroll
            # the per-step layer loop (as the loop path does) but slice each
            # layer's params out of the stacked tree and apply the layer as a
            # pure function — keeps one cache dict per layer so beam reorder
            # gathers stay (B*K, ...)-shaped
            stacked = self.variables["params"]["layers_scan"]["layer"]
            layer_mod = TransformerDecoderLayer(cfg, 0.0, dtype=self.dtype)
            for i in range(n_layers):
                lp = jax.tree.map(lambda a: a[i], stacked)
                self_bias = (
                    self_bias_spec.layer_bias_rows(i, cache_index, Tt)
                    if self_bias_spec is not None else None
                )
                cb = cross_bias
                if cb is not None:
                    cb = jax.lax.dynamic_slice_in_dim(cb, cache_index, Tt, axis=2)
                x, layer_cache = layer_mod.apply(
                    {"params": lp},
                    x, encoder_out, self_mask, self_bias, cross_mask, cb,
                    True, cache[f"layers_{i}"], modal_spans, full_context,
                )
                new_cache[f"layers_{i}"] = layer_cache
        else:
            layer_cls = TransformerDecoderLayer
            if cache is None:
                # self counts as arg 0: deterministic (7), modal_spans (9),
                # full_context (10) are static
                layer_cls = _maybe_remat(TransformerDecoderLayer, cfg, (7, 9, 10))
            for i in range(n_layers):
                if self_bias_spec is not None:
                    if cache is None:
                        self_bias = self_bias_spec.layer_bias(i)
                    else:
                        # O(Tk) row gather instead of materializing (H, T, T)
                        self_bias = self_bias_spec.layer_bias_rows(i, cache_index, Tt)
                else:
                    self_bias = None
                cb = cross_bias
                if cb is not None and cache is not None:
                    cb = jax.lax.dynamic_slice_in_dim(cb, cache_index, Tt, axis=2)
                layer = layer_cls(cfg, drop_path_rate=float(dpr[i]), dtype=self.dtype,
                                  mesh=self.mesh, use_moe=_is_moe_layer(cfg, i),
                                  name=f"layers_{i}")
                y, layer_cache = layer(
                    x, encoder_out, self_mask, self_bias, cross_mask, cb,
                    deterministic,
                    None if cache is None else cache[f"layers_{i}"],
                    modal_spans, full_context,
                )
                if (cfg.decoder.layerdrop > 0.0 and not deterministic
                        and cache is None):
                    # LayerDrop (see encoder loop); never during decode
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(self.make_rng("dropout"), i),
                        1.0 - cfg.decoder.layerdrop,
                    )
                    y = jnp.where(keep, y, x)
                x = y
                if cache is not None:
                    new_cache[f"layers_{i}"] = layer_cache
        if cfg.decoder.normalize_before:
            x = make_ln(self.cfg, self.dtype, "layer_norm")(x)
        return x, new_cache
