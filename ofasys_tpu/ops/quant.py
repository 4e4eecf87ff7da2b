"""Int8 quantization for TPU serving.

The reference framework has no quantization subsystem; this is a
TPU-first addition motivated by v5e hardware: the MXU runs
int8 x int8 -> int32 at ~2x the bf16 peak (~394 vs ~197 TOPS), and
decode-time GEMVs are *weight-bandwidth*-bound, so storing weights as
int8 halves the HBM traffic that governs per-token latency.

Scheme (standard symmetric post-training quantization):

  * weights are quantized OFFLINE, per output channel, no zero point:
    ``w ~= q * scale`` with ``q`` int8 of the kernel's shape and
    ``scale`` fp32 over the output axis.
  * activations are quantized DYNAMICALLY per row at matmul time
    ("w8a8" mode) so the contraction runs on the int8 MXU; "w8" mode
    instead dequantizes the weight to the compute dtype and runs a
    bf16 matmul (no MXU speedup, but still the HBM win when XLA keeps
    the int8 copy resident — useful where activation outliers hurt).

Flax integration keeps the checkpoint format unchanged: ``QuantDense``
creates the exact same fp32 ``kernel``/``bias`` params as ``nn.Dense``
(same initializers, same names); at serving time
``quantize_for_serving`` moves matched kernels into a separate
``qkern`` variable collection (int8 data + scales), PRUNES the fp32
copies from ``params``, and ``QuantDense`` reads the collection when
present. Training and checkpoints never see int8.

``QuantEmbed`` does the same for the tied output projection
(``embed_tokens.attend`` — the single largest decode GEMV at
(E, vocab)): the int8 copy is an EXTRA table used only by ``attend``;
the fp32 embedding stays for input lookups, so input embeddings are
exact and only the logits matmul is quantized.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-8

# kernels of these module names get int8-quantized by default: the qkv/out
# projections and FFN matmuls of both transformer stacks (incl. per-modality
# FFN experts). Adaptor-side convs/prenets and LayerNorms stay fp32.
DEFAULT_PATTERN = (
    r"(^|/)(q_proj|k_proj|v_proj|out_proj|fc1|fc2|experts_fc[12]_\d+)/kernel$"
)


def quantize_weight(w: jax.Array, axis: int = -2) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization.

    ``axis`` is the contraction ("in") axis that gets reduced when
    computing per-channel maxima; for a Dense kernel (in, out) the
    default -2 yields one scale per output column. Stacked
    scan-over-layers kernels (L, in, out) quantize per (layer, out).
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / jnp.expand_dims(scale, axis)),
        -127, 127,
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-row symmetric int8 quantization over the last axis."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), _EPS) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def int8_matmul(
    x: jax.Array,            # (..., in)
    q: jax.Array,            # (in, out) int8
    scale: jax.Array,        # (out,) fp32
    *,
    mode: str = "w8a8",
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """x @ dequant(q) with either an int8 MXU contraction (w8a8) or a
    dequantize-then-bf16 matmul (w8)."""
    if mode == "w8":
        w = q.astype(out_dtype) * scale.astype(out_dtype)[None, :]
        return jnp.dot(x.astype(out_dtype), w)
    if mode != "w8a8":
        raise ValueError(f"unknown quant mode {mode!r}; expected 'w8a8' or 'w8'")
    xq, sx = _quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * scale).astype(out_dtype)


def _int8_fwd_value(x: jax.Array, w: jax.Array) -> jax.Array:
    """Forward value of the quantized-training matmul: both operands are
    quantized on the fly (weights per output channel from the live fp32
    param, activations per row) and contracted on the int8 MXU."""
    q, scale = quantize_weight(w, axis=-2)
    xq, sx = _quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * scale).astype(x.dtype)


@jax.custom_vjp
def int8_train_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """``x @ w`` with an int8 forward and a straight-through bf16 backward.

    Quantized TRAINING (beyond-reference, TPU-first): the v5e MXU runs
    int8 x int8 -> int32 at ~2x the bf16 rate, so forward matmuls go
    through dynamic symmetric quantization (the AQT recipe) while both
    backward matmuls (dx = g w^T, dw = x^T g) stay in the compute dtype —
    the straight-through estimator treats round() as identity, which is
    the standard, convergence-safe variant.

    x: (..., in) compute dtype (bf16); w: (in, out) fp32 param.
    """
    return _int8_fwd_value(x, w)


def _int8_train_fwd(x, w):
    return _int8_fwd_value(x, w), (x, w)


def _int8_train_bwd(res, g):
    x, w = res
    gb = g.astype(x.dtype)
    dx = jnp.dot(gb, w.astype(x.dtype).T)
    xm = x.reshape(-1, x.shape[-1])
    gm = gb.reshape(-1, gb.shape[-1])
    dw = jnp.dot(xm.T, gm).astype(w.dtype)
    return dx, dw


int8_train_matmul.defvjp(_int8_train_fwd, _int8_train_bwd)


class QuantDense(nn.Module):
    """Drop-in for ``nn.Dense(features, dtype=..., param_dtype=...)`` that
    consumes an int8 kernel from the ``qkern`` collection when one is
    present (see ``quantize_for_serving``). Parameter names, shapes, and
    initializers are identical to ``nn.Dense``, so checkpoints and the
    torch importer are unaffected."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_bias: bool = True
    qmode: str = "w8a8"
    # int8 quantized training (int8_train_matmul): forward contraction on
    # the int8 MXU, straight-through backward in the compute dtype. Ignored
    # whenever a qkern collection is present (serving already quantized).
    qtrain: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, return_params: bool = False):
        quantized = (not self.is_initializing()) and self.has_variable("qkern", "q")
        if return_params:
            # hand the (kernel, bias) params to the caller for a fused
            # multi-projection GEMM (model/transformer.py fuse_qkv); None
            # signals the caller to fall back to per-projection calls
            # (int8 serving keeps per-kernel scales, so no fusion there)
            if quantized:
                return None
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (jnp.shape(x)[-1], self.features), self.param_dtype,
            )
            bias = None
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros_init(), (self.features,),
                    self.param_dtype,
                )
            return kernel, bias
        if quantized:
            q = self.get_variable("qkern", "q")
            scale = self.get_variable("qkern", "scale")
            y = int8_matmul(x, q, scale, mode=self.qmode, out_dtype=self.dtype)
        else:
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (jnp.shape(x)[-1], self.features), self.param_dtype,
            )
            if self.qtrain and not self.is_initializing():
                y = int8_train_matmul(x.astype(self.dtype), kernel)
            else:
                y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class QuantEmbed(nn.Embed):
    """``nn.Embed`` whose ``attend`` (tied output projection) uses an int8
    copy of the table when the ``qkern`` collection provides one. The fp32
    embedding param is kept for exact input lookups."""

    def attend(self, query: jax.Array) -> jax.Array:
        if self.has_variable("qkern", "q"):
            # stored PRE-TRANSPOSED as (E, V) so the contraction is a
            # natural (rows, E) @ (E, V) GEMM — contracting the (V, E)
            # table's axis 1 forces an int8 relayout that measured SLOWER
            # than bf16 at large batch on v5e
            q = self.get_variable("qkern", "q")          # (E, V) int8
            scale = self.get_variable("qkern", "scale")  # (V,) fp32
            xq, sx = _quantize_rows(query)
            lead = xq.shape[:-1]
            M = 1
            for s in lead:
                M *= s
            K, V = q.shape
            from ofasys_tpu.ops.pallas_int8 import fused_supported, fused_w8a8_matmul

            if jax.default_backend() in ("tpu", "axon") and fused_supported(M, K, V):
                # large-rows logits GEMM: the Pallas kernel keeps the int32
                # accumulator + f32 epilogue in VMEM (XLA materializes them
                # in HBM here, which measured SLOWER than bf16)
                out = fused_w8a8_matmul(
                    xq.reshape(M, K), sx.reshape(M, 1), q, scale,
                    out_dtype=query.dtype,
                )
                return out.reshape(*lead, V)
            acc = jax.lax.dot_general(
                xq, q,
                (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * sx * scale[None, :]).astype(query.dtype)
        return super().attend(query)


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def _set_path(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _del_path(tree: Dict, path):
    node = tree
    for k in path[:-1]:
        node = node[k]
    del node[path[-1]]
    # drop now-empty parents so the pruned tree has no hollow dicts
    for i in range(len(path) - 1, 0, -1):
        node = tree
        for k in path[:i - 1]:
            node = node[k]
        if not node[path[i - 1]]:
            del node[path[i - 1]]
        else:
            break


def quantize_for_serving(
    params: Dict[str, Any],
    *,
    pattern: str = DEFAULT_PATTERN,
    quantize_logits: bool = True,
    embed_name: str = "embed_tokens",
) -> Dict[str, Any]:
    """Turn a trained fp32 param tree into serving variables:
    ``{"params": <pruned>, "qkern": <int8 kernels + scales>}``.

    Matched Dense kernels move to ``qkern`` (fp32 copies pruned; biases
    stay). With ``quantize_logits`` the shared token embedding also gets
    an int8 ATTEND copy under ``qkern/<embed_name>`` (fp32 embedding is
    kept — input lookups must stay exact). Pass the result anywhere a
    bare ``params`` tree is accepted (generators, ``model.apply``,
    ``TraverseTask``); ``QuantDense``/``QuantEmbed`` pick it up.

    Stacked scan-over-layers kernels (L, in, out) are supported: scales
    are per (layer, out) and ``nn.scan`` slices ``qkern`` along the
    layer axis like ``params``.
    """
    import copy

    pruned = copy.deepcopy(params)
    qkern: Dict[str, Any] = {}
    rx = re.compile(pattern)
    n = 0
    for path, leaf in list(_walk(params)):
        if rx.search("/".join(path)) is None:
            continue
        if leaf.ndim < 2:
            continue
        q, scale = quantize_weight(leaf, axis=-2)
        _set_path(qkern, path[:-1] + ("q",), q)
        _set_path(qkern, path[:-1] + ("scale",), scale)
        _del_path(pruned, path)
        n += 1
    if n == 0:
        raise ValueError(
            f"quantize_for_serving: pattern {pattern!r} matched no kernels — "
            "is this a GeneralistModel param tree?"
        )
    if quantize_logits and embed_name in params:
        emb = params[embed_name]["embedding"]  # (V, E)
        q, scale = quantize_weight(emb, axis=-1)  # per-vocab-row scales
        qkern[embed_name] = {"q": q.T, "scale": scale}  # (E, V): see attend()
    return {"params": pruned, "qkern": qkern}


def as_variables(params) -> Dict[str, Any]:
    """Accept either a bare param tree or a full variables dict (the
    output of ``quantize_for_serving``); return flax apply variables."""
    if isinstance(params, dict) and "params" in params:
        return params
    return {"params": params}
