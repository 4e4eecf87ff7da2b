"""Non-finite detection & localization.

Counterpart of the reference NanDetector (ofasys/engine/nan_detector.py:12-104),
which registers fwd/bwd hooks on every torch module. Under jit there are no
module hooks; the TPU-native equivalents are:

  * check_tree(tree)      — report every non-finite leaf by path (run on
                            params/grads after a bad loss)
  * checkpointed forward  — debug_forward reruns the forward eagerly with
                            jax.debug-style per-layer finiteness checks
  * jax_debug_nans()      — context manager enabling jax's global nan debug
                            mode (compiles with checks, raises at the op)
"""

from __future__ import annotations

import contextlib
import logging
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("ofasys_tpu.nan")


def check_tree(tree: Any, name: str = "tree") -> List[str]:
    """Return (and log) the tree paths containing non-finite values."""
    bad: List[str] = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            n_nan = int(np.isnan(arr).sum())
            n_inf = int(np.isinf(arr).sum())
            bad.append(p)
            logger.error("%s: non-finite at %s (nan=%d inf=%d shape=%s)", name, p, n_nan, n_inf, arr.shape)
    if not bad:
        logger.info("%s: all finite", name)
    return bad


@contextlib.contextmanager
def jax_debug_nans(enable: bool = True):
    """Enable jax's nan-checking mode for the scope (recompiles jits)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def debug_forward(model, params, slots, **kwargs) -> List[str]:
    """Eager re-run of a forward pass checking intermediate outputs via
    flax capture_intermediates; returns offending module paths."""
    variables = {"params": params}
    _, state = model.net.apply(
        variables, slots, capture_intermediates=True, mutable=["intermediates"], **kwargs
    )
    bad: List[str] = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append("/".join(str(getattr(k, "key", k)) for k in path))
    if bad:
        logger.error("first non-finite intermediates: %s", bad[:5])
    return bad
