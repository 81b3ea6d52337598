"""Post-training int8 weight quantization for the serving path.

TPU-native rationale: the v5e MXU runs int8 x int8 -> int32 matmuls at
twice the bf16 rate, and int8 weights halve HBM weight traffic — both
land directly on the serving bottleneck (batched encoder forward). The
reference has no quantized inference at all (its serving story is the
eval CLI, /root/reference/audio8/test.py:26-171); this is a
beyond-parity capability.

Design: quantization is a pure *param-tree* transform. ``Dense``
(nn/layers.py) detects an int8 ``kernel`` at apply time and switches to
``int8_dot`` (dynamic per-token activation scales x per-output-channel
weight scales), so the flax model definition is shared between the
f32/bf16 training path and the quantized serving path — no parallel
module tree, no checkpoint format change (quantize after load).

Only 2-D Dense kernels with min(shape) >= ``min_dim`` are quantized:
attention QKV/O and FFN expand/contract hold ~all serving FLOPs; tiny
projections (e.g. WavLM's gate Dense(8)) and non-Dense params (conv
filters, norms, embeddings, relative-position tables) are left alone.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def quantize_kernel(kernel) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a ``(C_in,
    C_out)`` Dense kernel. Returns ``(kernel_q int8, scale f32[C_out])``
    with ``dequant = kernel_q * scale``."""
    k = np.asarray(kernel, dtype=np.float32)
    scale = np.max(np.abs(k), axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    kq = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return jnp.asarray(kq), jnp.asarray(scale.astype(np.float32))


def _is_dense_node(node: dict, min_dim: int) -> bool:
    if not isinstance(node, dict) or "kernel" not in node:
        return False
    k = node["kernel"]
    if not hasattr(k, "ndim") or k.ndim != 2:
        return False
    if set(node.keys()) - {"kernel", "bias"}:
        return False  # not a plain Dense (e.g. weight-normed conv g/v)
    if k.dtype == jnp.int8:
        return False  # already quantized
    return min(k.shape) >= min_dim


def quantize_dense_tree(params, min_dim: int = 64):
    """Walk a param pytree; replace every plain Dense ``{kernel[, bias]}``
    node whose kernel is 2-D with ``min(shape) >= min_dim`` by
    ``{kernel: int8, kernel_scale: f32[C_out][, bias]}``.

    Returns ``(new_params, num_quantized)``. The returned tree is apply-
    compatible with the unquantized model definition (Dense dispatches on
    kernel dtype).
    """
    count = 0

    def walk(node):
        nonlocal count
        if not isinstance(node, dict):
            return node
        if _is_dense_node(node, min_dim):
            kq, scale = quantize_kernel(node["kernel"])
            count += 1
            out = {"kernel": kq, "kernel_scale": scale}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        return {k: walk(v) for k, v in node.items()}

    return walk(params), count


def quantize_model_params(params, min_dim: int = 64):
    """Quantize a full flax variables dict (``{'params': ...}``) or a bare
    param tree; logs the leaf count. Raises if nothing was quantized
    (wrong tree / all kernels too small) so a silent no-op can't ship."""
    import logging
    logger = logging.getLogger("audio8_tpu")
    tree = params.get("params", params) if isinstance(params, dict) else params
    wrapped = isinstance(params, dict) and "params" in params
    new_tree, count = quantize_dense_tree(tree, min_dim=min_dim)
    if count == 0:
        raise ValueError(
            "int8 quantization matched no Dense kernels — wrong param tree?")
    logger.info("int8-quantized %d Dense kernels (min_dim=%d)", count, min_dim)
    if wrapped:
        out = dict(params)
        out["params"] = new_tree
        return out
    return new_tree
