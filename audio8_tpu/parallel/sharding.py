"""Device mesh + sharding rules.

The reference is pure data-parallel DDP over NCCL
(/root/reference/audio8/train.py:266-268, SURVEY.md §2.6-2.7). Here
parallelism is expressed TPU-natively as a ``jax.sharding.Mesh`` with
``NamedSharding`` annotations and XLA-inserted collectives over ICI:

- axis ``'data'``: batch dimension (DP; gradient psum replaces DDP
  allreduce);
- axis ``'model'``: optional tensor parallelism over attention heads /
  FFN hidden (the transformer dominates FLOPs; the conv stack stays
  replicated).

Rules are (regex over the '/'-joined param path) -> PartitionSpec, first
match wins.
"""
from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh; data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(
                f"model-parallel extent {model} (--tensor_parallel) does "
                f"not divide the {n} available devices")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# DP only: everything replicated
DP_ONLY_RULES: List[Tuple[str, P]] = [
    (r".*", P()),
]

# Tensor parallelism over the transformer; conv stack + norms replicated.
# Dense kernels are (in, out). Attention QKV and FFN expand split the output
# dim; attention O and FFN contract split the input dim — the standard
# Megatron layout so each pair needs a single psum (inserted by XLA).
TP_RULES: List[Tuple[str, P]] = [
    (r".*self_attn/w_[QKV]/kernel$", P(None, "model")),
    (r".*self_attn/w_[QKV]/bias$", P("model")),
    (r".*self_attn/w_O/kernel$", P("model", None)),
    (r".*src_attn/w_[QKV]/kernel$", P(None, "model")),
    (r".*src_attn/w_[QKV]/bias$", P("model")),
    (r".*src_attn/w_O/kernel$", P("model", None)),
    (r".*ffn/expand/kernel$", P(None, "model")),
    (r".*ffn/expand/bias$", P("model")),
    (r".*ffn/contract/kernel$", P("model", None)),
    # expert parallelism: MoE expert weights (nn/moe.py; leading (E, ...)
    # expert axis) shard over 'model' — XLA inserts the token all-to-alls
    # around the dispatch/combine einsums. The router stays replicated
    # (catch-all).
    (r".*ffn/w[io]$", P("model")),
    (r".*ffn/b[io]$", P("model")),
    (r".*", P()),
]


def _spec_for(path: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pat, spec in rules:
        if re.match(pat, path):
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _fixed_spec(leaf, spec: P, mesh: Mesh) -> list:
    """Validate a spec against a leaf: drop axes whose mesh extent doesn't
    divide the dim; pad with None to the leaf's rank."""
    fixed = []
    for d, axis in enumerate(spec):
        if axis is None:
            fixed.append(None)
            continue
        size = mesh.shape[axis]
        if d < leaf.ndim and leaf.shape[d] % size == 0:
            fixed.append(axis)
        else:
            fixed.append(None)
    if len(fixed) < leaf.ndim:
        fixed += [None] * (leaf.ndim - len(fixed))
    return fixed[: leaf.ndim]


def param_shardings(params: Any, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = DP_ONLY_RULES) -> Any:
    """Tree of NamedShardings matching ``params`` by path rules. Specs that
    don't divide the dim evenly fall back to replication on that axis."""

    def one(path, leaf):
        spec = _spec_for(_path_str(path), rules)
        return NamedSharding(mesh, P(*_fixed_spec(leaf, spec, mesh)))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = DP_ONLY_RULES) -> Any:
    """Place a host param tree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


_MOMENT_RE = re.compile(r"\.(mu|nu)/")


def zero1_spec(leaf, mesh: Mesh, base: Optional[P] = None) -> P:
    """ZeRO-1 spec for an optimizer-moment leaf: KEEP the param's own
    sharding (``base`` — e.g. the Megatron 'model' split under TP) and add
    'data' on the first free axis the 'data' extent divides; all-replicated
    if no axis fits (tiny/odd leaves)."""
    n = mesh.shape["data"]
    fixed = list(_fixed_spec(leaf, base, mesh)) if base is not None else [
        None] * leaf.ndim
    for d in range(leaf.ndim):
        if fixed[d] is None and leaf.shape[d] % n == 0 and leaf.shape[d] >= n:
            fixed[d] = "data"
            break
    return P(*fixed)


def _state_shardings(state: Any, mesh: Mesh,
                     rules: Sequence[Tuple[str, P]],
                     data_shards_leaf) -> Any:
    """Shared builder for ZeRO-1/FSDP sharding trees: leaves selected by
    ``data_shards_leaf(path_str)`` get their rule spec + 'data' on the
    first divisible free axis (zero1_spec); the rest follow the rules."""

    def one(path, leaf):
        pstr = _path_str(path)
        spec = _spec_for(pstr, rules)
        if data_shards_leaf(pstr):
            return NamedSharding(mesh, zero1_spec(leaf, mesh, base=spec))
        return NamedSharding(mesh, P(*_fixed_spec(leaf, spec, mesh)))

    return jax.tree_util.tree_map_with_path(one, state)


def zero1_shardings(state: Any, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = DP_ONLY_RULES) -> Any:
    """Sharding tree for a TrainState with ZeRO-1 optimizer-state
    partitioning: params follow ``rules`` (replicated under DP, Megatron
    split under TP), AdamW moments (mu/nu) shard over the 'data' axis.

    The reference has no equivalent (plain DDP replicates moments per GPU,
    /root/reference/audio8/train.py:266-268); this is the TPU-native
    optional extension called out in SURVEY.md §2.6. XLA turns the update
    into a reduce-scattered/sharded AdamW step followed by an all-gather of
    the param deltas over ICI — moments never materialize replicated, a
    ~2/3 cut of optimizer HBM at wav2vec2-base scale."""
    return _state_shardings(state, mesh, rules, _MOMENT_RE.search)


def fsdp_shardings(state: Any, mesh: Mesh,
                   rules: Sequence[Tuple[str, P]] = DP_ONLY_RULES) -> Any:
    """Sharding tree for fully-sharded data parallelism (ZeRO-3): EVERY
    weight leaf — params and AdamW moments alike — keeps its rule spec
    (Megatron 'model' split under TP) and additionally shards over 'data'
    on the first free axis the extent divides; scalars and tiny leaves
    stay replicated.

    This is FSDP the SPMD way: no wrapper classes or manual
    gather/scatter hooks (torch FSDP's machinery) — the annotation alone
    makes XLA all-gather each layer's params over ICI right before use,
    reduce-scatter its gradients, and run the optimizer update on the
    shard. Per-chip HBM for weights+grads+moments drops by the 'data'
    extent, the compute cost is one all-gather per layer per step that
    overlaps with the previous layer's compute (XLA's latency-hiding
    scheduler), and checkpoint save/restore is unchanged
    (train/checkpoint.py host-gathers via ``to_host``). The reference
    has no equivalent (plain DDP replicates everything,
    /root/reference/audio8/train.py:266-268)."""
    return _state_shardings(state, mesh, rules, lambda _: True)


def shard_state(state: Any, mesh: Mesh,
                rules: Sequence[Tuple[str, P]] = DP_ONLY_RULES,
                zero1: bool = False, fsdp: bool = False) -> Any:
    """Place a full TrainState (params + optimizer moments + step) onto the
    mesh. The path rules match optimizer-moment leaves too because their
    paths end with the same param path (``.*`` rule prefixes), so TP moments
    shard like their params; scalars fall back to replication. With
    ``zero1=True`` the AdamW moments additionally shard over 'data'
    (see zero1_shardings); with ``fsdp=True`` params shard too (ZeRO-3,
    see fsdp_shardings — implies zero1)."""
    if fsdp:
        shardings = fsdp_shardings(state, mesh, rules)
        return jax.tree_util.tree_map(jax.device_put, state, shardings)
    if zero1:
        shardings = zero1_shardings(state, mesh, rules)
        return jax.tree_util.tree_map(jax.device_put, state, shardings)
    return shard_params(state, mesh, rules)


def put_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded over 'data'.

    Single process: a plain sharded device_put. Multi-process: each process
    holds its contiguous row-block of the global batch (the datasets' row
    sharding contract) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — XLA then inserts the
    gradient psums the reference gets from DDP
    (/root/reference/audio8/train.py:266-268,320-326).
    """
    bs = batch_sharding(mesh)
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    if jax.process_count() == 1:
        return {k: jax.device_put(np.asarray(v), bs) for k, v in arrays.items()}
    return {k: jax.make_array_from_process_local_data(bs, np.asarray(v))
            for k, v in arrays.items()}


def global_sum_scalars(values) -> np.ndarray:
    """Sum a small host array across processes (validation counters).
    Identity in single-process mode; a collective otherwise — every
    process must call it."""
    values = np.asarray(values)
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return np.sum(multihost_utils.process_allgather(values), axis=0)


def to_host(x) -> np.ndarray:
    """Fetch an array to host numpy, all-gathering first if it is not fully
    addressable (multi-host shard of a global batch, or a ZeRO-1 moment
    sharded across hosts)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if isinstance(x.sharding, NamedSharding):
            # jitted identity with replicated output: XLA inserts the
            # all-gather whatever axis the array is sharded on (the
            # process_allgather fallback below only handles axis-0 tiling)
            x = jax.jit(
                lambda a: a,
                out_shardings=NamedSharding(x.sharding.mesh, P()))(x)
        else:
            from jax.experimental import multihost_utils

            # tiled: concatenate the per-process shards along axis 0,
            # giving the global array in row order
            x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)
