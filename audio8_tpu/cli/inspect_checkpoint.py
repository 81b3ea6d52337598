"""`a8t-inspect`: summarize any checkpoint the framework can load.

Operational tool with no reference equivalent: prints the detected
format (a8t/Orbax directory, fairseq ``.pt``, HF ``save_pretrained``
dir), the training step, total/ per-module parameter counts, dtype
breakdown, and whether optimizer state is present — without building a
model or knowing the flags that trained it.

  a8t-inspect runs/ctc/checkpoint-step-320000
  a8t-inspect wav2vec_small.pt --tree
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from collections import defaultdict

import numpy as np


def _leaves(tree, prefix=()):
    """Yield (path_tuple, array-like) for a nested dict tree."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves(v, prefix + (str(k),))
    elif hasattr(tree, "shape"):
        yield prefix, tree
    # scalars / metadata are skipped


def _load(path: str):
    """-> (format, step, param_tree, has_opt_state)."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "config.json")):
            tree = _load_hf(path)
            return "huggingface save_pretrained", None, tree, False
        from audio8_tpu.train.checkpoint import (find_latest_checkpoint,
                                                 load_checkpoint,
                                                 parse_checkpoint_step)
        if not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")) \
                and not any(n.startswith("checkpoint")
                            for n in os.listdir(path)) \
                and not os.path.exists(os.path.join(path, "params")):
            raise SystemExit(f"{path}: not a recognizable checkpoint dir")
        try:
            raw = load_checkpoint(path)
            step = parse_checkpoint_step(path)
        except Exception:
            latest, step = find_latest_checkpoint(path)
            raw = load_checkpoint(latest)
            path = latest
        params = raw.get("params", raw) if isinstance(raw, dict) else raw
        has_opt = isinstance(raw, dict) and any(
            k in raw for k in ("opt_state", "mu", "nu"))
        return "a8t (Orbax)", step, params, has_opt
    if path.endswith((".pt", ".pth")):
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=False)
        model = blob.get("model", blob) if isinstance(blob, dict) else blob
        if hasattr(model, "state_dict"):
            model = model.state_dict()
        tree = {k: v.numpy() if hasattr(v, "numpy") else v
                for k, v in model.items() if hasattr(v, "shape")}
        # fairseq stores optimizer state under 'last_optimizer_state'
        # (+ 'optimizer_history'); plain torch training loops use
        # 'optimizer'
        has_opt = isinstance(blob, dict) and any(
            k in blob for k in ("optimizer", "last_optimizer_state",
                                "optimizer_history"))
        return "fairseq/torch .pt", None, tree, has_opt
    raise SystemExit(f"{path}: unknown checkpoint format")


def _load_hf(path: str):
    st = os.path.join(path, "model.safetensors")
    bin_ = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return dict(load_file(st))
    if os.path.exists(bin_):
        import torch

        return {k: v.numpy() for k, v in
                torch.load(bin_, map_location="cpu").items()
                if hasattr(v, "shape")}
    raise SystemExit(f"{path}: HF dir without model weights")


def main(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("--tree", action="store_true",
                   help="print every leaf path with shape/dtype")
    p.add_argument("--json", action="store_true",
                   help="machine-readable summary on stdout")
    args = p.parse_args(argv)

    fmt, step, tree, has_opt = _load(args.checkpoint)
    leaves = list(_leaves(tree))
    total = sum(int(np.prod(a.shape)) for _, a in leaves)
    by_module = defaultdict(int)
    by_dtype = defaultdict(int)
    for path, a in leaves:
        by_module[path[0] if path else "?"] += int(np.prod(a.shape))
        by_dtype[str(a.dtype)] += int(np.prod(a.shape))

    summary = {
        "checkpoint": args.checkpoint,
        "format": fmt,
        "step": step,
        "leaves": len(leaves),
        "total_params": total,
        "optimizer_state": has_opt,
        "by_dtype": dict(sorted(by_dtype.items())),
        "by_module": dict(sorted(by_module.items(),
                                 key=lambda kv: -kv[1])),
    }
    if args.json:
        print(json.dumps(summary, indent=1))
    else:
        print(f"format:          {fmt}")
        print(f"step:            {step if step is not None else 'n/a'}")
        print(f"leaves:          {len(leaves)}")
        print(f"total params:    {total:,} ({total / 1e6:.1f}M)")
        print(f"optimizer state: {'yes' if has_opt else 'no'}")
        print("dtypes:          "
              + ", ".join(f"{k}={v:,}" for k, v in sorted(by_dtype.items())))
        print("by module:")
        for mod, n in sorted(by_module.items(), key=lambda kv: -kv[1]):
            print(f"  {mod:40s} {n:>14,} ({100 * n / max(total, 1):5.1f}%)")
        if args.tree:
            print("leaves:")
            for path, a in sorted(leaves):
                print(f"  {'/'.join(path):60s} {str(a.shape):20s} {a.dtype}")
    return summary


if __name__ == "__main__":
    main()
