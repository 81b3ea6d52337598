"""Warm-starting text towers from pretrained transformer-LM .npz files.

Equivalent of eight_mile's ``load_tlm_npz`` used by the paired pretrainer
(/root/reference/audio8/wav2vec2.py:362-364, pretrain_paired warmstart).
The npz is a flat dict of arrays; we accept two key styles:

- our own export style: keys matching the flax param tree joined with '/'
  (e.g. ``embeddings/embedding``, ``transformer/layer_0/self_attn/w_Q/kernel``);
- a torch-layout style (``...weight``/(out,in) linear matrices), detected
  by suffix and transposed on the way in.

Arrays whose path doesn't exist in the target tree are reported, not fatal
— mirroring the reference's lenient strict=False load.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _flatten(tree: Dict, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def load_tlm_npz(params: Dict, npz_file: str) -> Tuple[Dict, Dict]:
    """Overlay arrays from ``npz_file`` onto ``params`` (a flax param tree
    for a text encoder). Returns (new_params, report)."""
    blob = np.load(npz_file, allow_pickle=False)
    flat = _flatten(params)
    by_path = {"/".join(p): p for p in flat}
    loaded: List[str] = []
    unexpected: List[str] = []
    for key in blob.files:
        arr = np.asarray(blob[key])
        norm = key.replace(".", "/")
        if norm.endswith("/weight"):  # torch-style linear/emb weight
            cand = norm[: -len("/weight")] + "/kernel"
            if cand in by_path and flat[by_path[cand]].shape == arr.T.shape:
                flat[by_path[cand]] = arr.T.astype(np.float32)
                loaded.append(key)
                continue
            cand = norm[: -len("/weight")] + "/embedding"
            if cand in by_path and flat[by_path[cand]].shape == arr.shape:
                flat[by_path[cand]] = arr.astype(np.float32)
                loaded.append(key)
                continue
        if norm in by_path and flat[by_path[norm]].shape == arr.shape:
            flat[by_path[norm]] = arr.astype(np.float32)
            loaded.append(key)
        else:
            unexpected.append(key)
    missing = [("/".join(p)) for p in flat if "/".join(p) not in
               {k.replace(".", "/") for k in blob.files}]
    return _unflatten(flat), {"loaded": loaded, "unexpected": unexpected,
                              "missing_in_npz": missing}


def save_tlm_npz(params: Dict, npz_file: str) -> None:
    """Export a text-encoder param tree to the flat npz format."""
    flat = {"/".join(p): np.asarray(v) for p, v in _flatten(params).items()}
    np.savez(npz_file, **flat)
