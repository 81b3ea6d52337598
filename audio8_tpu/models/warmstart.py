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


def convert_transformers_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF-transformers BERT-style encoder keys -> our text-encoder npz keys.

    Equivalent of eight_mile's ``convert_transformers_keys``
    (imported at /root/reference/audio8/pretrain.py:21). The result feeds
    :func:`load_tlm_npz`. Handles the standard layout:

      embeddings.word_embeddings.weight        -> embeddings/embedding
      encoder.layer.N.attention.self.{query,key,value}.{weight,bias}
      encoder.layer.N.attention.output.dense   (w_O)
      encoder.layer.N.attention.output.LayerNorm (ln_attn)
      encoder.layer.N.intermediate.dense       (ffn expand)
      encoder.layer.N.output.dense             (ffn contract)
      encoder.layer.N.output.LayerNorm         (ln_ffn)
    """
    out: Dict[str, np.ndarray] = {}

    def lin(src: str, dst: str) -> None:
        if src + ".weight" in state:
            out[dst + "/kernel"] = np.asarray(state[src + ".weight"]).T
        if src + ".bias" in state:
            out[dst + "/bias"] = np.asarray(state[src + ".bias"])

    def ln(src: str, dst: str) -> None:
        if src + ".weight" in state:
            out[dst + "/scale"] = np.asarray(state[src + ".weight"])
        if src + ".bias" in state:
            out[dst + "/bias"] = np.asarray(state[src + ".bias"])

    for k in state:
        if k.endswith("embeddings.word_embeddings.weight"):
            out["embeddings/embedding"] = np.asarray(state[k])

    layers = set()
    for k in state:
        parts = k.split(".")
        for i, p in enumerate(parts):
            if p == "layer" and i + 1 < len(parts) and parts[i + 1].isdigit():
                layers.add(int(parts[i + 1]))
    prefix = ""
    for cand in ("encoder.layer.", "bert.encoder.layer."):
        if any(k.startswith(cand) for k in state):
            prefix = cand
            break
    for n in sorted(layers):
        src = f"{prefix}{n}"
        dst = f"transformer/layer_{n}"
        lin(f"{src}.attention.self.query", f"{dst}/self_attn/w_Q")
        lin(f"{src}.attention.self.key", f"{dst}/self_attn/w_K")
        lin(f"{src}.attention.self.value", f"{dst}/self_attn/w_V")
        lin(f"{src}.attention.output.dense", f"{dst}/self_attn/w_O")
        ln(f"{src}.attention.output.LayerNorm", f"{dst}/ln_attn")
        lin(f"{src}.intermediate.dense", f"{dst}/ffn/expand")
        lin(f"{src}.output.dense", f"{dst}/ffn/contract")
        ln(f"{src}.output.LayerNorm", f"{dst}/ln_ffn")
    return out
