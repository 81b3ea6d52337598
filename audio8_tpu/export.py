"""Serialized-model export/load: StableHLO inference artifacts.

A production-serving surface with no reference equivalent (audio8's
inference story ends at the batch eval driver,
/root/reference/audio8/test.py): ``a8t-export`` lowers the jitted
acoustic forward through ``jax.export`` into a *versioned, serialized
StableHLO artifact* that a server can load and run without the model
code, the checkpoint-restore stack, or the flag set that built it —
the same role torch.jit/ONNX exports play in the reference's wider
ecosystem, done the XLA-native way.

Artifact layout (a directory)::

    meta.json      vocab, conv geometry, entry table, versions
    params.npz     flat parameter list (p000000, p000001, ...)
    fwd_t<T>.shlo  jax.export serialization of
                   forward(flat_params, signal (b, T) f32, lengths (b,))
                   -> (log_probs (b, T', V), frames (b,))

Design points:

- **Batch-polymorphic, time-static.** Each entry is exported with a
  symbolic batch dim (any B re-specializes cheaply at run time) and a
  FIXED sample count T — the shape discipline of the whole framework:
  serving pads/chunks to a small set of static shapes, so every entry
  is one XLA program. Long audio rides ``serve.ChunkedTranscriber``
  over an entry-sized window.
- **Params ride as call arguments,** not baked constants: the artifact
  stays ~params-sized instead of embedding weights into the StableHLO
  text (which would also overflow remote-compile relays; see the
  HTTP-413 note in cli/transcribe.load_acoustic).
- **Multi-platform.** Entries are lowered for both ``cpu`` and ``tpu``
  by default, so the artifact smoke-tests on a CPU host and serves on
  TPU unchanged.
- **Forward-compatible.** ``jax.export`` pins StableHLO serialization
  versions with a documented compatibility window; ``meta.json``
  records the jax version and artifact schema version for auditing.
"""
from __future__ import annotations

import json
import os
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

ARTIFACT_VERSION = 1


def param_specs(flat_params: Sequence) -> List[jax.ShapeDtypeStruct]:
    return [jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
            for x in flat_params]


def export_callable(fn: Callable, arg_specs: Sequence,
                    platforms: Sequence[str] = ("cpu", "tpu")) -> bytes:
    """Serialize ``fn(*arg_specs)`` (specs may be ShapeDtypeStruct
    pytrees, e.g. from ``jax.eval_shape``). Returns serialized bytes."""
    exp = jax_export.export(jax.jit(fn),
                            platforms=tuple(platforms))(*arg_specs)
    return exp.serialize()


def export_forward(fn: Callable, flat_params: Sequence,
                   t_samples: int,
                   platforms: Sequence[str] = ("cpu", "tpu")) -> bytes:
    """Serialize ``fn(flat_params, signal (b, t_samples), lengths (b,))``
    with a symbolic batch dim. Returns the serialized bytes."""
    (b,) = jax_export.symbolic_shape("b")
    return export_callable(
        fn,
        (param_specs(flat_params),
         jax.ShapeDtypeStruct((b, t_samples), jnp.float32),
         jax.ShapeDtypeStruct((b,), jnp.int32)),
        platforms)


def save_artifact(out_dir: str, flat_params: Sequence, meta: dict,
                  entries: List[dict]) -> None:
    """Write the artifact directory: meta.json + params.npz + the
    ``entries`` (each ``{"t": int, "data": bytes}``) as .shlo files."""
    os.makedirs(out_dir, exist_ok=True)
    arrays = {f"p{i:06d}": np.asarray(x) for i, x in enumerate(flat_params)}
    np.savez(os.path.join(out_dir, "params.npz"), **arrays)
    entry_meta = []
    for e in entries:
        name = e.get("name") or f"fwd_t{e['t']}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(e["data"])
        em = {k: v for k, v in e.items() if k not in ("data", "name")}
        em["file"] = name
        entry_meta.append(em)
    meta = dict(meta)
    meta["version"] = ARTIFACT_VERSION
    meta["jax_version"] = jax.__version__
    meta["entries"] = entry_meta
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


class _ArtifactBase:
    """Shared artifact loading: meta.json + schema-version check +
    the flat params.npz list. Subclasses deserialize their entries."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("version", 0) > ARTIFACT_VERSION:
            raise ValueError(
                f"artifact schema v{self.meta['version']} is newer than "
                f"this loader (v{ARTIFACT_VERSION})")
        with np.load(os.path.join(path, "params.npz")) as z:
            self._params = [jnp.asarray(z[k]) for k in sorted(z.files)]

    def _deserialize(self, entry: dict):
        with open(os.path.join(self.path, entry["file"]), "rb") as f:
            exp = jax_export.deserialize(f.read())
        # jit the rehydrated call so repeated dispatches hit the
        # executable cache instead of re-tracing
        return jax.jit(exp.call)

    @property
    def kind(self) -> str:
        return self.meta.get("kind", "ctc")

    @property
    def conv_features(self):
        return [tuple(f) for f in self.meta["conv_features"]]

    @property
    def sample_rate(self) -> int:
        return int(self.meta.get("sample_rate", 16_000))


class ExportedAcoustic(_ArtifactBase):
    """A loaded artifact: ``forward(signal, lengths)`` with the entry
    table's shape discipline, plus the metadata serving needs.

    ``forward`` pads the time axis up to the smallest entry that fits
    (the batch dim is symbolic — any B runs), returns
    ``(log_probs, frames)`` exactly like the live
    ``cli/transcribe.load_acoustic`` forward, so ChunkedTranscriber /
    StreamingTranscriber / MicroBatcher all plug in unchanged.

    NOTE on pad geometry: the valid-frame count under the reference's
    reshape-all pad-mask downsampling is a function of the PADDED
    length, so outputs are bit-identical to a live eval only when both
    pad to the same sizes — feed entry-sized batches (e.g. a8t-test
    --exported pins the dataset length grid to the entry table).
    """

    def __init__(self, path: str):
        super().__init__(path)
        self._fns = {}
        for e in sorted(self.meta["entries"], key=lambda e: e["t"]):
            self._fns[int(e["t"])] = self._deserialize(e)
        if not self._fns:
            raise ValueError(f"no entries in artifact {path}")
        self._sizes = sorted(self._fns)

    @property
    def vocab(self) -> List[str]:
        return list(self.meta["vocab"])

    @property
    def max_samples(self) -> int:
        return self._sizes[-1]

    def entry_samples(self, requested: int = 0) -> int:
        """The entry size serving should window on: the smallest entry
        ≥ ``requested`` (or the largest when none fit / unspecified)."""
        for t in self._sizes:
            if t >= requested > 0:
                return t
        return self._sizes[-1]

    def forward(self, signal, lengths):
        signal = np.asarray(signal, np.float32)
        t = signal.shape[-1]
        fit = [s for s in self._sizes if s >= t]
        if not fit:
            raise ValueError(
                f"input of {t} samples exceeds the largest exported "
                f"shape ({self._sizes[-1]}); window long audio with "
                f"--chunk_seconds (ChunkedTranscriber) or re-export "
                f"with a larger --seconds")
        tt = fit[0]
        if tt != t:
            signal = np.pad(signal, ((0, 0), (0, tt - t)))
        return self._fns[tt](self._params, jnp.asarray(signal),
                             jnp.asarray(lengths, jnp.int32))


class ExportedTransducer(_ArtifactBase):
    """A loaded RNN-T artifact: the three streaming-decode callables
    (``encode`` / ``decode_init`` / ``decode_frames``) with the exact
    interface ``cli/transcribe.load_transducer_stream`` returns, so a
    ``serve.TransducerStreamer`` plugs in unchanged — the resumable
    windowed lattice search decodes any-length audio through the
    artifact's fixed shapes (chunk for the encoder, ``window_frames``
    per decode window, ``max_output_len`` label budget)."""

    def __init__(self, path: str):
        from audio8_tpu.utils import Offsets

        Offsets.remap_fairseq_ctc()  # _pad_id / blank follow CTC order
        super().__init__(path)
        fns = {e["role"]: self._deserialize(e)
               for e in self.meta["entries"]}
        missing = {"encode", "decode_init", "decode_frames"} - set(fns)
        if missing:
            raise ValueError(f"artifact {path} missing entries: {missing}")
        self._encode, self._init, self._frames = (
            fns["encode"], fns["decode_init"], fns["decode_frames"])
        self.chunk_samples = int(
            next(e["t"] for e in self.meta["entries"]
                 if e["role"] == "encode"))
        self.window_frames = int(self.meta["window_frames"])
        self.max_output_len = int(self.meta["max_output_len"])

    @property
    def vocab(self) -> List[str]:
        return list(self.meta["vocab"])

    def encode(self, signal, lengths):
        signal = np.asarray(signal, np.float32)
        t = signal.shape[-1]
        if t > self.chunk_samples:
            raise ValueError(
                f"encode window of {t} samples exceeds the exported "
                f"chunk ({self.chunk_samples}); the TransducerStreamer "
                f"must window on chunk_samples")
        if t < self.chunk_samples:
            signal = np.pad(signal, ((0, 0), (0, self.chunk_samples - t)))
        return self._encode(self._params, jnp.asarray(signal),
                            jnp.asarray(lengths, jnp.int32))

    def decode_init(self):
        return self._init(self._params)

    def decode_frames(self, enc, n_frames, tokens, n, pred_out, carry):
        return self._frames(self._params, enc, n_frames, tokens, n,
                            pred_out, carry)


class ExportedEmbedder(ExportedAcoustic):
    """A loaded utterance-embedding artifact (kind 'embed'): the same
    entry-table shape discipline as the CTC artifact, but the forward
    returns (B, D) L2-normalized embeddings (no vocab, no frames).
    ``reduction_type`` records the pooling baked at export."""

    @property
    def reduction_type(self) -> str:
        return self.meta.get("reduction_type", "mean")

    def run(self, signal, lengths):
        return self.forward(signal, lengths)


def artifact_kind(path: str) -> str:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f).get("kind", "ctc")


def load_artifact(path: str):
    """Load an artifact by its recorded kind: ``ExportedAcoustic``
    (kind 'ctc') or ``ExportedTransducer`` (kind 'transducer')."""
    kind = artifact_kind(path)
    if kind == "transducer":
        return ExportedTransducer(path)
    if kind == "ctc":
        return ExportedAcoustic(path)
    if kind == "embed":
        return ExportedEmbedder(path)
    raise ValueError(f"unknown artifact kind {kind!r} in {path}")
