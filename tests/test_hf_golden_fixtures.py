"""Pinned golden-oracle parity: every supported HF family's conversion +
forward checked against committed tensors.

Unlike tests/test_convert_hf.py (whose oracle is the live transformers
forward, re-derived per run), these fixtures freeze the oracle — weights,
input and expected log-probs generated once at fixed seeds
(tools/make_golden_fixtures.py) — so the parity evidence is stable across
transformers upgrades and runs with neither torch nor transformers
installed. The fixture stores the save_pretrained artifacts verbatim, so
this exercises the exact production load path (``load_hf_dir``) plus
``acoustic_config_from_hf`` and the full JAX forward.

Reference anchor: checkpoint parity is the reference's de-facto
correctness mechanism (/root/reference/audio8/wav2vec2.py:39-186,
convert_wav2vec2_checkpoint.py:59-60). Real pretrained checkpoints are
unobtainable here (no network); see docs/PARITY.md "Real-checkpoint
evidence".
"""
import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.models.convert import merge_params
from audio8_tpu.models.convert_hf import acoustic_config_from_hf, load_hf_dir
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "hf_golden")
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.npz")))


def _unpack(path, tmp_path):
    """Rebuild the save_pretrained dir the fixture snapshotted."""
    from safetensors.numpy import save_file

    blob = np.load(path)
    state = {k[len("state::"):]: np.ascontiguousarray(blob[k])
             for k in blob.files if k.startswith("state::")}
    config_text = bytes(blob["__config_json__"]).decode("utf-8")
    d = tmp_path / "hf"
    d.mkdir()
    (d / "config.json").write_text(config_text)
    save_file(state, str(d / "model.safetensors"))
    return str(d), json.loads(config_text), blob["__input__"], \
        blob["__log_probs__"]


def test_fixtures_exist():
    assert len(FIXTURES) >= 7, (
        f"expected the committed golden set in {FIXTURE_DIR}; regenerate "
        "with tools/make_golden_fixtures.py")


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(p)[:-4] for p in FIXTURES])
def test_golden_forward_parity(path, tmp_path):
    pytest.importorskip("safetensors")
    hf_dir, cfg_json, x, want = _unpack(path, tmp_path)

    params, report = load_hf_dir(hf_dir, ctc="auto")
    assert report["kind"] == "ctc"
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]

    cfg = acoustic_config_from_hf(cfg_json, report["topology"])
    assert cfg.conv_features == [(32, 10, 5), (32, 3, 2)]
    model = Wav2Vec2AcousticModel(config=cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    flat = lambda t: {
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_leaves_with_path(t)}
    fi, fc = flat(init), flat(params)
    assert set(fc) == set(fi), set(fi) ^ set(fc)

    merged = merge_params(init, params)
    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)
    assert (np.argmax(np.asarray(lp), -1) == np.argmax(want, -1)).mean() \
        > 0.999
