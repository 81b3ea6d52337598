"""Coverage for the remaining tool/utility surfaces: the offline
checkpoint-converter CLI, the step profiler, the pooled-reduction menu,
and the Pallas dropout kernel's backend gate.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio8_tpu.nn.pooling import make_reduction
from audio8_tpu.train.profiler import StepProfiler


def test_convert_checkpoint_cli(tmp_path):
    """fairseq .pt -> CLI conversion -> checkpoint on disk with the
    converted tree (the reference's convert_wav2vec2_checkpoint.py:8-62
    flow, including the raise-on-unmapped-keys contract)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_convert import make_fairseq_state, D, H, L, V

    from audio8_tpu.cli.convert_checkpoint import main
    from audio8_tpu.train.checkpoint import load_checkpoint

    rng = np.random.default_rng(7)
    s = make_fairseq_state(rng, prefix="w2v_encoder.w2v_model.")
    s["w2v_encoder.proj.weight"] = rng.normal(size=(V, D)).astype(np.float32) * 0.1
    s["w2v_encoder.proj.bias"] = rng.normal(size=V).astype(np.float32) * 0.1
    pt = tmp_path / "ckpt.pt"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in s.items()}}, str(pt))

    out = tmp_path / "converted"
    main(["--input", str(pt), "--output", str(out), "--ctc", "true",
          "--num_labels", str(V), "--d_model", str(D), "--num_heads", str(H),
          "--num_layers", str(L), "--d_ff", str(4 * D)])

    restored = load_checkpoint(str(out) + "-step-0")
    proj = np.asarray(restored["params"]["proj"]["kernel"])
    np.testing.assert_allclose(proj, s["w2v_encoder.proj.weight"].T, rtol=1e-6)

    # unmapped keys must raise (reference behavior)
    s_bad = dict(s)
    s_bad["w2v_encoder.w2v_model.mystery.weight"] = np.zeros(3, np.float32)
    pt_bad = tmp_path / "bad.pt"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in s_bad.items()}}, str(pt_bad))
    with pytest.raises(ValueError, match="Unmapped"):
        main(["--input", str(pt_bad), "--output", str(tmp_path / "x"),
              "--ctc", "true", "--num_labels", str(V), "--d_model", str(D),
              "--num_heads", str(H), "--num_layers", str(L),
              "--d_ff", str(4 * D)])


def test_step_profiler_window(tmp_path):
    prof = StepProfiler(str(tmp_path / "trace"), start_step=1, num_steps=2)
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((8, 8))
    for step in range(5):
        prof.step(step)
        x = f(x)
    np.asarray(x)
    assert not prof._active  # window closed
    written = glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
    assert written, "profiler wrote no trace files"


def test_step_profiler_disabled():
    prof = StepProfiler(None)
    for step in range(3):
        prof.step(step)  # no-op, must not raise


@pytest.mark.parametrize("rt", ["max", "mean", "sha", "sha_max", "sha_mean",
                                "2ha", "2ha_max", "2ha_mean"])
def test_reduction_menu_shapes(rng, rt):
    """The full reference reduction-type menu
    (/root/reference/audio8/wav2vec2.py:806-846) produces (B, C) and
    ignores padded positions."""
    b, t, d = 3, 12, 16
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    lengths = jnp.asarray([12, 7, 3])
    pad_mask = jnp.arange(t)[None, :] < lengths[:, None]
    red = make_reduction(rt, d_model=d, d_k=8)
    params = red.init(jax.random.PRNGKey(0), x, pad_mask)
    y = red.apply(params, x, pad_mask)
    assert y.shape == (b, d)

    # padding must not affect the output
    x_noised = jnp.where(pad_mask[..., None], x, 1e3)
    y2 = red.apply(params, x_noised, pad_mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-4)


def test_reduction_mean_matches_manual(rng):
    b, t, d = 2, 10, 8
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    lengths = jnp.asarray([10, 4])
    pad_mask = jnp.arange(t)[None, :] < lengths[:, None]
    red = make_reduction("mean", d_model=d)
    y = red.apply(red.init(jax.random.PRNGKey(0), x, pad_mask), x, pad_mask)
    manual = np.stack([np.asarray(x)[i, :int(lengths[i])].mean(0) for i in range(b)])
    np.testing.assert_allclose(np.asarray(y), manual, rtol=1e-5)


def test_reduction_none_passthrough(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    pad_mask = jnp.ones((2, 6), bool)
    red = make_reduction("none", d_model=8)
    y, m = red.apply(red.init(jax.random.PRNGKey(0), x, pad_mask), x, pad_mask)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_pallas_dropout_requires_tpu():
    """fast_dropout uses the TPU hardware PRNG (pltpu.prng_seed), which has
    no CPU interpret lowering — off-TPU it must fail loudly rather than
    silently produce wrong masks (the Dropout module only dispatches to it
    behind use_pallas=True on the TPU backend)."""
    from audio8_tpu.ops.pallas.dropout_kernel import fast_dropout

    x = jnp.ones((256, 128), jnp.float32)
    with pytest.raises(Exception):
        np.asarray(fast_dropout(x, 0.25, jax.random.PRNGKey(0)))
