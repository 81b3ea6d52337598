"""npz text-tower warm start (load_tlm_npz equivalent)."""
import numpy as np
import jax
import jax.numpy as jnp

from audio8_tpu.config import TextEncoderConfig
from audio8_tpu.models.text import TextTransformerPooledEncoder
from audio8_tpu.models.warmstart import load_tlm_npz, save_tlm_npz


def test_npz_roundtrip_and_overlay(tmp_path):
    cfg = TextEncoderConfig(vocab_size=20, d_model=16, num_heads=2,
                            num_layers=1, d_ff=32, rpr_k=None,
                            reduction_type="max")
    m = TextTransformerPooledEncoder(config=cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    lens = jnp.asarray([4])
    p1 = m.init(jax.random.PRNGKey(0), ids, lens)["params"]
    p2 = m.init(jax.random.PRNGKey(1), ids, lens)["params"]

    f = str(tmp_path / "tlm.npz")
    save_tlm_npz(jax.tree_util.tree_map(np.asarray, p1), f)
    merged, report = load_tlm_npz(jax.tree_util.tree_map(np.asarray, p2), f)
    assert not report["unexpected"]
    l1 = jax.tree_util.tree_leaves(p1)
    lm = jax.tree_util.tree_leaves(merged)
    for a, b in zip(l1, lm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_npz_torch_style_weights(tmp_path):
    target = {"proj": {"kernel": np.zeros((4, 8), np.float32)},
              "emb": {"embedding": np.zeros((10, 4), np.float32)}}
    w = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    e = np.random.default_rng(1).normal(size=(10, 4)).astype(np.float32)
    f = str(tmp_path / "t.npz")
    np.savez(f, **{"proj.weight": w, "emb.weight": e})
    merged, report = load_tlm_npz(target, f)
    np.testing.assert_allclose(merged["proj"]["kernel"], w.T)
    np.testing.assert_allclose(merged["emb"]["embedding"], e)
    assert not report["unexpected"]


def test_convert_transformers_keys(tmp_path):
    """HF BERT-style keys -> npz -> text encoder overlay."""
    import jax
    import jax.numpy as jnp
    from audio8_tpu.config import TextEncoderConfig
    from audio8_tpu.models.text import TextTransformerPooledEncoder
    from audio8_tpu.models.warmstart import convert_transformers_keys

    rng = np.random.default_rng(0)
    d, ff, L, V = 16, 32, 2, 20
    state = {"embeddings.word_embeddings.weight":
             rng.normal(size=(V, d)).astype(np.float32)}
    for n in range(L):
        b = f"encoder.layer.{n}"
        for nm, shape in [("attention.self.query", (d, d)),
                          ("attention.self.key", (d, d)),
                          ("attention.self.value", (d, d)),
                          ("attention.output.dense", (d, d)),
                          ("intermediate.dense", (ff, d)),
                          ("output.dense", (d, ff))]:
            state[f"{b}.{nm}.weight"] = rng.normal(size=shape).astype(np.float32)
            state[f"{b}.{nm}.bias"] = rng.normal(size=shape[0]).astype(np.float32)
        for nm in ["attention.output.LayerNorm", "output.LayerNorm"]:
            state[f"{b}.{nm}.weight"] = np.ones(d, np.float32)
            state[f"{b}.{nm}.bias"] = np.zeros(d, np.float32)
    conv = convert_transformers_keys(state)
    f = str(tmp_path / "hf.npz")
    np.savez(f, **conv)

    cfg = TextEncoderConfig(vocab_size=V, d_model=d, num_heads=2, num_layers=L,
                            d_ff=ff, rpr_k=None, reduction_type="max")
    m = TextTransformerPooledEncoder(config=cfg)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
               jnp.asarray([4]))["params"]
    merged, report = load_tlm_npz(jax.tree_util.tree_map(np.asarray, p), f)
    assert not report["unexpected"]
    np.testing.assert_allclose(
        merged["transformer"]["layer_0"]["self_attn"]["w_Q"]["kernel"],
        state["encoder.layer.0.attention.self.query.weight"].T)
