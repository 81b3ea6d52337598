"""packed_qkv: the one-GEMM Q/K/V path is numerically identical to the
three-GEMM path (same param tree, same forward, same gradients)."""
import numpy as np
import jax
import jax.numpy as jnp

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.nn.transformer import MultiHeadAttention


def test_packed_qkv_forward_and_grad_identical():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 32)).astype(np.float32))
    base = MultiHeadAttention(num_heads=4, d_model=32)
    packed = MultiHeadAttention(num_heads=4, d_model=32, packed_qkv=True)
    params = base.init(jax.random.PRNGKey(0), x, x, x)["params"]
    # identical param trees
    p2 = packed.init(jax.random.PRNGKey(0), x, x, x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)

    want = base.apply({"params": params}, x, x, x)
    got = packed.apply({"params": params}, x, x, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply({"params": p}, x, x, x) ** 2)
        return jax.grad(f)(params)

    g1, g2 = loss(base), loss(packed)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, err_msg=str(k1))


def test_packed_qkv_cross_attention_falls_back():
    """query is not key -> the packed path must not engage (decoder
    cross-attention); output still matches the unpacked module."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    base = MultiHeadAttention(num_heads=4, d_model=32)
    packed = MultiHeadAttention(num_heads=4, d_model=32, packed_qkv=True)
    params = base.init(jax.random.PRNGKey(0), q, kv, kv)["params"]
    np.testing.assert_allclose(
        np.asarray(packed.apply({"params": params}, q, kv, kv)),
        np.asarray(base.apply({"params": params}, q, kv, kv)), atol=1e-6)


def test_packed_qkv_reaches_hubert_and_data2vec():
    """The flag must thread through EVERY encoder owner, not silently
    no-op: with packed_qkv=True, hubert/data2vec forwards still match the
    unpacked forward bit-for-bit on the same params (proving the packed
    code path actually engaged AND is numerically identical)."""
    from audio8_tpu.config import Data2VecPretrainConfig, HubertPretrainConfig
    from audio8_tpu.models.data2vec import Data2VecAudioModel
    from audio8_tpu.models.hubert import HubertPretrainModel

    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 4000)),
                    jnp.float32)
    lens = jnp.asarray([4000, 3000], jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    for cls, cfg_cls, outs in [
            (HubertPretrainModel, HubertPretrainConfig, 3),
            (Data2VecAudioModel, Data2VecPretrainConfig, 3)]:
        kw = dict(d_model=32, num_heads=2, num_layers=1, d_ff=64, dropout=0.0)
        if cfg_cls is HubertPretrainConfig:
            kw.update(num_clusters=12, final_dim=16)
        base = cls(config=cfg_cls(**kw))
        packed = cls(config=cfg_cls(packed_qkv=True, **kw))
        params = base.init(rngs, x, lens)["params"]
        assert jax.tree_util.tree_structure(
            packed.init(rngs, x, lens)["params"]) == \
            jax.tree_util.tree_structure(params)
        # same mask RNG on both sides -> identical span masks, so the
        # only difference can come from the attention projection path
        mk = {"mask": jax.random.PRNGKey(7)}
        a = base.apply({"params": params}, x, lens, rngs=mk)
        b = packed.apply({"params": params}, x, lens, rngs=mk)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=1e-6, err_msg=cls.__name__)


def test_packed_qkv_full_model_parity():
    cfgs = [AcousticConfig(num_labels=12, d_model=64, num_heads=4,
                           num_layers=2, d_ff=128, dropout=0.0,
                           timestep_masking=0.0, channel_masking=0.0,
                           packed_qkv=pq) for pq in (False, True)]
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 8000)).astype(np.float32))
    lens = jnp.full((2,), 8000, jnp.int32)
    models = [Wav2Vec2AcousticModel(config=c) for c in cfgs]
    params = models[0].init(jax.random.PRNGKey(0), x, lens)["params"]
    lp0, _ = models[0].apply({"params": params}, x, lens)
    lp1, _ = models[1].apply({"params": params}, x, lens)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0), atol=1e-5)
