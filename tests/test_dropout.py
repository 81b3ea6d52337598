"""Hash-dropout statistical validation + module dispatch."""
import numpy as np
import jax
import jax.numpy as jnp

from audio8_tpu.nn.dropout import Dropout, _hash_keep_mask, set_default_impl


def test_hash_mask_statistics():
    m = np.asarray(_hash_keep_mask((1000, 500), 0.1, jnp.int32(12345)))
    assert abs(m.mean() - 0.9) < 0.005
    m2 = np.asarray(_hash_keep_mask((1000, 500), 0.1, jnp.int32(54321)))
    # independent seeds: overlap ~= 0.81
    assert abs((m & m2).mean() - 0.81) < 0.01
    # per-row keep rates binomially tight
    assert m.mean(axis=1).std() < 0.03
    # rate 0.5
    m5 = np.asarray(_hash_keep_mask((1000, 500), 0.5, jnp.int32(7)))
    assert abs(m5.mean() - 0.5) < 0.01


def test_dropout_module_modes():
    x = jnp.ones((64, 128))
    for impl in ["threefry", "hash"]:
        m = Dropout(rate=0.25, impl=impl)
        y = m.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(0)})
        y = np.asarray(y)
        kept = y > 0
        assert abs(kept.mean() - 0.75) < 0.05, impl
        np.testing.assert_allclose(y[kept], 1.0 / 0.75, rtol=1e-6)
        # deterministic: identity
        y2 = m.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y2), np.asarray(x))


def test_dropout_grad_matches_mask():
    x = jnp.ones((32, 64))
    m = Dropout(rate=0.5, impl="hash")

    def f(x):
        return jnp.sum(m.apply({}, x, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(3)}))

    g = np.asarray(jax.grad(f)(x))
    y = np.asarray(m.apply({}, x, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(3)}))
    # gradient is exactly the applied mask/scale
    np.testing.assert_allclose(g, y, rtol=1e-6)


def test_hashrand_statistics():
    from audio8_tpu.ops.hashrand import hash_uniform, hash_gumbel, hash_randint

    u = np.asarray(hash_uniform((2000, 250), jnp.int32(5)))
    assert 0.0 < u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.std() - (1 / 12) ** 0.5) < 0.005
    g = np.asarray(hash_gumbel((2000, 250), jnp.int32(9)))
    # gumbel mean = euler-mascheroni, std = pi/sqrt(6)
    assert abs(g.mean() - 0.5772) < 0.01
    assert abs(g.std() - np.pi / np.sqrt(6)) < 0.02
    r = np.asarray(hash_randint((100000,), jnp.int32(3), jnp.asarray(7)))
    counts = np.bincount(r, minlength=7)
    assert counts.min() > 0.9 * 100000 / 7
