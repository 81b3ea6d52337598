"""Grouped-conv weight gradients on multi-axis meshes.

XLA's SPMD partitioner (jax/jaxlib 0.9.0) double-counts the weight
gradient of a ``feature_group_count > 1`` convolution when the batch is
sharded over one axis of a 2-D mesh and the kernel is replicated: dW
comes out scaled by exactly the unused mesh axis's size. The first test
documents the raw bug (and will start failing if an upstream fix lands —
at which point ``grouped_conv1d``'s custom VJP can be retired); the rest
pin our workaround.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio8_tpu.nn.layers import PositionalConv, grouped_conv1d

B, T, C, K, G = 8, 32, 16, 5, 4


def _mesh_4x2():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model"))


def _raw_grouped_loss(w, x):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=G)
    return jnp.sum(y * y)


def _data(rng):
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(K, C // G, C)) * 0.1).astype(np.float32))
    return x, w


def _shard(mesh, x, w):
    return (jax.device_put(x, NamedSharding(mesh, P("data"))),
            jax.device_put(w, NamedSharding(mesh, P())))


def test_upstream_grouped_wgrad_bug_still_present(rng):
    """Documents the raw XLA bug: dW scaled by the model-axis size (2)."""
    mesh = _mesh_4x2()
    x, w = _data(rng)
    grad = jax.jit(jax.grad(_raw_grouped_loss))
    g_ref = np.asarray(grad(w, x))
    xs, ws = _shard(mesh, x, w)
    g_mesh = np.asarray(grad(ws, xs))
    ratio = np.median(g_mesh / np.where(np.abs(g_ref) > 1e-6, g_ref, 1.0))
    assert ratio == pytest.approx(2.0, rel=1e-3), (
        f"median dW ratio {ratio}: upstream XLA grouped-conv wgrad bug looks "
        "fixed - grouped_conv1d's custom VJP can be retired")


def test_grouped_conv1d_wgrad_correct_on_mesh(rng):
    mesh = _mesh_4x2()
    x, w = _data(rng)

    def loss(w, x):
        y = grouped_conv1d(x, w, 1, "SAME", G)
        return jnp.sum(y * y)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    gw_ref, gx_ref = map(np.asarray, grad(w, x))
    xs, ws = _shard(mesh, x, w)
    gw_mesh, gx_mesh = map(np.asarray, grad(ws, xs))
    np.testing.assert_allclose(gw_mesh, gw_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gx_mesh, gx_ref, rtol=1e-4, atol=1e-5)


def test_grouped_conv1d_matches_lax_fwd_and_grad(rng):
    """The custom-VJP grads equal the plain lax grouped-conv grads
    (single device, where lax is trustworthy)."""
    x, w = _data(rng)

    def loss_ours(w, x):
        return jnp.sum(grouped_conv1d(x, w, 1, "SAME", G) ** 2)

    y_ours = grouped_conv1d(x, w, 1, "SAME", G)
    y_lax = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=G)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_lax),
                               rtol=1e-5, atol=1e-5)
    gw_ours, gx_ours = jax.grad(loss_ours, argnums=(0, 1))(w, x)
    gw_lax, gx_lax = jax.grad(_raw_grouped_loss, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_ours), np.asarray(gw_lax),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_ours), np.asarray(gx_lax),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_positional_conv_wgrad_correct_on_mesh(rng):
    """End-to-end through the weight-normed PositionalConv module."""
    mesh = _mesh_4x2()
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    mod = PositionalConv(features=C, kernel_size=8, groups=G)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, x):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    grad = jax.jit(jax.grad(loss))
    g_ref = grad(params, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ps = jax.tree_util.tree_map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P())), params)
    g_mesh = grad(ps, xs)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_mesh)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=str(ka))
