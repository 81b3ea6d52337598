"""Fused Pallas AdamW vs optax.adamw exactness (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from audio8_tpu.ops.pallas.adamw_kernel import FusedAdamW


def test_fused_adamw_matches_optax(rng):
    params = {
        "a": jnp.asarray(rng.normal(size=(16, 384)).astype(np.float32)),
        "b": {"c": jnp.asarray(rng.normal(size=(129,)).astype(np.float32))},
    }
    lr = lambda step: 0.01 * jnp.minimum(step.astype(jnp.float32) / 3.0, 1.0)
    wd = 0.02
    ref_tx = optax.adamw(learning_rate=lambda c: lr(c), b1=0.9, b2=0.999,
                         eps=1e-8, weight_decay=wd)
    ref_state = ref_tx.init(params)
    fused = FusedAdamW(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    fstate = fused.init(params)

    p_ref, p_fused = params, params
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(np.random.default_rng(step).normal(
                size=p.shape).astype(np.float32)), params)
        gscale = 0.5  # combined example-count scale + clip factor
        scaled = jax.tree_util.tree_map(lambda g: g * gscale, grads)
        updates, ref_state = ref_tx.update(scaled, ref_state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_fused, fstate = fused.apply(grads, fstate, p_fused, gscale)

    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)
