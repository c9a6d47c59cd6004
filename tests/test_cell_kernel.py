"""Fused maxout-LSTM cell kernel: reference equivalence + gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from cooperativeimagecaptioning_tpu.ops.pallas import cell_step


def case(seed=0, B=8, D=12, H=16, use_att=True):
    rng = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    return (f(B, D), f(B, H), f(B, H), f(B, H) if use_att else None,
            f(D, 5 * H), f(5 * H), f(H, 5 * H), f(5 * H),
            f(H, 2 * H) if use_att else None,
            f(2 * H) if use_att else None)


def test_cell_matches_unfused_math():
    """cell_reference == the original layers-based formulation."""
    from cooperativeimagecaptioning_tpu.models import layers
    xt, h, c, ar, wi, bi, wh, bh, wc, bc = case(use_att=False)
    want_h, want_c = layers.maxout_lstm_gates(
        (xt @ wi + bi) + (h @ wh + bh), c, h.shape[-1])
    got_h, got_c = cell_step.cell_reference(xt, h, c, None, wi, bi, wh, bh,
                                            None, None)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=1e-6)


def test_att_cell_adds_a2c_to_in_transform_only():
    args = case(seed=1)
    xt, h, c, ar, wi, bi, wh, bh, wc, bc = args
    h1, c1 = cell_step.cell_reference(*args)
    # zero a2c == no attention contribution
    h2, c2 = cell_step.cell_reference(xt, h, c, ar, wi, bi, wh, bh,
                                      jnp.zeros_like(wc), jnp.zeros_like(bc))
    h3, c3 = cell_step.cell_reference(xt, h, c, None, wi, bi, wh, bh,
                                      None, None)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h3), atol=1e-6)
    assert not np.allclose(np.asarray(h1), np.asarray(h3))


def test_cell_gradients_match_reference():
    args = case(seed=2)

    def f_fused(xt, h, c, ar):
        hh, cc = cell_step.fused_cell(xt, h, c, ar, *args[4:])
        return jnp.sum(hh ** 2) + jnp.sum(cc ** 2)

    def f_ref(xt, h, c, ar):
        hh, cc = cell_step.cell_reference(xt, h, c, ar, *args[4:])
        return jnp.sum(hh ** 2) + jnp.sum(cc ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(*args[:4])
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args[:4])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
