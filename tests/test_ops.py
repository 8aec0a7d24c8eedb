"""Aggregation kernels: Pallas (interpret mode on CPU) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.ops.aggregate import gather_multiply_aggregate
from gamd_tpu.ops.pallas_mp import (
    _fused_reference,
    fused_edge_mlp_aggregate,
    pallas_gather_multiply_aggregate,
)


def _inputs(n=16, k=8, d=128, seed=0):
    rng = np.random.RandomState(seed)
    h = rng.randn(n, d).astype(np.float32)
    e = rng.randn(n, k, d).astype(np.float32)
    idx = rng.randint(0, n, size=(n, k)).astype(np.int32)
    mask = rng.rand(n, k) > 0.3
    return (jnp.asarray(h), jnp.asarray(e), jnp.asarray(idx),
            jnp.asarray(mask))


def test_reference_aggregate_matches_loop():
    h, e, idx, mask = _inputs(n=8, k=4, d=8)
    out = np.asarray(gather_multiply_aggregate(h, e, idx, mask))
    hn, en, idxn, maskn = map(np.asarray, (h, e, idx, mask))
    expected = np.zeros_like(out)
    for i in range(8):
        for kk in range(4):
            if maskn[i, kk]:
                expected[i] += hn[idxn[i, kk]] * en[i, kk]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_pallas_gather_aggregate_matches_reference():
    h, e, idx, mask = _inputs()
    ref = gather_multiply_aggregate(h, e, idx, mask)
    out = pallas_gather_multiply_aggregate(h, e, idx, mask, tile_n=8,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_edge_mlp_aggregate_matches_reference():
    rng = np.random.RandomState(1)
    n, k, h_dim, d = 16, 8, 128, 128
    edge_pre = jnp.asarray(rng.randn(n, k, h_dim).astype(np.float32))
    h_src = jnp.asarray(rng.randn(n, k, d).astype(np.float32))
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    w1 = jnp.asarray(rng.randn(h_dim, h_dim).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(h_dim).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(h_dim, d).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)

    ref = _fused_reference(edge_pre, h_src, mask, w1, b1, w2, b2)
    out = fused_edge_mlp_aggregate(edge_pre, h_src, mask, w1, b1, w2, b2,
                                   8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fused_edge_mlp_aggregate_gradients():
    """custom_vjp backward equals autodiff through the reference impl."""
    rng = np.random.RandomState(2)
    n, k, h_dim, d = 8, 4, 128, 128
    edge_pre = jnp.asarray(rng.randn(n, k, h_dim).astype(np.float32) * 0.5)
    h_src = jnp.asarray(rng.randn(n, k, d).astype(np.float32) * 0.5)
    mask = jnp.asarray(rng.rand(n, k) > 0.2)
    w1 = jnp.asarray(rng.randn(h_dim, h_dim).astype(np.float32) * 0.05)
    b1 = jnp.zeros(h_dim)
    w2 = jnp.asarray(rng.randn(h_dim, d).astype(np.float32) * 0.05)
    b2 = jnp.zeros(d)

    def loss_pallas(w1_):
        return jnp.sum(fused_edge_mlp_aggregate(
            edge_pre, h_src, mask, w1_, b1, w2, b2, 8, True) ** 2)

    def loss_ref(w1_):
        return jnp.sum(_fused_reference(
            edge_pre, h_src, mask, w1_, b1, w2, b2) ** 2)

    g_pallas = jax.grad(loss_pallas)(w1)
    g_ref = jax.grad(loss_ref)(w1)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)
