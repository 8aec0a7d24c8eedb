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


def test_fused_conv_message_matches_reference():
    from gamd_tpu.ops.pallas_mp import (_conv_msg_reference,
                                        fused_conv_message)
    rng = np.random.RandomState(3)
    n, k, e_dim, h_dim, d = 20, 8, 128, 128, 128   # n not tile-divisible
    e = jnp.asarray(rng.randn(n, k, e_dim).astype(np.float32) * 0.3)
    h_src = jnp.asarray(rng.randn(n, k, d).astype(np.float32) * 0.3)
    src_code = jnp.asarray(rng.randn(n, k, h_dim).astype(np.float32) * 0.3)
    dst_code = jnp.asarray(rng.randn(n, h_dim).astype(np.float32) * 0.3)
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    ws = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.08)
          for s in [(e_dim, h_dim), (h_dim,), (h_dim, h_dim), (h_dim,),
                    (h_dim, h_dim), (h_dim,), (h_dim, d), (d,)]]
    ref = _conv_msg_reference(e, h_src, src_code, dst_code, mask, *ws)
    out = fused_conv_message(e, h_src, src_code, dst_code, mask, *ws,
                             8, True)
    # kernel matmuls are bf16 with fp32 accumulation
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_fused_conv_message_grads_match():
    from gamd_tpu.ops.pallas_mp import (_conv_msg_reference,
                                        fused_conv_message)
    rng = np.random.RandomState(4)
    n, k, dim = 8, 4, 128
    e = jnp.asarray(rng.randn(n, k, dim).astype(np.float32) * 0.3)
    h_src = jnp.asarray(rng.randn(n, k, dim).astype(np.float32) * 0.3)
    src_code = jnp.asarray(rng.randn(n, k, dim).astype(np.float32) * 0.3)
    dst_code = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.3)
    mask = jnp.asarray(rng.rand(n, k) > 0.2)
    ws = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.08)
          for s in [(dim, dim), (dim,), (dim, dim), (dim,),
                    (dim, dim), (dim,), (dim, dim), (dim,)]]

    g_p = jax.grad(lambda w: jnp.sum(fused_conv_message(
        e, h_src, src_code, dst_code, mask, w, *ws[1:], 8, True) ** 2))(ws[0])
    g_r = jax.grad(lambda w: jnp.sum(_conv_msg_reference(
        e, h_src, src_code, dst_code, mask, w, *ws[1:]) ** 2))(ws[0])
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=2e-2, atol=2e-2)


def test_gamdnet_pallas_flag_matches_xla():
    """Same params, pallas on/off -> same forces (interpret mode on CPU)."""
    from unittest import mock
    import gamd_tpu.ops.pallas_mp as pm
    from gamd_tpu.core.config import ModelConfig
    from gamd_tpu.models import GAMDNet
    from gamd_tpu.neighbors import dense_neighbor_list

    rng = np.random.RandomState(5)
    n, k, box, cutoff = 20, 8, 10.0, 3.5
    pos = rng.uniform(0, box, size=(1, n, 3)).astype(np.float32)
    idx, mask, _ = dense_neighbor_list(pos[0], box, cutoff, k_max=k)
    pos, idx, mask = jnp.asarray(pos), idx[None], mask[None]

    cfg_x = ModelConfig(encoding_size=128, hidden_dim=128,
                        edge_embedding_dim=128, conv_layers=2)
    cfg_p = ModelConfig(encoding_size=128, hidden_dim=128,
                        edge_embedding_dim=128, conv_layers=2,
                        use_pallas=True, use_pallas_encoder=True)
    m_x = GAMDNet(cfg=cfg_x, species="lj")
    m_p = GAMDNet(cfg=cfg_p, species="lj")
    params = m_x.init(jax.random.PRNGKey(0), pos, idx, mask, box, 0.0, 1.0)
    out_x = m_x.apply(params, pos, idx, mask, box, 0.0, 1.0)

    import gamd_tpu.ops.pallas_encoder as pe
    orig = pm._conv_msg_gather_forward
    orig_enc = pe.fused_edge_encoder
    with mock.patch.object(
            pm, "_conv_msg_gather_forward",
            lambda *a: orig(*a[:-1], True)), \
         mock.patch.object(
            pe, "fused_edge_encoder",
            lambda *a, **kw: orig_enc(*a, **{**kw, "interpret": True})):
        out_p = m_p.apply(params, pos, idx, mask, box, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=0.08, atol=0.08)


def test_fused_conv_gather_message_matches_reference():
    from gamd_tpu.ops.pallas_mp import (_conv_msg_gather_reference,
                                        fused_conv_gather_message)
    rng = np.random.RandomState(6)
    n, k, e_dim, h_dim, d = 20, 8, 128, 128, 128
    e = jnp.asarray(rng.randn(n, k, e_dim).astype(np.float32) * 0.3)
    idx = jnp.asarray(rng.randint(0, n, (n, k)).astype(np.int32))
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    hn = jnp.asarray(rng.randn(n, d).astype(np.float32) * 0.5)
    src_nodes = jnp.asarray(rng.randn(n, h_dim).astype(np.float32) * 0.5)
    dst_code = jnp.asarray(rng.randn(n, h_dim).astype(np.float32) * 0.3)
    ws = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.08)
          for s in [(e_dim, h_dim), (h_dim,), (h_dim, h_dim), (h_dim,),
                    (h_dim, h_dim), (h_dim,), (h_dim, d), (d,)]]
    ref = _conv_msg_gather_reference(e, idx, mask, hn, src_nodes, dst_code,
                                     *ws)
    out = fused_conv_gather_message(e, idx, mask, hn, src_nodes, dst_code,
                                    *ws, 8, True)
    # hi/lo split one-hot gather is exact; matmuls bf16-accumulated-fp32.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_onehot_hi_lo_gather_is_exact():
    """The hi+lo bf16 decomposition reconstructs fp32 rows exactly."""
    rng = np.random.RandomState(7)
    x = rng.randn(64, 128).astype(np.float32) * 3.14159
    hi = x.astype(jnp.bfloat16)
    lo = (x - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    recon = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    # bf16 hi + bf16 lo carries ~16 mantissa bits: near-fp32 row values.
    np.testing.assert_allclose(recon, x, rtol=3e-5, atol=3e-5)


def test_fused_edge_encoder_matches_xla(monkeypatch):
    """Encoder kernel (interpret) vs the model's XLA feature+encoder path."""
    import gamd_tpu.ops.pallas_encoder as pe
    from gamd_tpu.core import space
    from gamd_tpu.models.gnn import edge_geometry, rbf_expand
    from gamd_tpu.models.mlp import get_activation

    rng = np.random.RandomState(8)
    n, k, box = 20, 8, 10.0
    hid, e_dim, n_rbf = 128, 128, 40
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    from gamd_tpu.neighbors import dense_neighbor_list
    idx, mask, _ = dense_neighbor_list(pos, box, 4.0, k_max=k)

    w0 = jnp.asarray(rng.randn(4 + n_rbf, hid).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rng.randn(hid).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(hid, hid).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(hid).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(hid, e_dim).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(e_dim).astype(np.float32) * 0.1)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(e_dim).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(e_dim).astype(np.float32))
    lm, ls = 2.0, 0.8

    # XLA reference
    act = get_activation("gelu")
    unit, dist = edge_geometry(pos[None], idx[None], box)
    std = (dist - lm) / ls
    feat = jnp.concatenate([unit, std[..., None], rbf_expand(std)], -1)[0]
    z = act(feat @ w0 + b0)
    z = act(z @ w1 + b1)
    z = z @ w2 + b2
    mu = z.mean(-1, keepdims=True)
    zc = z - mu
    ref = zc * jax.lax.rsqrt((zc**2).mean(-1, keepdims=True) + 1e-6)
    ref = ref * ln_s + ln_b

    e, live = pe.fused_edge_encoder(
        pos, idx, mask, box, None, lm, ls, w0, b0, w1, b1, w2, b2,
        ln_s, ln_b, tile_n=4, interpret=True)
    assert e.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(live), np.asarray(mask))
    diff = np.abs(np.asarray(e, np.float32) - np.asarray(ref))
    # bf16 output + bf16 matmuls: loose but meaningful agreement.
    assert diff.mean() < 0.05, diff.mean()
    assert diff.max() < 0.5, diff.max()


def test_fused_edge_encoder_cutoff_mask():
    """With a cutoff, the kernel refines the build mask to the true cutoff."""
    import gamd_tpu.ops.pallas_encoder as pe
    from gamd_tpu.neighbors import dense_neighbor_list
    from gamd_tpu.neighbors.dense import refresh_mask

    rng = np.random.RandomState(9)
    n, k, box, cutoff = 16, 8, 10.0, 3.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    idx, bmask, _ = dense_neighbor_list(pos, box, cutoff + 1.0, k_max=k)
    expected = refresh_mask(pos, box, cutoff, idx, bmask)

    hid = 128
    zeros = jnp.zeros
    _, live = pe.fused_edge_encoder(
        pos, idx, bmask, box, cutoff, 0.0, 1.0,
        zeros((44, hid)), zeros((hid,)), zeros((hid, hid)), zeros((hid,)),
        zeros((hid, hid)), zeros((hid,)), jnp.ones((hid,)), zeros((hid,)),
        tile_n=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(live), np.asarray(expected))


def test_fused_conv_layer_matches_reference():
    from gamd_tpu.ops.pallas_mp import (_conv_layer_reference,
                                        fused_conv_layer)
    rng = np.random.RandomState(10)
    n, k, dim = 20, 8, 128
    e = jnp.asarray(rng.randn(n, k, dim).astype(np.float32) * 0.3)
    idx = jnp.asarray(rng.randint(0, n, (n, k)).astype(np.int32))
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    h = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.5)
    hn = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.5)
    src_nodes = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.5)
    dst_code = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.3)
    weights = tuple(
        jnp.asarray(rng.randn(*s).astype(np.float32) * 0.08)
        for s in [(dim, dim), (dim,)] * 7)
    ref = _conv_layer_reference(e, idx, mask, h, hn, src_nodes, dst_code,
                                weights)
    out = fused_conv_layer(e, idx, mask, h, hn, src_nodes, dst_code,
                           weights, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_fused_conv_layer_grads():
    from gamd_tpu.ops.pallas_mp import (_conv_layer_reference,
                                        fused_conv_layer)
    rng = np.random.RandomState(11)
    n, k, dim = 8, 4, 128
    e = jnp.asarray(rng.randn(n, k, dim).astype(np.float32) * 0.3)
    idx = jnp.asarray(rng.randint(0, n, (n, k)).astype(np.int32))
    mask = jnp.asarray(rng.rand(n, k) > 0.2)
    h = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.3)
    hn = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.3)
    src_nodes = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.3)
    dst_code = jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.3)
    weights = tuple(
        jnp.asarray(rng.randn(*s).astype(np.float32) * 0.08)
        for s in [(dim, dim), (dim,)] * 7)

    g_p = jax.grad(lambda w0: jnp.sum(fused_conv_layer(
        e, idx, mask, h, hn, src_nodes, dst_code,
        (w0,) + weights[1:], 8, True) ** 2))(weights[0])
    g_r = jax.grad(lambda w0: jnp.sum(_conv_layer_reference(
        e, idx, mask, h, hn, src_nodes, dst_code,
        (w0,) + weights[1:]) ** 2))(weights[0])
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=3e-2, atol=3e-2)


def _gather_msg_inputs(rng, n, k, e_dim, h_dim, d):
    e = jnp.asarray(rng.randn(n, k, e_dim).astype(np.float32) * 0.3)
    idx = jnp.asarray(rng.randint(0, n, (n, k)).astype(np.int32))
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    hn = jnp.asarray(rng.randn(n, d).astype(np.float32) * 0.5)
    src_nodes = jnp.asarray(rng.randn(n, h_dim).astype(np.float32) * 0.5)
    dst_code = jnp.asarray(rng.randn(n, h_dim).astype(np.float32) * 0.3)
    ws = tuple(jnp.asarray(rng.randn(*s).astype(np.float32) * 0.08)
               for s in [(e_dim, h_dim), (h_dim,), (h_dim, h_dim), (h_dim,),
                         (h_dim, h_dim), (h_dim,), (h_dim, d), (d,)])
    return e, idx, mask, hn, src_nodes, dst_code, ws


def test_conv_gather_message_pallas_backward_matches_reference():
    """The REAL backward kernel (recompute-in-VMEM, per-tile partials)
    against jax.grad of the XLA reference, every differentiable input."""
    from gamd_tpu.ops.pallas_mp import (_conv_msg_gather_reference,
                                        fused_conv_gather_message)
    rng = np.random.RandomState(12)
    n, k, e_dim, h_dim, d = 20, 8, 128, 128, 128
    e, idx, mask, hn, src_nodes, dst_code, ws = _gather_msg_inputs(
        rng, n, k, e_dim, h_dim, d)

    def loss_p(e, hn, src_nodes, dst_code, ws):
        out = fused_conv_gather_message(e, idx, mask, hn, src_nodes,
                                        dst_code, *ws, 8, True)
        return jnp.sum(out * jnp.cos(out))   # non-trivial cotangent

    def loss_r(e, hn, src_nodes, dst_code, ws):
        out = _conv_msg_gather_reference(e, idx, mask, hn, src_nodes,
                                         dst_code, *ws)
        return jnp.sum(out * jnp.cos(out))

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(
        e, hn, src_nodes, dst_code, ws)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(
        e, hn, src_nodes, dst_code, ws)
    names = ["e", "hn", "src_nodes", "dst_code"]
    for nm, a, b in zip(names, gp[:4], gr[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=4e-2, atol=4e-2, err_msg=nm)
    for i, (a, b) in enumerate(zip(gp[4], gr[4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=4e-2, atol=4e-2, err_msg=f"w{i}")


def test_conv_gather_message_backward_vmap_batched():
    """The bwd kernel under jax.vmap (the model's batch path): closure-
    captured weights must receive batch-summed gradients."""
    from gamd_tpu.ops.pallas_mp import (_conv_msg_gather_reference,
                                        fused_conv_gather_message)
    rng = np.random.RandomState(13)
    b_, n, k, e_dim, h_dim, d = 2, 16, 8, 128, 128, 128
    batches = [_gather_msg_inputs(rng, n, k, e_dim, h_dim, d)
               for _ in range(b_)]
    e = jnp.stack([x[0] for x in batches])
    idx = jnp.stack([x[1] for x in batches])
    mask = jnp.stack([x[2] for x in batches])
    hn = jnp.stack([x[3] for x in batches])
    src = jnp.stack([x[4] for x in batches])
    dst = jnp.stack([x[5] for x in batches])
    ws = batches[0][6]

    def loss_p(ws):
        out = jax.vmap(
            lambda eb, ib, mb, hb, sb, db: fused_conv_gather_message(
                eb, ib, mb, hb, sb, db, *ws, 8, True)
        )(e, idx, mask, hn, src, dst)
        return jnp.sum(out ** 2)

    def loss_r(ws):
        out = jax.vmap(
            lambda eb, ib, mb, hb, sb, db: _conv_msg_gather_reference(
                eb, ib, mb, hb, sb, db, *ws)
        )(e, idx, mask, hn, src, dst)
        return jnp.sum(out ** 2)

    gp = jax.grad(loss_p)(ws)
    gr = jax.grad(loss_r)(ws)
    for i, (a, b) in enumerate(zip(gp, gr)):
        # bf16-recompute noise scales with the batch-summed magnitudes.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=6e-2, atol=8e-2, err_msg=f"w{i}")


def test_gamdnet_grads_pallas_vs_xla():
    """End-to-end model gradient parity: GAMDNet(use_pallas) vs plain XLA
    on the same params — the training-path integration check."""
    from gamd_tpu.core.config import ModelConfig
    from gamd_tpu.models.gnn import GAMDNet
    from gamd_tpu.neighbors import dense_neighbor_list

    rng = np.random.RandomState(14)
    n, box = 24, 10.0
    pos = jnp.asarray(rng.uniform(0, box, (1, n, 3)).astype(np.float32))
    idx, mask, _ = jax.vmap(
        lambda p: dense_neighbor_list(p, box, 4.5, k_max=8))(pos)

    def build(use_pallas):
        cfg = ModelConfig(encoding_size=128, hidden_dim=128,
                          edge_embedding_dim=128, conv_layers=2,
                          use_layer_norm=True, use_pallas=use_pallas)
        return GAMDNet(cfg=cfg, species="lj")

    params = build(False).init(
        {"params": jax.random.PRNGKey(0)}, pos, idx, mask, box,
        jnp.float32(2.0), jnp.float32(0.8))

    def loss(model, p):
        out = model.apply(p, pos, idx, mask, box, jnp.float32(2.0),
                          jnp.float32(0.8))
        return jnp.mean(jnp.abs(out))

    g_x = jax.grad(lambda p: loss(build(False), p))(params)
    g_p = jax.grad(lambda p: loss(build(True), p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(g_p)}
    checked = 0
    for kp, vx in flat_x:
        vp = flat_p[jax.tree_util.keystr(kp)]
        np.testing.assert_allclose(
            np.asarray(vp), np.asarray(vx), rtol=6e-2, atol=6e-2,
            err_msg=jax.tree_util.keystr(kp))
        checked += 1
    assert checked >= 20
