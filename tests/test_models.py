"""Model-layer tests: shapes, parity semantics, equivariance-ish sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core.config import ModelConfig
from gamd_tpu.models import MLP, GAMDNet, cubic_kernel
from gamd_tpu.models.gnn import rbf_expand, edge_geometry, gather_nodes
from gamd_tpu.models.normalizer import (
    init_stat,
    update_stat,
    normalize,
    denormalize,
    stat_from_values,
)
from gamd_tpu.neighbors import dense_neighbor_list
from gamd_tpu.neighbors.topology import neighbor_bond_channel


SMALL = ModelConfig(encoding_size=16, hidden_dim=16, edge_embedding_dim=16,
                    conv_layers=2)


def _make_inputs(rng, n=20, k=8, box=10.0, cutoff=3.5, batch=2):
    pos = rng.uniform(0, box, size=(batch, n, 3)).astype(np.float32)
    idxs, masks = [], []
    for b in range(batch):
        idx, mask, _ = dense_neighbor_list(pos[b], box, cutoff, k_max=k)
        idxs.append(np.asarray(idx))
        masks.append(np.asarray(mask))
    return (jnp.asarray(pos), jnp.asarray(np.stack(idxs)),
            jnp.asarray(np.stack(masks)))


# ---------------------------------------------------------------- MLP ------

def test_mlp_layer_structure():
    """hidden_layer=L builds L Dense layers; activation_first adds no Dense."""
    x = jnp.ones((4, 8))
    for hl in (1, 2, 3):
        m = MLP(out_feats=5, hidden_dim=16, hidden_layer=hl)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        assert len(params) == hl, f"hidden_layer={hl}"
        y = m.apply({"params": params}, x)
        assert y.shape == (4, 5)


def test_mlp_activation_first_prepends():
    """With activation_first + relu, a negative input must act like zero."""
    m = MLP(out_feats=3, hidden_dim=8, hidden_layer=1, activation="relu",
            activation_first=True)
    params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 4)))
    y_neg = m.apply(params, -5.0 * jnp.ones((1, 4)))
    y_zero = m.apply(params, jnp.zeros((1, 4)))
    np.testing.assert_allclose(np.asarray(y_neg), np.asarray(y_zero), atol=1e-6)


# ---------------------------------------------------------------- RBF ------

def test_rbf_expansion_reference_semantics():
    """40 centers over [0,1], gamma=40, exact gaussian values."""
    d = jnp.array([0.0, 0.5])
    out = np.asarray(rbf_expand(d, 0.0, 1.0, 0.025))
    assert out.shape == (2, 40)
    centers = np.linspace(0, 1, 40)
    expected = np.exp(-40.0 * (0.5 - centers) ** 2)
    np.testing.assert_allclose(out[1], expected, rtol=1e-5)


def test_rbf_handles_negative_standardized_distance():
    out = np.asarray(rbf_expand(jnp.array([-2.0]), 0.0, 1.0, 0.025))
    assert np.all(np.isfinite(out))
    assert out[0, 0] == pytest.approx(np.exp(-40.0 * 4.0), rel=1e-4)


def test_cubic_kernel():
    r = jnp.array([0.0005, 0.5, 1.0, 2.0])
    out = np.asarray(cubic_kernel(r, re=1.0))
    assert out[0] == pytest.approx(0.0)       # r<=eps mapped to re -> kernel 0
    assert out[1] == pytest.approx(0.75**3, rel=1e-5)
    assert out[2] == pytest.approx(0.0, abs=1e-6)
    assert out[3] == pytest.approx(0.0)       # clamped by relu


# ------------------------------------------------------------ normalizer ---

def test_running_stat_matches_numpy_two_batches():
    rng = np.random.RandomState(0)
    a = rng.randn(50).astype(np.float32)
    b = rng.randn(70).astype(np.float32) * 3 + 1
    stat = init_stat()
    stat = update_stat(stat, jnp.asarray(a))
    stat = update_stat(stat, jnp.asarray(b))
    all_vals = np.concatenate([a, b])
    assert float(stat.mean) == pytest.approx(all_vals.mean(), abs=1e-5)
    assert float(stat.var) == pytest.approx(all_vals.var(), rel=1e-4)


def test_running_stat_masked():
    vals = jnp.array([1.0, 2.0, 3.0, 100.0])
    mask = jnp.array([True, True, True, False])
    stat = update_stat(init_stat(), vals, mask=mask)
    assert float(stat.mean) == pytest.approx(2.0)
    assert float(stat.var) == pytest.approx(np.var([1, 2, 3]), rel=1e-5)


def test_normalize_denormalize_roundtrip():
    stat = stat_from_values(mean=2.0, var=9.0)
    x = jnp.array([5.0])
    z = normalize(x, stat)
    assert float(z[0]) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(denormalize(z, stat)), [5.0],
                               rtol=1e-6)


def test_running_stat_matches_sklearn_partial_fit_sequence():
    """Same partial_fit order as the reference's per-batch streaming."""
    sklearn = pytest.importorskip("sklearn.preprocessing")
    ref = sklearn.StandardScaler()
    stat = init_stat()
    rng = np.random.RandomState(1)
    for _ in range(5):
        batch = rng.randn(rng.randint(10, 40), 1).astype(np.float64)
        ref.partial_fit(batch)
        stat = update_stat(stat, jnp.asarray(batch.ravel()))
    assert float(stat.mean) == pytest.approx(ref.mean_[0], abs=1e-5)
    assert float(stat.var) == pytest.approx(ref.var_[0], rel=1e-4)


# ---------------------------------------------------------------- GNN ------

def test_edge_geometry_sign_and_distance():
    pos = jnp.array([[[0.0, 0, 0], [1.5, 0, 0], [9.0, 0, 0]]])  # box 10
    idx = jnp.array([[[1, 2], [0, 0], [0, 0]]])
    unit, dist = edge_geometry(pos, idx, 10.0)
    # center 0 -> neighbor 1: +x direction, distance 1.5
    np.testing.assert_allclose(np.asarray(dist)[0, 0, 0], 1.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(unit)[0, 0, 0], [1, 0, 0], atol=1e-4)
    # center 0 -> neighbor 2: min-image -x direction, distance 1.0
    np.testing.assert_allclose(np.asarray(dist)[0, 0, 1], 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(unit)[0, 0, 1], [-1, 0, 0], atol=1e-4)
    # flip_dir negates
    unit_f, _ = edge_geometry(pos, idx, 10.0, flip_dir=True)
    np.testing.assert_allclose(np.asarray(unit_f), -np.asarray(unit), atol=1e-6)


def test_gamdnet_lj_forward_shape_and_finite():
    rng = np.random.RandomState(0)
    pos, idx, mask = _make_inputs(rng)
    model = GAMDNet(cfg=SMALL, species="lj")
    params = model.init(jax.random.PRNGKey(0), pos, idx, mask, 10.0, 0.0, 1.0)
    out = model.apply(params, pos, idx, mask, 10.0, 0.0, 1.0)
    assert out.shape == (2, 20, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gamdnet_water_with_bond_channel():
    rng = np.random.RandomState(1)
    pos, idx, mask = _make_inputs(rng, n=18)
    feat = jnp.asarray((np.arange(18) % 3 == 0).astype(np.float32))[None, :, None]
    feat = jnp.tile(feat, (2, 1, 1))
    bond = jnp.stack([neighbor_bond_channel(idx[b]) for b in range(2)])
    model = GAMDNet(cfg=SMALL, species="water", use_bond=True)
    params = model.init(jax.random.PRNGKey(0), pos, idx, mask, 10.0, 0.0, 1.0,
                        node_feat=feat, bond=bond)
    out = model.apply(params, pos, idx, mask, 10.0, 0.0, 1.0,
                      node_feat=feat, bond=bond)
    assert out.shape == (2, 18, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gamdnet_masked_edges_do_not_affect_output():
    """Garbage in padded slots must not change predictions."""
    rng = np.random.RandomState(2)
    pos, idx, mask = _make_inputs(rng, n=16, k=8)
    model = GAMDNet(cfg=SMALL, species="lj")
    params = model.init(jax.random.PRNGKey(0), pos, idx, mask, 10.0, 0.0, 1.0)
    out1 = model.apply(params, pos, idx, mask, 10.0, 0.0, 1.0)
    # Redirect every masked slot to a different (arbitrary) atom.
    idx2 = jnp.where(mask, idx, (idx + 7) % 16)
    out2 = model.apply(params, pos, idx2, mask, 10.0, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_gamdnet_translation_invariance():
    """Forces depend only on relative positions: rigid translation (mod box)
    must leave the output unchanged."""
    rng = np.random.RandomState(3)
    pos, idx, mask = _make_inputs(rng, n=16, k=8)
    model = GAMDNet(cfg=SMALL, species="lj")
    params = model.init(jax.random.PRNGKey(0), pos, idx, mask, 10.0, 0.0, 1.0)
    out1 = model.apply(params, pos, idx, mask, 10.0, 0.0, 1.0)
    shift = jnp.array([3.3, -1.2, 7.7])
    out2 = model.apply(params, (pos + shift) % 10.0, idx, mask, 10.0, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-4)


def test_gamdnet_dynamic_per_sample_box():
    rng = np.random.RandomState(4)
    cfg = ModelConfig(encoding_size=16, hidden_dim=16, edge_embedding_dim=16,
                      conv_layers=2, flip_dir=True)
    boxes = np.array([[9.0, 10.0, 11.0], [10.0, 10.0, 10.0]], dtype=np.float32)
    pos = rng.uniform(0, 9, size=(2, 12, 3)).astype(np.float32)
    idxs, masks = [], []
    for b in range(2):
        idx, mask, _ = dense_neighbor_list(pos[b], boxes[b], 3.5, k_max=8)
        idxs.append(np.asarray(idx)); masks.append(np.asarray(mask))
    idx, mask = jnp.asarray(np.stack(idxs)), jnp.asarray(np.stack(masks))
    feat = jnp.tile(
        jnp.asarray((np.arange(12) % 3 == 0).astype(np.float32))[None, :, None],
        (2, 1, 1))
    model = GAMDNet(cfg=cfg, species="water")
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pos), idx, mask,
                        jnp.asarray(boxes), 0.0, 1.0, node_feat=feat)
    out = model.apply(params, jnp.asarray(pos), idx, mask, jnp.asarray(boxes),
                      0.0, 1.0, node_feat=feat)
    assert out.shape == (2, 12, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gather_nodes():
    h = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    idx = jnp.array([[[1, 2], [0, 3], [3, 3], [0, 0]]])
    out = np.asarray(gather_nodes(h, idx))
    np.testing.assert_allclose(out[0, 0, 0], [3, 4, 5])
    np.testing.assert_allclose(out[0, 1, 1], [9, 10, 11])


def test_gamdnet_bfloat16_compute():
    """bf16 compute policy: output fp32, finite, close to fp32 compute."""
    from gamd_tpu.core.config import ModelConfig
    rng = np.random.RandomState(5)
    pos, idx, mask = _make_inputs(rng)
    cfg16 = ModelConfig(encoding_size=16, hidden_dim=16, edge_embedding_dim=16,
                        conv_layers=2, compute_dtype="bfloat16")
    m32 = GAMDNet(cfg=SMALL, species="lj")
    m16 = GAMDNet(cfg=cfg16, species="lj")
    params = m32.init(jax.random.PRNGKey(0), pos, idx, mask, 10.0, 0.0, 1.0)
    out32 = m32.apply(params, pos, idx, mask, 10.0, 0.0, 1.0)
    out16 = m16.apply(params, pos, idx, mask, 10.0, 0.0, 1.0)
    assert out16.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out16)))
    # bf16 has ~3 decimal digits; outputs should agree loosely.
    denom = np.abs(np.asarray(out32)).mean() + 1e-6
    assert np.abs(np.asarray(out16) - np.asarray(out32)).mean() / denom < 0.2
