"""Distributed GNN force (layer-wise halo exchange) vs single-device model.

VERDICT round-1 item #6: the GNN force model — the actual product — must run
under spatial decomposition with per-atom parity against the single-device
forward on the virtual 8-CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core import space
from gamd_tpu.core.config import ModelConfig
from gamd_tpu.models.gnn import GAMDNet
from gamd_tpu.neighbors.dense import dense_neighbor_list, rect_neighbor_list
from gamd_tpu.ops.pallas_model import pack_params, reference_forward
from gamd_tpu.parallel.halo import sort_into_slabs
from gamd_tpu.parallel.halo_gnn import make_halo_gnn_force, make_halo_gnn_md
from gamd_tpu.parallel.mesh import make_mesh
from gamd_tpu.physics import lennard_jones as lj

CUTOFF = 3.4
SKIN = 0.5
K = 24


def _system(n=512, seed=0):
    box, pos = lj.lj_fluid_box(n, 0.5)
    rng = np.random.RandomState(seed)
    pos = (pos + rng.randn(*pos.shape).astype(np.float32) * 0.1) % box
    return float(box), jnp.asarray(pos)


def _model(seed=0):
    cfg = ModelConfig(use_layer_norm=True)
    model = GAMDNet(cfg=cfg, species="lj")
    dummy_pos = jnp.zeros((1, 8, 3))
    dummy_idx = jnp.zeros((1, 8, 4), jnp.int32)
    dummy_mask = jnp.zeros((1, 8, 4), bool)
    params = model.init(jax.random.PRNGKey(seed), dummy_pos, dummy_idx,
                        dummy_mask, 10.0, 0.5, 2.0, train=False)["params"]
    mp = pack_params(params, cfg)
    h0_row = params["node_emb"][0]
    return cfg, mp, h0_row


def test_rect_neighbor_list_matches_square():
    box, pos = _system(128)
    idx_sq, mask_sq, _ = dense_neighbor_list(pos, box, CUTOFF, K)
    idx_r, mask_r, ovf = rect_neighbor_list(
        pos, pos, jnp.ones((128,), bool), box, CUTOFF, K,
        self_idx=jnp.arange(128, dtype=jnp.int32))
    assert not bool(ovf)
    # Same neighbor SETS per row (ordering may differ on distance ties).
    for i in range(0, 128, 17):
        s1 = set(np.asarray(idx_sq[i])[np.asarray(mask_sq[i])].tolist())
        s2 = set(np.asarray(idx_r[i])[np.asarray(mask_r[i])].tolist())
        assert s1 == s2


def test_halo_gnn_forces_match_single_device():
    box, pos = _system(512)
    cfg, mp, h0_row = _model()
    n_slabs = 4
    mesh = make_mesh(n_slabs)
    cap, hs = 256, 160

    st = sort_into_slabs(pos, jnp.zeros_like(pos), box, n_slabs, cap,
                         CUTOFF + SKIN, hs, jax.random.PRNGKey(0))
    assert not bool(st.overflow)

    force_fn = make_halo_gnn_force(
        mesh, mp, box, n_slabs, CUTOFF, SKIN, K, h0_row,
        length_mean=3.0, length_std=1.0)
    f_slab, ovf = force_fn(st)
    assert not bool(ovf)

    # Single-device reference at the same positions.
    posw = space.wrap(pos, box)
    idx, mask, _ = dense_neighbor_list(posw, box, CUTOFF, K)
    h0 = jnp.broadcast_to(h0_row, (512, h0_row.shape[-1]))
    f_ref = reference_forward(posw, idx, mask, h0, mp, box, None, 3.0, 1.0)

    # Match slab rows back to original atoms by exact position bytes.
    lookup = {np.asarray(posw)[i].tobytes(): i for i in range(512)}
    p_rows = np.asarray(st.pos)
    v_rows = np.asarray(st.valid)
    f_rows = np.asarray(f_slab)
    f_ref_np = np.asarray(f_ref)
    checked = 0
    for r in range(p_rows.shape[0]):
        if not v_rows[r]:
            continue
        orig = lookup[p_rows[r].tobytes()]
        np.testing.assert_allclose(f_rows[r], f_ref_np[orig], atol=2e-4,
                                   rtol=1e-4)
        checked += 1
    assert checked == 512


def test_halo_gnn_md_chunk_runs():
    """A jitted distributed GNN-MD chunk advances without NaNs and keeps
    every atom accounted for."""
    box, pos = _system(512)
    cfg, mp, h0_row = _model()
    n_slabs = 4
    mesh = make_mesh(n_slabs)
    cap, hs = 256, 160

    st = sort_into_slabs(pos,
                         jnp.zeros_like(pos), box, n_slabs, cap,
                         CUTOFF + SKIN, hs, jax.random.PRNGKey(2))
    chunk_fn = make_halo_gnn_md(
        mesh, mp, box, n_slabs, CUTOFF, SKIN, K, h0_row,
        length_mean=3.0, length_std=1.0, masses_scalar=39.948,
        temperature=100.0, dt_fs=2.0, friction_per_ps=25.0,
        force_unit=1e-3)     # small forces: untrained net, stability only
    out = chunk_fn(st, 5)
    assert bool(jnp.isfinite(out.pos[out.valid]).all())
    assert bool(jnp.isfinite(out.vel[out.valid]).all())
    assert int(out.valid.sum()) == 512
