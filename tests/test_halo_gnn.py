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

CUTOFF = 5.0
SKIN = 0.5
K = 32


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


def _water_model(seed=0):
    cfg = ModelConfig(use_layer_norm=True)
    model = GAMDNet(cfg=cfg, species="water", use_bond=True)
    dummy_pos = jnp.zeros((1, 9, 3))
    dummy_idx = jnp.zeros((1, 9, 4), jnp.int32)
    dummy_mask = jnp.zeros((1, 9, 4), bool)
    params = model.init(
        jax.random.PRNGKey(seed), dummy_pos, dummy_idx, dummy_mask, 10.0,
        0.5, 2.0, node_feat=jnp.zeros((1, 9, 1)),
        bond=jnp.zeros((1, 9, 4)), train=False)["params"]
    mp = pack_params(params, cfg)
    return cfg, mp, params


def _water_system(n_mol=258, box=20.0, seed=3):
    from gamd_tpu.physics import water as w

    pos = w.water_box(n_mol, box, seed=seed)
    n = 3 * n_mol
    onehot = (np.arange(n) % 3 == 0).astype(np.float32)[:, None]
    return jnp.asarray(pos), jnp.asarray(onehot), n


WCUT, WSKIN, WK = 4.2, 0.5, 96


def _water_h0(params, onehot):
    enc = params["node_encoder"]
    return onehot @ enc["kernel"] + enc["bias"]


def test_halo_gnn_water_forces_match_single_device():
    """Water species (per-atom h0 through aux) + O-H bond channel across
    halo boundaries must reproduce the single-device forward per atom
    (VERDICT round-2 weak #5: halo_gnn supported only the LJ broadcast
    embedding)."""
    from gamd_tpu.neighbors.topology import neighbor_bond_channel

    box, n_slabs = 20.0, 4
    pos, onehot, n = _water_system()
    cfg, mp, params = _water_model()
    h0 = _water_h0(params, onehot)
    mesh = make_mesh(n_slabs)
    cap = 384
    aid = jnp.arange(n, dtype=jnp.int32)

    st = sort_into_slabs(pos, jnp.zeros_like(pos), box, n_slabs, cap,
                         WCUT + WSKIN, cap, jax.random.PRNGKey(0),
                         extras={"h0": h0, "aid": aid})
    assert not bool(st.overflow)

    force_fn = make_halo_gnn_force(
        mesh, mp, box, n_slabs, WCUT, WSKIN, WK, None,
        length_mean=2.8, length_std=1.1, use_bond=True, per_atom_h0=True)
    f_slab, ovf = force_fn(st)
    assert not bool(ovf)

    posw = space.wrap(pos, box)
    idx, mask, _ = dense_neighbor_list(posw, box, WCUT, WK)
    bond = neighbor_bond_channel(idx)
    f_ref = np.asarray(reference_forward(posw, idx, mask, h0, mp, box,
                                         None, 2.8, 1.1, bond=bond))

    rows_aid = np.asarray(st.aux["aid"])
    rows_val = np.asarray(st.valid)
    f_rows = np.asarray(f_slab)
    checked = 0
    for r in range(rows_aid.shape[0]):
        if not rows_val[r]:
            continue
        np.testing.assert_allclose(f_rows[r], f_ref[rows_aid[r]],
                                   atol=3e-4, rtol=1e-4)
        checked += 1
    assert checked == n


def test_halo_gnn_water_md_migration_parity():
    """run_halo_gnn_md with re-sorts between chunks must track a
    single-device trajectory while atoms migrate across slab boundaries
    (>=3 re-sort cycles; deterministic gamma=0 Verlet so the two paths are
    comparable step for step)."""
    from gamd_tpu.neighbors.topology import neighbor_bond_channel
    from gamd_tpu.parallel.halo_gnn import run_halo_gnn_md

    box, n_slabs = 20.0, 4
    pos, onehot, n = _water_system()
    cfg, mp, params = _water_model()
    h0 = _water_h0(params, onehot)
    mesh = make_mesh(n_slabs)
    cap = 384
    aid = jnp.arange(n, dtype=jnp.int32)
    masses = jnp.asarray(np.where(np.arange(n) % 3 == 0, 15.9994, 1.008)
                         .astype(np.float32))

    rng = np.random.RandomState(7)
    vel = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.02)
    dt_fs, chunk_steps, n_chunks = 2.0, 10, 3
    funit = 1e-3

    chunk_fn = make_halo_gnn_md(
        mesh, mp, box, n_slabs, WCUT, WSKIN, WK, None,
        length_mean=2.8, length_std=1.1, masses_scalar=0.0,
        temperature=300.0, dt_fs=dt_fs, friction_per_ps=0.0,
        force_unit=funit, use_bond=True, per_atom_h0=True,
        per_atom_mass=True)
    st, ovf = run_halo_gnn_md(
        mesh, chunk_fn, pos, vel, box, n_slabs, cap, cap, WCUT + WSKIN,
        n_chunks * chunk_steps, chunk_steps, jax.random.PRNGKey(9),
        extras={"h0": h0, "aid": aid, "mass": masses})
    assert not bool(ovf)

    # Single-device deterministic reference: same Verlet splitting, list
    # rebuilt every step (the halo path builds its rect list per force
    # call), force on wrapped positions.
    from gamd_tpu.core import units as U
    dt = dt_fs * U.FS
    m = masses[:, None]

    def force(p):
        pw = space.wrap(p, box)
        idx, mask, _ = dense_neighbor_list(pw, box, WCUT, WK)
        bond = neighbor_bond_channel(idx)
        return reference_forward(pw, idx, mask, h0, mp, box, None,
                                 2.8, 1.1, bond=bond) * funit

    @jax.jit
    def run_ref(p, v):
        f = force(p)
        def step(carry, _):
            p, v, f = carry
            v = v + 0.5 * dt * f / m
            p2 = p + dt * v
            f2 = force(p2)
            v = v + 0.5 * dt * f2 / m
            return (p2, v, f2), None
        (p, v, _), _ = jax.lax.scan(step, (p, v, f), None,
                                    length=n_chunks * chunk_steps)
        return p, v

    # The halo chunk recomputes f at chunk start (cheap, stateless), which
    # matches this reference exactly since force is deterministic in p.
    p_ref, v_ref = run_ref(pos, vel)
    p_ref = np.asarray(space.wrap(p_ref, box))

    rows_aid = np.asarray(st.aux["aid"])
    rows_val = np.asarray(st.valid)
    p_rows = np.asarray(space.wrap(st.pos, box))
    # Migration actually happened: final slab of some atom differs from its
    # initial slab.
    slab_w = box / n_slabs
    init_slab = np.clip((np.asarray(space.wrap(pos, box))[:, 0] // slab_w)
                        .astype(int), 0, n_slabs - 1)
    moved = 0
    checked = 0
    for r in range(rows_aid.shape[0]):
        if not rows_val[r]:
            continue
        a = rows_aid[r]
        d = p_rows[r] - p_ref[a]
        d -= box * np.round(d / box)
        np.testing.assert_allclose(d, 0.0, atol=5e-3)
        final_slab = min(int(p_rows[r, 0] // slab_w), n_slabs - 1)
        moved += int(final_slab != init_slab[a])
        checked += 1
    assert checked == n
    assert moved > 0, "no atom crossed a slab boundary - test too weak"


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


def test_wide_halo_gnn_forces_match_single_device():
    """Wide-halo path: ONE position exchange (halo = n_layers*cutoff+skin),
    whole forward computed locally per slab — owned forces must match the
    single-device forward per atom. This is the latency-lean counterpart
    to the layer-wise exchange, and the layout the banded kernel composes
    with (round-4 roadmap)."""
    from gamd_tpu.parallel.halo_gnn import (make_wide_halo_gnn_force,
                                            wide_halo_width)

    n, box, n_slabs = 2000, 48.0, 4
    cutoff, skin, k = 2.8, 0.2, 16
    rng = np.random.RandomState(11)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    cfg, mp, h0_row = _model()
    halo = wide_halo_width(mp, cutoff, skin)
    assert box / n_slabs >= halo

    mesh = make_mesh(n_slabs)
    cap, hs = 768, 640
    aid = jnp.arange(n, dtype=jnp.int32)
    st = sort_into_slabs(pos, jnp.zeros_like(pos), box, n_slabs, cap,
                         halo, hs, jax.random.PRNGKey(0),
                         extras={"aid": aid})
    assert not bool(st.overflow)

    force_fn = make_wide_halo_gnn_force(
        mesh, mp, box, n_slabs, cutoff, skin, k, h0_row,
        length_mean=2.0, length_std=0.8)
    f_slab, ovf = force_fn(st)
    assert not bool(ovf)

    posw = space.wrap(pos, box)
    idx, mask, _ = dense_neighbor_list(posw, box, cutoff, k)
    h0 = jnp.broadcast_to(h0_row, (n, h0_row.shape[-1]))
    f_ref = np.asarray(reference_forward(posw, idx, mask, h0, mp, box,
                                         None, 2.0, 0.8))

    rows_aid = np.asarray(st.aux["aid"])
    rows_val = np.asarray(st.valid)
    f_rows = np.asarray(f_slab)
    checked = 0
    for r in range(rows_aid.shape[0]):
        if not rows_val[r]:
            continue
        np.testing.assert_allclose(f_rows[r], f_ref[rows_aid[r]],
                                   atol=2e-4, rtol=1e-4)
        checked += 1
    assert checked == n


def test_wide_halo_gnn_md_trajectory_parity():
    """make_halo_gnn_md(wide=True): deterministic (gamma=0) distributed MD
    on the wide-halo forward tracks the single-device trajectory through
    re-sort cycles."""
    from gamd_tpu.parallel.halo_gnn import (make_halo_gnn_md,
                                            run_halo_gnn_md,
                                            wide_halo_width)

    n, box, n_slabs = 2000, 48.0, 4
    cutoff, skin, k = 2.8, 0.2, 16
    rngn = np.random.RandomState(13)
    pos = jnp.asarray(rngn.uniform(0, box, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rngn.randn(n, 3).astype(np.float32) * 0.02)
    cfg, mp, h0_row = _model()
    halo = wide_halo_width(mp, cutoff, skin)
    mesh = make_mesh(n_slabs)
    cap, hs = 768, 640
    aid = jnp.arange(n, dtype=jnp.int32)
    dt_fs, funit = 2.0, 1e-3
    chunk_steps, n_chunks = 6, 2

    chunk_fn = make_halo_gnn_md(
        mesh, mp, box, n_slabs, cutoff, skin, k, h0_row,
        length_mean=2.0, length_std=0.8, masses_scalar=39.948,
        temperature=100.0, dt_fs=dt_fs, friction_per_ps=0.0,
        force_unit=funit, wide=True)
    st, ovf = run_halo_gnn_md(
        mesh, chunk_fn, pos, vel, box, n_slabs, cap, hs, halo,
        n_chunks * chunk_steps, chunk_steps, jax.random.PRNGKey(21),
        extras={"aid": aid})
    assert not bool(ovf)

    from gamd_tpu.core import units as U
    dt = dt_fs * U.FS
    h0 = jnp.broadcast_to(h0_row, (n, h0_row.shape[-1]))

    def force(p):
        pw = space.wrap(p, box)
        idx, mask, _ = dense_neighbor_list(pw, box, cutoff, k)
        return reference_forward(pw, idx, mask, h0, mp, box, None,
                                 2.0, 0.8) * funit

    @jax.jit
    def run_ref(p, v):
        f = force(p)
        def step(carry, _):
            p, v, f = carry
            v = v + 0.5 * dt * f / 39.948
            p2 = p + dt * v
            f2 = force(p2)
            v = v + 0.5 * dt * f2 / 39.948
            return (p2, v, f2), None
        (p, v, _), _ = jax.lax.scan(step, (p, v, f), None,
                                    length=n_chunks * chunk_steps)
        return p, v

    p_ref, _ = run_ref(pos, vel)
    p_ref = np.asarray(space.wrap(p_ref, box))

    rows_aid = np.asarray(st.aux["aid"])
    rows_val = np.asarray(st.valid)
    p_rows = np.asarray(space.wrap(st.pos, box))
    checked = 0
    for r in range(rows_aid.shape[0]):
        if not rows_val[r]:
            continue
        d = p_rows[r] - p_ref[rows_aid[r]]
        d -= box * np.round(d / box)
        np.testing.assert_allclose(d, 0.0, atol=5e-3)
        checked += 1
    assert checked == n


def test_wide_halo_banded_forces_match_single_device():
    """banded=True wide-halo: slab decomposition x banded in-slab gathers
    (interpret-mode kernel on CPU) must still match the single-device
    forward per atom."""
    from gamd_tpu.parallel.halo_gnn import (make_wide_halo_gnn_force,
                                            wide_halo_width)

    n, box, n_slabs = 2000, 48.0, 4
    cutoff, skin, k = 2.8, 0.2, 16
    rng = np.random.RandomState(17)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    cfg, mp, h0_row = _model()
    halo = wide_halo_width(mp, cutoff, skin)
    mesh = make_mesh(n_slabs)
    cap, hs = 768, 640
    aid = jnp.arange(n, dtype=jnp.int32)
    st = sort_into_slabs(pos, jnp.zeros_like(pos), box, n_slabs, cap,
                         halo, hs, jax.random.PRNGKey(0),
                         extras={"aid": aid})
    assert not bool(st.overflow)

    force_fn = make_wide_halo_gnn_force(
        mesh, mp, box, n_slabs, cutoff, skin, k, h0_row,
        length_mean=2.0, length_std=0.8, banded=True, interpret=True)
    f_slab, ovf = force_fn(st)
    assert not bool(ovf)

    posw = space.wrap(pos, box)
    idx, mask, _ = dense_neighbor_list(posw, box, cutoff, k)
    h0 = jnp.broadcast_to(h0_row, (n, h0_row.shape[-1]))
    f_ref = np.asarray(reference_forward(posw, idx, mask, h0, mp, box,
                                         None, 2.0, 0.8))

    rows_aid = np.asarray(st.aux["aid"])
    rows_val = np.asarray(st.valid)
    f_rows = np.asarray(f_slab)[rows_val]
    f_want = f_ref[rows_aid[rows_val]]
    assert f_rows.shape[0] == n
    # bf16 hi/lo edge stream in the banded kernel: same global accuracy
    # budget as tests/test_banded.py (0.6% relative MAE, cosine).
    rel_mae = np.abs(f_rows - f_want).mean() / np.abs(f_want).mean()
    cos = (f_rows * f_want).sum() / (np.linalg.norm(f_rows)
                                     * np.linalg.norm(f_want))
    assert rel_mae < 6e-3, rel_mae
    assert cos > 0.99995, cos


def test_wide_halo_banded_md_chunk_runs():
    """wide=True banded=True distributed MD chunk advances finitely with
    every atom accounted for (interpret-mode kernel on CPU)."""
    from gamd_tpu.parallel.halo_gnn import (make_halo_gnn_md,
                                            wide_halo_width)

    n, box, n_slabs = 2000, 48.0, 4
    cutoff, skin, k = 2.8, 0.2, 16
    rng = np.random.RandomState(23)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    cfg, mp, h0_row = _model()
    halo = wide_halo_width(mp, cutoff, skin)
    mesh = make_mesh(n_slabs)
    st = sort_into_slabs(pos, jnp.zeros((n, 3)), box, n_slabs, 768,
                         halo, 640, jax.random.PRNGKey(1))
    chunk_fn = make_halo_gnn_md(
        mesh, mp, box, n_slabs, cutoff, skin, k, h0_row,
        length_mean=2.0, length_std=0.8, masses_scalar=39.948,
        temperature=100.0, dt_fs=2.0, friction_per_ps=25.0,
        force_unit=1e-3, wide=True, banded=True, interpret=True)
    out = chunk_fn(st, 3)
    assert bool(jnp.isfinite(out.pos[out.valid]).all())
    assert int(out.valid.sum()) == n


def test_wide_halo_water_bond_forces_match_single_device():
    """Wide-halo with per-atom h0 + O-H bond channel (aid rows exchanged
    once, bond evaluated in the slab frame) matches the single-device
    forward — covers the water plumbing of both wide paths' shared
    exchange hoisting."""
    from gamd_tpu.neighbors.topology import neighbor_bond_channel
    from gamd_tpu.parallel.halo_gnn import (make_wide_halo_gnn_force,
                                            wide_halo_width)

    n_mol, box, n_slabs = 1200, 48.0, 4
    cutoff, skin, k = 2.5, 0.2, 24
    pos, onehot, n = _water_system(n_mol=n_mol, box=box, seed=5)
    cfg, mp, params = _water_model()
    h0 = _water_h0(params, onehot)
    halo = wide_halo_width(mp, cutoff, skin)
    assert box / n_slabs >= halo
    mesh = make_mesh(n_slabs)
    cap, hs = 1536, 1280
    aid = jnp.arange(n, dtype=jnp.int32)
    st = sort_into_slabs(pos, jnp.zeros_like(pos), box, n_slabs, cap,
                         halo, hs, jax.random.PRNGKey(0),
                         extras={"h0": h0, "aid": aid})
    assert not bool(st.overflow)

    force_fn = make_wide_halo_gnn_force(
        mesh, mp, box, n_slabs, cutoff, skin, k, None,
        length_mean=1.5, length_std=0.7, use_bond=True, per_atom_h0=True)
    f_slab, ovf = force_fn(st)
    assert not bool(ovf)

    posw = space.wrap(pos, box)
    idx, mask, _ = dense_neighbor_list(posw, box, cutoff, k)
    bond = neighbor_bond_channel(idx)
    f_ref = np.asarray(reference_forward(posw, idx, mask, h0, mp, box,
                                         None, 1.5, 0.7, bond=bond))

    rows_aid = np.asarray(st.aux["aid"])
    rows_val = np.asarray(st.valid)
    f_rows = np.asarray(f_slab)
    checked = 0
    for r in range(rows_aid.shape[0]):
        if not rows_val[r]:
            continue
        np.testing.assert_allclose(f_rows[r], f_ref[rows_aid[r]],
                                   atol=3e-4, rtol=1e-4)
        checked += 1
    assert checked == n


def test_distributed_nose_hoover_matches_single_device():
    """integrator='nose_hoover' distributed MD: one GLOBAL chain fed by
    psum'd kinetic energy must track the single-device NHC trajectory
    exactly (deterministic), including the chain state across a re-sort
    boundary."""
    from gamd_tpu.core import units as U
    from gamd_tpu.md import integrators as integ
    from gamd_tpu.parallel.halo_gnn import run_halo_gnn_md

    box, pos = _system(512)
    cfg, mp, h0_row = _model()
    n, n_slabs = 512, 4
    mesh = make_mesh(n_slabs)
    cap, hs = 256, 160
    aid = jnp.arange(n, dtype=jnp.int32)
    rngv = np.random.RandomState(3)
    vel = jnp.asarray(rngv.randn(n, 3).astype(np.float32) * 0.05)
    dt_fs, funit, temp, fric = 2.0, 1e-3, 100.0, 25.0
    chunk_steps, n_chunks = 6, 2

    chunk_fn = make_halo_gnn_md(
        mesh, mp, box, n_slabs, CUTOFF, SKIN, K, h0_row,
        length_mean=3.0, length_std=1.0, masses_scalar=39.948,
        temperature=temp, dt_fs=dt_fs, friction_per_ps=fric,
        force_unit=funit, integrator="nose_hoover", ndf=3 * n)
    st, ovf = run_halo_gnn_md(
        mesh, chunk_fn, pos, vel, box, n_slabs, cap, hs, CUTOFF + SKIN,
        n_chunks * chunk_steps, chunk_steps, jax.random.PRNGKey(4),
        extras={"aid": aid})
    assert not bool(ovf)

    dt = dt_fs * U.FS
    h0 = jnp.broadcast_to(h0_row, (n, h0_row.shape[-1]))
    masses_vec = jnp.full((n,), 39.948)

    def force(p):
        pw = space.wrap(p, box)
        idx, mask, _ = dense_neighbor_list(pw, box, CUTOFF, K)
        return reference_forward(pw, idx, mask, h0, mp, box, None,
                                 3.0, 1.0) * funit

    init_fn, step_fn = integ.nose_hoover_chain(
        force, dt, masses_vec, temp, frequency=fric / U.PS,
        chain_length=10, n_c=5, n_ys=5, ndf=3 * n)

    @jax.jit
    def run_ref(p, v):
        def step(s, _):
            return step_fn(s), None
        s, _ = jax.lax.scan(step, init_fn(p, v), None,
                            length=n_chunks * chunk_steps)
        return s.pos

    p_ref = np.asarray(space.wrap(run_ref(pos, vel), box))
    rows_aid = np.asarray(st.aux["aid"])
    rows_val = np.asarray(st.valid)
    p_rows = np.asarray(space.wrap(st.pos, box))
    checked = 0
    for r in range(rows_aid.shape[0]):
        if not rows_val[r]:
            continue
        d = p_rows[r] - p_ref[rows_aid[r]]
        d -= box * np.round(d / box)
        np.testing.assert_allclose(d, 0.0, atol=5e-3)
        checked += 1
    assert checked == n


def test_distributed_rigid_water_matches_single_device():
    """Constrained (SETTLE rigid water) distributed GNN-MD: molecule-
    grouped slab sort (group_size=3) + per-slab projections must track the
    single-device g-BAOAB constrained trajectory (gamma=0, deterministic)
    through a re-sort boundary."""
    from gamd_tpu.core import units as U
    from gamd_tpu.md import integrators as integ
    from gamd_tpu.md.constraints import RigidWater
    from gamd_tpu.neighbors.topology import neighbor_bond_channel
    from gamd_tpu.parallel.halo_gnn import run_halo_gnn_md

    n_mol, box, n_slabs = 600, 48.0, 4
    cutoff, skin, k = 4.2, 0.5, 48
    pos, onehot, n = _water_system(n_mol=n_mol, box=box, seed=9)
    cfg, mp, params = _water_model()
    h0 = _water_h0(params, onehot)
    mesh = make_mesh(n_slabs)
    cap = 768                          # multiple of 3
    # +1 A slack: grouped sort places H's up to a bond length outside
    # their molecule's slab.
    halo = cutoff + skin + 1.0
    aid = jnp.arange(n, dtype=jnp.int32)
    masses = jnp.asarray(np.where(np.arange(n) % 3 == 0, 15.9994, 1.008)
                         .astype(np.float32))
    full_constraint = RigidWater(n_mol, box)
    pos = full_constraint.project_initial(pos)
    rngv = np.random.RandomState(11)
    vel = jnp.asarray(rngv.randn(n, 3).astype(np.float32) * 0.02)
    vel = full_constraint.velocities(pos, vel)
    dt_fs, funit = 2.0, 1e-3
    chunk_steps, n_chunks = 5, 2

    chunk_fn = make_halo_gnn_md(
        mesh, mp, box, n_slabs, cutoff, skin, k, None,
        length_mean=2.8, length_std=1.1, masses_scalar=0.0,
        temperature=300.0, dt_fs=dt_fs, friction_per_ps=0.0,
        force_unit=funit, use_bond=True, per_atom_h0=True,
        per_atom_mass=True, constraint=RigidWater(cap // 3, box))
    st, ovf = run_halo_gnn_md(
        mesh, chunk_fn, pos, vel, box, n_slabs, cap, cap, halo,
        n_chunks * chunk_steps, chunk_steps, jax.random.PRNGKey(12),
        extras={"h0": h0, "aid": aid, "mass": masses}, group_size=3)
    assert not bool(ovf)

    dt = dt_fs * U.FS

    def force(p):
        pw = space.wrap(p, box)
        idx, mask, _ = dense_neighbor_list(pw, box, cutoff, k)
        bond = neighbor_bond_channel(idx)
        return reference_forward(pw, idx, mask, h0, mp, box, None,
                                 2.8, 1.1, bond=bond) * funit

    init_fn, step_fn = integ.baoab_langevin(
        force, dt, masses, 300.0, friction=0.0,
        constraint=full_constraint)

    @jax.jit
    def run_ref(p, v):
        zero = jnp.zeros_like(p)
        def step(s, _):
            return step_fn(s, noise=zero), None
        s, _ = jax.lax.scan(step, init_fn(p, v, jax.random.PRNGKey(0)),
                            None, length=n_chunks * chunk_steps)
        return s.pos

    p_ref = np.asarray(space.wrap(run_ref(pos, vel), box))
    rows_aid = np.asarray(st.aux["aid"])
    rows_val = np.asarray(st.valid)
    p_rows = np.asarray(space.wrap(st.pos, box))
    # Constraint residual holds on the distributed side.
    res = float(full_constraint.residual(
        jnp.asarray(p_rows[rows_val][np.argsort(rows_aid[rows_val])])))
    assert res < 5e-5, res
    checked = 0
    for r in range(rows_aid.shape[0]):
        if not rows_val[r]:
            continue
        d = p_rows[r] - p_ref[rows_aid[r]]
        d -= box * np.round(d / box)
        np.testing.assert_allclose(d, 0.0, atol=5e-3)
        checked += 1
    assert checked == n
