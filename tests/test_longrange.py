"""Analytic long-range (k-space Ewald) force channel.

Round-4 finding (RESULTS.md): at the reference recipe, a 4.2 A-cutoff local
GNN memorizes rather than generalizes the reciprocal-space component of
PME/Ewald water labels (mean |F_recip| ~ 0.031 eV/A). With fixed TIP3P
point charges that component is analytic, so the framework supports a
physics split: train the GNN on ``label - F_recip`` and add the analytic
term back at deployment (ModelConfig.longrange == 'ewald_recip'). The
reference (trains directly on PME-containing labels,
/root/reference/dataset/generate_tip3p_data.py:55-57) has no such channel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gamd_tpu.core.config import ModelConfig, TrainConfig, get_preset
from gamd_tpu.physics.ewald import (make_ewald_params, make_recip_force_fn,
                                    recip_energy)
from gamd_tpu.physics.water import TIP3PParams, atom_charges, water_box


def _small_water(m=8, box=7.0, seed=0):
    pos = water_box(m, box, seed=seed)
    q = atom_charges(m, TIP3PParams())
    return jnp.asarray(pos), q, box


def test_recip_force_finite_difference():
    """-grad(recip_energy) matches central finite differences."""
    pos, q, box = _small_water()
    ew = make_ewald_params(box, cutoff=3.0)
    f = -jax.grad(lambda p: recip_energy(p, q, ew))(pos.astype(jnp.float64)
                                                    if jax.config.jax_enable_x64
                                                    else pos)
    e = lambda p: float(recip_energy(p, q, ew))
    h = 1e-3
    for (i, d) in [(0, 0), (5, 1), (17, 2)]:
        dp = jnp.zeros_like(pos).at[i, d].set(h)
        fd = -(e(pos + dp) - e(pos - dp)) / (2 * h)
        assert abs(float(f[i, d]) - fd) < 5e-2 * max(1.0, abs(fd)), (i, d)


def test_recip_force_periodic():
    """The k-space force is exactly periodic in the box (k on the
    reciprocal lattice), so whole-box translations of single atoms are
    invisible to it."""
    pos, q, box = _small_water(seed=1)
    fn = make_recip_force_fn(box, q, cutoff=3.0)
    shifted = pos.at[4].add(jnp.array([box, -box, 2 * box]))
    np.testing.assert_allclose(np.asarray(fn(pos)), np.asarray(fn(shifted)),
                               rtol=1e-4, atol=1e-4)


def test_recip_is_a_term_of_the_total():
    """ewald_energy decomposes linearly: total == (total - recip) + recip,
    with recip computed by the standalone recip_energy (same kfac/kvecs)."""
    from gamd_tpu.physics.ewald import ewald_energy
    pos, q, box = _small_water(seed=2)
    ew = make_ewald_params(box, cutoff=3.0)
    mol = jnp.arange(pos.shape[0]) // 3
    same_mol = mol[:, None] == mol[None, :]
    total = float(ewald_energy(pos, q, box, same_mol, ew))
    recip = float(recip_energy(pos, q, ew))
    # Re-derive the non-recip remainder with a zeroed k-grid.
    ew0 = ew._replace(kfac=np.zeros_like(ew.kfac))
    rest = float(ewald_energy(pos, q, box, same_mol, ew0))
    assert abs(total - (rest + recip)) < 1e-3 * max(1.0, abs(total))


def test_forcefield_longrange_composition():
    """A longrange checkpoint's every consumer-facing path equals the plain
    path plus the analytic term; the fused in-kernel paths refuse."""
    from gamd_tpu.core import units
    from gamd_tpu.neighbors.dense import dense_neighbor_list, refresh_mask
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    system = get_preset("tip3p", n_atoms=24, box=7.0, cutoff=3.0,
                        nbr_capacity=16, skin=0.5)
    cfg = ModelConfig(use_layer_norm=True, in_node_feats=1)
    cfg_lr = ModelConfig(use_layer_norm=True, in_node_feats=1,
                         longrange="ewald_recip")
    model = build_model(cfg, system)
    state = create_train_state(model, system, TrainConfig(), 1)
    ff = GNNForceField(state, system, cfg)
    ff_lr = GNNForceField(state, system, cfg_lr)

    pos = jnp.asarray(water_box(8, 7.0, seed=3))
    q = atom_charges(8, TIP3PParams())
    lr = make_recip_force_fn(7.0, q)

    idx, mask, _ = dense_neighbor_list(pos, 7.0, system.cutoff + system.skin,
                                       16)
    live = refresh_mask(pos, 7.0, system.cutoff, idx, mask)
    base = ff.force_fn()(pos, idx, live)
    split = ff_lr.force_fn()(pos, idx, live)
    np.testing.assert_allclose(np.asarray(split),
                               np.asarray(base + lr(pos)),
                               rtol=1e-5, atol=1e-5)

    # predict() works in dataset units (kJ/mol/nm).
    p_base = ff.predict(pos)
    p_split = ff_lr.predict(pos)
    np.testing.assert_allclose(
        np.asarray(p_split),
        np.asarray(p_base
                   + lr(jnp.mod(pos, 7.0)) / system.force_unit_to_internal),
        rtol=1e-4, atol=1e-4)

    # predict_batch composes identically.
    pb = ff_lr.predict_batch(jnp.stack([pos, pos + 0.05]), batch_size=2)
    np.testing.assert_allclose(np.asarray(pb[0]), np.asarray(p_split),
                               rtol=1e-4, atol=1e-4)

    with pytest.raises(ValueError):
        ff_lr.megastep_fn()
    with pytest.raises(ValueError):
        ff_lr.banded_force_fn()


def test_tip4p_recip_force():
    """TIP4P k-space channel: finite-difference consistent, with the M-site
    force redistributed onto real atoms (H rows receive force even though
    the O charge is zero)."""
    from gamd_tpu.physics.water import make_tip4p_recip_force_fn

    pos, _, box = _small_water(seed=4)
    fn = make_tip4p_recip_force_fn(box, pos.shape[0], cutoff=3.0)
    f = fn(pos)
    assert bool(jnp.isfinite(f).all())

    from gamd_tpu.physics.water import (TIP4PEwParams, tip4pew_m_sites)
    from gamd_tpu.physics.ewald import make_ewald_params
    p = TIP4PEwParams()
    ew = make_ewald_params(box, cutoff=3.0)
    m = pos.shape[0] // 3
    q = jnp.tile(jnp.array([p.q_m, p.q_h, p.q_h]), m)

    def e(pp):
        o, h1, h2 = pp[0::3], pp[1::3], pp[2::3]
        sites = jnp.stack([tip4pew_m_sites(o, h1, h2, box, p), h1, h2],
                          axis=1).reshape(3 * m, 3)
        return float(recip_energy(sites, q, ew))

    h = 1e-3
    for (i, d) in [(0, 1), (7, 0)]:
        dp = jnp.zeros_like(pos).at[i, d].set(h)
        fd = -(e(pos + dp) - e(pos - dp)) / (2 * h)
        assert abs(float(f[i, d]) - fd) < 5e-2 * max(1.0, abs(fd)), (i, d)

    # forcefield dispatch accepts the tip4p preset
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state
    system = get_preset("tip4p", n_atoms=24, box=7.0, cutoff=3.0,
                        nbr_capacity=16, skin=0.5)
    cfg = ModelConfig(use_layer_norm=True, in_node_feats=1,
                      longrange="ewald_recip")
    model = build_model(cfg, system)
    state = create_train_state(model, system, TrainConfig(), 1)
    ff = GNNForceField(state, system, cfg)
    assert ff._longrange_fn is not None


def test_dataset_label_subtraction(tmp_path):
    """subtract_from_labels shifts in-memory labels only; the on-disk pack
    cache keeps the raw labels."""
    from gamd_tpu.train.data import TrajectoryDataset

    rng = np.random.RandomState(0)
    ddir = tmp_path / "lj_data"
    ddir.mkdir()
    for t in range(6):
        np.savez(ddir / f"data_0_{t}.npz",
                 pos=rng.rand(12, 3).astype(np.float32),
                 vel=np.zeros((12, 3), np.float32),
                 forces=rng.rand(12, 3).astype(np.float32))
    cache = str(ddir / "_packed.npz")
    ds = TrajectoryDataset(str(ddir), sample_num=6, seed_num=1,
                           mode="train", data_type="lj", pack_cache=cache)
    before = [np.array(ds[i]["forces"]) for i in range(len(ds))]
    ds.subtract_from_labels(lambda p: np.ones_like(p) * 0.5, chunk=2)
    after = [np.array(ds[i]["forces"]) for i in range(len(ds))]
    for b, a in zip(before, after):
        np.testing.assert_allclose(a, b - 0.5, rtol=1e-6)
    with np.load(cache) as z:
        disk = z["forces"]
    np.testing.assert_allclose(disk[int(ds.idx[0])], before[0], rtol=1e-6)


def test_longrange_checkpoint_roundtrip(tmp_path):
    """ModelConfig.longrange survives the self-describing envelope, so
    evaluate/run_md/analyze_rollout reconstruct the split automatically."""
    from gamd_tpu.train.checkpoint import (load_self_describing,
                                           save_checkpoint)
    from gamd_tpu.train.state import build_model, create_train_state

    system = get_preset("tip3p", n_atoms=24, box=7.0, cutoff=3.0,
                        nbr_capacity=16, skin=0.5)
    cfg = ModelConfig(use_layer_norm=True, in_node_feats=1,
                      longrange="ewald_recip")
    model = build_model(cfg, system)
    state = create_train_state(model, system, TrainConfig(), 1)
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, state, model_cfg=cfg, system=system)
    _, cfg2, system2 = load_self_describing(path)
    assert cfg2.longrange == "ewald_recip"
    assert system2.name == "tip3p"
