"""End-to-end training tests on synthetic LJ data (CPU, tiny configs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core.config import ModelConfig, SystemConfig, TrainConfig
from gamd_tpu.models.normalizer import denormalize
from gamd_tpu.physics import lennard_jones as lj
from gamd_tpu.train import augment
from gamd_tpu.train.checkpoint import (
    load_checkpoint,
    load_scaler,
    save_checkpoint,
    save_scaler,
)
from gamd_tpu.train.data import (
    RealLargeDataset,
    TrajectoryDataset,
    batch_iterator,
    reference_split,
)
from gamd_tpu.train.forcefield import GNNForceField
from gamd_tpu.train.loop import make_eval_step, make_train_step, train
from gamd_tpu.train.state import build_model, create_train_state, make_optimizer


TINY = ModelConfig(encoding_size=16, hidden_dim=16, edge_embedding_dim=16,
                   conv_layers=2)


def make_lj_frames(n_frames=12, n=24, seed=0):
    """Synthetic LJ frames with exact classical forces."""
    params = lj.LJParams()
    box, pos0 = lj.lj_fluid_box(n, 0.5, params)
    params = lj.LJParams(cutoff=min(params.cutoff, box / 2 - 0.01))
    rng = np.random.RandomState(seed)
    frames = []
    for _ in range(n_frames):
        p = (pos0 + rng.randn(*pos0.shape).astype(np.float32) * 0.3) % box
        f = np.asarray(lj.lj_forces_dense(jnp.asarray(p), box, params))
        frames.append({"pos": p.astype(np.float32),
                       "forces": (f / 0.1).astype(np.float32)})  # kJ/mol/nm
    system = SystemConfig(
        name="tiny-lj", n_atoms=n, box=box, cutoff=params.cutoff,
        nbr_capacity=n, skin=1.0, species="lj", masses=(lj.ARGON_MASS,),
        temperature=100.0)
    return system, frames


class ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_reference_split_parity():
    """Exact reproduction of the reference's seed-0 shuffled 90/10 split."""
    train_idx, test_idx = reference_split(100)
    idxs = np.arange(100)
    np.random.seed(0)
    np.random.shuffle(idxs)
    np.testing.assert_array_equal(train_idx, idxs[:90])
    np.testing.assert_array_equal(test_idx, idxs[90:])


def test_trajectory_dataset_roundtrip(tmp_path):
    d = tmp_path / "lj_data"
    d.mkdir()
    rng = np.random.RandomState(0)
    for seed in range(2):
        for t in range(5):
            np.savez(d / f"data_{seed}_{t}.npz",
                     pos=rng.randn(8, 3).astype(np.float32),
                     vel=rng.randn(8, 3).astype(np.float32),
                     forces=rng.randn(8, 3).astype(np.float32))
    ds = TrajectoryDataset(str(d), sample_num=5, seed_num=2, mode="train")
    assert len(ds) == 9
    item = ds[0]
    assert item["pos"].shape == (8, 3)
    ds_test = TrajectoryDataset(str(d), sample_num=5, seed_num=2, mode="test")
    assert len(ds_test) == 1


def test_trajectory_dataset_extra_seeds(tmp_path):
    """extra_seed_num appends whole trajectories to TRAIN only; the
    canonical split (and therefore the held-out eval set) is unchanged."""
    d = tmp_path / "lj_data"
    d.mkdir()
    rng = np.random.RandomState(0)
    for seed in range(3):
        for t in range(5):
            np.savez(d / f"data_{seed}_{t}.npz",
                     pos=rng.randn(8, 3).astype(np.float32),
                     vel=rng.randn(8, 3).astype(np.float32),
                     forces=rng.randn(8, 3).astype(np.float32))
    base = TrajectoryDataset(str(d), sample_num=5, seed_num=2, mode="train")
    ext = TrajectoryDataset(str(d), sample_num=5, seed_num=2, mode="train",
                            extra_seed_num=1)
    assert len(ext) == len(base) + 5
    np.testing.assert_array_equal(ext.idx[:len(base)], base.idx)
    assert set(ext.idx[len(base):]) == set(range(10, 15))
    t_base = TrajectoryDataset(str(d), sample_num=5, seed_num=2, mode="test")
    t_ext = TrajectoryDataset(str(d), sample_num=5, seed_num=2, mode="test",
                              extra_seed_num=1)
    np.testing.assert_array_equal(t_base.idx, t_ext.idx)
    # Pack cache spans the extended set and a stale-size cache is rejected.
    cache = str(tmp_path / "pack_s3.npz")
    packed = TrajectoryDataset(str(d), sample_num=5, seed_num=2,
                               mode="train", extra_seed_num=1,
                               pack_cache=cache)
    np.testing.assert_allclose(packed[len(base)]["pos"],
                               ext[len(base)]["pos"])
    import pytest
    with pytest.raises(ValueError, match="stale"):
        TrajectoryDataset(str(d), sample_num=5, seed_num=2, mode="train",
                          pack_cache=cache)


def test_tip4p_m_site_dropping(tmp_path):
    d = tmp_path / "tip4p_data"
    d.mkdir()
    # 2 molecules x 4 sites (O,H,H,M)
    pos = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    np.savez(d / "data_0_0.npz", pos=pos, vel=pos, forces=pos)
    ds = TrajectoryDataset(str(d), sample_num=1, seed_num=1, mode="train",
                           data_type="tip4p", split=(1.0, 0.0))
    item = ds[0]
    assert item["pos"].shape == (6, 3)          # M sites dropped
    np.testing.assert_array_equal(item["pos"][:3], pos[:3])
    np.testing.assert_array_equal(item["pos"][3:], pos[4:7])
    assert item["feat"].shape == (6, 1)
    np.testing.assert_array_equal(item["feat"].ravel(), [1, 0, 0, 1, 0, 0])


def test_real_large_dataset(tmp_path):
    path = tmp_path / "rpbe.npz"
    n_frames, n = 10, 6
    rng = np.random.RandomState(1)
    np.savez(path,
             pos=rng.randn(n_frames, n, 3).astype(np.float32),
             force=rng.randn(n_frames, n, 3).astype(np.float32),
             box=np.tile(np.array([12.0, 12.0, 12.0], np.float32),
                         (n_frames, 1)),
             atom_type=np.tile((np.arange(n) % 3 == 0).astype(np.int64),
                               (n_frames, 1)),
             train_idx=np.arange(8),
             test_idx=np.arange(8, 10))
    ds = RealLargeDataset(str(path), mode="train")
    assert len(ds) == 8
    item = ds[0]
    assert item["box_size"].shape == (3,)
    assert item["feat"].shape == (n, 1)
    ds_part = RealLargeDataset(str(path), mode="train", use_part=True)
    assert len(ds_part) == 8  # fewer than 1500 -> all


def test_rotation_augmentation_preserves_force_geometry():
    """Rotating pos and forces by the same R keeps |F| and relative angles."""
    rng = jax.random.PRNGKey(0)
    pos = jax.random.uniform(rng, (10, 3)) * 5.0
    forces = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    p2, f2, _ = augment.rotate_sample(jax.random.PRNGKey(4), pos, forces, 5.0,
                                      prob=1.0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(f2), axis=1),
        np.linalg.norm(np.asarray(forces), axis=1), rtol=1e-2)


def test_flip_rotation_is_axis_aligned():
    r = np.asarray(augment.random_flip_rotation(jax.random.PRNGKey(3),
                                                prob=1.0))
    # Rotation by multiples of pi: entries in {-1, 0, 1}, orthogonal.
    np.testing.assert_allclose(np.abs(r).sum(axis=0), 1.0, atol=1e-5)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_train_step_runs_and_loss_decreases():
    system, frames = make_lj_frames(n_frames=8)
    ds = ListDataset(frames)
    cfg = TrainConfig(max_epoch=30, batch_size=4, lr=3e-3,
                      rotate_aug=True, jitter_sigma=0.001)
    model = build_model(TINY, system)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    state = create_train_state(model, system, cfg, steps_per_epoch=2)
    step = make_train_step(model, system, cfg, tx)

    losses = []
    for epoch in range(30):
        for batch in batch_iterator(ds, 4, shuffle=True, seed=epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7
    assert int(state.step) == 60
    assert float(state.force_stat.count) > 0
    assert float(state.length_stat.safe_mean) > 0


def test_train_step_exact_relabel():
    """--relabel path: labels recomputed at the augmented positions.

    With jitter_sigma=0 and rotation off, the relabeled ground truth must
    match the stored labels exactly (same classical oracle at the same
    positions), so the two steps produce identical loss from identical
    states; with jitter on, the relabeled step must still run and the
    recomputed labels follow the jittered positions."""
    system, frames = make_lj_frames(n_frames=4)
    params = lj.LJParams(cutoff=system.cutoff)
    box = system.box

    def relabel_fn(p):
        return lj.lj_forces_dense(p, box, params) / 0.1  # match units

    model = build_model(TINY, system)
    batch = {k: jnp.asarray(np.stack([f[k] for f in frames[:2]]))
             for k in frames[0]}

    cfg0 = TrainConfig(max_epoch=1, batch_size=2, rotate_aug=False,
                       jitter_sigma=0.0)
    tx = make_optimizer(cfg0, 1)
    state = create_train_state(model, system, cfg0, 1)
    _, m_plain = make_train_step(model, system, cfg0, tx)(state, batch)
    _, m_rel = make_train_step(model, system, cfg0, tx,
                               relabel_fn=relabel_fn)(state, batch)
    np.testing.assert_allclose(float(m_plain["loss"]), float(m_rel["loss"]),
                               rtol=1e-5)

    cfg_j = TrainConfig(max_epoch=1, batch_size=2, rotate_aug=True,
                        jitter_sigma=0.02)
    txj = make_optimizer(cfg_j, 1)
    state_j = create_train_state(model, system, cfg_j, 1)
    st2, m_j = make_train_step(model, system, cfg_j, txj,
                               relabel_fn=relabel_fn)(state_j, batch)
    assert np.isfinite(float(m_j["loss"]))
    assert int(st2.step) == 1


def test_eval_step_metrics():
    system, frames = make_lj_frames(n_frames=4)
    ds = ListDataset(frames)
    cfg = TrainConfig(max_epoch=1, batch_size=2)
    model = build_model(TINY, system)
    tx = make_optimizer(cfg, 2)
    state = create_train_state(model, system, cfg, 2)
    train_step = make_train_step(model, system, cfg, tx)
    for batch in batch_iterator(ds, 2, shuffle=False):
        state, _ = train_step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()})
    eval_step = make_eval_step(model, system)
    batch = next(batch_iterator(ds, 2, shuffle=False))
    m = eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    for key in ("val_mae", "val_mse", "val_outlier"):
        assert np.isfinite(float(m[key]))


def test_checkpoint_self_describing(tmp_path):
    """Envelope checkpoints embed Model/SystemConfig; legacy (state-only)
    files still load (round-1 artifacts)."""
    import flax.serialization
    from gamd_tpu.train.checkpoint import (load_checkpoint_configs,
                                           load_self_describing)

    system, _ = make_lj_frames(n_frames=2)
    cfg = TrainConfig(max_epoch=1, batch_size=2)
    model = build_model(TINY, system)
    state = create_train_state(model, system, cfg, 1)

    p = tmp_path / "ckpt.msgpack"
    save_checkpoint(str(p), state, model_cfg=TINY, system=system)
    st2, cfg2, sys2 = load_self_describing(str(p))
    assert cfg2 == TINY
    assert sys2 == system
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Runtime override doesn't disturb the architecture.
    _, cfg3, _ = load_self_describing(str(p), compute_dtype="bfloat16")
    assert cfg3.compute_dtype == "bfloat16"
    assert cfg3.encoding_size == TINY.encoding_size

    # Legacy layout: raw state bytes, no meta.
    legacy = tmp_path / "legacy.msgpack"
    with open(legacy, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    assert load_checkpoint_configs(str(legacy)) == (None, None)
    template = create_train_state(model, system, cfg, 1,
                                  rng=jax.random.PRNGKey(5))
    restored = load_checkpoint(str(legacy), template)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
    st4, cfg4, _ = load_self_describing(
        str(legacy), fallback_model_cfg=TINY, fallback_system=system)
    assert cfg4 == TINY
    with pytest.raises(ValueError):
        load_self_describing(str(legacy))


def test_checkpoint_roundtrip(tmp_path):
    system, frames = make_lj_frames(n_frames=2)
    cfg = TrainConfig(max_epoch=1, batch_size=2)
    model = build_model(TINY, system)
    state = create_train_state(model, system, cfg, 1)
    p = tmp_path / "ckpt.msgpack"
    save_checkpoint(str(p), state)
    template = create_train_state(model, system, cfg, 1,
                                  rng=jax.random.PRNGKey(99))
    restored = load_checkpoint(str(p), template)
    before = jax.tree.leaves(state.params)
    after = jax.tree.leaves(restored.params)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sp = tmp_path / "scaler.npz"
    save_scaler(str(sp), state)
    z = np.load(sp)
    assert set(["mean", "var"]).issubset(z.files)   # reference-compatible keys
    force, length = load_scaler(str(sp))
    assert float(force.var) == pytest.approx(float(state.force_stat.var),
                                             rel=1e-5)


def test_gnn_forcefield_predict_and_md_roundtrip():
    """Full loop: train briefly, wrap as force field, run fused MD."""
    from gamd_tpu.core.config import MDConfig
    from gamd_tpu.md.simulate import Simulation

    system, frames = make_lj_frames(n_frames=6)
    ds = ListDataset(frames)
    cfg = TrainConfig(max_epoch=3, batch_size=2, rotate_aug=False)
    state = train(system, TINY, cfg, ds, log_fn=lambda s: None)

    ff = GNNForceField(state, system, TINY)
    pred = ff.predict(frames[0]["pos"])
    assert pred.shape == (system.n_atoms, 3)
    assert np.all(np.isfinite(np.asarray(pred)))

    md = MDConfig(integrator="langevin", temperature=100.0, rebuild_every=5)
    sim = Simulation(ff.force_fn(), system, md)
    st = sim.init_state(jnp.asarray(frames[0]["pos"]),
                        rng=jax.random.PRNGKey(0))
    result = sim.run(st, 20)
    assert np.all(np.isfinite(np.asarray(result.state.pos)))
    assert result.thermo.temperature.shape == (20,)


def test_train_data_parallel_mesh():
    """Same step function under a dp-sharded batch on the 8-CPU mesh."""
    from gamd_tpu.parallel.mesh import dp_sharding, make_mesh

    system, frames = make_lj_frames(n_frames=8)
    ds = ListDataset(frames)
    cfg = TrainConfig(max_epoch=1, batch_size=8, rotate_aug=False)
    model = build_model(TINY, system)
    tx = make_optimizer(cfg, 1)
    state = create_train_state(model, system, cfg, 1)
    step = make_train_step(model, system, cfg, tx)

    mesh = make_mesh(8)
    shard = dp_sharding(mesh)
    batch = next(batch_iterator(ds, 8, shuffle=False))
    sharded = {k: jax.device_put(v, shard) for k, v in batch.items()}
    state_sharded, m_sharded = step(state, sharded)

    local = {k: jnp.asarray(v) for k, v in batch.items()}
    state_local, m_local = step(state, local)
    # Same math regardless of sharding.
    assert float(m_sharded["loss"]) == pytest.approx(
        float(m_local["loss"]), rel=1e-4)
    a = jax.tree.leaves(state_sharded.params)
    b = jax.tree.leaves(state_local.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_trajectory_dataset_pack_cache(tmp_path):
    """Native (or fallback) packing matches per-file reads exactly."""
    d = tmp_path / "lj_data"
    d.mkdir()
    rng = np.random.RandomState(2)
    for seed in range(2):
        for t in range(4):
            np.savez(d / f"data_{seed}_{t}.npz",
                     pos=rng.randn(10, 3).astype(np.float32),
                     vel=rng.randn(10, 3).astype(np.float32),
                     forces=rng.randn(10, 3).astype(np.float32))
    cache = str(tmp_path / "pack.npz")
    ds_packed = TrajectoryDataset(str(d), sample_num=4, seed_num=2,
                                  mode="train", pack_cache=cache)
    ds_files = TrajectoryDataset(str(d), sample_num=4, seed_num=2,
                                 mode="train")
    assert os.path.exists(cache)
    for i in range(len(ds_files)):
        np.testing.assert_array_equal(ds_packed[i]["pos"], ds_files[i]["pos"])
        np.testing.assert_array_equal(ds_packed[i]["forces"],
                                      ds_files[i]["forces"])
    # Second construction reads the cache (no rebuild).
    ds2 = TrajectoryDataset(str(d), sample_num=4, seed_num=2, mode="train",
                            pack_cache=cache)
    np.testing.assert_array_equal(ds2[0]["pos"], ds_packed[0]["pos"])


def test_train_step_dynamic_box_dft_variant():
    """RPBE-style config: per-sample [B,3] boxes, water one-hot, flip_dir,
    box rotation in augmentation (reference: train_network_real_large.py)."""
    rng = np.random.RandomState(3)
    n = 12   # 4 molecules
    system = SystemConfig(
        name="tiny-dft", n_atoms=n, box=None, cutoff=4.0, nbr_capacity=n,
        skin=0.0, species="water", has_bonds=False,
        masses=(15.9994, 1.008, 1.008), temperature=300.0)
    cfg_m = ModelConfig(encoding_size=16, hidden_dim=16,
                        edge_embedding_dim=16, conv_layers=2, flip_dir=True)
    cfg_t = TrainConfig(max_epoch=1, batch_size=2, rotate_aug=True,
                        jitter_sigma=0.00025, lambda_net_force=0.5e-2)
    model = build_model(cfg_m, system)
    tx = make_optimizer(cfg_t, 1)
    state = create_train_state(model, system, cfg_t, 1)
    step = make_train_step(model, system, cfg_t, tx)

    batch = {
        "pos": jnp.asarray(rng.uniform(0, 9, (2, n, 3)).astype(np.float32)),
        "forces": jnp.asarray(rng.randn(2, n, 3).astype(np.float32)),
        "feat": jnp.asarray(np.tile(
            (np.arange(n) % 3 == 0).astype(np.float32).reshape(1, n, 1),
            (2, 1, 1))),
        "box_size": jnp.asarray(np.array([[9.0, 10.0, 11.0],
                                          [10.0, 10.0, 10.0]], np.float32)),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = step(state, batch)
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state.step) == 2

    # SCALAR per-frame boxes (cubic RPBE surrogate, generate.py): the
    # rotation augmentation must pass a 0-d box through unchanged instead
    # of matmul-rotating it (caught live: ndim-0 matmul ValueError).
    batch["box_size"] = jnp.asarray(np.array([9.0, 10.0], np.float32))
    state, metrics3 = step(state, batch)
    assert np.isfinite(float(metrics3["loss"]))


def test_predict_batch_matches_single():
    system, frames = make_lj_frames(n_frames=5)
    cfg = TrainConfig(max_epoch=1, batch_size=2, rotate_aug=False)
    model = build_model(TINY, system)
    state = create_train_state(model, system, cfg, 1)
    ff = GNNForceField(state, system, TINY)
    pos_all = np.stack([f["pos"] for f in frames])
    batch_pred = np.asarray(ff.predict_batch(pos_all, batch_size=2))
    single = np.stack([np.asarray(ff.predict(f["pos"])) for f in frames])
    np.testing.assert_allclose(batch_pred, single, rtol=1e-4, atol=1e-4)


def test_load_reference_style_scaler(tmp_path):
    """Read a scaler.npz with only the reference's mean/var keys
    (reference shipped values: LJ var ~1010 (kJ/mol/nm)^2)."""
    from gamd_tpu.train.checkpoint import load_scaler
    p = tmp_path / "scaler.npz"
    np.savez(p, mean=np.array([0.123]), var=np.array([1010.0]))
    force, length = load_scaler(str(p))
    assert float(force.safe_mean) == pytest.approx(0.123)
    assert float(force.var) == pytest.approx(1010.0)
    assert float(force.std) == pytest.approx(np.sqrt(1010.0), rel=1e-5)
    # length falls back to identity
    assert float(length.std) == pytest.approx(1.0)


def test_water_train_step_with_bond_channel():
    """TIP3P-style training step: one-hot node feats + O-H bond channel."""
    rng = np.random.RandomState(6)
    n = 12  # 4 molecules
    system = SystemConfig(
        name="tiny-water", n_atoms=n, box=8.0, cutoff=3.0, nbr_capacity=n,
        skin=0.5, species="water", has_bonds=True,
        masses=(15.9994, 1.008, 1.008), temperature=300.0)
    cfg = TrainConfig(max_epoch=1, batch_size=2, rotate_aug=True)
    model = build_model(TINY, system)
    assert model.use_bond
    tx = make_optimizer(cfg, 1)
    state = create_train_state(model, system, cfg, 1)
    step = make_train_step(model, system, cfg, tx)
    feat = np.tile((np.arange(n) % 3 == 0).astype(np.float32).reshape(
        1, n, 1), (2, 1, 1))
    batch = {
        "pos": jnp.asarray(rng.uniform(0, 8, (2, n, 3)).astype(np.float32)),
        "forces": jnp.asarray(rng.randn(2, n, 3).astype(np.float32)),
        "feat": jnp.asarray(feat),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_epoch_scan_with_drop_edge_and_dropout():
    """On-device epoch path with stochastic regularizers enabled."""
    from gamd_tpu.train.loop import make_train_epoch
    system, frames = make_lj_frames(n_frames=8)
    cfg_m = ModelConfig(encoding_size=16, hidden_dim=16,
                        edge_embedding_dim=16, conv_layers=2, drop_edge=True,
                        dropout=0.1)
    cfg_t = TrainConfig(max_epoch=1, batch_size=4)
    model = build_model(cfg_m, system)
    tx = make_optimizer(cfg_t, 2)
    state = create_train_state(model, system, cfg_t, 2)
    epoch_fn = make_train_epoch(model, system, cfg_t, tx, n_frames=8)
    pos = jnp.asarray(np.stack([f["pos"] for f in frames]))
    forces = jnp.asarray(np.stack([f["forces"] for f in frames]))
    state, metrics = epoch_fn(state, pos, forces, None, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_train_step_update_edge_path():
    """update_edge (per-layer edge-embedding refresh w/ LayerNorm)."""
    system, frames = make_lj_frames(n_frames=2)
    cfg_m = ModelConfig(encoding_size=16, hidden_dim=16,
                        edge_embedding_dim=16, conv_layers=2,
                        update_edge=True)
    cfg_t = TrainConfig(max_epoch=1, batch_size=2, rotate_aug=False)
    model = build_model(cfg_m, system)
    tx = make_optimizer(cfg_t, 1)
    state = create_train_state(model, system, cfg_t, 1)
    step = make_train_step(model, system, cfg_t, tx)
    batch = {k: jnp.asarray(np.stack([f[k] for f in frames]))
             for k in ("pos", "forces")}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_precomputed_nbrs_match_per_step_search():
    """precompute_nbrs=True reproduces the per-step-search trainer exactly
    (same rng stream, same lists: search precedes jitter and the rotation
    augmentation preserves min-image distances)."""
    from gamd_tpu.train.loop import train

    system, frames = make_lj_frames(n_frames=12)
    ds = ListDataset(frames[:8])
    val = ListDataset(frames[8:])
    logs_a, logs_b = [], []
    for precompute, logs in ((False, logs_a), (True, logs_b)):
        cfg_t = TrainConfig(max_epoch=2, batch_size=4, seed=3,
                            precompute_nbrs=precompute)
        train(system, TINY, cfg_t, ds, val_data=val,
              log_fn=lambda m, logs=logs: logs.append(m))
    # identical up to XLA fusion-order float noise in the last digit
    import re
    for la, lb in zip(logs_a, logs_b):
        va = [float(x) for x in re.findall(r"=(-?[\d.]+)", la)]
        vb = [float(x) for x in re.findall(r"=(-?[\d.]+)", lb)]
        np.testing.assert_allclose(va, vb, rtol=1e-5, atol=1e-5)
    assert len(logs_a) == len(logs_b)
    assert any("val_mae" in line for line in logs_a)


def test_precomputed_nbrs_water_bond_epoch():
    """Water (one-hot feats + bond channel) through the full epoch-scan
    trainer with precomputed neighbor lists — the exact on-chip tip3p
    configuration."""
    from gamd_tpu.train.loop import train

    rng = np.random.RandomState(9)
    n = 12
    system = SystemConfig(
        name="tiny-water", n_atoms=n, box=8.0, cutoff=3.0, nbr_capacity=n,
        skin=0.5, species="water", has_bonds=True,
        masses=(15.9994, 1.008, 1.008), temperature=300.0)
    feat = (np.arange(n) % 3 == 0).astype(np.float32)[:, None]
    frames = [{"pos": rng.uniform(0, 8, (n, 3)).astype(np.float32),
               "forces": rng.randn(n, 3).astype(np.float32),
               "feat": feat} for _ in range(10)]
    cfg_t = TrainConfig(max_epoch=2, batch_size=2, precompute_nbrs=True)
    logs = []
    train(system, TINY, cfg_t, ListDataset(frames[:8]),
          val_data=ListDataset(frames[8:]),
          log_fn=lambda m: logs.append(m))
    assert any("epoch 1:" in line for line in logs)
    assert all("nan" not in line for line in logs)


def test_train_resume_matches_straight_run(tmp_path):
    """The production resume contract (scripts/train_gamd.py
    --state_ckpt_dir + --start_epoch, used by scripts/round5b_queue.sh):
    restoring checkpoint_E and continuing with start_epoch=E+1 must
    reproduce the straight run exactly — same per-epoch RNG stream
    (loop.py replays start_epoch splits), same LR schedule (opt-state
    step count rides the checkpoint), same streaming-scaler state."""
    system, frames = make_lj_frames(n_frames=8)
    ds = ListDataset(frames)
    cfg = TrainConfig(max_epoch=3, batch_size=4, lr=3e-3,
                      rotate_aug=True, jitter_sigma=0.001,
                      precompute_nbrs=True, checkpoint_every=1)
    straight = train(system, TINY, cfg, ds, ckpt_dir=str(tmp_path),
                     log_fn=lambda m: None)

    model = build_model(TINY, system)
    template = create_train_state(model, system, cfg, steps_per_epoch=2,
                                  rng=jax.random.PRNGKey(123))
    restored = load_checkpoint(str(tmp_path / "checkpoint_1.msgpack"),
                               template)
    import dataclasses
    cfg_resume = dataclasses.replace(cfg, start_epoch=2)
    resumed = train(system, TINY, cfg_resume, ds, state=restored,
                    log_fn=lambda m: None)

    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(straight.step) == int(resumed.step)
    np.testing.assert_array_equal(
        np.asarray(straight.force_stat.count),
        np.asarray(resumed.force_stat.count))
    np.testing.assert_allclose(float(straight.force_stat.var),
                               float(resumed.force_stat.var), rtol=1e-6)


def test_rigid_jitter_preserves_molecule_geometry():
    """Rigid per-molecule jitter must keep every intra-molecular distance
    exact (the constraint manifold) while actually moving the molecules."""
    rng = jax.random.PRNGKey(3)
    m, g = 16, 3
    pos = jax.random.uniform(rng, (m * g, 3)) * 10.0
    sigma = 0.05
    out = augment.rigid_jitter_positions(jax.random.PRNGKey(7), pos, sigma)
    p0 = np.asarray(pos).reshape(m, g, 3)
    p1 = np.asarray(out).reshape(m, g, 3)
    for a, b in ((0, 1), (0, 2), (1, 2)):
        d0 = np.linalg.norm(p0[:, a] - p0[:, b], axis=-1)
        d1 = np.linalg.norm(p1[:, a] - p1[:, b], axis=-1)
        np.testing.assert_allclose(d1, d0, rtol=0, atol=5e-5)
    # Molecules moved by ~sigma (not frozen, not exploded).
    disp = np.linalg.norm(p1.mean(axis=1) - p0.mean(axis=1), axis=-1)
    assert 0.2 * sigma < disp.mean() < 5.0 * sigma


def test_rigid_jitter_batched_shape_and_determinism():
    pos = jax.random.uniform(jax.random.PRNGKey(0), (2, 12, 3)) * 5.0
    a = augment.rigid_jitter_positions(jax.random.PRNGKey(1), pos, 0.02)
    b = augment.rigid_jitter_positions(jax.random.PRNGKey(1), pos, 0.02)
    assert a.shape == pos.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment.rigid_jitter_positions(jax.random.PRNGKey(2), pos, 0.02)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


def test_train_step_rigid_jitter_runs():
    """Rigid-jitter + relabel train step runs and yields a finite loss."""
    system, frames = make_lj_frames(n_frames=4)
    cfg = TrainConfig(batch_size=2, rotate_aug=False, jitter_sigma=0.03,
                      rigid_jitter=True)
    model = build_model(TINY, system)
    state = create_train_state(model, system, cfg, 2)
    tx = make_optimizer(cfg, 2)
    step = make_train_step(model, system, cfg, tx,
                           relabel_fn=lambda p: jnp.zeros_like(p))
    batch = {"pos": jnp.stack([jnp.asarray(frames[i]["pos"])
                               for i in range(2)]),
             "forces": jnp.stack([jnp.asarray(frames[i]["forces"])
                                  for i in range(2)])}
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_rigid_jitter_wrapped_molecule_minimum_image():
    """A molecule straddling the periodic boundary (wrapped coordinates
    spanning ~L) must keep its MINIMUM-IMAGE intra distances exact under
    rigid jitter. Without the box-aware local frame, rotating the wrapped
    coordinates about their bogus arithmetic centroid changes the true
    O-H geometry by ~|v|*theta and drives atoms into neighbor molecules
    (the r5d flagship force_std blowup)."""
    L = 20.0
    # O just inside the left face; both H's wrapped to the right face.
    pos = np.array([
        [0.05, 10.0, 10.0], [L - 0.70, 10.6, 10.0], [L - 0.70, 9.4, 10.0],
        # plus one interior molecule for contrast
        [5.0, 5.0, 5.0], [5.76, 5.59, 5.0], [5.76, 4.41, 5.0],
    ], dtype=np.float32)

    def min_image_d(p, a, b):
        d = p[a] - p[b]
        d = d - L * np.round(d / L)
        return np.linalg.norm(d)

    out = np.asarray(augment.rigid_jitter_positions(
        jax.random.PRNGKey(11), jnp.asarray(pos), 0.02, box=L))
    for mol in (0, 1):
        for a, b in ((0, 1), (0, 2), (1, 2)):
            i, j = 3 * mol + a, 3 * mol + b
            np.testing.assert_allclose(
                min_image_d(out, i, j), min_image_d(pos, i, j),
                rtol=0, atol=5e-5)
    # displacement stays at jitter scale for every atom (min-image sense)
    disp = pos - out
    disp = disp - L * np.round(disp / L)
    assert np.linalg.norm(disp, axis=-1).max() < 0.3
