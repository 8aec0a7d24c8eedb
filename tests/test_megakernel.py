"""Whole-model megakernel (ops.pallas_model) parity tests, interpret mode.

The kernel's bf16 edge pipeline sets the noise floor: tolerances follow the
measured deviation of the round-1 production kernel (fused_conv_gather_
message), which this kernel replaces and slightly beats on accuracy (node
stream is fp32 here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core.config import ModelConfig, TrainConfig, get_preset
from gamd_tpu.models.gnn import GAMDNet
from gamd_tpu.neighbors.dense import dense_neighbor_list, refresh_mask
from gamd_tpu.neighbors.topology import neighbor_bond_channel
from gamd_tpu.ops.pallas_model import MegaParams, mega_forward, pack_params

BOX = 12.0


def _setup(cfg, species="lj", n=64, k=16, cutoff=5.0, seed=0,
           use_bond=False, train_bn=False):
    model = GAMDNet(cfg=cfg, species=species, use_bond=use_bond)
    rng = np.random.RandomState(seed)
    pos = jnp.asarray(rng.uniform(0, BOX, (n, 3)).astype(np.float32))
    idx, mask, _ = dense_neighbor_list(pos, BOX, cutoff, k)
    feat = None
    bond = None
    if species == "water":
        feat = jnp.asarray((np.arange(n) % 3 == 0).astype(np.float32))[:,
                                                                       None]
    if use_bond:
        bond = neighbor_bond_channel(idx)
    variables = model.init(jax.random.PRNGKey(seed), pos[None], idx[None],
                           mask[None], BOX, 0.5, 2.0,
                           node_feat=None if feat is None else feat[None],
                           bond=None if bond is None else bond[None],
                           train=False)
    return model, variables, pos, idx, mask, feat, bond


def _h0(params, cfg, species, feat, n):
    if species == "lj":
        return jnp.broadcast_to(params["node_emb"], (n, cfg.encoding_size))
    enc = params["node_encoder"]
    return feat @ enc["kernel"] + enc["bias"]


def _xla(model, variables, pos, idx, mask, feat, bond):
    return model.apply(
        variables, pos[None], idx[None], mask[None], BOX, 0.5, 2.0,
        node_feat=None if feat is None else feat[None],
        bond=None if bond is None else bond[None], train=False)[0]


def test_megakernel_lj_layernorm_parity():
    cfg = ModelConfig(use_layer_norm=True)
    model, variables, pos, idx, mask, feat, bond = _setup(cfg)
    ref = _xla(model, variables, pos, idx, mask, feat, bond)
    mp = pack_params(variables["params"], cfg)
    out = mega_forward(pos, idx, mask,
                       _h0(variables["params"], cfg, "lj", feat, 64),
                       mp, BOX, None, 0.5, 2.0, tile_n=8, interpret=True)
    err = jnp.abs(out - ref)
    scale = float(jnp.abs(ref).std())
    assert float(err.max()) < 0.03 * scale
    assert float(err.mean()) < 0.01 * scale


def test_megakernel_logic_exact_in_f32():
    """f32_edges mode removes the bf16 noise floor: any remaining deviation
    is logic, not precision (tanh-gelu vs erf-gelu stays, ~1e-3)."""
    cfg = ModelConfig(use_layer_norm=True)
    model, variables, pos, idx, mask, feat, bond = _setup(cfg, seed=7)
    ref = _xla(model, variables, pos, idx, mask, feat, bond)
    mp = pack_params(variables["params"], cfg)
    out = mega_forward(pos, idx, mask,
                       _h0(variables["params"], cfg, "lj", feat, 64),
                       mp, BOX, None, 0.5, 2.0, tile_n=8, interpret=True,
                       f32_edges=True)
    err = jnp.abs(out - ref)
    assert float(err.max()) < 5e-3 * float(jnp.abs(ref).std())


def test_megakernel_water_bond_batchnorm_parity():
    """Water variant: one-hot node encoder + bond channel + BatchNorm
    (eval-mode running stats folded into the per-feature affine). Run in
    f32_edges mode: an untrained BN-at-eval model amplifies magnitudes
    ~1e8x, so the bf16 floor would swamp the logic check."""
    cfg = ModelConfig(use_layer_norm=False)
    model, variables, pos, idx, mask, feat, bond = _setup(
        cfg, species="water", n=66, k=16, seed=1, use_bond=True)
    params = variables["params"]
    # Make running stats non-trivial so the fold is actually exercised.
    batch_stats = jax.tree.map(
        lambda x: x + jnp.linspace(0.1, 0.5, x.shape[-1]),
        variables["batch_stats"])
    variables = {"params": params, "batch_stats": batch_stats}
    ref = _xla(model, variables, pos, idx, mask, feat, bond)
    mp = pack_params(params, cfg, batch_stats=batch_stats)
    out = mega_forward(pos, idx, mask,
                       _h0(params, cfg, "water", feat, 66),
                       mp, BOX, None, 0.5, 2.0, bond=bond,
                       use_ln=False, tile_n=8, interpret=True,
                       f32_edges=True)
    err = jnp.abs(out - ref)
    scale = float(jnp.abs(ref).std())
    assert float(err.max()) < 5e-3 * scale


def test_megakernel_water_bond_bf16_floor():
    """bf16 production mode on the water/bond/LayerNorm variant stays at
    the same noise floor as the round-1 production kernel (~few % of the
    output scale on an untrained net; trained nets are far smoother)."""
    cfg = ModelConfig(use_layer_norm=True)
    model, variables, pos, idx, mask, feat, bond = _setup(
        cfg, species="water", n=66, k=16, seed=1, use_bond=True)
    ref = _xla(model, variables, pos, idx, mask, feat, bond)
    mp = pack_params(variables["params"], cfg)
    out = mega_forward(pos, idx, mask,
                       _h0(variables["params"], cfg, "water", feat, 66),
                       mp, BOX, None, 0.5, 2.0, bond=bond,
                       use_ln=True, tile_n=8, interpret=True)
    err = jnp.abs(out - ref)
    scale = float(jnp.abs(ref).std())
    assert float(err.max()) < 0.08 * scale
    assert float(err.mean()) < 0.03 * scale


def test_megakernel_in_kernel_mask_refresh():
    """cutoff=<r> reproduces XLA refresh_mask + forward on a stale list."""
    cfg = ModelConfig(use_layer_norm=True)
    model, variables, pos, idx, mask, feat, bond = _setup(
        cfg, cutoff=5.0, seed=2)
    # Perturb positions so some build-time neighbors leave the true cutoff.
    pos2 = pos + 0.35 * jnp.asarray(
        np.random.RandomState(3).randn(*pos.shape).astype(np.float32))
    pos2 = jnp.mod(pos2, BOX)
    live = refresh_mask(pos2, BOX, 4.2, idx, mask)
    ref = _xla(model, variables, pos2, idx, live, feat, bond)
    mp = pack_params(variables["params"], cfg)
    out = mega_forward(pos2, idx, mask,
                       _h0(variables["params"], cfg, "lj", feat, 64),
                       mp, BOX, 4.2, 0.5, 2.0, tile_n=8, interpret=True)
    err = jnp.abs(out - ref)
    assert float(err.max()) < 0.03 * float(jnp.abs(ref).std())


def test_megakernel_replica_axis():
    """The explicit replica grid dimension matches per-replica calls."""
    cfg = ModelConfig(use_layer_norm=True)
    model, variables, pos, idx, mask, feat, bond = _setup(cfg, seed=4)
    mp = pack_params(variables["params"], cfg)
    h0 = _h0(variables["params"], cfg, "lj", feat, 64)
    pos2 = jnp.mod(pos + 1.7, BOX)
    idx2, mask2, _ = dense_neighbor_list(pos2, BOX, 5.0, 16)
    pos_r = jnp.stack([pos, pos2])
    idx_r = jnp.stack([idx, idx2])
    mask_r = jnp.stack([mask, mask2])
    h0_r = jnp.broadcast_to(h0, (2,) + h0.shape)
    out_r = mega_forward(pos_r, idx_r, mask_r, h0_r, mp, BOX, None,
                         0.5, 2.0, tile_n=8, interpret=True)
    for i, (p, ii, mm) in enumerate([(pos, idx, mask), (pos2, idx2, mask2)]):
        one = mega_forward(p, ii, mm, h0, mp, BOX, None, 0.5, 2.0,
                           tile_n=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out_r[i]), np.asarray(one),
                                   atol=1e-5)


def test_megakernel_denorm_folding():
    """force_std/mean + unit folded into the decoder affine."""
    cfg = ModelConfig(use_layer_norm=True)
    model, variables, pos, idx, mask, feat, bond = _setup(cfg, seed=5)
    params = variables["params"]
    h0 = _h0(params, cfg, "lj", feat, 64)
    base = mega_forward(pos, idx, mask, h0, pack_params(params, cfg),
                        BOX, None, 0.5, 2.0, tile_n=8, interpret=True)
    folded = mega_forward(
        pos, idx, mask, h0,
        pack_params(params, cfg, force_std=3.0, force_mean=0.25, unit=2.0),
        BOX, None, 0.5, 2.0, tile_n=8, interpret=True)
    np.testing.assert_allclose(np.asarray(folded),
                               np.asarray(base * 3.0 * 2.0 + 0.25 * 2.0),
                               rtol=1e-4, atol=2e-3)


def test_simulation_megakernel_short_md():
    """A few fused MD steps through the megakernel force path track the XLA
    path from the same start (same noise stream; bf16 force noise only)."""
    from gamd_tpu.core.config import MDConfig
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    system = get_preset("lj", n_atoms=64, box=BOX, cutoff=4.2,
                        nbr_capacity=16, skin=0.8)
    cfg = ModelConfig(use_layer_norm=True)
    model = build_model(cfg, system)
    state = create_train_state(model, system, TrainConfig(), 1)
    ff = GNNForceField(state, system, cfg)
    md = MDConfig(integrator="langevin", temperature=100.0, dt_fs=2.0,
                  friction_per_ps=25.0, rebuild_every=5)

    rng = np.random.RandomState(8)
    pos = jnp.asarray(rng.uniform(0, BOX, (64, 3)).astype(np.float32))

    sim_x = Simulation(ff.force_fn(), system, md)
    sim_m = Simulation(ff.force_fn(megakernel=True, tile_n=8,
                                   interpret=True), system, md)
    st_x = sim_x.init_state(pos, rng=jax.random.PRNGKey(3))
    st_m = sim_m.init_state(pos, rng=jax.random.PRNGKey(3))
    r_x = sim_x.run(st_x, 5)
    r_m = sim_m.run(st_m, 5)
    np.testing.assert_allclose(np.asarray(r_m.state.pos),
                               np.asarray(r_x.state.pos), atol=5e-3)

    # Batched replicas through the explicit replica grid dimension.
    states = sim_m.init_replicas(pos, 2, rng=jax.random.PRNGKey(4))
    rr = sim_m.run_replicas(states, 5)
    assert rr.state.pos.shape == (2, 64, 3)
    assert rr.thermo.temperature.shape == (2, 5)
    assert bool(jnp.isfinite(rr.state.pos).all())


def test_forcefield_megakernel_closure():
    """GNNForceField.force_fn(megakernel=True) matches the XLA force_fn
    through the Simulation-facing (pos, idx, mask) interface."""
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    system = get_preset("lj", n_atoms=64, box=BOX, cutoff=4.2,
                        nbr_capacity=16, skin=0.8)
    cfg = ModelConfig(use_layer_norm=True)
    model = build_model(cfg, system)
    state = create_train_state(model, system, TrainConfig(), 1)
    ff = GNNForceField(state, system, cfg)

    rng = np.random.RandomState(6)
    pos = jnp.asarray(rng.uniform(0, BOX, (64, 3)).astype(np.float32))
    idx, mask, _ = dense_neighbor_list(pos, BOX,
                                       system.cutoff + system.skin, 16)
    live = refresh_mask(pos, BOX, system.cutoff, idx, mask)
    ref = ff.force_fn()(pos, idx, live)
    fn = ff.force_fn(megakernel=True, tile_n=8, interpret=True)
    assert fn.handles_refresh
    out = fn(pos, idx, mask)     # raw build mask: kernel refreshes itself
    err = jnp.abs(out - ref)
    assert float(err.max()) < 0.08 * float(jnp.abs(ref).std() + 1e-9)


def test_megastep_multi_step_kernel():
    """The in-kernel multi-step BAOAB path (mega_md_steps) matches the XLA
    BAOAB integrator step-for-step when the noise is switched off (c2col=0
    makes BAOAB deterministic; forces from the f32_edges kernel match the
    tanh-gelu XLA oracle to ~1e-4)."""
    from gamd_tpu.md import integrators as integ
    from gamd_tpu.ops.pallas_model import (mega_md_steps, pack_params,
                                           reference_forward)

    n, kcap, cutoff = 64, 16, 4.2
    cfg = ModelConfig(use_layer_norm=True)
    model, variables, pos, idx, mask, feat, bond = _setup(
        cfg, n=n, k=kcap, cutoff=cutoff + 0.8)
    mp = pack_params(variables["params"], cfg)
    h0 = _h0(variables["params"], cfg, "lj", feat, n)

    masses = jnp.full((n,), 39.9, jnp.float32)
    dt, c1, hdt = 0.02, 0.98, 0.01
    c2col = jnp.zeros((n,))
    vel0 = jnp.asarray(
        np.random.RandomState(5).randn(n, 3).astype(np.float32)) * 0.05

    # oracle: XLA BAOAB over the tanh-gelu reference forward (zero noise)
    def force(p):
        return reference_forward(p, idx, mask, h0, mp, BOX, cutoff,
                                 0.5, 2.0)
    init, step = integ.baoab_langevin(force, dt, masses, 100.0,
                                      friction=1.0)
    st = init(pos, vel0, jax.random.PRNGKey(0))
    st = st._replace(vel=vel0)
    zero = jnp.zeros((n, 3))
    for _ in range(3):
        # zero noise + friction folded to match c1 exactly
        v = st.vel + 0.5 * dt * st.force / masses[:, None]
        x = st.pos + 0.5 * dt * v
        v = c1 * v
        x = x + 0.5 * dt * v
        f = force(x)
        v = v + 0.5 * dt * f / masses[:, None]
        st = st._replace(pos=x, vel=v, force=f)

    pos2, vel2, f2, ke = mega_md_steps(
        pos, vel0, force(pos), idx, mask, h0, mp, BOX, cutoff, 0.5, 2.0,
        masses, n_steps=3, c1=c1, hdt=hdt, c2col=c2col, seed=7,
        tile_n=8, interpret=True, f32_edges=True)

    np.testing.assert_allclose(np.asarray(pos2), np.asarray(st.pos),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(vel2), np.asarray(st.vel),
                               atol=2e-4)
    ke_ref = 0.5 * float(jnp.sum(masses[:, None] * st.vel ** 2))
    assert abs(float(ke[-1]) - ke_ref) < 1e-2 * max(ke_ref, 1.0)
    assert ke.shape == (3,)


def test_simulation_megastep_runs():
    """Simulation(megastep_fn=...) advances, reports thermo, and stays
    finite; replica variant carries the batch axis."""
    from gamd_tpu.core.config import MDConfig
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.train.forcefield import GNNForceField
    from gamd_tpu.train.state import build_model, create_train_state

    system = get_preset("lj", n_atoms=64, box=BOX, cutoff=4.2,
                        nbr_capacity=16, skin=0.8)
    cfg = ModelConfig(use_layer_norm=True)
    model = build_model(cfg, system)
    state = create_train_state(model, system, TrainConfig(), 1)
    ff = GNNForceField(state, system, cfg)
    md = MDConfig(integrator="langevin", temperature=100.0, dt_fs=2.0,
                  friction_per_ps=25.0, rebuild_every=5)

    rng = np.random.RandomState(8)
    pos = jnp.asarray(rng.uniform(0, BOX, (64, 3)).astype(np.float32))

    sim = Simulation(ff.force_fn(megakernel=True, tile_n=8, interpret=True),
                     system, md,
                     megastep_fn=ff.megastep_fn(tile_n=8, interpret=True))
    st = sim.init_state(pos, rng=jax.random.PRNGKey(3))
    r = sim.run(st, 12)
    assert r.thermo.temperature.shape == (12,)
    assert bool(jnp.isfinite(r.state.pos).all())
    assert bool(jnp.isfinite(r.thermo.temperature).all())
    assert float(r.thermo.temperature.min()) > 0.0

    states = sim.init_replicas(pos, 2, rng=jax.random.PRNGKey(4))
    rr = sim.run_replicas(states, 10)
    assert rr.state.pos.shape == (2, 64, 3)
    assert rr.thermo.temperature.shape == (2, 10)
    assert bool(jnp.isfinite(rr.state.pos).all())


def test_megakernel_edge_hilo_tightens_water_parity():
    """edge_hilo (fp32-exact edge stream, the round-5 water-deployment
    default) must cut the bf16 parity error vs the XLA oracle relative to
    the single-bf16 stream on the same inputs."""
    cfg = ModelConfig(use_layer_norm=True)
    model, variables, pos, idx, mask, feat, bond = _setup(
        cfg, species="water", n=66, k=16, seed=1, use_bond=True)
    ref = _xla(model, variables, pos, idx, mask, feat, bond)
    mp = pack_params(variables["params"], cfg)
    h0 = _h0(variables["params"], cfg, "water", feat, 66)
    out_1 = mega_forward(pos, idx, mask, h0, mp, BOX, None, 0.5, 2.0,
                         bond=bond, use_ln=True, tile_n=8, interpret=True,
                         edge_hilo=False)
    out_2 = mega_forward(pos, idx, mask, h0, mp, BOX, None, 0.5, 2.0,
                         bond=bond, use_ln=True, tile_n=8, interpret=True,
                         edge_hilo=True)
    e1 = float(jnp.abs(out_1 - ref).mean())
    e2 = float(jnp.abs(out_2 - ref).mean())
    scale = float(jnp.abs(ref).std())
    assert e2 < e1, (e1, e2)
    assert e2 < 0.015 * scale


def test_edge_hilo_vmem_size_guard():
    """Shapes whose lo-residual scratch exceeds the VMEM cap must fall back
    to the single-bf16 stream instead of failing scoped-VMEM assignment at
    compile time (water-774 K=84 measured at 137.44 MB scoped,
    results/water_rollout_mk_hilo_r5d.log)."""
    import warnings

    from gamd_tpu.ops import pallas_model as pm

    # LJ-258 megastep shape (rows 384*48): residual 4.7 MB -> stays on.
    assert pm._resolve_edge_hilo(True, 384 * 48, 128) is True
    # water-774 full K=84 slice (rows 896*84): 19.3 MB -> guarded off.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert pm._resolve_edge_hilo(True, 896 * 84, 128) is False
    # water-774 at k_model=64 (rows 896*64): 14.7 MB -> fits, stays on.
    assert pm._resolve_edge_hilo(True, 896 * 64, 128) is True
    # caller default off is never force-enabled by the guard.
    assert pm._resolve_edge_hilo(False, 384 * 48, 128) is False
