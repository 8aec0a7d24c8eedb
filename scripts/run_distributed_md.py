#!/usr/bin/env python
"""Distributed GNN-driven MD over a device mesh (slab decomposition).

The multi-chip deployment surface: loads a trained (self-describing)
checkpoint, tiles the system to --n_atoms, slab-sorts it over the mesh,
and runs halo-exchange GNN-MD (parallel/halo_gnn.py) with atom-migration
re-sorts every --chunk_steps.

Layouts (see parallel/halo_gnn.py):
  default         layer-wise feature halo (narrow slabs / small boxes)
  --wide          one position exchange per force eval (wide slabs)
  --wide --banded wide-halo + in-slab banded gather kernel (large N)
Integrators: langevin (default) or nose_hoover (one global chain over
psum'd KE). Water systems run RIGID by default (molecule-grouped slab
sort + per-slab SETTLE).

On a single-chip/CPU host, pass --cpu_devices K to build a virtual
K-device mesh (sets XLA_FLAGS before jax imports); on real multi-chip
hardware the mesh uses jax.devices() as-is.

reference: no counterpart — the reference's rollouts are single-GPU
(SURVEY §2.3); this is the TPU-first scaling path.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--system", default="lj", choices=["lj", "tip3p"])
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--n_atoms", type=int, default=None,
                        help="tile the trained system to this many atoms "
                             "(default: 8x the checkpoint's system)")
    parser.add_argument("--slabs", type=int, default=None,
                        help="slab count (default: all devices)")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--chunk_steps", type=int, default=20,
                        help="steps between atom-migration re-sorts")
    parser.add_argument("--integrator", default="langevin",
                        choices=["langevin", "nose_hoover"])
    parser.add_argument("--friction", type=float, default=25.0)
    parser.add_argument("--temperature", type=float, default=None)
    parser.add_argument("--dt", type=float, default=2.0, help="fs")
    parser.add_argument("--wide", action="store_true",
                        help="wide-halo layout (one exchange per eval)")
    parser.add_argument("--banded", action="store_true",
                        help="banded in-slab gathers (requires --wide)")
    parser.add_argument("--no-rigid", dest="rigid", action="store_false",
                        help="water: unconstrained instead of SETTLE")
    parser.add_argument("--cpu_devices", type=int, default=0,
                        help="virtual CPU mesh size (testing without "
                             "multi-chip hardware)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from gamd_tpu.core import units
    from gamd_tpu.core.config import get_preset
    from gamd_tpu.ops.pallas_model import pack_params
    from gamd_tpu.parallel.halo_gnn import (make_halo_gnn_md,
                                            run_halo_gnn_md,
                                            wide_halo_width)
    from gamd_tpu.parallel.mesh import make_mesh
    from gamd_tpu.train.checkpoint import load_self_describing
    from gamd_tpu.train.forcefield import GNNForceField

    state, model_cfg, system = load_self_describing(
        args.ckpt, fallback_system=get_preset(args.system))
    n_slabs = args.slabs or len(jax.devices())
    water = system.species == "water"      # from the checkpoint envelope

    group = 3 if water else 1
    n_atoms = args.n_atoms or 8 * system.n_atoms
    n_atoms -= n_atoms % group

    # Tile the trained box into a supercell of >= n_atoms along x/y/z.
    reps = int(np.ceil((n_atoms / system.n_atoms) ** (1 / 3)))
    box = float(system.box) * reps
    ff = GNNForceField(state, system, model_cfg)

    # Constrained distributed MD is langevin-only (the global-chain NHC
    # has no projection hooks yet).
    if water and args.rigid and args.integrator == "nose_hoover":
        parser.error("distributed nose_hoover is unconstrained-only: "
                     "pass --no-rigid (or use langevin for rigid water)")

    rng = np.random.RandomState(args.seed)
    if water:
        from gamd_tpu.md.constraints import RigidWater
        from gamd_tpu.physics import water as w
        n_mol = n_atoms // 3
        pos = w.water_box(n_mol, box, seed=args.seed)
        masses = jnp.asarray(
            np.where(np.arange(n_atoms) % 3 == 0, 15.9994, 1.008)
            .astype(np.float32))
        pos = RigidWater(n_mol, box).project_initial(jnp.asarray(pos))
    else:
        from gamd_tpu.physics import lennard_jones as lj
        _, cell = lj.lj_fluid_box(system.n_atoms, 0.5)
        offs = np.stack(np.meshgrid(*[np.arange(reps)] * 3),
                        -1).reshape(-1, 3) * float(system.box)
        pos = (np.asarray(cell)[None] + offs[:, None]).reshape(-1, 3)
        pos = jnp.asarray(pos[:n_atoms], jnp.float32)
        masses = None

    temp = args.temperature or system.temperature
    sigma = jnp.sqrt(units.KB * temp / (
        masses if masses is not None
        else jnp.full((n_atoms,), float(lj.ARGON_MASS))))[:, None]
    vel = sigma * jnp.asarray(rng.randn(n_atoms, 3).astype(np.float32))

    # Packed weights with the force scaler + unit folded into the decoder.
    mp = pack_params(
        state.params, model_cfg, batch_stats=ff.batch_stats,
        force_std=jnp.maximum(ff.force_stat.std, 1e-12),
        force_mean=ff.force_stat.safe_mean,
        unit=system.force_unit_to_internal)
    length_mean = ff.length_stat.safe_mean
    length_std = jnp.maximum(ff.length_stat.std, 1e-12)

    halo = (wide_halo_width(mp, system.cutoff, system.skin) if args.wide
            else system.cutoff + system.skin) + (1.0 if water else 0.0)
    # Slabs must be at least a halo wide (2x for 2-slab meshes). A mesh
    # over a SUBSET of devices deadlocks CPU-backend collectives, so do
    # not silently shrink the slab count — tell the user the feasible
    # geometry instead.
    n_fit = max(int(box // halo), 1)
    if n_fit == 2 and box / 2 < 2 * halo:
        n_fit = 1
    if box / n_slabs < halo or (n_slabs == 2 and box / 2 < 2 * halo):
        parser.error(
            f"box {box:.1f} A / {n_slabs} slabs = {box / n_slabs:.1f} A "
            f"per slab < halo {halo:.1f} A. Feasible: at most {n_fit} "
            f"slabs — rerun with --slabs {n_fit} and matching device "
            f"count (--cpu_devices {n_fit} for virtual meshes), or raise "
            f"--n_atoms.")
    cap = int(np.ceil(1.5 * n_atoms / n_slabs / 24)) * 24   # /3 and /8
    hs = int(np.ceil(cap * min(1.0, 1.5 * halo / (box / n_slabs))))

    extras = {"aid": jnp.arange(n_atoms, dtype=jnp.int32)}
    kw = {}
    if water:
        onehot = (np.arange(n_atoms) % 3 == 0).astype(np.float32)[:, None]
        enc = state.params["node_encoder"]
        extras["h0"] = jnp.asarray(onehot) @ enc["kernel"] + enc["bias"]
        extras["mass"] = masses
        kw.update(use_bond=True, per_atom_h0=True, per_atom_mass=True,
                  masses_scalar=0.0)
        if args.rigid:
            from gamd_tpu.md.constraints import RigidWater as RW
            kw["constraint"] = RW(cap // 3, box)
        h0_row = None
    else:
        h0_row = state.params["node_emb"][0]
        kw["masses_scalar"] = float(lj.ARGON_MASS)
    if args.integrator == "nose_hoover":
        kw.update(integrator="nose_hoover", ndf=3 * n_atoms)

    mesh = make_mesh(n_slabs)
    chunk_fn = make_halo_gnn_md(
        mesh, mp, box, n_slabs, system.cutoff, system.skin,
        system.nbr_capacity, h0_row, length_mean, length_std,
        temperature=temp, dt_fs=args.dt, friction_per_ps=args.friction,
        flip_dir=model_cfg.flip_dir, use_ln=model_cfg.use_layer_norm,
        conv_act=model_cfg.conv_activation,
        mlp_act=model_cfg.mlp_activation, rbf_gap=model_cfg.rbf_gap,
        wide=args.wide, banded=args.banded,
        interpret=bool(args.cpu_devices), **kw)

    print(f"{n_atoms} atoms, box {box:.1f} A, {n_slabs} slabs "
          f"(cap {cap}, strip {hs}, halo {halo:.1f} A, "
          f"{'wide' if args.wide else 'layer-wise'}"
          f"{'+banded' if args.banded else ''}, {args.integrator}"
          f"{', rigid' if water and args.rigid else ''})")
    t0 = time.perf_counter()
    st, ovf = run_halo_gnn_md(
        mesh, chunk_fn, pos, vel, box, n_slabs, cap, hs, halo,
        args.steps, args.chunk_steps, jax.random.PRNGKey(args.seed),
        extras=extras, group_size=group)
    wall = time.perf_counter() - t0
    n_valid = int(st.valid.sum())
    p = np.asarray(st.pos)[np.asarray(st.valid)]
    assert np.isfinite(p).all(), "non-finite positions (overflow poison?)"
    m_col = (np.asarray(st.aux["mass"])[np.asarray(st.valid)]
             if water else float(lj.ARGON_MASS))
    v = np.asarray(st.vel)[np.asarray(st.valid)]
    ke = 0.5 * float(np.sum(m_col * (v * v).sum(-1))) if water else \
        0.5 * float(lj.ARGON_MASS) * float((v * v).sum())
    ndf_rep = (2 * n_valid if (water and args.rigid) else 3 * n_valid)
    t_inst = 2.0 * ke / (ndf_rep * units.KB)
    print(f"{args.steps} steps in {wall:.2f} s "
          f"({args.steps / wall:.1f} steps/s, "
          f"{args.steps * n_atoms / wall:.0f} atom-steps/s, incl. compile)")
    print(f"atoms accounted: {n_valid}/{n_atoms}  overflow: {bool(ovf)}  "
          f"T: {t_inst:.1f} K (target {temp})")


if __name__ == "__main__":
    main()
