#!/usr/bin/env python
"""Bisect the TPU-only NVE energy drift in rigid water (round-2 finding:
+8.6 kJ/mol/ps at 258 molecules on the TPU backend, flat on CPU, with all
constraint matmuls already at HIGHEST precision).

Runs a rigid TIP3P NVE ladder on the current backend and prints per-leg
total-energy drift so CPU/TPU runs can be diffed:

  legs: constraint method {shake, settle} x system size {27, 258} molecules,
        plus a force-only microprobe (same positions, force evaluated on
        backend vs a float64 CPU oracle) to separate force error from
        integrator/constraint error.

Usage:
  python scripts/nve_drift_probe.py            # current backend (TPU here)
  python scripts/nve_drift_probe.py --cpu      # CPU reference
  python scripts/nve_drift_probe.py --steps 4000 --sizes 27 258
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--dt", type=float, default=2.0)
    ap.add_argument("--sizes", type=int, nargs="*", default=[27, 258])
    ap.add_argument("--methods", nargs="*", default=["shake", "settle"])
    ap.add_argument("--force_probe", action="store_true",
                    help="also diff on-backend forces vs f64 CPU oracle")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from gamd_tpu.core.config import MDConfig, get_preset
    from gamd_tpu.md import integrators as integ
    from gamd_tpu.md.constraints import RigidWater, tip3p_rigid_params
    from gamd_tpu.md.simulate import Simulation
    from gamd_tpu.physics import water as w
    from gamd_tpu.physics.minimize import fire_minimize

    print(f"backend: {jax.devices()[0].platform}")

    for n_mol in args.sizes:
        # Density-consistent box (258 molecules in 20 A per the preset).
        box = 20.0 * (n_mol / 258.0) ** (1.0 / 3.0)
        cutoff = min(4.2, box / 2 - 0.01)
        system = get_preset("tip3p", n_atoms=3 * n_mol, box=box,
                            cutoff=cutoff, nbr_capacity=96)
        params = w.TIP3PParams(cutoff=cutoff)
        masses = jnp.asarray(system.atom_masses())

        pos = w.water_box(n_mol, box, params, seed=1)
        pos, _ = fire_minimize(
            jax.jit(lambda p: w.tip3p_forces(p, box, params)),
            jnp.asarray(pos), n_steps=800, max_step=0.05)

        for method in args.methods:
            constraint = RigidWater(n_mol, box,
                                    tip3p_rigid_params(params.r_oh,
                                                       params.theta0),
                                    method=method)
            p0 = constraint.project_initial(pos)

            # Thermalize at 300 K with Langevin, then measure NVE drift.
            md0 = MDConfig(integrator="langevin", temperature=300.0,
                           dt_fs=1.0, friction_per_ps=5.0, rebuild_every=10)
            sim0 = Simulation(w.tip3p_force_fn(box, params, rigid=True),
                              system, md0, constraint=constraint)
            st0 = sim0.init_state(p0, rng=jax.random.PRNGKey(2))
            r0 = sim0.run(st0, 1000)

            md = MDConfig(integrator="nve", dt_fs=args.dt, rebuild_every=10)
            sim = Simulation(w.tip3p_force_fn(box, params, rigid=True),
                             system, md, constraint=constraint)
            st = sim.init_state(r0.state.pos, vel=r0.state.vel)

            def etot(s):
                return (float(integ.kinetic_energy(s.vel, masses))
                        + float(w.tip3p_energy_rigid(jnp.mod(s.pos, box),
                                                     box, params)))

            e0 = etot(st)
            t0 = time.perf_counter()
            r = sim.run(st, args.steps)
            jax.block_until_ready(r.state.pos)
            wall = time.perf_counter() - t0
            e1 = etot(r.state)
            ps = args.steps * args.dt / 1000.0
            res = float(constraint.residual(r.state.pos))
            print(f"n_mol={n_mol:4d} method={method:7s} "
                  f"dE={e1 - e0:+10.3f} kJ/mol over {ps:.1f} ps "
                  f"({(e1 - e0) / ps:+8.3f} kJ/mol/ps)  "
                  f"residual={res:.2e} A  wall={wall:.1f}s")

        if args.force_probe:
            # Force error vs f64: needs a separate x64 process for a true
            # oracle; here diff f32 backend force vs itself on CPU via
            # jax.jit backend transfer is not available — print rms force
            # for cross-process comparison instead.
            f = w.tip3p_forces_rigid(jnp.mod(pos, box), box, params)
            print(f"n_mol={n_mol:4d} force rms={float(jnp.std(f)):.6f} "
                  f"mean_abs={float(jnp.mean(jnp.abs(f))):.6f} kJ/mol/A")


if __name__ == "__main__":
    main()
