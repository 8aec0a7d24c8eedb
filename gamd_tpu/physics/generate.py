"""Ground-truth dataset generation with the classical LJ potential.

First-party replacement for the reference's OpenMM-based generator
(reference: /root/reference/dataset/generate_lj_data.py): per seed, randomly
rotate + jitter the initial configuration, minimize, thermalize with a
Nose-Hoover chain (chain 10, n_c 5, n_ys 5, T = 100 K, friction 25/ps,
dt 2 fs), then record 1000 frames spaced 50 steps apart. Frames are written
in the exact reference layout: data_{seed}_{t}.npz with keys pos (angstrom),
vel (m/s), forces (kJ/mol/nm) (generate_lj_data.py:93-106).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import space, units
from gamd_tpu.core.config import MDConfig, get_preset
from gamd_tpu.md.simulate import Simulation
from gamd_tpu.physics import lennard_jones as lj
from gamd_tpu.physics.minimize import fire_minimize


def random_rotation_matrix(rng: np.random.RandomState):
    """Uniform-ish random rotation from three Euler angles in [-pi, pi]
    (reference: generate_lj_data.py:23-44)."""
    angles = rng.uniform(-1.0, 1.0, size=(3,)) * np.pi
    cx, sx = np.cos(angles[0]), np.sin(angles[0])
    cy, sy = np.cos(angles[1]), np.sin(angles[1])
    cz, sz = np.cos(angles[2]), np.sin(angles[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float32)
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float32)
    return rz @ ry @ rx


def generate_lj_dataset(out_dir, seeds=10, frames_per_seed=1000,
                        record_interval=50, n_particles=258,
                        minimize_steps=2000, log_every_frames=100,
                        params: lj.LJParams = lj.LJParams()):
    """Generate the LJ training set; returns the output directory."""
    os.makedirs(out_dir, exist_ok=True)
    system = get_preset("lj")
    box, lattice = lj.lj_fluid_box(n_particles, 0.5, params)
    md = MDConfig(integrator="nose_hoover", temperature=system.temperature,
                  dt_fs=system.dt_fs, friction_per_ps=system.friction_per_ps,
                  chain_length=10, chain_mts=5, chain_ys=5,
                  rebuild_every=10)

    force_fn = lj.lj_force_fn(box, params)
    sim = Simulation(force_fn, system, md)
    dense_force = jax.jit(lambda p: lj.lj_forces_dense(p, box, params))

    for seed in range(seeds):
        host_rng = np.random.RandomState(seed)
        # Rotate + jitter the lattice (generate_lj_data.py:59-65).
        r_mat = random_rotation_matrix(host_rng)
        pos = lattice - lattice.mean(axis=0)
        pos = pos @ r_mat + lattice.mean(axis=0)
        pos = pos + host_rng.randn(*pos.shape).astype(np.float32) * 0.005
        pos = np.asarray(space.wrap(jnp.asarray(pos), box))

        # Minimize with the classical potential.
        pos, _ = fire_minimize(dense_force, jnp.asarray(pos),
                               n_steps=minimize_steps)

        state = sim.init_state(pos, rng=jax.random.PRNGKey(1000 + seed))
        for t in range(frames_per_seed):
            p = np.ascontiguousarray(
                np.asarray(space.wrap(state.pos, box), np.float32))
            f = np.ascontiguousarray(
                np.asarray(dense_force(jnp.asarray(p)), np.float32))
            v = np.ascontiguousarray(np.asarray(state.vel, np.float32))
            np.savez(os.path.join(out_dir, f"data_{seed}_{t}.npz"),
                     pos=p,
                     vel=v / units.M_PER_S_TO_INTERNAL,
                     forces=f / units.KJ_MOL_NM_TO_INTERNAL)
            result = sim.run(state, record_interval)
            state = result.state
            if bool(result.overflow):
                raise RuntimeError(
                    "neighbor capacity overflow during generation; "
                    "increase SystemConfig.nbr_capacity")
            if (t + 1) % log_every_frames == 0:
                temp = float(result.thermo.temperature[-1])
                print(f"seed {seed}: frame {t + 1}/{frames_per_seed} "
                      f"T={temp:.1f}K", flush=True)
    return out_dir


def generate_water_dataset(out_dir, seeds=10, frames_per_seed=1000,
                           record_interval=50, n_molecules=258,
                           minimize_steps=3000, dt_fs=0.5,
                           log_every_frames=100):
    """TIP3P water ground truth in the reference layout
    (reference: /root/reference/dataset/generate_tip3p_data.py: WaterBox
    2 nm, T = 300 K, friction 1/ps, NHC chain 10/5/5, 1000 frames x 50
    steps). Flexible-TIP3P forces (see gamd_tpu.physics.water), so the
    timestep defaults to 0.5 fs instead of the rigid reference's 2 fs.
    """
    from gamd_tpu.physics import water as w

    os.makedirs(out_dir, exist_ok=True)
    system = get_preset("tip3p", n_atoms=3 * n_molecules)
    params = w.TIP3PParams()
    box = system.box
    md = MDConfig(integrator="nose_hoover", temperature=300.0, dt_fs=dt_fs,
                  friction_per_ps=1.0, chain_length=10, chain_mts=5,
                  chain_ys=5, rebuild_every=10)
    force_fn = w.tip3p_force_fn(box, params)
    sim = Simulation(force_fn, system, md)
    dense_force = jax.jit(lambda p: w.tip3p_forces(p, box, params))

    for seed in range(seeds):
        pos = w.water_box(n_molecules, box, params, seed=seed)
        pos, _ = fire_minimize(dense_force, jnp.asarray(pos),
                               n_steps=minimize_steps, max_step=0.05)
        state = sim.init_state(pos, rng=jax.random.PRNGKey(2000 + seed))
        for t in range(frames_per_seed):
            p = np.ascontiguousarray(
                np.asarray(space.wrap(state.pos, box), np.float32))
            f = np.ascontiguousarray(
                np.asarray(dense_force(jnp.asarray(p)), np.float32))
            v = np.ascontiguousarray(np.asarray(state.vel, np.float32))
            np.savez(os.path.join(out_dir, f"data_{seed}_{t}.npz"),
                     pos=p,
                     vel=v / units.M_PER_S_TO_INTERNAL,
                     forces=f / units.KJ_MOL_NM_TO_INTERNAL)
            result = sim.run(state, record_interval)
            state = result.state
            if bool(result.overflow):
                raise RuntimeError("neighbor capacity overflow; "
                                   "increase SystemConfig.nbr_capacity")
            if (t + 1) % log_every_frames == 0:
                temp = float(result.thermo.temperature[-1])
                print(f"seed {seed}: frame {t + 1}/{frames_per_seed} "
                      f"T={temp:.1f}K", flush=True)
    return out_dir


def generate_tip4p_dataset(out_dir, seeds=10, frames_per_seed=1000,
                           record_interval=50, n_molecules=251,
                           minimize_steps=3000, dt_fs=0.5,
                           log_every_frames=100):
    """TIP4P-Ew ground truth in the reference's 4-site frame layout
    (reference: /root/reference/dataset/generate_tip4p_data.py: WaterBox
    model='tip4pew', 251 molecules). Frames store O,H,H,M rows per molecule;
    the training loader drops the M rows (train_utils.py:58-64)."""
    from gamd_tpu.physics import water as w

    os.makedirs(out_dir, exist_ok=True)
    system = get_preset("tip4p", n_atoms=3 * n_molecules)
    params = w.TIP4PEwParams()
    box = system.box
    md = MDConfig(integrator="nose_hoover", temperature=300.0, dt_fs=dt_fs,
                  friction_per_ps=1.0, chain_length=10, chain_mts=5,
                  chain_ys=5, rebuild_every=10)
    force_fn = w.tip4pew_force_fn(box, params)
    sim = Simulation(force_fn, system, md)
    dense_force = jax.jit(lambda p: w.tip4pew_forces(p, box, params))

    for seed in range(seeds):
        pos = w.water_box(n_molecules, box,
                          w.TIP3PParams(r_oh=params.r_oh,
                                        theta0=params.theta0), seed=seed)
        pos, _ = fire_minimize(dense_force, jnp.asarray(pos),
                               n_steps=minimize_steps, max_step=0.05)
        state = sim.init_state(pos, rng=jax.random.PRNGKey(3000 + seed))
        for t in range(frames_per_seed):
            p = np.ascontiguousarray(
                np.asarray(space.wrap(state.pos, box), np.float32))
            f = np.ascontiguousarray(
                np.asarray(dense_force(jnp.asarray(p)), np.float32))
            v = np.ascontiguousarray(np.asarray(state.vel, np.float32))
            pos4, f4 = w.expand_with_m_sites(
                p, f / units.KJ_MOL_NM_TO_INTERNAL, box, params)
            vel4, _ = w.expand_with_m_sites(
                v / units.M_PER_S_TO_INTERNAL, np.zeros_like(v), box, params)
            np.savez(os.path.join(out_dir, f"data_{seed}_{t}.npz"),
                     pos=pos4, vel=vel4, forces=f4)
            result = sim.run(state, record_interval)
            state = result.state
            if bool(result.overflow):
                raise RuntimeError("neighbor capacity overflow; "
                                   "increase SystemConfig.nbr_capacity")
            if (t + 1) % log_every_frames == 0:
                temp = float(result.thermo.temperature[-1])
                print(f"seed {seed}: frame {t + 1}/{frames_per_seed} "
                      f"T={temp:.1f}K", flush=True)
    return out_dir
