"""Ground-truth dataset generation (classical potentials, on-device).

First-party replacement for the reference's OpenMM-based generators
(reference: /root/reference/dataset/generate_lj_data.py,
generate_tip3p_data.py, generate_tip4p_data.py): per seed, prepare an
initial configuration, minimize, then thermalize with a Nose-Hoover chain
and record frames in the exact reference layout (data_{seed}_{t}.npz with
keys pos [angstrom], vel [m/s], forces [kJ/mol/nm]).

TPU-first structure: frames are recorded INSIDE the device program
(Simulation.run_recorded — an outer lax.scan emits (pos, vel, force) every
`record_interval` steps), so a 250-frame block is ONE dispatch instead of
250 host round trips. Round 1 measured ~7 s/frame for water with the
per-frame host loop; the scan path generates at MD speed.

Water is RIGID (SETTLE constraints, dt = 2 fs), matching the reference's
constrained OpenMM WaterBox (generate_tip3p_data.py:55-78): recorded forces
are nonbonded-only, exactly like OpenMM's getForces on rigid TIP3P/TIP4P-Ew.
Pass rigid=False for the round-1 flexible variant (dt 0.5 fs).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import space, units
from gamd_tpu.core.config import MDConfig, get_preset
from gamd_tpu.md.constraints import RigidWater, tip3p_rigid_params
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


def _record_seeds_batched(sim: Simulation, states, out_dir: str, seeds,
                          frames_per_seed: int, record_interval: int,
                          record_force, frames_per_dispatch: int,
                          log_every_frames: int, postprocess=None):
    """Advance ALL seeds' trajectories in lockstep: one vmapped device
    program per frame block. A few hundred atoms nowhere near fills a TPU
    core, so R independent seeds cost ~the wall time of one — measured
    ~10x over the sequential path for the 774-atom water sets.

    `states` is a stacked integrator state (leading seed axis on every
    leaf); `record_force` maps [N,3]->[N,3] and is vmapped here.
    """
    n_seeds = len(seeds)
    key = ("recorded-batch", frames_per_dispatch, record_interval,
           id(record_force), n_seeds)
    if key not in sim._run_cache:
        # vmap over the whole single-seed runner: record_force and the
        # neighbor build get batched implicitly.
        single = sim._make_run_recorded(frames_per_dispatch, record_interval,
                                        record_force)
        sim._run_cache[key] = jax.jit(jax.vmap(single))
    run = sim._run_cache[key]

    t = 0
    while t < frames_per_seed:
        n_f = min(frames_per_dispatch, frames_per_seed - t)
        if n_f != frames_per_dispatch:
            runner = jax.jit(jax.vmap(sim._make_run_recorded(
                n_f, record_interval, record_force)))
        else:
            runner = run
        states, ovf, pos_f, vel_f, force_f, temp = runner(states)
        if bool(jnp.any(ovf)):
            raise RuntimeError(
                "neighbor capacity overflow during generation; "
                "increase SystemConfig.nbr_capacity")
        # [R, F, N, 3] batches -> per-seed per-frame npz files.
        pos_np = np.asarray(pos_f, np.float32)
        vel_np = np.asarray(vel_f, np.float32) / units.M_PER_S_TO_INTERNAL
        force_np = (np.asarray(force_f, np.float32)
                    / units.KJ_MOL_NM_TO_INTERNAL)
        for s_i, seed in enumerate(seeds):
            for i in range(n_f):
                p, v, f = pos_np[s_i, i], vel_np[s_i, i], force_np[s_i, i]
                if postprocess is not None:
                    p, v, f = postprocess(p, v, f)
                np.savez(os.path.join(out_dir, f"data_{seed}_{t + i}.npz"),
                         pos=np.ascontiguousarray(p),
                         vel=np.ascontiguousarray(v),
                         forces=np.ascontiguousarray(f))
        t += n_f
        if log_every_frames:
            temps = " ".join(f"{float(temp[s, -1]):.0f}"
                             for s in range(n_seeds))
            print(f"frames {t}/{frames_per_seed} x {n_seeds} seeds "
                  f"T=[{temps}]K", flush=True)
    return states


def _stack_states(states_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states_list)


def _record_seed(sim: Simulation, state, out_dir: str, seed: int,
                 frames_per_seed: int, record_interval: int, record_force,
                 frames_per_dispatch: int, log_every_frames: int,
                 postprocess=None):
    """Advance + record one seed's trajectory in device-program blocks and
    write the per-frame npz files on the host."""
    t = 0
    while t < frames_per_seed:
        n_f = min(frames_per_dispatch, frames_per_seed - t)
        state, ovf, pos_f, vel_f, force_f, temp = sim.run_recorded(
            state, n_f, record_interval, record_force)
        if bool(ovf):
            raise RuntimeError(
                "neighbor capacity overflow during generation; "
                "increase SystemConfig.nbr_capacity")
        pos_np = np.asarray(pos_f, np.float32)
        vel_np = np.asarray(vel_f, np.float32) / units.M_PER_S_TO_INTERNAL
        force_np = (np.asarray(force_f, np.float32)
                    / units.KJ_MOL_NM_TO_INTERNAL)
        for i in range(n_f):
            p, v, f = pos_np[i], vel_np[i], force_np[i]
            if postprocess is not None:
                p, v, f = postprocess(p, v, f)
            np.savez(os.path.join(out_dir, f"data_{seed}_{t + i}.npz"),
                     pos=np.ascontiguousarray(p),
                     vel=np.ascontiguousarray(v),
                     forces=np.ascontiguousarray(f))
        t += n_f
        if log_every_frames:
            print(f"seed {seed}: frame {t}/{frames_per_seed} "
                  f"T={float(temp[-1]):.1f}K", flush=True)
    return state


def generate_lj_dataset(out_dir, seeds=10, frames_per_seed=1000,
                        record_interval=50, n_particles=258,
                        minimize_steps=2000, log_every_frames=250,
                        frames_per_dispatch=250,
                        params: lj.LJParams = lj.LJParams(),
                        seed_start=0, temperature=None):
    """Generate the LJ training set; returns the output directory
    (reference protocol: generate_lj_data.py:56-106 — rotate + jitter the
    lattice, minimize, NHC 10/5/5 at 100 K, 1000 frames x 50 steps)."""
    os.makedirs(out_dir, exist_ok=True)
    # temperature override: extra training seeds can be generated hotter
    # than the canonical 100 K protocol to cover the repulsive core that
    # Boltzmann sampling at 100 K rarely reaches (the r4 pair-bias
    # analysis pins the LJ rollout over-structure partly on a softened
    # learned core below r ~ 3.2 A, results/pair_bias_r3e_r4f.json).
    system = (get_preset("lj") if temperature is None
              else get_preset("lj", temperature=float(temperature)))
    box, lattice = lj.lj_fluid_box(n_particles, 0.5, params)
    md = MDConfig(integrator="nose_hoover", temperature=system.temperature,
                  dt_fs=system.dt_fs, friction_per_ps=system.friction_per_ps,
                  chain_length=10, chain_mts=5, chain_ys=5,
                  rebuild_every=10)

    force_fn = lj.lj_force_fn(box, params)
    sim = Simulation(force_fn, system, md)
    dense_force = jax.jit(lambda p: lj.lj_forces_dense(p, box, params))

    for seed in range(seed_start, seed_start + seeds):
        host_rng = np.random.RandomState(seed)
        # Rotate + jitter the lattice (generate_lj_data.py:59-65).
        r_mat = random_rotation_matrix(host_rng)
        pos = lattice - lattice.mean(axis=0)
        pos = pos @ r_mat + lattice.mean(axis=0)
        pos = pos + host_rng.randn(*pos.shape).astype(np.float32) * 0.005
        pos = np.asarray(space.wrap(jnp.asarray(pos), box))

        pos, _ = fire_minimize(dense_force, jnp.asarray(pos),
                               n_steps=minimize_steps)
        state = sim.init_state(pos, rng=jax.random.PRNGKey(1000 + seed))
        _record_seed(sim, state, out_dir, seed, frames_per_seed,
                     record_interval, dense_force, frames_per_dispatch,
                     log_every_frames)
    return out_dir


def generate_water_dataset(out_dir, seeds=10, frames_per_seed=1000,
                           record_interval=50, n_molecules=258,
                           minimize_steps=3000, dt_fs=None, rigid=True,
                           log_every_frames=250, frames_per_dispatch=250,
                           electrostatics="ewald", seed_start=0):
    """TIP3P water ground truth in the reference layout
    (reference: /root/reference/dataset/generate_tip3p_data.py: WaterBox
    2 nm, T = 300 K, friction 1/ps, NHC chain 10/5/5, 1000 frames x 50
    steps, RIGID water at dt = 2 fs). rigid=True reproduces that protocol
    with SETTLE constraints; rigid=False is the flexible variant
    (dt 0.5 fs). electrostatics="ewald" (default) matches the reference's
    PME WaterBox protocol via the first-party full Ewald sum
    (physics/ewald.py); "dsf" keeps the rounds-1-3 damped-shifted-force
    truncated potential."""
    from gamd_tpu.physics import ewald as _ewald
    from gamd_tpu.physics import water as w

    os.makedirs(out_dir, exist_ok=True)
    if dt_fs is None:
        dt_fs = 2.0 if rigid else 0.5
    system = get_preset("tip3p", n_atoms=3 * n_molecules)
    params = w.TIP3PParams()
    box = system.box
    constraint = RigidWater(n_molecules, box,
                            tip3p_rigid_params(params.r_oh,
                                               params.theta0)) if rigid \
        else None
    # BAOAB Langevin for generation: samples the same NVT ensemble as the
    # reference's NHC, and its strong local coupling pins the temperature
    # against the residual f32 integration drift measured on TPU for rigid
    # water (NVE: +8.6 kJ/mol/ps at 258 molecules -> steady-state offset
    # under gamma = 2/ps is < 1 K; the weakly-coupled NHC 1/ps let it run
    # away). Ensemble-equivalent protocol deviation, noted in RESULTS.md.
    md = MDConfig(integrator="langevin", temperature=300.0, dt_fs=dt_fs,
                  friction_per_ps=2.0, rebuild_every=10)
    force_fn = w.tip3p_force_fn(box, params, rigid=rigid,
                                electrostatics=electrostatics)
    sim = Simulation(force_fn, system, md, constraint=constraint)
    if electrostatics == "ewald":
        ew = _ewald.make_ewald_params(box)
        rec_energy = (w.tip3p_energy_rigid_ewald if rigid
                      else w.tip3p_energy_ewald)
        record_force = jax.jit(
            lambda p: -jax.grad(rec_energy)(p, box, ew, params))
        minimize_force = jax.jit(
            lambda p: -jax.grad(w.tip3p_energy_ewald)(p, box, ew, params))
    else:
        fwd = w.tip3p_forces_rigid if rigid else w.tip3p_forces
        record_force = jax.jit(lambda p: fwd(p, box, params))
        # Minimize with the FLEXIBLE potential (the rigid one has no
        # intramolecular restoring force), then snap onto the constraints.
        minimize_force = jax.jit(lambda p: w.tip3p_forces(p, box, params))

    states = []
    for seed in range(seed_start, seed_start + seeds):
        pos = w.water_box(n_molecules, box, params, seed=seed)
        pos, _ = fire_minimize(minimize_force, jnp.asarray(pos),
                               n_steps=minimize_steps, max_step=0.05)
        if constraint is not None:
            pos = constraint.project_initial(pos)
        states.append(sim.init_state(pos,
                                     rng=jax.random.PRNGKey(2000 + seed)))
    states = _stack_states(states)
    # Thermalize before recording (grid-start boxes begin far colder than
    # openmmtools' pre-equilibrated WaterBox liquid).
    states = jax.jit(jax.vmap(lambda st: sim.run(st, 5000).state))(states)
    _record_seeds_batched(sim, states, out_dir,
                          list(range(seed_start, seed_start + seeds)),
                          frames_per_seed,
                          record_interval, record_force,
                          frames_per_dispatch, log_every_frames)
    return out_dir


def generate_rpbe_surrogate(out_path, n_molecules=64, frames_per_box=1000,
                            record_interval=50, box_sizes=None,
                            equil_steps=2000, minimize_steps=2000,
                            test_fraction=0.1, seed=0, rigid=True,
                            frames_per_dispatch=250, log_every_frames=250):
    """Surrogate for the reference's RPBE/DFT dataset (dynamic-box model).

    The real data (Cheng et al. PNAS, used by
    /root/reference/code/water/train_network_real_large.py:71-371 via
    train_utils.py:117-163) is not obtainable in this offline environment,
    so this produces a stand-in with the same CONTRACT: one npz with
    pos [M,N,3] (bohr), force [M,N,3] (Hartree/bohr), box [M] per-frame box
    edges (bohr, varying frame to frame), atom_type [M,N] (1 = O), and
    train_idx/test_idx splits — 64 rigid-water molecules simulated at
    several densities so the per-sample traced-box path is genuinely
    exercised. Model-accuracy numbers on this surrogate validate the
    dynamic-box pipeline, not the published RPBE figures (RESULTS.md states
    the non-comparability).
    """
    from gamd_tpu.physics import water as w

    n_atoms = 3 * n_molecules
    if box_sizes is None:
        # liquid density +-3%: V = n * M_w / (rho * N_A)
        base = (n_molecules * 18.015 / (0.998 * 6.02214e23)) ** (1 / 3) \
            * 1e8  # cm -> angstrom
        box_sizes = [base * 0.97, base * 1.0, base * 1.03]

    all_pos, all_force, all_box = [], [], []
    for b_i, box in enumerate(box_sizes):
        box = float(box)
        params = w.TIP3PParams(cutoff=min(6.0, box / 2 - 0.01))
        # ~126 atoms sit inside cutoff+skin (6.7 A) at liquid density —
        # the tip3p preset's K=96 (sized for its 4.2 A cutoff) overflows.
        system = get_preset("tip3p", n_atoms=n_atoms, box=box,
                            cutoff=min(6.0, box / 2 - 0.01),
                            nbr_capacity=176)
        constraint = RigidWater(n_molecules, box,
                                tip3p_rigid_params(params.r_oh,
                                                   params.theta0)) if rigid \
            else None
        md = MDConfig(integrator="langevin", temperature=300.0,
                      dt_fs=2.0 if rigid else 0.5, friction_per_ps=2.0,
                      rebuild_every=10)
        sim = Simulation(w.tip3p_force_fn(box, params, rigid=rigid),
                         system, md, constraint=constraint)
        fwd = w.tip3p_forces_rigid if rigid else w.tip3p_forces
        record_force = jax.jit(lambda p, box=box, params=params:
                               fwd(p, box, params))
        minimize_force = jax.jit(lambda p, box=box, params=params:
                                 w.tip3p_forces(p, box, params))

        pos = w.water_box(n_molecules, box, params, seed=seed + b_i)
        pos, _ = fire_minimize(minimize_force, jnp.asarray(pos),
                               n_steps=minimize_steps, max_step=0.05)
        if constraint is not None:
            pos = constraint.project_initial(pos)
        state = sim.init_state(pos, rng=jax.random.PRNGKey(4000 + b_i))
        if equil_steps:
            state = sim.run(state, equil_steps).state

        t = 0
        while t < frames_per_box:
            n_f = min(frames_per_dispatch, frames_per_box - t)
            state, ovf, pos_f, _, force_f, temp = sim.run_recorded(
                state, n_f, record_interval, record_force)
            if bool(ovf):
                raise RuntimeError("neighbor capacity overflow")
            all_pos.append(np.asarray(pos_f, np.float32))
            all_force.append(np.asarray(force_f, np.float32))
            all_box.append(np.full((n_f,), box, np.float32))
            t += n_f
            if log_every_frames:
                print(f"box {box:.2f} A: frame {t}/{frames_per_box} "
                      f"T={float(temp[-1]):.1f}K", flush=True)

    pos = np.concatenate(all_pos) / units.BOHR_TO_ANGSTROM
    # kJ/mol/A -> Hartree/bohr
    force = (np.concatenate(all_force)
             * (units.BOHR_TO_ANGSTROM / units.HARTREE_TO_KJ_MOL))
    box_arr = np.concatenate(all_box) / units.BOHR_TO_ANGSTROM
    atom_type = np.tile(np.tile([1, 2, 2], n_molecules)[None, :],
                        (pos.shape[0], 1)).astype(np.int32)

    m = pos.shape[0]
    order = np.random.RandomState(seed).permutation(m)
    n_test = max(1, int(m * test_fraction))
    np.savez(out_path, pos=pos.astype(np.float32),
             force=force.astype(np.float32), box=box_arr,
             atom_type=atom_type,
             train_idx=order[n_test:], test_idx=order[:n_test])
    return out_path


def generate_tip4p_dataset(out_dir, seeds=10, frames_per_seed=1000,
                           record_interval=50, n_molecules=251,
                           minimize_steps=3000, dt_fs=None, rigid=True,
                           log_every_frames=250, frames_per_dispatch=250,
                           electrostatics="ewald"):
    """TIP4P-Ew ground truth in the reference's 4-site frame layout
    (reference: /root/reference/dataset/generate_tip4p_data.py: WaterBox
    model='tip4pew', 251 molecules, rigid, dt = 2 fs). Frames store O,H,H,M
    rows per molecule; the training loader drops the M rows
    (train_utils.py:58-64). electrostatics="ewald" (default) matches the
    reference's PME protocol (see generate_water_dataset)."""
    from gamd_tpu.physics import ewald as _ewald
    from gamd_tpu.physics import water as w

    os.makedirs(out_dir, exist_ok=True)
    if dt_fs is None:
        dt_fs = 2.0 if rigid else 0.5
    system = get_preset("tip4p", n_atoms=3 * n_molecules)
    params = w.TIP4PEwParams()
    box = system.box
    constraint = RigidWater(n_molecules, box,
                            tip3p_rigid_params(params.r_oh,
                                               params.theta0)) if rigid \
        else None
    # Langevin for the same reasons as generate_water_dataset (ensemble-
    # equivalent; pins T against residual f32 drift).
    md = MDConfig(integrator="langevin", temperature=300.0, dt_fs=dt_fs,
                  friction_per_ps=2.0, rebuild_every=10)
    force_fn = w.tip4pew_force_fn(box, params, rigid=rigid,
                                  electrostatics=electrostatics)
    sim = Simulation(force_fn, system, md, constraint=constraint)
    if electrostatics == "ewald":
        ew = _ewald.make_ewald_params(box)
        rec_energy = (w.tip4pew_energy_rigid_ewald if rigid
                      else w.tip4pew_energy_ewald)
        record_force = jax.jit(
            lambda p: -jax.grad(rec_energy)(p, box, ew, params))
        minimize_force = jax.jit(
            lambda p: -jax.grad(w.tip4pew_energy_ewald)(p, box, ew, params))
    else:
        fwd = w.tip4pew_forces_rigid if rigid else w.tip4pew_forces
        record_force = jax.jit(lambda p: fwd(p, box, params))
        minimize_force = jax.jit(lambda p: w.tip4pew_forces(p, box, params))

    def to_4site(p, v, f):
        pos4, f4 = w.expand_with_m_sites(p, f, box, params)
        vel4, _ = w.expand_with_m_sites(v, np.zeros_like(v), box, params)
        return pos4, vel4, f4

    states = []
    for seed in range(seeds):
        pos = w.water_box(n_molecules, box,
                          w.TIP3PParams(r_oh=params.r_oh,
                                        theta0=params.theta0), seed=seed)
        pos, _ = fire_minimize(minimize_force, jnp.asarray(pos),
                               n_steps=minimize_steps, max_step=0.05)
        if constraint is not None:
            pos = constraint.project_initial(pos)
        states.append(sim.init_state(pos,
                                     rng=jax.random.PRNGKey(3000 + seed)))
    states = _stack_states(states)
    states = jax.jit(jax.vmap(lambda st: sim.run(st, 5000).state))(states)
    _record_seeds_batched(sim, states, out_dir,
                          list(range(seeds)), frames_per_seed,
                          record_interval, record_force,
                          frames_per_dispatch, log_every_frames,
                          postprocess=to_4site)
    return out_dir
