"""Fused GNN-MD simulation driver: neighbor search + force model + integrator
in a single jitted double-scan, zero per-step host round trips.

This replaces the reference's rollout contraption, which bounces every step
through four frameworks and the host (set per-DoF force -> OpenMM step(1) ->
getState -> JAX neighbor search -> CuPy -> Torch GNN -> numpy -> OpenMM;
reference: /root/reference/code/LJ/test_script/test_langevin.py:95-113, and
README's own admission of the overhead, /root/reference/code/README.md:46).

Structure: an outer lax.scan over "chunks" rebuilds the padded neighbor list
(at cutoff+skin) once per chunk; an inner lax.scan advances `rebuild_every`
MD steps reusing those indices, re-validating only the true-cutoff mask from
current positions each force call (Verlet-skin reuse). Thermostat state rides
the scan carry; capacity overflow is OR-accumulated and reported at the end
(recover by enlarging k_max and rerunning — the static-shape analogue of the
reference's did_buffer_overflow rebuild, graph_utils.py:41-43).
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gamd_tpu.core import space, units
from gamd_tpu.core.config import MDConfig, SystemConfig
from gamd_tpu.md import integrators as integ
from gamd_tpu.neighbors import dense
from gamd_tpu.neighbors.cell_list import cell_list_neighbor_list


class Thermo(NamedTuple):
    """Per-step thermodynamic log (the reference's StateDataReporter columns:
    step, time, KE, T — test_langevin.py:79-83)."""

    kinetic_energy: jnp.ndarray   # [steps] kJ/mol
    temperature: jnp.ndarray      # [steps] K


class RunResult(NamedTuple):
    state: object                 # final integrator state
    thermo: Thermo
    overflow: jnp.ndarray         # bool — neighbor capacity exceeded at any rebuild
    positions: jnp.ndarray = None  # [n_chunks, N, 3] wrapped samples (one per
                                   # neighbor-rebuild chunk) for RDF analysis


class Simulation:
    """Fused NVT/NVE simulation of a periodic particle system.

    Args:
        force_fn: (pos_wrapped [N,3], idx [N,K], mask [N,K]) -> force [N,3]
            in internal units (kJ/mol/A). Typically a closure over trained
            GNN params (gamd_tpu.train.forcefield) or a classical potential.
        system: SystemConfig (box, cutoff, capacity, masses).
        md: MDConfig (integrator, dt, thermostat parameters, cadences).
        nbr_method: 'dense' | 'cell'.
    """

    def __init__(self, force_fn: Callable, system: SystemConfig,
                 md: MDConfig, nbr_method: str = "dense", constraint=None,
                 k_model: Optional[int] = None, megastep_fn=None):
        if system.box is None:
            raise ValueError("Simulation requires a fixed box")
        self.force_fn = force_fn
        self.system = system
        self.md = md
        self.nbr_method = nbr_method
        self.constraint = constraint
        self.k_model = k_model
        self.masses = jnp.asarray(system.atom_masses())
        self.dt = md.dt_fs * units.FS
        self.ndf = 3 * system.n_atoms - (
            constraint.n_constraints if constraint is not None else 0)
        # Whole-window fused MD (GNNForceField.megastep_fn): one Pallas
        # program per neighbor-rebuild chunk instead of one per step.
        # Langevin-only (NHC chain state stays in the XLA scan path).
        self.megastep_fn = megastep_fn
        if megastep_fn is not None and (
                md.integrator != "langevin" or constraint is not None):
            raise ValueError("megastep_fn supports the unconstrained "
                             "langevin integrator only")
        self._run_cache = {}

    def _baoab_constants(self):
        gamma = self.md.friction_per_ps / units.PS
        c1 = jnp.exp(-gamma * self.dt)
        b = jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * self.dt))
        sigma = jnp.sqrt(units.KB * self.md.temperature / self.masses)
        return c1, 0.5 * self.dt, b * sigma

    # -- neighbor plumbing --------------------------------------------------

    def _build_nbrs(self, pos):
        sysc = self.system
        radius = sysc.cutoff + sysc.skin
        if self.nbr_method == "dense":
            idx, mask, ovf = dense.dense_neighbor_list(
                pos, sysc.box, radius, sysc.nbr_capacity)
        else:
            idx, mask, ovf = cell_list_neighbor_list(
                pos, float(sysc.box), float(radius), sysc.nbr_capacity)
        k = self.k_model
        if k is not None and k < idx.shape[-1]:
            # Lists are distance-sorted, so the nearest k slots are a valid
            # smaller working set (~25% FLOP cut at k=48 vs 64). If ANY
            # dropped slot is live at build time — i.e. a cutoff+skin
            # neighbor would be lost for the chunk — flag overflow so the
            # caller rebuilds with a larger k_model.
            ovf = ovf | jnp.any(mask[..., k:])
            idx, mask = idx[..., :k], mask[..., :k]
        return idx, mask, ovf

    def _force_with(self, idx, mask):
        if getattr(self.force_fn, "handles_refresh", False):
            # Megakernel force models fold the true-cutoff mask refresh into
            # their own distance computation — pass the raw build-time mask.
            def force(pos):
                posw = space.wrap(pos, self.system.box)
                return self.force_fn(posw, idx, mask)
            return force

        def force(pos):
            posw = space.wrap(pos, self.system.box)
            live = dense.refresh_mask(posw, self.system.box,
                                      self.system.cutoff, idx, mask)
            return self.force_fn(posw, idx, live)
        return force

    # -- integrator construction ---------------------------------------------

    def _integrator(self, force):
        md, cst = self.md, self.constraint
        if md.integrator == "nve":
            return integ.velocity_verlet(force, self.dt, self.masses,
                                         constraint=cst)
        if md.integrator == "langevin":
            return integ.baoab_langevin(
                force, self.dt, self.masses, md.temperature,
                friction=md.friction_per_ps / units.PS, constraint=cst)
        if md.integrator == "nose_hoover":
            return integ.nose_hoover_chain(
                force, self.dt, self.masses, md.temperature,
                frequency=md.friction_per_ps / units.PS,
                chain_length=md.chain_length, n_c=md.chain_mts,
                n_ys=md.chain_ys, ndf=self.ndf, constraint=cst)
        if md.integrator == "andersen":
            return integ.andersen(
                force, self.dt, self.masses, md.temperature,
                collision_rate=md.friction_per_ps / units.PS, constraint=cst)
        raise ValueError(f"unknown integrator {self.md.integrator!r}")

    def init_state(self, pos, vel=None, rng=None):
        """Initial integrator state; velocities default to Maxwell-Boltzmann."""
        rng = jax.random.PRNGKey(self.md.seed) if rng is None else rng
        k_vel, k_state = jax.random.split(rng)
        pos = jnp.asarray(pos, jnp.float32)
        if vel is None:
            vel = integ.maxwell_boltzmann_velocities(
                k_vel, self.masses, self.md.temperature)
        idx, mask, _ = self._build_nbrs(space.wrap(pos, self.system.box))
        init_fn, _ = self._integrator(self._force_with(idx, mask))
        if self.md.integrator in ("langevin", "andersen"):
            return init_fn(pos, vel, k_state)
        return init_fn(pos, vel)

    # -- fused run -----------------------------------------------------------

    def _chunk_fn(self, rebuild: int):
        """One neighbor-rebuild chunk: rebuild the padded list, then scan
        `rebuild` MD steps reusing it (Verlet-skin reuse). Shared by the
        plain runner and the on-device frame recorder."""
        masses = self.masses
        ndf = self.ndf
        stochastic = self.md.integrator in ("langevin", "andersen")
        n_atoms = self.system.n_atoms

        if self.megastep_fn is not None:
            c1, hdt, c2col = self._baoab_constants()
            box = self.system.box
            ms = self.megastep_fn

            def mega_chunk(carry, _):
                state, any_ovf = carry
                posw = space.wrap(state.pos, box)
                idx, mask, ovf = self._build_nbrs(posw)
                rng, k_seed = jax.random.split(state.rng)
                seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)
                pos2, vel2, f2, ke = ms(
                    posw, state.vel, state.force, idx, mask, seed,
                    n_steps=rebuild, c1=c1, hdt=hdt, c2col=c2col,
                    masses=masses)
                state = integ.LangevinState(pos=pos2, vel=vel2, force=f2,
                                            rng=rng)
                temp = 2.0 * ke / (ndf * units.KB)
                return (state, any_ovf | ovf), (
                    ke, temp, space.wrap(pos2, box))

            return mega_chunk

        def chunk(carry, _):
            state, any_ovf = carry
            posw = space.wrap(state.pos, self.system.box)
            idx, mask, ovf = self._build_nbrs(posw)
            _, step_fn = self._integrator(self._force_with(idx, mask))

            # Pre-draw the whole chunk's thermostat noise in one RNG call;
            # per-step threefry inside the inner scan costs ~20 us on TPU.
            xs = None
            if stochastic:
                rng, k_noise = jax.random.split(state.rng)
                state = state._replace(rng=rng)
                if self.md.integrator == "langevin":
                    xs = jax.random.normal(k_noise,
                                           (rebuild, n_atoms, 3))
                else:
                    k_u, k_g = jax.random.split(k_noise)
                    xs = (jax.random.uniform(k_u, (rebuild, n_atoms, 3)),
                          jax.random.normal(k_g, (rebuild, n_atoms, 3)))

            def inner(st, noise):
                st = step_fn(st) if noise is None else step_fn(st, noise)
                ke = integ.kinetic_energy(st.vel, masses)
                return st, (ke, 2.0 * ke / (ndf * units.KB))

            state, (ke, temp) = jax.lax.scan(
                inner, state, xs, length=rebuild)
            pos_sample = space.wrap(state.pos, self.system.box)
            return (state, any_ovf | ovf), (ke, temp, pos_sample)

        return chunk

    def _make_run(self, n_steps: int):
        rebuild = max(1, min(self.md.rebuild_every, n_steps))
        n_chunks = n_steps // rebuild
        remainder = n_steps % rebuild          # exact step count: a shorter
        chunk = self._chunk_fn(rebuild)        # final chunk, never overshoot
        chunk_rem = self._chunk_fn(remainder) if remainder else None

        @jax.jit
        def run(state):
            (state, ovf), (ke, temp, pos_samples) = jax.lax.scan(
                chunk, (state, jnp.asarray(False)), None, length=n_chunks)
            ke, temp = ke.reshape(-1), temp.reshape(-1)
            if chunk_rem is not None:
                (state, ovf), (ke_r, temp_r, pos_r) = chunk_rem(
                    (state, ovf), None)
                ke = jnp.concatenate([ke, ke_r])
                temp = jnp.concatenate([temp, temp_r])
                pos_samples = jnp.concatenate(
                    [pos_samples, pos_r[None]]) if n_chunks else pos_r[None]
            thermo = Thermo(kinetic_energy=ke, temperature=temp)
            return RunResult(state=state, thermo=thermo, overflow=ovf,
                             positions=pos_samples)

        return run

    def run(self, state, n_steps: int) -> RunResult:
        """Advance n_steps (jit-compiled; cached per n_steps)."""
        key = (n_steps, type(state).__name__)
        if key not in self._run_cache:
            self._run_cache[key] = self._make_run(n_steps)
        return self._run_cache[key](state)

    def run_segmented(self, state, n_steps: int, segment: int = 10000):
        """Advance n_steps in host-level segments (a few dispatches).

        Very long single programs (>~20k steps) have tripped device-side
        faults on the tunneled TPU; segmenting bounds program runtime while
        keeping per-step cost identical. Thermo/positions are concatenated.
        """
        results = []
        done = 0
        while done < n_steps:
            chunk = min(segment, n_steps - done)
            result = self.run(state, chunk)
            state = result.state
            results.append(result)
            done += chunk
        thermo = Thermo(
            kinetic_energy=jnp.concatenate(
                [r.thermo.kinetic_energy for r in results]),
            temperature=jnp.concatenate(
                [r.thermo.temperature for r in results]))
        positions = jnp.concatenate([r.positions for r in results])
        overflow = jnp.any(jnp.stack([r.overflow for r in results]))
        return RunResult(state=state, thermo=thermo, overflow=overflow,
                         positions=positions)

    # -- on-device trajectory recording ----------------------------------

    def _make_run_recorded(self, n_frames: int, record_interval: int,
                           record_force):
        rebuild = max(1, min(self.md.rebuild_every, record_interval))
        while record_interval % rebuild:
            rebuild -= 1                     # largest divisor <= cadence
        n_chunks = record_interval // rebuild
        chunk = self._chunk_fn(rebuild)
        box = self.system.box

        def frame(carry, _):
            state, ovf = carry
            posw = space.wrap(state.pos, box)
            force = record_force(posw)
            vel = state.vel
            (state, ovf), (_, temp, _) = jax.lax.scan(
                chunk, (state, ovf), None, length=n_chunks)
            return (state, ovf), (posw, vel, force, temp[-1, -1])

        @jax.jit
        def run(state):
            (state, ovf), (pos, vel, force, temp) = jax.lax.scan(
                frame, (state, jnp.asarray(False)), None, length=n_frames)
            return state, ovf, pos, vel, force, temp

        return run

    def run_recorded(self, state, n_frames: int, record_interval: int,
                     record_force):
        """Dataset-generation runner: emit (pos, vel, force) snapshots every
        `record_interval` steps, advancing entirely on device — one dispatch
        per call instead of one host round trip per frame (the reference
        pulls state through the host for every frame,
        /root/reference/dataset/generate_lj_data.py:93-106; round 1 measured
        ~7 s/frame for water that way through the tunneled chip).

        Frame t is recorded BEFORE advancing (frame 0 = the initial state).
        `record_force(pos_wrapped) -> [N,3]` computes the recorded
        ground-truth force (classical dense potential). Returns
        (final_state, overflow, pos [F,N,3], vel [F,N,3], force [F,N,3],
        temperature [F]).
        """
        key = ("recorded", n_frames, record_interval, id(record_force))
        if key not in self._run_cache:
            self._run_cache[key] = self._make_run_recorded(
                n_frames, record_interval, record_force)
        return self._run_cache[key](state)

    # -- independent replicas (explicit batch axis) -----------------------

    def _batched_force(self, idx, mask):
        """(pos [R,N,3]) -> [R,N,3] given per-replica lists [R,N,K]."""
        fn = self.force_fn
        if getattr(fn, "handles_refresh", False):
            # Megakernel path: native replica grid dimension, in-kernel
            # mask refresh — no vmap lowering anywhere.
            def force(pos):
                return fn(space.wrap(pos, self.system.box), idx, mask)
            return force

        def one(pos, idx_r, mask_r):
            posw = space.wrap(pos, self.system.box)
            live = dense.refresh_mask(posw, self.system.box,
                                      self.system.cutoff, idx_r, mask_r)
            return self.force_fn(posw, idx_r, live)
        return lambda pos: jax.vmap(one)(pos, idx, mask)

    def init_replicas(self, pos, n_replicas: int, rng=None):
        """Batched replica state from one configuration: identical
        positions, independent Maxwell-Boltzmann velocities. Every state
        leaf carries a leading replica axis; the RNG is one stream whose
        block draws cover all replicas at once."""
        if self.md.integrator == "nose_hoover":
            # Chain state is per-replica; use the vmapped constructor.
            rng = jax.random.PRNGKey(self.md.seed) if rng is None else rng
            keys = jax.random.split(rng, n_replicas)
            pos = jnp.asarray(pos, jnp.float32)
            return jax.vmap(lambda k: self.init_state(pos, rng=k))(keys)

        rng = jax.random.PRNGKey(self.md.seed) if rng is None else rng
        k_vel, k_state = jax.random.split(rng)
        pos = jnp.asarray(pos, jnp.float32)
        r = n_replicas
        pos_b = jnp.broadcast_to(pos, (r,) + pos.shape)
        sigma = jnp.sqrt(
            units.KB * self.md.temperature / self.masses)[:, None]
        vel = sigma * jax.random.normal(k_vel, (r,) + pos.shape)
        posw = space.wrap(pos, self.system.box)
        idx, mask, _ = self._build_nbrs(posw)
        idx_b = jnp.broadcast_to(idx, (r,) + idx.shape)
        mask_b = jnp.broadcast_to(mask, (r,) + mask.shape)
        force = self._batched_force(idx_b, mask_b)(pos_b)
        if self.md.integrator == "nve":
            return integ.NVEState(pos=pos_b, vel=vel, force=force)
        if self.md.integrator == "andersen":
            return integ.AndersenState(pos=pos_b, vel=vel, force=force,
                                       rng=k_state)
        return integ.LangevinState(pos=pos_b, vel=vel, force=force,
                                   rng=k_state)

    def _make_run_replicas(self, n_steps: int, r: int):
        """Batched variant of _make_run: the replica axis rides every array
        (the integrator math is elementwise in atoms, so the single-system
        step functions apply unchanged; the force model sees the full
        [R, N, 3] stack — the megakernel's explicit grid dimension).

        Replaces round 1's jax.vmap(run) lowering, which collapsed to
        ~1/12 per-replica throughput through pallas_call.
        """
        md = self.md
        rebuild = max(1, min(md.rebuild_every, n_steps))
        n_chunks = n_steps // rebuild
        remainder = n_steps % rebuild
        masses = self.masses
        ndf = self.ndf
        stochastic = md.integrator in ("langevin", "andersen")
        n_atoms = self.system.n_atoms
        box = self.system.box

        def chunk_of(rb):
            if self.megastep_fn is not None:
                c1, hdt, c2col = self._baoab_constants()
                ms = self.megastep_fn

                def mega_chunk(carry, _):
                    state, any_ovf = carry
                    posw = space.wrap(state.pos, box)
                    idx, mask, ovf = jax.vmap(self._build_nbrs)(posw)
                    rng, k_seed = jax.random.split(state.rng)
                    seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)
                    pos2, vel2, f2, ke = ms(
                        posw, state.vel, state.force, idx, mask, seed,
                        n_steps=rb, c1=c1, hdt=hdt, c2col=c2col,
                        masses=masses)
                    state = integ.LangevinState(pos=pos2, vel=vel2,
                                                force=f2, rng=rng)
                    ke = ke.T                      # [R, rb] -> [rb, R]
                    temp = 2.0 * ke / (ndf * units.KB)
                    return (state, any_ovf | jnp.any(ovf)), (
                        ke, temp, space.wrap(pos2, box))

                return mega_chunk

            def chunk(carry, _):
                state, any_ovf = carry
                posw = space.wrap(state.pos, box)
                idx, mask, ovf = jax.vmap(self._build_nbrs)(posw)
                force = self._batched_force(idx, mask)
                _, step_fn = self._integrator(force)

                xs = None
                if stochastic:
                    rng, k_noise = jax.random.split(state.rng)
                    state = state._replace(rng=rng)
                    if md.integrator == "langevin":
                        xs = jax.random.normal(k_noise,
                                               (rb, r, n_atoms, 3))
                    else:
                        k_u, k_g = jax.random.split(k_noise)
                        xs = (jax.random.uniform(k_u, (rb, r, n_atoms, 3)),
                              jax.random.normal(k_g, (rb, r, n_atoms, 3)))

                def inner(st, noise):
                    st = step_fn(st) if noise is None else step_fn(st, noise)
                    ke = 0.5 * jnp.sum(
                        masses[:, None] * st.vel * st.vel, axis=(1, 2))
                    return st, (ke, 2.0 * ke / (ndf * units.KB))

                state, (ke, temp) = jax.lax.scan(inner, state, xs, length=rb)
                pos_sample = space.wrap(state.pos, box)
                return (state, any_ovf | jnp.any(ovf)), (ke, temp, pos_sample)
            return chunk

        chunk = chunk_of(rebuild)
        chunk_rem = chunk_of(remainder) if remainder else None

        @jax.jit
        def run(state):
            (state, ovf), (ke, temp, pos_samples) = jax.lax.scan(
                chunk, (state, jnp.asarray(False)), None, length=n_chunks)
            ke = ke.reshape(-1, r)
            temp = temp.reshape(-1, r)
            if chunk_rem is not None:
                (state, ovf), (ke_r, temp_r, pos_r) = chunk_rem(
                    (state, ovf), None)
                ke = jnp.concatenate([ke, ke_r])
                temp = jnp.concatenate([temp, temp_r])
                pos_samples = jnp.concatenate([pos_samples, pos_r[None]]) \
                    if n_chunks else pos_r[None]
            # [steps, R] -> [R, steps]; positions [chunks, R, ...] -> [R, ...]
            thermo = Thermo(kinetic_energy=ke.T, temperature=temp.T)
            return RunResult(state=state, thermo=thermo, overflow=ovf,
                             positions=jnp.swapaxes(pos_samples, 0, 1))

        return run

    def run_replicas(self, states, n_steps: int) -> RunResult:
        """Advance a batch of replicas in lockstep (one fused program; the
        batch dimension fills the MXU that a single 258-atom chain cannot).
        All RunResult fields gain a leading replica axis."""
        r = states.pos.shape[0]
        if self.md.integrator == "nose_hoover" and self.constraint is not None:
            # Constrained NHC replicas: SETTLE/RATTLE projections are
            # single-system, so this path stays on the vmap lowering.
            # Unconstrained NHC rides _make_run_replicas below — the chain
            # math in _nhc_propagate is batch-polymorphic ([R, M] chain
            # state, one fused program, no vmap through pallas_call).
            key = ("replicas-vmap", n_steps, type(states).__name__)
            if key not in self._run_cache:
                self._run_cache[key] = jax.jit(
                    jax.vmap(self._make_run(n_steps)))
            return self._run_cache[key](states)
        key = ("replicas", n_steps, r, type(states).__name__)
        if key not in self._run_cache:
            self._run_cache[key] = self._make_run_replicas(n_steps, r)
        return self._run_cache[key](states)


def simulate(force_fn, system: SystemConfig, md: MDConfig, pos, vel=None,
             rng=None, nbr_method: str = "dense") -> RunResult:
    """One-call convenience wrapper: init + run md.n_steps."""
    sim = Simulation(force_fn, system, md, nbr_method=nbr_method)
    state = sim.init_state(pos, vel=vel, rng=rng)
    return sim.run(state, md.n_steps)
