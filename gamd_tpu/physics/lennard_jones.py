"""Classical Lennard-Jones reference potential.

First-party replacement for the OpenMM testsystem the reference uses both to
generate ground-truth data and as the physics oracle (reference:
/root/reference/dataset/generate_lj_data.py:56 builds
testsystems.LennardJonesFluid(nparticles=258, reduced_density=0.50,
shift=True)). openmmtools' LJ fluid is argon: sigma = 3.4 A,
epsilon = 0.238 kcal/mol, mass 39.9 amu, cutoff 3*sigma, potential shifted to
zero at the cutoff. Reduced density 0.5 with N = 258 gives the reference's
box edge 27.27 A (train_network_lj.py:27).

Energies kJ/mol, forces kJ/mol/A (internal units).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import space, units


class LJParams(NamedTuple):
    sigma: float = 3.4                       # A
    epsilon: float = 0.238 * units.KCAL_TO_KJ  # kJ/mol
    cutoff: float = 3.0 * 3.4                # A
    shift: bool = True


ARGON_MASS = 39.948


def _pair_energy(r2, p: LJParams):
    """Pair energy from squared distance; shifted & masked beyond cutoff."""
    inv_r2 = p.sigma * p.sigma / jnp.maximum(r2, 1e-12)
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    e = 4.0 * p.epsilon * (inv_r6 * inv_r6 - inv_r6)
    if p.shift:
        s6 = (p.sigma / p.cutoff) ** 6
        e = e - 4.0 * p.epsilon * (s6 * s6 - s6)
    return jnp.where(r2 < p.cutoff * p.cutoff, e, 0.0)


def lj_energy_dense(pos, box, params: LJParams = LJParams()):
    """Total potential energy via the dense pair matrix (small N)."""
    n = pos.shape[0]
    d2 = space.pairwise_distance2(pos, box)
    d2 = d2 + jnp.eye(n) * 1e10          # exclude self pairs
    return 0.5 * jnp.sum(_pair_energy(d2, params))


def lj_forces_dense(pos, box, params: LJParams = LJParams()):
    """Forces = -grad E (exactly consistent with the energy)."""
    return -jax.grad(lj_energy_dense)(pos, box, params)


def lj_energy_neighbors(pos, idx, mask, box, params: LJParams = LJParams()):
    """Total energy over a padded [N, K] neighbor list (each pair counted
    twice across rows, hence the 0.5).

    Padded slots are self-references with r = 0; the double-where guard keeps
    the 1/r^12 singularity (inf in fp32) out of both the primal and the
    backward pass (inf * 0 = nan would otherwise poison grad forces).
    """
    nbr_pos = pos[idx]
    dr = space.min_image(nbr_pos - pos[:, None, :], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    r2_safe = jnp.where(mask, r2, params.sigma**2)
    e = jnp.where(mask, _pair_energy(r2_safe, params), 0.0)
    return 0.5 * jnp.sum(e)


def lj_force_fn(box, params: LJParams = LJParams()):
    """force_fn(pos, idx, mask) for the fused Simulation driver."""
    def force(pos, idx, mask):
        return -jax.grad(lj_energy_neighbors)(pos, idx, mask, box, params)
    return force


def lj_fluid_box(n_particles: int = 258, reduced_density: float = 0.5,
                 params: LJParams = LJParams()):
    """Box edge (A) and initial FCC-lattice positions for an LJ fluid at the
    given reduced density rho* = rho sigma^3 (matches the reference's
    27.27 A box for N=258, rho*=0.5)."""
    volume = n_particles * params.sigma**3 / reduced_density
    box = float(volume ** (1.0 / 3.0))

    # Smallest FCC supercell holding n_particles.
    cells = 1
    while 4 * cells**3 < n_particles:
        cells += 1
    a = box / cells
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    sites = []
    for i in range(cells):
        for j in range(cells):
            for k in range(cells):
                sites.append((base + np.array([i, j, k])) * a)
    all_sites = np.concatenate(sites, axis=0)
    # Pick an evenly-spread subset: taking the first n sites would fill an
    # x-slab at double density (neighbor-capacity overflow at init).
    sel = np.round(np.linspace(0, len(all_sites) - 1,
                               n_particles)).astype(int)
    pos = all_sites[sel].astype(np.float32)
    return box, pos
