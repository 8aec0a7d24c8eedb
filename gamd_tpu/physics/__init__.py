from gamd_tpu.physics.lennard_jones import (
    LJParams,
    lj_energy_dense,
    lj_forces_dense,
    lj_force_fn,
    lj_fluid_box,
)
from gamd_tpu.physics.minimize import fire_minimize
from gamd_tpu.physics.rdf import radial_distribution

__all__ = [
    "LJParams",
    "lj_energy_dense",
    "lj_forces_dense",
    "lj_force_fn",
    "lj_fluid_box",
    "fire_minimize",
    "radial_distribution",
]
