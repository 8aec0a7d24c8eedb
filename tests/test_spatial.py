"""Multi-device sharded MD on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core import space
from gamd_tpu.parallel.mesh import make_mesh
from gamd_tpu.parallel.spatial import (
    ShardedMDState,
    block_lj_force,
    make_sharded_lj_step,
)
from gamd_tpu.physics import lennard_jones as lj


def test_block_force_matches_dense():
    params = lj.LJParams()
    box, pos = lj.lj_fluid_box(64, 0.5, params)
    params = lj.LJParams(cutoff=min(params.cutoff, box / 2 - 0.01))
    rng = np.random.RandomState(0)
    pos = (pos + rng.randn(*pos.shape).astype(np.float32) * 0.1) % box
    pos = jnp.asarray(pos)
    f_dense = np.asarray(lj.lj_forces_dense(pos, box, params))
    # Two blocks of 32.
    f0 = np.asarray(block_lj_force(pos[:32], pos, 0, box, params))
    f1 = np.asarray(block_lj_force(pos[32:], pos, 32, box, params))
    np.testing.assert_allclose(np.concatenate([f0, f1]), f_dense,
                               rtol=2e-3, atol=2e-3)


def test_sharded_md_runs_on_8_devices():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8)
    params = lj.LJParams()
    n = 64
    box, pos = lj.lj_fluid_box(n, 0.5, params)
    params = lj.LJParams(cutoff=min(params.cutoff, box / 2 - 0.01))

    init_fn, step_fn = make_sharded_lj_step(
        mesh, n, box, lj.ARGON_MASS, temperature=100.0, dt_fs=2.0,
        friction_per_ps=25.0, params=params)
    state = init_fn(pos, jax.random.PRNGKey(0))
    state = step_fn(state, 50)
    out_pos = np.asarray(state.pos)
    assert out_pos.shape == (n, 3)
    assert np.all(np.isfinite(out_pos))
    # Dynamics actually moved atoms.
    assert np.abs(out_pos - np.asarray(pos)).max() > 1e-3


def test_sharded_md_agrees_with_single_device_forces():
    """Initial force computed through shard_map equals dense reference."""
    mesh = make_mesh(4)
    params = lj.LJParams()
    n = 32
    box, pos = lj.lj_fluid_box(n, 0.5, params)
    params = lj.LJParams(cutoff=min(params.cutoff, box / 2 - 0.01))
    rng = np.random.RandomState(1)
    pos = (pos + rng.randn(*pos.shape).astype(np.float32) * 0.1) % box

    init_fn, _ = make_sharded_lj_step(
        mesh, n, box, lj.ARGON_MASS, 100.0, 2.0, 25.0, params=params)
    state = init_fn(pos, jax.random.PRNGKey(2))
    f_ref = np.asarray(lj.lj_forces_dense(jnp.asarray(pos), box, params))
    np.testing.assert_allclose(np.asarray(state.force), f_ref,
                               rtol=2e-3, atol=2e-3)
