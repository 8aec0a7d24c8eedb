"""Halo-exchange slab decomposition vs dense single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamd_tpu.core import space, units
from gamd_tpu.parallel.halo import (
    make_halo_lj_step,
    run_halo_md,
    sort_into_slabs,
)
from gamd_tpu.parallel.mesh import make_mesh
from gamd_tpu.physics import lennard_jones as lj


def big_lj(n=512):
    # cutoff shortened so the halo fits inside a 4-slab decomposition of the
    # N=512 box (slab width ~8.6 A)
    params = lj.LJParams(cutoff=6.0)
    box, pos = lj.lj_fluid_box(n, 0.5, lj.LJParams())
    rng = np.random.RandomState(0)
    pos = (pos + rng.randn(*pos.shape).astype(np.float32) * 0.1) % box
    return params, box, pos


def test_sort_into_slabs_partition():
    params, box, pos = big_lj(256)
    n_slabs = 4
    state = sort_into_slabs(jnp.asarray(pos), jnp.zeros_like(pos), box,
                            n_slabs, capacity=128, halo_width=9.0,
                            strip_capacity=96, rng=jax.random.PRNGKey(0))
    assert not bool(state.overflow)
    valid = np.asarray(state.valid).reshape(n_slabs, -1)
    assert valid.sum() == 256
    # Every valid atom sits in its slab's x-range.
    p = np.asarray(state.pos).reshape(n_slabs, -1, 3)
    slab_w = box / n_slabs
    for s in range(n_slabs):
        xs = p[s][valid[s]][:, 0]
        assert np.all(xs >= s * slab_w - 1e-4)
        assert np.all(xs < (s + 1) * slab_w + 1e-4)


def test_halo_forces_match_dense():
    """Owned+halo environment forces == dense all-atom forces, per slab."""
    params, box, pos = big_lj(512)
    n_slabs, cap, hs = 4, 256, 192
    halo_w = params.cutoff + 1.0
    st = sort_into_slabs(jnp.asarray(pos), jnp.zeros((512, 3)), box,
                         n_slabs, cap, halo_w, hs, jax.random.PRNGKey(1))
    assert not bool(st.overflow)
    p_b = np.asarray(st.pos).reshape(n_slabs, cap, 3)
    v_b = np.asarray(st.valid).reshape(n_slabs, cap)
    l_i = np.asarray(st.left_idx).reshape(n_slabs, hs)
    r_i = np.asarray(st.right_idx).reshape(n_slabs, hs)

    all_valid = np.concatenate([p_b[s][v_b[s]] for s in range(n_slabs)])
    f_dense = np.asarray(lj.lj_forces_dense(jnp.asarray(all_valid), box,
                                            params))
    row = 0
    for s in range(n_slabs):
        envp = np.concatenate([
            p_b[s],
            p_b[(s - 1) % n_slabs][r_i[(s - 1) % n_slabs]],
            p_b[(s + 1) % n_slabs][l_i[(s + 1) % n_slabs]]])
        envv = np.concatenate([
            v_b[s],
            v_b[(s - 1) % n_slabs][r_i[(s - 1) % n_slabs]],
            v_b[(s + 1) % n_slabs][l_i[(s + 1) % n_slabs]]])
        dr = np.asarray(space.min_image(
            jnp.asarray(envp[None] - p_b[s][:, None]), box))
        r2 = (dr**2).sum(-1)
        ok = (v_b[s][:, None] & envv[None, :]
              & (r2 < params.cutoff**2) & (r2 > 1e-8))
        r2s = np.where(ok, r2, params.sigma**2)
        inv6 = (params.sigma**2 / r2s) ** 3
        du = 4 * params.epsilon * (-6 * inv6**2 + 3 * inv6) / r2s
        f_halo = (np.where(ok, 2 * du, 0)[:, :, None] * dr).sum(1)
        for i in range(cap):
            if v_b[s][i]:
                np.testing.assert_allclose(
                    f_halo[i], f_dense[row], rtol=2e-3,
                    atol=1e-3 * max(1.0, np.abs(f_dense[row]).max()))
                row += 1
    assert row == 512


def test_halo_md_runs_and_conserves_atoms():
    params, box, pos = big_lj(512)
    mesh = make_mesh(4)
    out_pos, valid, overflow = run_halo_md(
        mesh, pos, box, n_steps=60, chunk_steps=20, n_slabs=4,
        capacity=256, strip_capacity=192,
        halo_width=params.cutoff + 1.0, masses_scalar=lj.ARGON_MASS,
        temperature=100.0, dt_fs=2.0, friction_per_ps=25.0,
        rng=jax.random.PRNGKey(2), params=params)
    assert not bool(overflow)
    assert int(np.asarray(valid).sum()) == 512
    real = np.asarray(out_pos)[np.asarray(valid)]
    assert np.all(np.isfinite(real))


def test_halo_md_temperature():
    """Thermostatted halo MD equilibrates near the target temperature."""
    params, box, pos = big_lj(512)
    mesh = make_mesh(4)
    resort_fn, chunk_fn = make_halo_lj_step(
        mesh, 512, box, 4, capacity=256, strip_capacity=192,
        masses_scalar=lj.ARGON_MASS, temperature=100.0, dt_fs=2.0,
        friction_per_ps=25.0, halo_width=params.cutoff + 1.0, params=params)
    k_vel, rng = jax.random.split(jax.random.PRNGKey(3))
    sigma = np.sqrt(units.KB * 100.0 / lj.ARGON_MASS)
    vel = sigma * jax.random.normal(k_vel, (512, 3))
    state = resort_fn(jnp.asarray(pos), vel, rng)
    state = chunk_fn(state, 150)
    v = np.asarray(state.vel)[np.asarray(state.valid)]
    ke = 0.5 * lj.ARGON_MASS * (v**2).sum()
    temp = 2 * ke / (3 * 512 * units.KB)
    assert temp == pytest.approx(100.0, rel=0.25)
