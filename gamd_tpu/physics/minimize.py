"""FIRE energy minimizer (fast inertial relaxation engine).

First-party replacement for the OpenMM minimizeEnergy calls the reference
makes before every data-generation and rollout run (reference:
/root/reference/dataset/generate_lj_data.py:83,
/root/reference/code/LJ/test_script/test_langevin.py:84). FIRE is the
standard jit-friendly choice: fixed iteration count, no line search, all
state in the scan carry.

Bitzek et al., PRL 97, 170201 (2006).
"""

from typing import Callable

import jax
import jax.numpy as jnp


def fire_minimize(force_fn: Callable, pos, n_steps: int = 500,
                  dt_start: float = 0.01, dt_max: float = 0.1,
                  n_min: int = 5, f_inc: float = 1.1, f_dec: float = 0.5,
                  alpha_start: float = 0.1, f_alpha: float = 0.99,
                  max_step: float = 0.1):
    """Minimize a potential by damped dynamics.

    Args:
        force_fn: pos -> force (= -grad E).
        pos: [N, 3] initial positions.
        n_steps: fixed iteration budget (static).
        max_step: trust radius — per-iteration displacement cap (angstrom).
            Essential for overlapping starts, where the LJ 1/r^12 singularity
            produces ~1e10 forces that would otherwise launch atoms across
            the box in one step.

    Returns:
        (pos, final_force) after n_steps FIRE iterations.
    """
    def step(carry, _):
        x, v, dt, alpha, n_pos = carry
        f = force_fn(x)
        # fp32 LJ forces overflow to inf for near-coincident wrap-seam
        # overlaps; clamp so the capped step still points downhill.
        f = jnp.nan_to_num(f, nan=0.0, posinf=1e10, neginf=-1e10)
        power = jnp.vdot(f, v)

        f_norm = jnp.sqrt(jnp.sum(f * f) + 1e-12)
        v_norm = jnp.sqrt(jnp.sum(v * v) + 1e-12)
        v_mixed = (1.0 - alpha) * v + alpha * f * (v_norm / f_norm)

        uphill = power < 0.0
        v_new = jnp.where(uphill, 0.0, v_mixed)
        n_pos_new = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt_new = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max),
                           jnp.where(uphill, dt * f_dec, dt))
        alpha_new = jnp.where(grow, alpha * f_alpha,
                              jnp.where(uphill, alpha_start, alpha))

        v_next = v_new + dt_new * f
        dx = dt_new * v_next
        step_norm = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True))
        dx = dx * jnp.minimum(1.0, max_step / jnp.maximum(step_norm, 1e-12))
        x_next = x + dx
        return (x_next, v_next, dt_new, alpha_new, n_pos_new), None

    init = (pos, jnp.zeros_like(pos), jnp.asarray(dt_start),
            jnp.asarray(alpha_start), jnp.asarray(0))
    (x, _, _, _, _), _ = jax.lax.scan(step, init, None, length=n_steps)
    return x, force_fn(x)
