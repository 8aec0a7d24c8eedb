"""Data augmentation inside the jitted train step.

Reference semantics (reference:
/root/reference/code/LJ/train_network_lj.py:38-66, 208-228):

  * with probability 0.3, rotate positions AND ground-truth forces by a
    random composition of axis rotations with angles drawn from
    randint(-2, 2) * pi — i.e. axis-aligned half-turn flips;
  * rotation is applied about the frame centroid after wrapping, then the
    centroid offset is restored;
  * independent Gaussian position jitter (sigma = 0.005 A for LJ/water,
    0.00025 bohr for DFT) applied AFTER the neighbor search.

The reference does this in numpy on the host; here it is jax so the whole
step stays on device.
"""

import jax
import jax.numpy as jnp


def random_flip_rotation(rng, prob=0.3):
    """[3, 3] rotation matrix: identity, or (with prob) axis-aligned k*pi
    rotations composed Rz @ Ry @ Rx, k in {-2, -1, 0, 1}."""
    k_apply, k_angles = jax.random.split(rng)
    apply = jax.random.uniform(k_apply) < prob
    ks = jax.random.randint(k_angles, (3,), -2, 2).astype(jnp.float32)
    angles = jnp.where(apply, ks * jnp.pi, jnp.zeros(3))
    cx, sx = jnp.cos(angles[0]), jnp.sin(angles[0])
    cy, sy = jnp.cos(angles[1]), jnp.sin(angles[1])
    cz, sz = jnp.cos(angles[2]), jnp.sin(angles[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def rotate_sample(rng, pos, forces, box, prob=0.3, rotate_box=False,
                  box_vec=None):
    """Apply the reference's rotation augmentation to one frame.

    pos: [N, 3]; forces: [N, 3]; box: scalar (wrap modulus).
    If rotate_box (DFT config), the per-sample box 3-vector is rotated too
    (reference: train_network_real_large.py:181).
    """
    r = random_flip_rotation(rng, prob)
    p = jnp.mod(pos, box) if box is not None else pos
    offset = jnp.mean(p, axis=0)
    # HIGHEST precision: TPU's default matmul precision is bf16, which
    # would round the COORDINATES to 8 mantissa bits (~0.05-0.1 A at these
    # box sizes) — 20x the intended 0.005 A jitter, silently corrupting
    # every rotated training sample. FLOP cost here is negligible.
    hi = jax.lax.Precision.HIGHEST
    p = jnp.matmul(p - offset, r, precision=hi) + offset
    f = jnp.matmul(forces, r, precision=hi)
    if rotate_box and box_vec is not None:
        if jnp.ndim(box_vec) == 0:
            # Cubic per-frame box (scalar): the k*pi axis flips only negate
            # axes, so |box| is invariant — pass it through unchanged.
            return p, f, box_vec
        box_vec = jnp.abs(jnp.matmul(box_vec, r, precision=hi))
        return p, f, box_vec
    return p, f, box_vec


def jitter_positions(rng, pos, sigma=0.005):
    """Gaussian position noise (applied after neighbor search,
    reference: train_network_lj.py:228)."""
    return pos + sigma * jax.random.normal(rng, pos.shape, pos.dtype)


def rigid_jitter_positions(rng, pos, sigma_t, box=None, group_size=3,
                           sigma_rot=None):
    """Constraint-manifold jitter for rigid-molecule systems (beyond the
    reference: train_network_lj.py:228 jitters atoms independently).

    Per-atom Gaussian jitter breaks rigid water's fixed O-H/H-H geometry:
    every training input lands OFF the constraint manifold the validation
    frames (and every MD rollout state) live ON, and the exact-relabel
    oracle then supervises configurations the deployed model never sees.
    This variant perturbs each molecule RIGIDLY — a random translation
    (sigma_t, angstrom) plus a small random rotation about the molecule
    centroid (sigma_rot, radians; default scaled so the H-atom displacement
    from rotation matches sigma_t) — so augmented samples stay exactly on
    the rigid-body manifold while still breaking frame memorization.

    box (scalar or [3]): REQUIRED for wrapped datasets. Stored frames wrap
    atoms into the box independently, so a boundary-straddling molecule's
    raw coordinates span ~L; rotating THOSE about their arithmetic
    centroid changes the minimum-image O-H geometry by ~|v|*theta
    (angstrom scale) and drives jittered atoms into neighboring molecules
    — the r5d flagship's epoch-0 force_std blew up 286x exactly this way.
    With box given, the rigid transform acts on minimum-image-local
    coordinates anchored at each molecule's first atom, which is exact
    for molecules smaller than half the box.

    pos: [..., N, 3] with N divisible by group_size (O,H,H ordering).
    """
    if sigma_rot is None:
        # Centroid->H distance in TIP3P geometry is ~0.65 A.
        sigma_rot = sigma_t / 0.65
    n = pos.shape[-2]
    m = n // group_size
    shape = pos.shape[:-2] + (m, group_size, 3)
    p = pos.reshape(shape)
    k_t, k_r = jax.random.split(rng)
    dt = sigma_t * jax.random.normal(k_t, pos.shape[:-2] + (m, 1, 3),
                                     pos.dtype)
    omega = sigma_rot * jax.random.normal(k_r, pos.shape[:-2] + (m, 1, 3),
                                          pos.dtype)
    if box is not None:
        b = jnp.asarray(box, pos.dtype)
        anchor = p[..., :1, :]
        dv = p - anchor
        dv = dv - b * jnp.round(dv / b)       # minimum-image local frame
        p = anchor + dv
    c = jnp.mean(p, axis=-2, keepdims=True)
    v = p - c
    # Rodrigues rotation by the vector omega, series-guarded near 0:
    #   R v = v + sin(t)/t (w x v) + (1-cos(t))/t^2 (w x (w x v))
    t2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    t = jnp.sqrt(jnp.maximum(t2, 1e-24))
    small = t2 < 1e-8
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    wxv = jnp.cross(omega, v)
    wxwxv = jnp.cross(omega, wxv)
    rv = v + a * wxv + b * wxwxv
    return (c + rv + dt).reshape(pos.shape)
