"""Checkpointing: full train state + the reference-compatible scaler.npz.

The reference saves a Lightning .ckpt plus a side-car scaler_{epoch}.npz with
the force scaler's mean/var every 5 epochs (reference:
/root/reference/code/LJ/train_network_lj.py:318-350), and resumes via
load_state_dict + load_training_stats (:85-87,119-123). Here the whole
TrainState pytree (params, optimizer moments, normalizer stats, RNG, step)
serializes with flax msgpack, and the scaler side-car keeps the exact npz
key layout (mean=, var=) so reference tooling can read it.
"""

import numpy as np
import flax.serialization
import jax
import jax.numpy as jnp

from gamd_tpu.models.normalizer import RunningStat, stat_from_values


def save_checkpoint(path, state):
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    return path


def load_checkpoint(path, template_state):
    """Restore into a freshly-created template (shapes must match)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template_state, f.read())


def save_scaler(path, state):
    """scaler.npz side-car, same keys as the reference
    (train_network_lj.py:346-349). Adds the length scaler (the reference
    buries it in model buffers)."""
    np.savez(path,
             mean=np.array([float(state.force_stat.safe_mean)]),
             var=np.array([float(state.force_stat.var)]),
             count=np.array([float(state.force_stat.count)]),
             length_mean=np.array([float(state.length_stat.safe_mean)]),
             length_var=np.array([float(state.length_stat.var)]),
             length_count=np.array([float(state.length_stat.count)]))
    return path


def load_scaler(path):
    """Read a scaler.npz (ours or the reference's) into RunningStats."""
    z = np.load(path)
    force = stat_from_values(z["mean"][0], z["var"][0],
                             count=float(z["count"][0]) if "count" in z else 1.0)
    if "length_mean" in z:
        length = stat_from_values(
            z["length_mean"][0], z["length_var"][0],
            count=float(z["length_count"][0]) if "length_count" in z else 1.0)
    else:
        length = stat_from_values(0.0, 1.0)
    return force, length
