"""Streaming normalization statistics (first-party StandardScaler).

The reference streams sklearn StandardScaler.partial_fit over (a) every
training batch's force components and (b) every batch's edge lengths, then
uses the running mean/std for normalization (reference:
/root/reference/code/LJ/train_network_lj.py:159-164,
/root/reference/code/nn_module.py:485-489). sklearn's partial_fit is the
Chan/Welford parallel-merge of (count, mean, M2) with *biased* variance
M2/count — reproduced here as a pure-JAX pytree so it lives inside the jitted
train step and can be psum'd across data-parallel shards (fixing the
reference's unsynchronized per-DDP-rank scaler hazard, SURVEY.md §2.3).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RunningStat(NamedTuple):
    """Scalar running moments. All fields are f32 scalars (weakly-typed ok)."""

    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray

    @property
    def var(self):
        """Biased variance, matching sklearn StandardScaler.var_."""
        return jnp.where(self.count > 0, self.m2 / jnp.maximum(self.count, 1.0), 1.0)

    @property
    def std(self):
        return jnp.sqrt(self.var)

    @property
    def safe_mean(self):
        return jnp.where(self.count > 0, self.mean, 0.0)


def init_stat() -> RunningStat:
    return RunningStat(
        count=jnp.zeros(()), mean=jnp.zeros(()), m2=jnp.zeros(()))


def stat_from_values(mean, var, count=1.0) -> RunningStat:
    """Build a stat from persisted scaler.npz mean/var (for resume)."""
    count = jnp.asarray(count, jnp.float32)
    mean = jnp.asarray(mean, jnp.float32).reshape(())
    var = jnp.asarray(var, jnp.float32).reshape(())
    return RunningStat(count=count, mean=mean, m2=var * count)


def merge_stats(a: RunningStat, b: RunningStat) -> RunningStat:
    """Chan et al. parallel combine of two moment sets."""
    n = a.count + b.count
    safe_n = jnp.maximum(n, 1.0)
    delta = b.mean - a.mean
    mean = a.mean + delta * b.count / safe_n
    m2 = a.m2 + b.m2 + delta * delta * a.count * b.count / safe_n
    # Preserve exact emptiness semantics.
    mean = jnp.where(n > 0, mean, 0.0)
    return RunningStat(count=n, mean=mean, m2=m2)


def update_stat(stat: RunningStat, values, mask=None,
                axis_name: Optional[str] = None) -> RunningStat:
    """partial_fit: fold a (masked) batch of values into the running stat.

    Args:
        stat: current moments.
        values: any-shape array of samples.
        mask: optional same-shape validity mask (padded edge slots).
        axis_name: if set, batch moments are psum'd over this mapped axis
            before merging, so every data-parallel shard holds identical
            statistics.
    """
    values = values.astype(jnp.float32)
    if mask is None:
        n_b = jnp.asarray(values.size, jnp.float32)
        s = jnp.sum(values)
        mean_b = s / jnp.maximum(n_b, 1.0)
        m2_b = jnp.sum((values - mean_b) ** 2)
    else:
        m = mask.astype(jnp.float32)
        n_b = jnp.sum(m)
        mean_b = jnp.sum(values * m) / jnp.maximum(n_b, 1.0)
        m2_b = jnp.sum(m * (values - mean_b) ** 2)

    if axis_name is not None:
        # Cross-shard combine: treat each shard's batch as one partition.
        n_all = jax.lax.psum(n_b, axis_name)
        sum_all = jax.lax.psum(mean_b * n_b, axis_name)
        mean_all = sum_all / jnp.maximum(n_all, 1.0)
        # M2 across shards: sum of within-shard M2 + between-shard term.
        m2_all = jax.lax.psum(m2_b + n_b * (mean_b - mean_all) ** 2, axis_name)
        n_b, mean_b, m2_b = n_all, mean_all, m2_all

    batch = RunningStat(count=n_b, mean=mean_b, m2=m2_b)
    return merge_stats(stat, batch)


def normalize(values, stat: RunningStat):
    """(x - mean) / std with the sklearn-compatible biased std."""
    return (values - stat.safe_mean) / jnp.maximum(stat.std, 1e-12)


def denormalize(values, stat: RunningStat):
    """pred * sqrt(var) + mean (reference: train_network_lj.py:128-131)."""
    return values * stat.std + stat.safe_mean
