"""Neighbor aggregation: the framework's hottest op, XLA reference version.

This is the TPU-native replacement for DGL's gspmm scatter kernels behind
g.update_all(fn.src_mul_edge('h', 'e_emb', 'm'), fn.sum('m', 'h'))
(reference: /root/reference/code/nn_module.py:142). In the padded [N, K]
layout the scatter becomes a *dense masked reduction over K*:

    out[i, :] = sum_k mask[i, k] * h[idx[i, k], :] * e[i, k, :]

which XLA lowers to a gather + fused multiply-reduce. The Pallas version in
gamd_tpu.ops.pallas_mp tiles the same contraction through VMEM explicitly.
"""

import jax
import jax.numpy as jnp


def gather_multiply_aggregate(h, e, idx, mask):
    """out[i] = sum_k mask[i,k] * h[idx[i,k]] * e[i,k].

    Args:
        h:    [N, D] node features.
        e:    [N, K, D] per-edge gate values.
        idx:  [N, K] neighbor indices (any value valid where mask False).
        mask: [N, K] bool.

    Returns:
        [N, D].
    """
    h_src = h[idx]                                       # [N, K, D]
    return jnp.sum(jnp.where(mask[..., None], h_src * e, 0.0), axis=1)
