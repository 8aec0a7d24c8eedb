"""Configurable MLP matching the reference's layer-construction semantics.

The reference's MLP builder (reference: /root/reference/code/nn_module.py:21-75)
has a quirky but load-bearing layout that the rest of the model depends on:

    hidden_layer=1, activation_first      -> [act, Linear(in, out)]
    hidden_layer=1, not activation_first  -> [Linear(in, out)]
    hidden_layer=L>1, not activation_first->
        [Linear(in, h), act] + [Linear(h, h), act]*(L-2) + [Linear(h, out)]
    hidden_layer=L>1, activation_first    ->
        [act, Linear(in, h), act] + [Linear(h, h), act]*(L-2) + [Linear(h, out)]

i.e. there is never an activation after the final Linear, and activation_first
prepends one before the first Linear. Weight init is Lecun-normal (flax
default); the reference's optional xavier init path is off by default.
"""

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


def get_activation(name: str) -> Callable:
    table = {
        "relu": nn.relu,
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "sigmoid": nn.sigmoid,
        "tanh": nn.tanh,
        "elu": nn.elu,
        # exact (erf) form to match torch nn.GELU's default
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "silu": nn.silu,
    }
    if name not in table:
        raise ValueError(
            f"unsupported activation {name!r}; choose from {sorted(table)}")
    return table[name]


class MLP(nn.Module):
    out_feats: int
    hidden_dim: int = 128
    hidden_layer: int = 3
    activation: str = "relu"
    activation_first: bool = False
    dtype: object = None     # compute dtype (bf16 mixed precision); params fp32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        dense = lambda feats: nn.Dense(feats, dtype=self.dtype)
        if self.hidden_layer == 1:
            if self.activation_first:
                x = act(x)
            return dense(self.out_feats)(x)

        if self.activation_first:
            x = act(x)
        x = act(dense(self.hidden_dim)(x))
        for _ in range(self.hidden_layer - 2):
            x = act(dense(self.hidden_dim)(x))
        return dense(self.out_feats)(x)
