"""Train state: parameters, optimizer, and streaming normalizer statistics.

The reference spreads this state across a LightningModule, two sklearn
scalers, and non-trainable torch buffers (reference:
/root/reference/code/LJ/train_network_lj.py:91-123). Here it is one pytree,
so the entire train step — including the scaler updates — is a single jitted,
shardable function, and checkpointing is one serialization call.
"""

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gamd_tpu.core.config import ModelConfig, SystemConfig, TrainConfig
from gamd_tpu.models.gnn import GAMDNet
from gamd_tpu.models.normalizer import RunningStat, init_stat


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any                 # flax BatchNorm running stats ({} if LN)
    opt_state: Any
    force_stat: RunningStat          # streaming force scaler (scalar moments)
    length_stat: RunningStat         # streaming edge-length scaler
    rng: jax.Array
    step: jnp.ndarray


def make_optimizer(train_cfg: TrainConfig, steps_per_epoch: int):
    """Adam + the reference's StepLR(step_size=5, gamma=0.001**(5/epochs))
    (reference: train_network_lj.py:251-254)."""
    epochs = max(train_cfg.max_epoch, 1)
    gamma = train_cfg.lr_total_decay ** (train_cfg.lr_step_epochs / epochs)
    schedule = optax.exponential_decay(
        init_value=train_cfg.lr,
        transition_steps=max(steps_per_epoch * train_cfg.lr_step_epochs, 1),
        decay_rate=gamma,
        staircase=True,
    )
    return optax.adam(schedule)


def build_model(model_cfg: ModelConfig, system: SystemConfig) -> GAMDNet:
    species = "lj" if system.species == "lj" else "water"
    return GAMDNet(cfg=model_cfg, species=species,
                   use_bond=system.has_bonds)


def create_train_state(model: GAMDNet, system: SystemConfig,
                       train_cfg: TrainConfig, steps_per_epoch: int,
                       rng: Optional[jax.Array] = None,
                       sample_box=None) -> TrainState:
    """Initialize parameters with a dummy single-frame batch."""
    rng = jax.random.PRNGKey(train_cfg.seed) if rng is None else rng
    k_init, k_state = jax.random.split(rng)

    n = system.n_atoms
    k = system.nbr_capacity
    pos = jnp.zeros((1, n, 3))
    idx = jnp.zeros((1, n, k), jnp.int32)
    mask = jnp.zeros((1, n, k), bool)
    box = sample_box if sample_box is not None else (
        system.box if system.box is not None else jnp.ones((1,)))
    feat = None
    bond = None
    if model.species == "water":
        feat = jnp.zeros((1, n, 1))
    if model.use_bond:
        bond = jnp.zeros((1, n, k))

    variables = model.init(k_init, pos, idx, mask, box, 0.0, 1.0,
                           node_feat=feat, bond=bond, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = make_optimizer(train_cfg, steps_per_epoch)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        force_stat=init_stat(),
        length_stat=init_stat(),
        rng=k_state,
        step=jnp.zeros((), jnp.int32),
    )
