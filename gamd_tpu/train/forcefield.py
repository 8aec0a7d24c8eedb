"""Bridge from a trained GNN to the fused MD driver.

The reference's deployment path is ParticleNetLightning.predict_forces:
neighbor search -> model forward -> denormalize -> numpy
(reference: /root/reference/code/LJ/train_network_lj.py:133-157). Here the
trained state produces a pure force_fn(pos, idx, mask) closure that the
Simulation driver fuses into its scan — plus a standalone predict() for
offline force evaluation (the notebooks' entry point).
"""

import jax
import jax.numpy as jnp

from gamd_tpu.core import units
from gamd_tpu.core.config import ModelConfig, SystemConfig
from gamd_tpu.models.normalizer import denormalize
from gamd_tpu.neighbors.dense import dense_neighbor_list
from gamd_tpu.neighbors.topology import neighbor_bond_channel
from gamd_tpu.train.state import TrainState, build_model


class GNNForceField:
    """Trained GAMD model wrapped as a force provider.

    Args:
        state: TrainState after training (or loaded from checkpoint).
        system: SystemConfig (box, cutoff, species, units).
        model_cfg: architecture config used at training time.
    """

    def __init__(self, state: TrainState, system: SystemConfig,
                 model_cfg: ModelConfig):
        self.system = system
        self.model = build_model(model_cfg, system)
        self.params = state.params
        self.batch_stats = state.batch_stats
        self.force_stat = state.force_stat
        self.length_stat = state.length_stat
        feat = system.species_onehot()
        self._feat = None if feat is None else jnp.asarray(feat)[None]

    def _forward(self, pos, idx, mask, box):
        """Normalized force prediction for a single frame."""
        variables = {"params": self.params}
        if self.batch_stats:
            variables["batch_stats"] = self.batch_stats
        bond = None
        if self.model.use_bond:
            bond = neighbor_bond_channel(idx)[None]
        pred = self.model.apply(
            variables, pos[None], idx[None], mask[None], box,
            self.length_stat.safe_mean,
            jnp.maximum(self.length_stat.std, 1e-12),
            node_feat=self._feat, bond=bond, train=False)
        return pred[0]

    def force_fn(self):
        """(pos, idx, mask) -> force in internal units (kJ/mol/A), for
        gamd_tpu.md.simulate.Simulation."""
        unit = self.system.force_unit_to_internal

        def fn(pos, idx, mask):
            pred = self._forward(pos, idx, mask, self.system.box)
            return denormalize(pred, self.force_stat) * unit
        return fn

    def predict(self, pos, box=None):
        """Offline force prediction in DATASET units (kJ/mol/nm for LJ/water,
        Hartree/bohr for DFT) — the predict_forces equivalent."""
        box = self.system.box if box is None else box
        pos = jnp.mod(jnp.asarray(pos, jnp.float32), box)
        idx, mask, _ = dense_neighbor_list(
            pos, box, self.system.cutoff, self.system.nbr_capacity)
        pred = self._forward(pos, idx, mask, box)
        return denormalize(pred, self.force_stat)

    def predict_batch(self, pos_all, batch_size: int = 16):
        """Predict forces for a whole trajectory in ONE device dispatch
        (lax.scan over batches; essential on high-latency device links).

        Args:
            pos_all: [M, N, 3] frames (fixed box).
        Returns:
            [M, N, 3] forces in dataset units.
        """
        if self.system.box is None:
            raise ValueError("predict_batch requires a fixed box")
        pos_all = jnp.asarray(pos_all, jnp.float32)
        m = pos_all.shape[0]
        n_batches = -(-m // batch_size)
        pad = n_batches * batch_size - m
        pos_pad = jnp.concatenate(
            [pos_all, jnp.repeat(pos_all[-1:], pad, axis=0)], axis=0) \
            if pad else pos_all

        box = self.system.box

        def one_frame(pos):
            posw = jnp.mod(pos, box)
            idx, mask, _ = dense_neighbor_list(
                posw, box, self.system.cutoff, self.system.nbr_capacity)
            return denormalize(self._forward(posw, idx, mask, box),
                               self.force_stat)

        @jax.jit
        def run(frames):
            batches = frames.reshape(n_batches, batch_size,
                                     *frames.shape[1:])
            def body(_, batch):
                return None, jax.vmap(one_frame)(batch)
            _, preds = jax.lax.scan(body, None, batches)
            return preds.reshape(-1, *frames.shape[1:])

        return run(pos_pad)[:m]
