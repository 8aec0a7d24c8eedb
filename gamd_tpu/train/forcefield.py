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


def make_longrange_force_fn(system: SystemConfig, kind: str = "ewald_recip"):
    """The analytic long-range force channel for a system preset
    (``pos [N, 3] angstrom -> [N, 3] kJ/mol/A``).

    SINGLE source of truth for the split: training subtracts exactly this
    function from the labels and GNNForceField adds exactly it back, so
    the two can never diverge. Supported: fixed-box tip3p (charges on real
    atoms) and tip4p (M-site charges, redistributed via autodiff)."""
    if kind != "ewald_recip":
        raise ValueError(f"unknown longrange channel {kind!r}")
    if system.name not in ("tip3p", "tip4p") or system.box is None:
        raise ValueError("longrange='ewald_recip' supports the fixed-box "
                         "tip3p / tip4p presets only")
    if system.name == "tip4p":
        from gamd_tpu.physics.water import make_tip4p_recip_force_fn
        return make_tip4p_recip_force_fn(float(system.box), system.n_atoms)
    from gamd_tpu.physics.ewald import make_recip_force_fn
    from gamd_tpu.physics.water import TIP3PParams, atom_charges
    q = atom_charges(system.n_atoms // 3, TIP3PParams())
    return make_recip_force_fn(float(system.box), q)


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
        self.model_cfg = model_cfg
        self.model = build_model(model_cfg, system)
        self.params = state.params
        self.batch_stats = state.batch_stats
        self.force_stat = state.force_stat
        self.length_stat = state.length_stat
        feat = system.species_onehot()
        self._feat = None if feat is None else jnp.asarray(feat)[None]
        # Analytic long-range channel: checkpoints trained with
        # ModelConfig.longrange learned the SHORT-RANGE residual only; the
        # k-space Ewald force is added back here, so every consumer of the
        # self-describing envelope (evaluate / run_md / analyze_rollout)
        # stays correct with no flag plumbing.
        self._longrange_fn = (self._build_longrange()
                              if getattr(model_cfg, "longrange", "")
                              else None)

    def _build_longrange(self):
        return make_longrange_force_fn(self.system,
                                       self.model_cfg.longrange)

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

    def force_fn(self, megakernel: bool = False, tile_n: int = 16,
                 interpret: bool = False):
        """(pos, idx, mask) -> force in internal units (kJ/mol/A), for
        gamd_tpu.md.simulate.Simulation.

        megakernel=True returns the whole-model Pallas path
        (ops.pallas_model): ONE device program from positions to forces,
        with the true-cutoff mask refresh folded in (the closure carries
        handles_refresh=True so the MD driver passes the raw build-time
        mask) and the force denormalization folded into the decoder
        weights.
        """
        unit = self.system.force_unit_to_internal
        if megakernel:
            base = self._megakernel_force_fn(unit, tile_n, interpret)
            if self._longrange_fn is None:
                return base
            lr = self._longrange_fn

            def fn_mk(pos, idx, mask):
                return base(pos, idx, mask) + lr(pos)
            fn_mk.handles_refresh = base.handles_refresh
            return fn_mk

        lr = self._longrange_fn

        def fn(pos, idx, mask):
            pred = self._forward(pos, idx, mask, self.system.box)
            out = denormalize(pred, self.force_stat) * unit
            return out if lr is None else out + lr(pos)
        return fn

    def _node_h0(self):
        """Initial node features [N, D]: the LJ broadcast embedding or the
        water node encoder applied to the (constant) one-hot species."""
        cfg = self.model_cfg
        n = self.system.n_atoms
        if self.model.species == "lj":
            return jnp.broadcast_to(self.params["node_emb"],
                                    (n, cfg.encoding_size))
        enc = self.params["node_encoder"]
        return (self._feat[0] @ enc["kernel"] + enc["bias"])

    def _megakernel_force_fn(self, unit, tile_n, interpret):
        from gamd_tpu.ops.pallas_model import mega_forward, pack_params

        cfg = self.model_cfg
        system = self.system
        if system.box is None or not cfg.expand_edge or cfg.update_edge:
            raise ValueError("megakernel path requires a fixed scalar box, "
                             "expand_edge=True, update_edge=False")
        mp = pack_params(self.params, cfg, batch_stats=self.batch_stats,
                         force_std=jnp.maximum(self.force_stat.std, 1e-12),
                         force_mean=self.force_stat.safe_mean, unit=unit)
        h0 = self._node_h0()
        length_mean = self.length_stat.safe_mean
        length_std = jnp.maximum(self.length_stat.std, 1e-12)
        use_bond = self.model.use_bond
        if use_bond:
            from gamd_tpu.neighbors.topology import neighbor_bond_channel

        # Water deployment defaults to the fp32-exact hi/lo edge stream:
        # the single-bf16 stream cost +4 K of thermostat bias at the
        # reference rollout friction (results/water_rollout_perf_mk_r4h.log)
        # — an accuracy regression on the throughput path. LJ keeps the
        # cheaper single-bf16 stream (parity within budget there).
        # GAMD_EDGE_HILO=0/1 overrides either default for A/Bs.
        edge_hilo = system.species in ("water",)

        def fn(pos, idx, mask):
            bond = neighbor_bond_channel(idx) if use_bond else None
            h0_b = jnp.broadcast_to(h0, pos.shape[:-2] + h0.shape) \
                if pos.ndim == 3 else h0
            return mega_forward(
                pos, idx, mask, h0_b, mp, system.box, system.cutoff,
                length_mean, length_std, bond=bond, rbf_gap=cfg.rbf_gap,
                flip_dir=cfg.flip_dir, use_ln=cfg.use_layer_norm,
                conv_act=cfg.conv_activation, mlp_act=cfg.mlp_activation,
                tile_n=tile_n, interpret=interpret, edge_hilo=edge_hilo)

        fn.handles_refresh = True     # in-kernel true-cutoff mask refresh
        return fn

    def banded_force_fn(self, band: int = None, tile_n: int = 64,
                        interpret: bool = False):
        """(pos, idx, mask) -> force for LARGE N: x-sorted circular band
        gathers (ops.banded) instead of the megakernel's O(N^2) one-hot or
        XLA's slow random row gathers. Folds the true-cutoff mask refresh
        (handles_refresh) and the force denormalization into the kernel
        weights, like the megakernel path."""
        from gamd_tpu.ops.banded import make_banded_force_fn
        from gamd_tpu.ops.pallas_model import pack_params

        if self._longrange_fn is not None:
            raise ValueError("banded path does not compose the analytic "
                             "longrange channel; use force_fn()")
        cfg = self.model_cfg
        system = self.system
        if system.box is None or not cfg.expand_edge or cfg.update_edge:
            raise ValueError("banded path requires a fixed scalar box, "
                             "expand_edge=True, update_edge=False")
        unit = system.force_unit_to_internal
        mp = pack_params(self.params, cfg, batch_stats=self.batch_stats,
                         force_std=jnp.maximum(self.force_stat.std, 1e-12),
                         force_mean=self.force_stat.safe_mean, unit=unit)
        h0_single = self._node_h0()
        fn0 = make_banded_force_fn(
            mp, system.box, system.cutoff, system.n_atoms, h0_single,
            self.length_stat.safe_mean,
            jnp.maximum(self.length_stat.std, 1e-12), band=band,
            tile_n=tile_n, use_bond=self.model.use_bond,
            flip_dir=cfg.flip_dir, use_ln=cfg.use_layer_norm,
            mlp_act=cfg.mlp_activation, interpret=interpret)

        def fn(pos, idx, mask):
            f, ovf = fn0(pos, idx, mask)
            # The Simulation force contract has no overflow channel; a band
            # overflow (a tile's neighbor arc wider than `band`) would
            # silently zero real edges, so poison the output instead —
            # drivers and benches assert finiteness and fail loudly.
            return jnp.where(ovf, jnp.nan, 1.0) * f

        fn.handles_refresh = True
        fn.banded_band = fn0.banded_band
        return fn

    def megastep_fn(self, tile_n: int = 16, interpret: bool = False,
                    ablate=()):
        """Multi-step fused MD: (pos, vel, force, idx, mask, seed, *,
        n_steps, c1, hdt, c2col, masses) -> (pos', vel', force', ke).

        Runs a whole neighbor-reuse window of BAOAB Langevin steps in ONE
        Pallas program (ops.pallas_model.mega_md_steps): zero launch or HBM
        round trips between steps. Pass to Simulation(megastep_fn=...).
        """
        from gamd_tpu.ops.pallas_model import mega_md_steps, pack_params

        if self._longrange_fn is not None:
            raise ValueError("megastep keeps whole MD windows inside one "
                             "Pallas program and cannot add the analytic "
                             "longrange term between steps; use the "
                             "per-step force_fn paths")
        cfg = self.model_cfg
        system = self.system
        if system.box is None or not cfg.expand_edge or cfg.update_edge:
            raise ValueError("megastep path requires a fixed scalar box, "
                             "expand_edge=True, update_edge=False")
        unit = system.force_unit_to_internal
        mp = pack_params(self.params, cfg, batch_stats=self.batch_stats,
                         force_std=jnp.maximum(self.force_stat.std, 1e-12),
                         force_mean=self.force_stat.safe_mean, unit=unit)
        h0 = self._node_h0()
        length_mean = self.length_stat.safe_mean
        length_std = jnp.maximum(self.length_stat.std, 1e-12)
        use_bond = self.model.use_bond

        def fn(pos, vel, force, idx, mask, seed, *, n_steps, c1, hdt,
               c2col, masses):
            bond = neighbor_bond_channel(idx) if use_bond else None
            h0_b = jnp.broadcast_to(h0, pos.shape[:-2] + h0.shape) \
                if pos.ndim == 3 else h0
            return mega_md_steps(
                pos, vel, force, idx, mask, h0_b, mp, system.box,
                system.cutoff, length_mean, length_std, masses,
                n_steps=n_steps, c1=c1, hdt=hdt, c2col=c2col, seed=seed,
                bond=bond, rbf_gap=cfg.rbf_gap, flip_dir=cfg.flip_dir,
                use_ln=cfg.use_layer_norm, conv_act=cfg.conv_activation,
                mlp_act=cfg.mlp_activation, tile_n=tile_n,
                interpret=interpret, ablate=ablate)

        return fn

    def predict(self, pos, box=None):
        """Offline force prediction in DATASET units (kJ/mol/nm for LJ/water,
        Hartree/bohr for DFT) — the predict_forces equivalent."""
        box = self.system.box if box is None else box
        pos = jnp.mod(jnp.asarray(pos, jnp.float32), box)
        idx, mask, _ = dense_neighbor_list(
            pos, box, self.system.cutoff, self.system.nbr_capacity)
        pred = self._forward(pos, idx, mask, box)
        out = denormalize(pred, self.force_stat)
        if self._longrange_fn is not None:
            out = out + self._longrange_fn(pos) \
                / self.system.force_unit_to_internal
        return out

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
            out = denormalize(self._forward(posw, idx, mask, box),
                              self.force_stat)
            if self._longrange_fn is not None:
                out = out + self._longrange_fn(posw) \
                    / self.system.force_unit_to_internal
            return out

        @jax.jit
        def run(frames):
            batches = frames.reshape(n_batches, batch_size,
                                     *frames.shape[1:])
            def body(_, batch):
                return None, jax.vmap(one_frame)(batch)
            _, preds = jax.lax.scan(body, None, batches)
            return preds.reshape(-1, *frames.shape[1:])

        return run(pos_pad)[:m]
