"""GAMD GNN force-field models over padded [N, K] neighbor lists.

TPU-first redesign of the reference's DGL models
(reference: /root/reference/code/nn_module.py — SmoothConvLayerNew :78-148,
SmoothConvBlockNew :151-206, RBFExpansion :210-263, SimpleMDNetNew :561-685,
WaterMDNetNew :410-558, WaterMDDynamicBoxNet :266-407). The math per edge is
identical; the data layout is not: instead of a dynamic [2, E] edge list and
scatter-add message passing (DGL's gspmm CUDA kernels), every tensor is a
dense [B, N, K, F] block and aggregation is a masked reduction over the K
axis — a regular VPU/MXU workload with static shapes. Padded slots point at
the center atom itself and are zeroed by the mask at aggregation time.

Per-edge message math (SmoothConvLayerNew.forward :130-147), with edges
pointing neighbor(src) -> center(dst):

    e_emb = theta_edge(edge_affine(e) + src_affine(h_nbr) + dst_affine(h_ctr))
    agg_i = sum_k mask_ik * h_nbr_ik * e_emb_ik        (fn.src_mul_edge + fn.sum)
    h'_i  = phi(phi_dst(h_i) + phi_edge(agg_i))

The src/dst affine projections are computed on nodes and then gathered
(N*D*H matmuls instead of E*D*H — a ~K-fold FLOP saving the edge-list layout
cannot express).

Parity notes:
  * the reference's add_self_loop call is a silent no-op (DGL returns a new
    graph that is dropped, nn_module.py:652) — self edges are deliberately
    absent here too;
  * RBF expansion is applied to the *standardized* distance (can be negative)
    with 40 centers in [0, 1], gamma = 40 (nn_module.py:295,435,584);
  * the dynamic-box model flips the unit-direction sign
    (nn_module.py:327 vs :483) — ModelConfig.flip_dir.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gamd_tpu.core import space
from gamd_tpu.core.config import ModelConfig
from gamd_tpu.models.mlp import MLP, get_activation


def cubic_kernel(r, re, eps=1e-3):
    """Smoothing kernel relu((1 - (r/re)^2)^3); unused by the models but part
    of the reference surface (reference: /root/reference/code/nn_module.py:15-18,
    including the threshold that maps r <= eps to re)."""
    r = jnp.where(r <= eps, re, r)
    return nn.relu((1.0 - (r / re) ** 2) ** 3)


def rbf_expand(d, low=0.0, high=1.0, gap=0.025):
    """Gaussian radial basis exp(-gamma * (d - mu)^2) with centers
    linspace(low, high, ceil((high-low)/gap)) and gamma = 1/gap
    (reference: /root/reference/code/nn_module.py:234-263)."""
    num_centers = int(np.ceil((high - low) / gap))
    centers = jnp.linspace(low, high, num_centers, dtype=jnp.float32)
    gamma = 1.0 / gap
    return jnp.exp(-gamma * (d[..., None] - centers) ** 2)


class RBFExpansion(nn.Module):
    """Module wrapper kept for API parity; centers are non-trainable."""

    low: float = 0.0
    high: float = 30.0
    gap: float = 0.1

    def __call__(self, d):
        return rbf_expand(d, self.low, self.high, self.gap)


def gather_nodes(h, idx):
    """Batched neighbor gather: h [B, N, D], idx [B, N, K] -> [B, N, K, D]."""
    return jax.vmap(lambda hh, ii: hh[ii])(h, idx)


def _box_for_edges(box, batch, pos_dtype):
    """Broadcast a scalar / per-sample / per-sample-vector box to [B,1,1,{1,3}]."""
    box = jnp.asarray(box, pos_dtype)
    if box.ndim == 0:
        return box
    if box.ndim == 1:           # [B] per-sample cubic box
        return box[:, None, None, None]
    if box.ndim == 2:           # [B, 3] per-sample orthorhombic box
        return box[:, None, None, :]
    raise ValueError(f"box must be scalar, [B], or [B,3]; got {box.shape}")


def edge_geometry(pos, idx, box, flip_dir=False):
    """Raw geometric edge features from positions and a padded index array.

    Returns (unit_dir [B,N,K,3], dist [B,N,K]) where dist is the min-image
    distance from center i to neighbor idx[i,k] and unit_dir its direction
    (center -> neighbor; reference: nn_module.py:615-624; negated when
    flip_dir, matching the dynamic-box model nn_module.py:327).
    """
    nbr_pos = gather_nodes(pos, idx)                       # [B, N, K, 3]
    rel = nbr_pos - pos[:, :, None, :]
    rel = space.min_image(rel, _box_for_edges(box, pos.shape[0], pos.dtype))
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))           # [B, N, K]
    unit = rel / (dist[..., None] + 1e-8)
    if flip_dir:
        unit = -unit
    return unit, dist


class EdgeGatedConv(nn.Module):
    """One message-passing layer (SmoothConvLayerNew equivalent).

    The edge pipeline — edge_affine MLP, + src/dst codes, theta_edge MLP,
    gate multiply, masked K-reduction — owns its weights explicitly so the
    same parameters drive either the plain-XLA path or the fused Pallas
    kernel (ops.pallas_mp.fused_conv_message), selected by `use_pallas`.
    """

    node_dim: int
    hidden_dim: int = 128
    activation: str = "silu"
    drop_edge: bool = False
    update_edge_emb: bool = False
    dtype: object = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h_raw, hn, e, idx, mask, train: bool = False):
        """h_raw [B,N,D] (residual input), hn [B,N,D] (pre-normalized),
        e [B,N,K,E], idx [B,N,K], mask [B,N,K] ->
        (h' [B,N,D] with residual applied, e' or None)."""
        act = get_activation(self.activation)
        hd, nd = self.hidden_dim, self.node_dim
        e_dim = e.shape[-1]
        init_w = nn.initializers.lecun_normal()
        init_b = nn.initializers.zeros_init()
        p = lambda name, shape, bias=False: self.param(
            name, init_b if bias else init_w, shape)

        # edge_affine: Linear -> act -> Linear (MLP hl=2)
        w_e1, b_e1 = p("edge_affine_w1", (e_dim, hd)), p("edge_affine_b1",
                                                         (hd,), True)
        w_e2, b_e2 = p("edge_affine_w2", (hd, hd)), p("edge_affine_b2",
                                                      (hd,), True)
        # theta_edge: act -> Linear -> act -> Linear (MLP hl=2, act-first)
        w_t1, b_t1 = p("theta_edge_w1", (hd, hd)), p("theta_edge_b1",
                                                     (hd,), True)
        w_t2, b_t2 = p("theta_edge_w2", (hd, nd)), p("theta_edge_b2",
                                                     (nd,), True)
        # node update: phi(phi_dst(hn) + phi_edge(agg)) (+ h_raw residual)
        w_pd, b_pd = p("phi_dst_w", (nd, hd)), p("phi_dst_b", (hd,), True)
        w_pe, b_pe = p("phi_edge_w", (nd, hd)), p("phi_edge_b", (hd,), True)
        w_p, b_p = p("phi_w", (hd, nd)), p("phi_b", (nd,), True)

        src_nodes = nn.Dense(hd, dtype=self.dtype, name="src_affine")(hn)
        dst_code = nn.Dense(hd, dtype=self.dtype, name="dst_affine")(hn)

        agg_mask = mask
        if self.drop_edge and train:
            # 20% random edge dropout per layer (reference drops an exact 20%
            # shuffle slice, nn_module.py:111-122; Bernoulli keep is the
            # static-shape equivalent).
            rng = self.make_rng("drop_edge")
            keep = jax.random.bernoulli(rng, 0.8, mask.shape)
            agg_mask = mask & keep

        new_e = None
        if self.use_pallas and not self.update_edge_emb:
            # Kernel 4 (edge pipeline + in-kernel one-hot gathers); the node
            # update stays in XLA — folding it into the kernel
            # (fused_conv_layer) measured SLOWER (68 vs 28 us/layer: the
            # tiny per-tile phi matmuls stall the MXU pipeline).
            from gamd_tpu.ops.pallas_mp import fused_conv_gather_message
            # Interpret mode on CPU backends so the same model config runs
            # in tests and on the virtual device mesh.
            interp = jax.devices()[0].platform == "cpu"
            agg = jax.vmap(
                lambda eb, ib, mk, hnb, sb, db: fused_conv_gather_message(
                    eb, ib, mk, hnb, sb, db, w_e1, b_e1, w_e2, b_e2,
                    w_t1, b_t1, w_t2, b_t2, 16, interp)
            )(e, idx, agg_mask, hn, src_nodes, dst_code)
            delta = act(hn @ w_pd + b_pd + agg @ w_pe + b_pe) @ w_p + b_p
            return h_raw + delta, None

        cd = (lambda x: x) if self.dtype is None else (
            lambda x: x.astype(self.dtype))
        edge_code = act(cd(e) @ cd(w_e1) + cd(b_e1)) @ cd(w_e2) + cd(b_e2)
        src_code = gather_nodes(src_nodes, idx)
        pre = edge_code + src_code + dst_code[:, :, None, :]
        e_emb = act(act(pre) @ cd(w_t1) + cd(b_t1)) @ cd(w_t2) + cd(b_t2)
        if self.update_edge_emb:
            new_e = nn.LayerNorm(name="edge_layer_norm")(e_emb)
        h_src = gather_nodes(hn, idx)
        msg = h_src * e_emb                                    # [B,N,K,D]
        agg = jnp.sum(jnp.where(agg_mask[..., None], msg, 0.0), axis=2)

        delta = act(cd(hn) @ cd(w_pd) + cd(b_pd)
                    + cd(agg) @ cd(w_pe) + cd(b_pe)) @ cd(w_p) + cd(b_p)
        return h_raw + delta, new_e


class ConvBlock(nn.Module):
    """Pre-norm residual stack of EdgeGatedConv layers
    (SmoothConvBlockNew equivalent: h = conv(norm(h)) + h,
    reference: nn_module.py:198-206)."""

    node_dim: int
    conv_layers: int = 4
    hidden_dim: int = 128
    activation: str = "silu"
    use_layer_norm: bool = True
    drop_edge: bool = False
    update_edge_emb: bool = False
    dtype: object = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h, e, idx, mask, train: bool = False):
        for layer in range(self.conv_layers):
            if self.use_layer_norm:
                hn = nn.LayerNorm(name=f"norm_{layer}")(h)
            else:
                # torch BatchNorm1d defaults: momentum 0.1 -> flax 0.9, eps 1e-5
                hn = nn.BatchNorm(use_running_average=not train,
                                  momentum=0.9, epsilon=1e-5,
                                  name=f"norm_{layer}")(h)
            h, new_e = EdgeGatedConv(
                node_dim=self.node_dim, hidden_dim=self.hidden_dim,
                activation=self.activation, drop_edge=self.drop_edge,
                update_edge_emb=self.update_edge_emb, dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"conv_{layer}")(h, hn, e, idx, mask, train=train)
            if self.update_edge_emb and new_e is not None:
                e = new_e
        return h


class GAMDNet(nn.Module):
    """Unified GAMD force-field model covering all three reference variants:

      * species='lj'    -> SimpleMDNetNew: a single learned embedding vector
        broadcast to every atom (reference: nn_module.py:597,680-681);
      * species='water' -> WaterMDNetNew: one-hot (O=1/H=0) node feature
        through a linear encoder (:449), optional intra-molecular bond edge
        channel (:510-511);
      * per-sample box + flip_dir=True -> WaterMDDynamicBoxNet (:266-407);
        expand_edge=False disables the RBF channel (:294).

    Output is the *normalized* per-atom force [B, N, 3]; denormalization with
    the streaming force scaler happens in the caller
    (reference: train_network_lj.py:128-131).
    """

    cfg: ModelConfig
    species: str = "lj"          # 'lj' | 'water'
    use_bond: bool = False

    @nn.compact
    def __call__(self, pos, idx, mask, box, length_mean, length_std,
                 node_feat=None, bond=None, train: bool = False):
        """Args:
            pos:  [B, N, 3] wrapped positions.
            idx:  [B, N, K] padded neighbor ids.
            mask: [B, N, K] validity (true-cutoff).
            box:  scalar, [B], or [B, 3].
            length_mean, length_std: scalars from the streaming edge-length
                normalizer (updated outside, in the train step).
            node_feat: [B, N, F] one-hot species feature (water variants).
            bond: [B, N, K] bond channel, or None.
        """
        cfg = self.cfg
        b, n, _ = pos.shape
        dtype = jnp.dtype(cfg.compute_dtype)
        cdtype = None if dtype == jnp.float32 else dtype

        # ---- edge encoder parameters (explicit: shared by XLA and Pallas
        # paths; reference MLP hl=3 + LayerNorm, nn_module.py:598-600) ------
        in_feats = 3 + 1 + (cfg.n_rbf if cfg.expand_edge else 0) \
            + (1 if self.use_bond else 0)
        init_w = nn.initializers.lecun_normal()
        init_b = nn.initializers.zeros_init()
        w0 = self.param("edge_encoder_w0", init_w, (in_feats, cfg.hidden_dim))
        b0 = self.param("edge_encoder_b0", init_b, (cfg.hidden_dim,))
        w1 = self.param("edge_encoder_w1", init_w,
                        (cfg.hidden_dim, cfg.hidden_dim))
        b1 = self.param("edge_encoder_b1", init_b, (cfg.hidden_dim,))
        w2 = self.param("edge_encoder_w2", init_w,
                        (cfg.hidden_dim, cfg.edge_embedding_dim))
        b2 = self.param("edge_encoder_b2", init_b, (cfg.edge_embedding_dim,))
        ln_scale = self.param("edge_ln_scale", nn.initializers.ones_init(),
                              (cfg.edge_embedding_dim,))
        ln_bias = self.param("edge_ln_bias", init_b,
                             (cfg.edge_embedding_dim,))
        act = get_activation(cfg.mlp_activation)

        pallas_encoder_ok = (cfg.use_pallas and cfg.use_pallas_encoder
                             and not train
                             and not self.use_bond and cfg.expand_edge
                             and jnp.ndim(box) == 0)
        if pallas_encoder_ok:
            from gamd_tpu.ops.pallas_encoder import fused_edge_encoder
            e, mask = jax.vmap(
                lambda p, i, m: fused_edge_encoder(
                    p, i, m, box, None, length_mean, length_std,
                    w0, b0, w1, b1, w2, b2, ln_scale, ln_bias,
                    rbf_low=cfg.rbf_low, rbf_high=cfg.rbf_high,
                    rbf_gap=cfg.rbf_gap, flip_dir=cfg.flip_dir)
            )(pos, idx, mask)
        else:
            unit, dist = edge_geometry(pos, idx, box, flip_dir=cfg.flip_dir)
            std_dist = (dist - length_mean) / length_std       # [B, N, K]
            feats = [unit, std_dist[..., None]]
            if cfg.expand_edge:
                feats.append(rbf_expand(std_dist, cfg.rbf_low, cfg.rbf_high,
                                        cfg.rbf_gap))
            if self.use_bond:
                if bond is None:
                    raise ValueError("use_bond=True requires a bond channel")
                feats.append(bond[..., None])
            edge_feat = jnp.concatenate(feats, axis=-1)
            if cdtype is not None:
                edge_feat = edge_feat.astype(cdtype)
            ew = (lambda x: x) if cdtype is None else (
                lambda x: x.astype(cdtype))
            z = act(edge_feat @ ew(w0) + ew(b0))
            z = act(z @ ew(w1) + ew(b1))
            e = z @ ew(w2) + ew(b2)
            e = nn.LayerNorm(name="edge_layer_norm",
                             use_scale=False, use_bias=False)(e)
            e = e * ln_scale + ln_bias
            e = nn.Dropout(cfg.dropout, name="edge_dropout")(
                e, deterministic=not train)

        # ---- node encoding ------------------------------------------------
        if self.species == "lj":
            node_emb = self.param(
                "node_emb", nn.initializers.normal(stddev=1.0),
                (1, cfg.encoding_size))
            h = jnp.broadcast_to(node_emb, (b, n, cfg.encoding_size))
        else:
            if node_feat is None:
                raise ValueError("water variants require node_feat one-hot")
            h = nn.Dense(cfg.encoding_size, dtype=cdtype,
                         name="node_encoder")(node_feat)

        # ---- message passing + decode --------------------------------------
        if cdtype is not None:
            h = h.astype(cdtype)
        h = ConvBlock(node_dim=cfg.encoding_size,
                      conv_layers=cfg.conv_layers,
                      hidden_dim=cfg.hidden_dim,
                      activation=cfg.conv_activation,
                      use_layer_norm=cfg.use_layer_norm,
                      drop_edge=cfg.drop_edge,
                      update_edge_emb=cfg.update_edge,
                      dtype=cdtype,
                      use_pallas=cfg.use_pallas,
                      name="graph_conv")(h, e, idx, mask, train=train)

        out = MLP(cfg.out_feats, hidden_dim=cfg.hidden_dim, hidden_layer=2,
                  activation=cfg.mlp_activation, dtype=cdtype,
                  name="graph_decoder")(h)
        return out.astype(jnp.float32)
