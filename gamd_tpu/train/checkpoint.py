"""Checkpointing: full train state + embedded config + reference scaler.npz.

The reference saves a Lightning .ckpt plus a side-car scaler_{epoch}.npz with
the force scaler's mean/var every 5 epochs (reference:
/root/reference/code/LJ/train_network_lj.py:318-350), and resumes via
load_state_dict + load_training_stats (:85-87,119-123) — the architecture
flags live only in the user's shell history. Here the whole TrainState
pytree (params, optimizer moments, normalizer stats, RNG, step) serializes
with flax msgpack in an envelope that ALSO carries the ModelConfig and
SystemConfig as JSON, so checkpoints are self-describing: eval/rollout CLIs
rebuild the exact architecture without re-specified flags. Legacy
(state-only) checkpoints from round 1 still load.

The scaler side-car keeps the exact reference npz key layout (mean=, var=)
so reference tooling can read it.
"""

import dataclasses
import json

import numpy as np
import flax.serialization

from gamd_tpu.models.normalizer import stat_from_values

_META_KEY = "__gamd_meta_json__"


def save_checkpoint(path, state, model_cfg=None, system=None):
    """Serialize state (+ optional ModelConfig / SystemConfig metadata)."""
    payload = {"state": flax.serialization.to_state_dict(state)}
    meta = {}
    if model_cfg is not None:
        meta["model"] = dataclasses.asdict(model_cfg)
    if system is not None:
        meta["system"] = dataclasses.asdict(system)
    payload[_META_KEY] = json.dumps(meta)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    return path


def _read(path):
    with open(path, "rb") as f:
        restored = flax.serialization.msgpack_restore(f.read())
    if isinstance(restored, dict) and _META_KEY in restored:
        return restored["state"], json.loads(restored[_META_KEY])
    return restored, {}          # legacy round-1 layout: bare state dict


def load_checkpoint(path, template_state):
    """Restore into a freshly-created template (shapes must match).
    Accepts both the envelope and legacy state-only layouts."""
    state_dict, _ = _read(path)
    return flax.serialization.from_state_dict(template_state, state_dict)


def load_checkpoint_meta(path):
    """The embedded {'model': ..., 'system': ...} dict ({} if legacy)."""
    _, meta = _read(path)
    return meta


def load_checkpoint_configs(path):
    """Rebuild (ModelConfig, SystemConfig) from an envelope checkpoint;
    returns (None, None) for legacy checkpoints."""
    from gamd_tpu.core.config import ModelConfig, SystemConfig

    meta = load_checkpoint_meta(path)
    model_cfg = ModelConfig(**meta["model"]) if "model" in meta else None
    system = None
    if "system" in meta:
        d = dict(meta["system"])
        d["masses"] = tuple(d["masses"])
        system = SystemConfig(**d)
    return model_cfg, system


def load_self_describing(path, fallback_model_cfg=None, fallback_system=None,
                         **model_overrides):
    """One-call restore for eval/rollout CLIs.

    Returns (state, model_cfg, system): configs come from the checkpoint
    envelope when present, else from the fallbacks (legacy checkpoints).
    `model_overrides` (e.g. use_pallas=True) are applied on top of whichever
    config wins — runtime toggles that don't change parameter shapes.
    """
    from gamd_tpu.core.config import TrainConfig
    from gamd_tpu.train.state import build_model, create_train_state

    model_cfg, system = load_checkpoint_configs(path)
    if model_cfg is None:
        model_cfg = fallback_model_cfg
    if system is None:
        system = fallback_system
    if model_cfg is None or system is None:
        raise ValueError(
            f"{path} is a legacy checkpoint without embedded config; "
            "pass the architecture flags explicitly")
    if model_overrides:
        model_cfg = dataclasses.replace(model_cfg, **model_overrides)
    model = build_model(model_cfg, system)
    template = create_train_state(model, system, TrainConfig(), 1)
    state = load_checkpoint(path, template)
    return state, model_cfg, system


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
