"""GAMD-TPU: a TPU-native machine-learned molecular dynamics engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of BaratiLab/GAMD
(graph-neural-network accelerated molecular dynamics): it trains an edge-gated
message-passing GNN to predict per-atom forces for periodic particle systems
(LJ fluid, TIP3P / TIP4P-Ew water, DFT-quality RPBE water) and then runs NVT
molecular dynamics (velocity-Verlet, BAOAB Langevin, Nose-Hoover chains,
Andersen) with the GNN as the force field — all inside a single jitted device
program with fixed-capacity padded neighbor lists.

Subpackages
-----------
core       periodic-space math, units, configuration presets
neighbors  jit-compatible neighbor search (dense top-K + cell list)
models     GNN force-field models (flax) + streaming normalizers
ops        aggregation kernels (XLA reference + Pallas fused)
train      datasets, augmentation, training loop, checkpointing
md         integrators + fused lax.scan simulation driver
physics    classical reference potentials, minimizer, RDF, data generation
parallel   device-mesh helpers, data parallelism, spatial sharding
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Point JAX's persistent compilation cache at a repo-local directory.

    The tile-136 megastep kernel compiles in ~20 minutes on the tunneled
    backend and nothing persisted it: every bench/train/rollout process paid
    the full compile. The cache directory defaults to results/xla_cache.
    NOTE: the directory is git-ignored (compiled executables grow to
    hundreds of MB), so the cache persists across PROCESSES within a
    session but NOT across session-boundary wipes. Overridable or disabled
    via GAMD_XLA_CACHE (set to "0"/"off" to disable). If the embedding
    process already configured jax_compilation_cache_dir, it is respected
    and this helper does nothing.
    """
    import os

    target = os.environ.get("GAMD_XLA_CACHE")
    if target in ("0", "off", "none"):
        return
    if not target:
        target = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "results", "xla_cache")
    try:
        import jax

        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return  # respect a cache dir the embedding process already set
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        # Cache everything that took meaningful compile time; the default
        # (1 s) already covers the megastep, but be explicit.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization — never block import
        pass


_enable_persistent_compile_cache()
