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
