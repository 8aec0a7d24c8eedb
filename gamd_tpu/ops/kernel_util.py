"""Shared utilities for the Pallas TPU kernels.

`trace_at_default_matmul_precision` exists because of a trace-time config
leak: rollout/eval CLIs pin ``jax_default_matmul_precision=highest``
globally for the XLA physics paths (augmentation/constraint math — the
round-2 bf16-default-matmul bug class), and that thread-local setting is
live while a Pallas kernel body is being traced. Inside the kernels every
dot already states its numerics explicitly — operands cast to bf16 with
fp32 accumulation (the hi/lo-split gathers), or kept fp32 where precision
is load-bearing — so the global override is never wanted, and it is
actively fatal: Mosaic rejects ``contract_precision<fp32>`` on bf16
operands with ``Bad lhs type`` (first hit by ``run_md.py --megakernel`` on
the N=774 bond-channel water path; bench.py/check_kernels.py never pin the
global, which is why the same kernel always compiled there). Tracing the
kernel body at DEFAULT reproduces exactly the lowering the benches and
parity checks have always validated, independent of caller config.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["trace_at_default_matmul_precision"]


def trace_at_default_matmul_precision(kernel):
    """Decorator: pin matmul precision to DEFAULT while tracing a kernel."""

    @functools.wraps(kernel)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("default"):
            return kernel(*args, **kwargs)

    return wrapped
