"""NHC-megastep lowering probe (round-4 design prerequisite).

The PLAN.md design note for an in-kernel Nose-Hoover megastep flags two
unverified Mosaic lowerings before the design can be committed:

  A. SMEM/scalar math: the chain update is M=10 SEQUENTIAL scalar updates
     per YS substep, each involving a scalar `exp` — scalar transcendental
     lowering on this backend is unverified.
  B. Vector fallback: hold the chain as a [1, 128] VMEM vector, compute
     `exp` on the full vector (VPU — known to lower, the megakernel already
     uses sigmoid), and do lane-masked updates with static-index extracts
     (~500 vector ops per NHC half-step; compile-size risk).

This probe builds BOTH variants as toy Pallas kernels around the exact
production chain math (`gamd_tpu/md/integrators._nhc_propagate`, itself a
functional transcription of reference hack_integrator.py:289-316), checks
numerics against the XLA implementation, and times a carried fori_loop of
repeated half-step propagations (the accumulator rides the loop carry —
see RESULTS.md round-3 measurement-integrity note: unthreaded in-kernel
loops collapse on Mosaic).

Verdict semantics for the round-4 decision:
  - variant compiles + parity < 1e-5 + per-halfstep cost ~ a few us
    -> NHC megastep is buildable with that representation.
  - scalar variant fails to lower -> use the vector representation.
  - both fail -> keep Langevin as the only megastep integrator.

Run on the chip (default) or CPU interpret mode (--cpu).
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gamd_tpu.md.integrators import _YS_WEIGHTS, _nhc_propagate

M = 10          # chain length (reference default)
N_C = 5         # MTS subdivisions
N_YS = 5        # Yoshida-Suzuki order
LANES = 128


def _schedule(dt):
    """Flattened (n_c * n_ys) YS/MTS weight schedule, as python floats."""
    ys = _YS_WEIGHTS[N_YS]
    return [float(w) * dt / N_C for _ in range(N_C) for w in ys]


def _chain_body_scalar(xi, vxi, g, ke2, scale, wdts, q, kt, ndf):
    """One NHC half-step on python lists of scalar tracers (unrolled)."""
    g[0] = (ke2 - ndf * kt) / q[0]
    for wdt in wdts:
        vxi[M - 1] = vxi[M - 1] + 0.25 * wdt * g[M - 1]
        for j in range(M - 2, -1, -1):
            aa = jnp.exp(-0.125 * wdt * vxi[j + 1])
            vxi[j] = aa * (aa * vxi[j] + 0.25 * wdt * g[j])
        aa = jnp.exp(-0.5 * wdt * vxi[0])
        scale = scale * aa
        for j in range(M):
            xi[j] = xi[j] + 0.5 * wdt * vxi[j]
        g[0] = (scale * scale * ke2 - ndf * kt) / q[0]
        for j in range(M - 1):
            aa = jnp.exp(-0.125 * wdt * vxi[j + 1])
            vxi[j] = aa * (aa * vxi[j] + 0.25 * wdt * g[j])
            g[j + 1] = (q[j] * vxi[j] * vxi[j] - kt) / q[j + 1]
        vxi[M - 1] = vxi[M - 1] + 0.25 * wdt * g[M - 1]
    return xi, vxi, g, scale


def _make_kernel_scalar(wdts, q, kt, ndf, reps, interpret=False):
    """Variant A: chain state lives as SMEM scalars; scalar exp per update."""

    def kernel(xi_ref, vxi_ref, g_ref, ke2_ref, xi_o, vxi_o, g_o, out_ref):
        def body(_, carry):
            xi, vxi, g, ke2, total = carry
            xi, vxi, g, scale = _chain_body_scalar(
                list(xi), list(vxi), list(g), ke2, jnp.float32(1.0),
                wdts, q, kt, ndf)
            return (tuple(xi), tuple(vxi), tuple(g),
                    scale * scale * ke2, total * scale)

        init = (tuple(xi_ref[j] for j in range(M)),
                tuple(vxi_ref[j] for j in range(M)),
                tuple(g_ref[j] for j in range(M)),
                ke2_ref[0], jnp.float32(1.0))
        xi, vxi, g, ke2, total = jax.lax.fori_loop(0, reps, body, init)
        for j in range(M):
            xi_o[j] = xi[j]
            vxi_o[j] = vxi[j]
            g_o[j] = g[j]
        out_ref[0] = total
        out_ref[1] = ke2

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[smem((M,)), smem((M,)), smem((M,)), smem((1,))],
        out_specs=[smem((M,)), smem((M,)), smem((M,)), smem((2,))],
        out_shape=[jax.ShapeDtypeStruct((M,), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((2,), jnp.float32)],
        interpret=interpret,
    )


def _make_kernel_vector(wdts, q, kt, ndf, reps, interpret=False):
    """Variant B: chain state as [1,128] VMEM vectors; vector exp + masked
    lane updates; scalars only via static-index extracts."""

    def kernel(xi_ref, vxi_ref, g_ref, ke2_ref, xi_o, vxi_o, g_o, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def setl(vec, j, val):
            return jnp.where(lane == j, val, vec)

        def body(_, carry):
            xi, vxi, g, ke2, total = carry
            scale = jnp.float32(1.0)
            g = setl(g, 0, (ke2 - ndf * kt) / q[0])
            for wdt in wdts:
                vxi = setl(vxi, M - 1, vxi[0, M - 1] + 0.25 * wdt * g[0, M - 1])
                for j in range(M - 2, -1, -1):
                    aa_v = jnp.exp(-0.125 * wdt * vxi)      # full-vector exp
                    aa = aa_v[0, j + 1]
                    vxi = setl(vxi, j, aa * (aa * vxi[0, j] + 0.25 * wdt * g[0, j]))
                aa_v = jnp.exp(-0.5 * wdt * vxi)
                scale = scale * aa_v[0, 0]
                xi = xi + 0.5 * wdt * vxi                    # whole-vector
                g = setl(g, 0, (scale * scale * ke2 - ndf * kt) / q[0])
                for j in range(M - 1):
                    aa_v = jnp.exp(-0.125 * wdt * vxi)
                    aa = aa_v[0, j + 1]
                    vxi = setl(vxi, j, aa * (aa * vxi[0, j] + 0.25 * wdt * g[0, j]))
                    g = setl(g, j + 1,
                             (q[j] * vxi[0, j] * vxi[0, j] - kt) / q[j + 1])
                vxi = setl(vxi, M - 1, vxi[0, M - 1] + 0.25 * wdt * g[0, M - 1])
            return xi, vxi, g, scale * scale * ke2, total * scale

        init = (xi_ref[:, :], vxi_ref[:, :], g_ref[:, :],
                ke2_ref[0, 0], jnp.float32(1.0))
        xi, vxi, g, ke2, total = jax.lax.fori_loop(0, reps, body, init)
        xi_o[:, :] = xi
        vxi_o[:, :] = vxi
        g_o[:, :] = g
        out_ref[:, :] = jnp.where(lane == 0, total, jnp.where(lane == 1, ke2,
                                                              0.0))

    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((1, LANES), jnp.float32)] * 4,
        interpret=interpret,
    )


def _reference(xi0, vxi0, g0, ke2, q, kt, ndf, dt, reps):
    """XLA reference: production _nhc_propagate applied `reps` times with
    ke2 threaded through the velocity scale (unit vel/mass carrier)."""
    vel = jnp.ones((1, 3), jnp.float32)
    masses = jnp.full((1,), float(ke2) / 3.0, jnp.float32)  # sum m v^2 = ke2
    xi, vxi, g = jnp.asarray(xi0), jnp.asarray(vxi0), jnp.asarray(g0)
    total = 1.0
    ys = _YS_WEIGHTS[N_YS]
    for _ in range(reps):
        vel2, xi, vxi, g = _nhc_propagate(
            vel, xi, vxi, g, masses, kt, ndf, jnp.asarray(q), dt, N_C, ys)
        s = float(vel2[0, 0] / vel[0, 0])
        total *= s
        masses = masses * s * s
    return np.asarray(xi), np.asarray(vxi), np.asarray(g), total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="interpret mode")
    ap.add_argument("--reps", type=int, default=400)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")

    # Liquid-argon-ish numbers (t0-native units as in md/simulate.py).
    kt, ndf, dt, freq = 0.8314, 771.0, 0.01, 5.0
    q_single = kt / freq**2
    q = [ndf * q_single] + [q_single] * (M - 1)
    wdts = _schedule(dt)
    rng = np.random.default_rng(0)
    xi0 = rng.normal(0, 0.1, M).astype(np.float32)
    vxi0 = rng.normal(0, 0.5, M).astype(np.float32)
    g0 = np.full(M, -(freq**2), np.float32)
    ke2 = float(ndf * kt * 1.07)  # slightly hot

    ref_xi, ref_vxi, ref_g, ref_total = _reference(
        xi0, vxi0, g0, ke2, q, kt, ndf, dt, 3)

    pad = lambda a: np.pad(a, (0, LANES - M)).reshape(1, LANES).astype(np.float32)

    for name, maker in (("scalar/SMEM", _make_kernel_scalar),
                        ("vector/VMEM", _make_kernel_vector)):
        for reps in (3, args.reps):
            try:
                call = maker(wdts, q, kt, ndf, reps, interpret=args.cpu)
                if name == "scalar/SMEM":
                    ins = (jnp.asarray(xi0), jnp.asarray(vxi0),
                           jnp.asarray(g0), jnp.asarray([ke2], jnp.float32))
                else:
                    ins = (jnp.asarray(pad(xi0)), jnp.asarray(pad(vxi0)),
                           jnp.asarray(pad(g0)),
                           jnp.asarray(pad(np.array([ke2] + [0.0] * (M - 1),
                                                    np.float32))))
                fn = jax.jit(lambda *a: call(*a))
                t0 = time.perf_counter()
                outs = jax.block_until_ready(fn(*ins))
                compile_s = time.perf_counter() - t0
                # steady-state timing
                n_timed = 20
                t0 = time.perf_counter()
                for _ in range(n_timed):
                    outs = jax.block_until_ready(fn(*ins))
                per_call = (time.perf_counter() - t0) / n_timed
                if name == "scalar/SMEM":
                    xi, vxi, g, aux = [np.asarray(o) for o in outs]
                    total = float(aux[0])
                else:
                    xi, vxi, g, aux = [np.asarray(o)[0, :M] for o in outs[:3]] + [
                        np.asarray(outs[3])]
                    total = float(aux[0, 0])
                if reps == 3:
                    err = max(np.abs(xi - ref_xi).max(),
                              np.abs(vxi - ref_vxi).max(),
                              np.abs(g[:2] - ref_g[:2]).max(),
                              abs(total - ref_total))
                    print(f"[{name}] reps=3 parity max-abs-err {err:.3e} "
                          f"(compile {compile_s:.1f}s)")
                else:
                    print(f"[{name}] reps={reps}: {per_call * 1e6:.1f} us/call "
                          f"-> {per_call / reps * 1e6:.3f} us per NHC "
                          f"half-step (compile {compile_s:.1f}s)")
            except Exception as e:  # lowering failures are the probe's data
                print(f"[{name}] reps={reps} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}")
    print("probe done")


if __name__ == "__main__":
    main()
