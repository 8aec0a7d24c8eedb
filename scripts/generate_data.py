#!/usr/bin/env python
"""Generate classical ground-truth training data (the reference's
dataset/generate_*_data.py, OpenMM-free).

Example:
    python scripts/generate_data.py --out ./md_dataset/lj_data \
        --seeds 10 --frames 1000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--system", default="lj",
                        choices=["lj", "tip3p", "tip4p", "rpbe"])
    parser.add_argument("--out", default="./md_dataset/lj_data")
    parser.add_argument("--seeds", default=10, type=int)
    parser.add_argument("--temperature", default=None, type=float,
                        help="LJ generation temperature override (K); "
                             "extra high-T seeds cover the repulsive core")
    parser.add_argument("--seed_start", default=0, type=int,
                        help="first trajectory seed index (extra training "
                             "seeds beyond the canonical 10 are generated "
                             "with --seed_start 10 into the same dir)")
    parser.add_argument("--frames", default=1000, type=int)
    parser.add_argument("--interval", default=50, type=int)
    parser.add_argument("--particles", default=258, type=int)
    parser.add_argument("--flexible", action="store_true",
                        help="water only: flexible harmonic monomers at "
                             "dt 0.5 fs instead of rigid SETTLE at 2 fs")
    parser.add_argument("--dispatch_frames", default=250, type=int,
                        help="frames recorded per device program")
    parser.add_argument("--electrostatics", default="ewald",
                        choices=["ewald", "dsf"],
                        help="water Coulomb treatment: full Ewald sum "
                             "(reference PME protocol, default) or the "
                             "rounds-1-3 damped-shifted-force cutoff")
    args = parser.parse_args()

    import jax
    # TPU default matmul precision is bf16 — full precision for ground
    # truth (constraint/rotation math; negligible cost in generation).
    jax.config.update("jax_default_matmul_precision", "highest")

    if args.system == "rpbe":
        from gamd_tpu.physics.generate import generate_rpbe_surrogate
        generate_rpbe_surrogate(args.out, frames_per_box=args.frames,
                                record_interval=args.interval,
                                rigid=not args.flexible,
                                frames_per_dispatch=args.dispatch_frames)
        print(f"Wrote RPBE surrogate npz to {args.out}")
        return
    if args.system == "lj":
        from gamd_tpu.physics.generate import generate_lj_dataset
        generate_lj_dataset(args.out, seeds=args.seeds,
                            frames_per_seed=args.frames,
                            record_interval=args.interval,
                            n_particles=args.particles,
                            frames_per_dispatch=args.dispatch_frames,
                            seed_start=args.seed_start,
                            temperature=args.temperature)
    elif args.system == "tip4p":
        from gamd_tpu.physics.generate import generate_tip4p_dataset
        generate_tip4p_dataset(args.out, seeds=args.seeds,
                               frames_per_seed=args.frames,
                               record_interval=args.interval,
                               rigid=not args.flexible,
                               frames_per_dispatch=args.dispatch_frames,
                               electrostatics=args.electrostatics)
    else:
        from gamd_tpu.physics.generate import generate_water_dataset
        generate_water_dataset(args.out, seeds=args.seeds,
                               frames_per_seed=args.frames,
                               record_interval=args.interval,
                               n_molecules=args.particles if args.particles != 258 else 258,
                               rigid=not args.flexible,
                               frames_per_dispatch=args.dispatch_frames,
                               electrostatics=args.electrostatics,
                               seed_start=args.seed_start)
    print(f"Wrote {args.seeds * args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
