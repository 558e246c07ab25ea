#!/usr/bin/env python
"""Generate cached ground-truth Rosenbrock samples via a long NUTS run.

The Rosenbrock density has no exact sampler; Sliced-W2 evaluation uses a
cached long-run NUTS sample set instead (the reference ships pre-generated
``rosenbrock_{20,50}d.npy`` files and this generation script, both missing
from its snapshot — reference targets.py:646-684).

Usage:
    python generate_rosenbrock_reference.py --dim 20
    python generate_rosenbrock_reference.py --dim 50 --n-samples 50000
"""

import argparse

import jax


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dim", type=int, default=20, help="20 or 50 (reference parity)")
    parser.add_argument("--scale", type=float, default=0.1)
    parser.add_argument("--n-samples", type=int, default=50000)
    parser.add_argument("--n-chains", type=int, default=32)
    parser.add_argument("--num-warmup", type=int, default=2000)
    parser.add_argument("--thin", type=int, default=4)
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    jax.config.update("jax_enable_x64", True)

    from mcmc_tpu.targets.rosenbrock_reference import generate_rosenbrock_reference
    samples = generate_rosenbrock_reference(
        dim=args.dim, scale=args.scale, n_samples=args.n_samples,
        n_chains=args.n_chains, num_warmup=args.num_warmup, seed=args.seed,
        thin=args.thin)
    print(f"Saved {samples.shape[0]} reference samples for Rosenbrock "
          f"{args.dim}D (scale={args.scale})")


if __name__ == "__main__":
    main()
