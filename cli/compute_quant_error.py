#!/usr/bin/env python
"""Analytical SQNR study CLI — counterpart of the reference's
compute_quant_error.py.  Runs on whatever jax backend is default (TPU when
available; the candidate sweep is a single device computation there).

Usage: python cli/compute_quant_error.py [--n-samples N] [--seed S] [--cpu]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-samples", type=int, default=5_000_000)
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--num-candidates", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from fp8_quantization_tpu.analytical.study import run_full_study
    run_full_study(n_samples=args.n_samples, seed=args.seed,
                   num_candidates=args.num_candidates)


if __name__ == "__main__":
    main()
