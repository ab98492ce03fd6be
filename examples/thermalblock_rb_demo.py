#!/usr/bin/env python
"""Thermalblock reduced-basis demo — the analog of the reference's
examples/linearelliptic/thermalblock_main.py full pyMOR workflow
(perform_standard_rb / perform_lrbms / test_quality, survey 3.5).

Runs the block-SWIPDG thermalblock, trains a standard RB and an LRBMS basis
with greedy, checks reduction quality against detailed solves, and saves the
reduced model.

Usage:  python examples/thermalblock_rb_demo.py [--platform cpu]
"""
import argparse
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    parser.add_argument("--num-blocks", type=int, nargs=2, default=[2, 2])
    parser.add_argument("--num-partitions", type=int, nargs=2, default=[2, 2])
    parser.add_argument("--refinements", type=int, default=2)
    parser.add_argument("--training-samples", type=int, default=8)
    parser.add_argument("--target-error", type=float, default=1e-6)
    parser.add_argument("--max-rb-size", type=int, default=12)
    parser.add_argument("--test-samples", type=int, default=5)
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from dune_hdd_tpu.discretizations.block_swipdg import BlockSWIPDGDiscretization
    from dune_hdd_tpu.grid import alu_cube_grid
    from dune_hdd_tpu.mor import (
        RBReductor,
        greedy_lrbms,
        greedy_rb,
        sample_randomly,
        save_reduced_model,
    )
    from dune_hdd_tpu.problems import ThermalblockProblem

    grid = alu_cube_grid((0, 0), (1, 1), (4, 4), refinements=args.refinements)
    problem = ThermalblockProblem(tuple(args.num_blocks))
    d = BlockSWIPDGDiscretization(
        grid, {"type": "stuff.grid.boundaryinfo.alldirichlet"}, problem,
        num_partitions=tuple(args.num_partitions),
    )
    print(f"detailed model: {d.space.num_dofs} DoFs, "
          f"{d.num_subdomains()} subdomains, mu in R^{np.prod(args.num_blocks)}")

    training = sample_randomly(d.parameter_type, 0.1, 1.0, args.training_samples)

    print("\n== standard RB greedy (gram_schmidt extension, h1_semi norm) ==")
    t0 = time.perf_counter()
    rb = greedy_rb(d, training, target_error=args.target_error,
                   max_extensions=args.max_rb_size, verbose=True)
    print(f"  basis size {rb.basis.shape[0]} in {time.perf_counter()-t0:.1f}s")

    print("\n== LRBMS greedy (per-subdomain local bases, local h1_semi) ==")
    t0 = time.perf_counter()
    lrbms = greedy_lrbms(d, training, target_error=args.target_error,
                         max_extensions=args.max_rb_size, verbose=True)
    print(f"  basis size {lrbms.basis.shape[0]} in {time.perf_counter()-t0:.1f}s")

    print("\n== quality check vs detailed solves (random test parameters) ==")
    reductor = RBReductor(d)
    tests = sample_randomly(d.parameter_type, 0.1, 1.0, args.test_samples, seed=123)
    for name, result in (("rb", rb), ("lrbms", lrbms)):
        errs = [reductor.true_error(result.reduced_model, mu) for mu in tests]
        print(f"  {name:6s}: max err {max(errs):.3e}  mean {np.mean(errs):.3e}")

    path = save_reduced_model(rb.reduced_model, "thermalblock_rb_model")
    print(f"\nsaved reduced model to {path}")


if __name__ == "__main__":
    main()
