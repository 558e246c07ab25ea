"""Standalone tune-and-sample CLI (parity: reference tuning/core.py).

Tunes a sampler on a target, then samples adaptively in batches until the
minimum bulk ESS reaches a target, with grid search over trajectory length for
HMC/GRAHMC. Flag surface matches the reference's argparse (core.py:804-902).

Differences from the reference (documented):
- ESS is computed on device (mcmc_tpu.diagnostics) instead of arviz,
- warmup goes through run_adaptive_warmup with the corrected call signature
  (the reference's own main() calls it with stale argument order —
  SURVEY.md §0),
- NUTS gradient accounting uses sum(2^depth - 1), consistent with the
  benchmark runner (the reference uses 2^(d+1)-1 here and 2^d-1 there).

Run: python -m mcmc_tpu.tuning.core --sampler grahmc --target neals_funnel
"""

import argparse
import os
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import random

from mcmc_tpu.targets import get_target, TargetDistribution
from mcmc_tpu.diagnostics import compute_diagnostics
from mcmc_tpu.samplers import (
    rwmh_run, hmc_run, nuts_run, grahmc_run, get_friction_schedule,
    default_steepness,
)
from mcmc_tpu.tuning.dual_averaging import dual_averaging_tune_rwmh
from mcmc_tpu.tuning.adaptation import run_adaptive_warmup

DEFAULT_HMC_GRID = [1, 2, 4, 8, 16, 32, 64]
DEFAULT_GRAHMC_GRID = [8, 16, 32, 64]


def _init_position(key, target: TargetDistribution, n_chains: int):
    if target.init_sampler is not None:
        return target.init_sampler(key, n_chains)
    return random.normal(key, (n_chains, target.dim)) * 2.0


def _adaptive_sample(key, run_batch: Callable, init_position, target_ess: int,
                     batch_size: int, max_samples: int) -> Dict:
    """Sample in batches until min bulk ESS >= target_ess (or max_samples).

    run_batch: (key, position) -> RunResult. Returns dict with concatenated
    samples/log_probs, per-batch info list, and totals.
    """
    pieces, infos = [], []
    position = init_position
    total = 0
    batch_num = 0
    min_ess = 0.0
    while total < max_samples:
        batch_num += 1
        key, sub = random.split(key)
        res = run_batch(sub, position)
        position = res.final_state.position
        pieces.append(res)
        total += batch_size

        samples = jnp.concatenate([p.samples for p in pieces], axis=0)
        diag = compute_diagnostics(samples)
        min_ess = diag["ess_bulk_min"]
        print(f"  batch {batch_num}: {total} samples, "
              f"min ESS = {min_ess:.1f}, mean ESS = {diag['ess_bulk_mean']:.1f}")
        if min_ess >= target_ess:
            print("  target ESS reached")
            break

    samples = jnp.concatenate([p.samples for p in pieces], axis=0)
    log_probs = jnp.concatenate([p.log_probs for p in pieces], axis=0)
    return {
        "samples": samples,
        "log_probs": log_probs,
        "pieces": pieces,
        "total_samples": total,
        "final_accept_rate": pieces[-1].accept_rate,
    }


def _print_diagnostics(diag: Dict, target_ess: int):
    print(f"\nSplit R-hat (rank-normalized): max {diag['rhat_max']:.4f} "
          f"mean {diag['rhat_mean']:.4f} "
          f"[{'PASS' if diag['rhat_max'] < 1.01 else 'FAIL'} @ 1.01]")
    print(f"Bulk ESS: min {diag['ess_bulk_min']:.1f} mean "
          f"{diag['ess_bulk_mean']:.1f} "
          f"[{'PASS' if diag['ess_bulk_min'] >= target_ess else 'FAIL'} "
          f"@ {target_ess}]")
    print(f"Tail ESS: min {diag['ess_tail_min']:.1f} mean "
          f"{diag['ess_tail_mean']:.1f}")


def tune_and_sample_rwmh(key, target: TargetDistribution, n_chains: int = 4,
                         target_ess: int = 1000, batch_size: int = 2000,
                         max_samples: int = 50000,
                         warmup_steps: int = 2000) -> Dict:
    """DA-tune the RWMH scale, then sample adaptively until target ESS."""
    key, init_key, tune_key = random.split(key, 3)
    init_pos = _init_position(init_key, target, n_chains)

    print(f"\nTUNING RWMH on {target.name} ({n_chains} chains)")
    scale, history = dual_averaging_tune_rwmh(
        tune_key, target.log_prob_fn, init_pos, max_iter=warmup_steps)
    print(f"Tuned scale: {scale:.4f}")

    def run_batch(k, pos):
        return rwmh_run(k, target.log_prob_fn, pos, num_samples=batch_size,
                        scale=scale, burn_in=0)

    out = _adaptive_sample(key, run_batch, init_pos, target_ess, batch_size,
                           max_samples)
    diag = compute_diagnostics(out["samples"])
    _print_diagnostics(diag, target_ess)
    return {
        "scale": scale,
        "history": history,
        "samples": out["samples"],
        "log_probs": out["log_probs"],
        "accept_rate": out["final_accept_rate"],
        "mean_acceptance": float(jnp.mean(out["final_accept_rate"])),
        "diagnostics": diag,
        "total_samples": out["total_samples"],
    }


def tune_and_sample_nuts(key, target: TargetDistribution, n_chains: int = 4,
                         target_ess: int = 1000, batch_size: int = 2000,
                         max_samples: int = 50000, warmup_steps: int = 1000,
                         max_tree_depth: int = 10) -> Dict:
    """Warmup-tune NUTS (step size + mass matrix), sample until target ESS."""
    key, init_key, tune_key = random.split(key, 3)
    init_pos = _init_position(init_key, target, n_chains)

    print(f"\nTUNING NUTS on {target.name} ({n_chains} chains)")
    step_size, inv_mass, warm_pos, tune_info = run_adaptive_warmup(
        "nuts", target.log_prob_fn, None, init_pos, tune_key,
        num_warmup=warmup_steps, max_tree_depth=max_tree_depth,
        value_and_grad_fn=target.value_and_grad_fn)
    print(f"Tuned step size: {step_size:.4f}")

    def run_batch(k, pos):
        return nuts_run(k, target.log_prob_fn, pos, step_size=step_size,
                        num_samples=batch_size, burn_in=0,
                        inv_mass_matrix=inv_mass, max_tree_depth=max_tree_depth,
                        value_and_grad_fn=target.value_and_grad_fn)

    out = _adaptive_sample(key, run_batch, warm_pos, target_ess, batch_size,
                           max_samples)
    tree_depths = jnp.concatenate(
        [p.info["tree_depths"] for p in out["pieces"]], axis=0)
    mean_accepts = jnp.concatenate(
        [p.info["mean_accept_probs"] for p in out["pieces"]], axis=0)
    total_gradient_calls = int(jnp.sum(2 ** tree_depths - 1))

    diag = compute_diagnostics(out["samples"])
    _print_diagnostics(diag, target_ess)
    ess_per_sample = diag["ess_bulk_min"] / out["total_samples"]
    ess_per_gradient = (diag["ess_bulk_min"] / total_gradient_calls
                        if total_gradient_calls else 0.0)
    print(f"Gradient calls: {total_gradient_calls}, avg depth "
          f"{float(jnp.mean(tree_depths)):.2f}, ESS/grad {ess_per_gradient:.6f}")
    return {
        "step_size": step_size,
        "inv_mass_matrix": inv_mass,
        "max_tree_depth": max_tree_depth,
        "history": tune_info,
        "samples": out["samples"],
        "log_probs": out["log_probs"],
        "tree_depths": tree_depths,
        "mean_accept_probs": mean_accepts,
        "avg_mean_accept": float(jnp.mean(mean_accepts)),
        "diagnostics": diag,
        "total_samples": out["total_samples"],
        "total_gradient_calls": total_gradient_calls,
        "avg_tree_depth": float(jnp.mean(tree_depths)),
        "ess_per_sample": ess_per_sample,
        "ess_per_gradient": ess_per_gradient,
    }


def _tune_and_sample_trajectory_grid(key, target, n_chains, target_ess,
                                     batch_size, max_samples, warmup_steps,
                                     num_steps_grid, sampler: str,
                                     schedule_type: str = "constant") -> Dict:
    """Shared HMC/GRAHMC grid loop: warmup + adaptive sample per L, pick the
    best ESS/gradient configuration."""
    grid_results = []
    for L in num_steps_grid:
        print(f"\n{'=' * 60}\n{sampler.upper()} grid: L = {L}\n{'=' * 60}")
        key, init_key, tune_key, sample_key = random.split(key, 4)
        init_pos = _init_position(init_key, target, n_chains)
        step_size, inv_mass, warm_pos, info = run_adaptive_warmup(
            sampler, target.log_prob_fn, None, init_pos, tune_key,
            num_warmup=warmup_steps, num_steps=L,
            schedule_type=schedule_type if sampler == "grahmc" else None,
            value_and_grad_fn=target.value_and_grad_fn)

        if sampler == "hmc":
            def run_batch(k, pos):
                return hmc_run(k, target.log_prob_fn, pos, step_size=step_size,
                               num_steps=L, num_samples=batch_size, burn_in=0,
                               inv_mass_matrix=inv_mass,
                               value_and_grad_fn=target.value_and_grad_fn)
        else:
            def run_batch(k, pos):
                return grahmc_run(
                    k, target.log_prob_fn, pos, step_size=step_size,
                    num_steps=L, gamma=info.get("gamma", 1.0),
                    steepness=info.get("steepness", 2.0),
                    num_samples=batch_size, burn_in=0,
                    inv_mass_matrix=inv_mass,
                    friction_schedule=get_friction_schedule(schedule_type),
                    value_and_grad_fn=target.value_and_grad_fn)

        out = _adaptive_sample(sample_key, run_batch, warm_pos, target_ess,
                               batch_size, max_samples)
        diag = compute_diagnostics(out["samples"])
        total_gradient_calls = out["total_samples"] * L * n_chains
        ess_per_gradient = diag["ess_bulk_min"] / total_gradient_calls
        entry = {
            "num_steps": L,
            "step_size": step_size,
            "total_samples": out["total_samples"],
            "total_gradient_calls": total_gradient_calls,
            "ess_bulk_min": diag["ess_bulk_min"],
            "rhat_max": diag["rhat_max"],
            "ess_per_gradient": ess_per_gradient,
            "mean_acceptance": float(jnp.mean(out["final_accept_rate"])),
            "diagnostics": diag,
        }
        if sampler == "grahmc":
            entry["gamma"] = info.get("gamma")
            entry["steepness"] = info.get("steepness")
            entry["schedule"] = schedule_type
        grid_results.append(entry)
        print(f"  L={L}: ESS/grad = {ess_per_gradient:.6f}")

    best = max(grid_results, key=lambda r: r["ess_per_gradient"])
    print(f"\nBEST: L={best['num_steps']} step={best['step_size']:.4f} "
          f"ESS/grad={best['ess_per_gradient']:.6f}")
    return {"best_config": best, "grid_results": grid_results,
            "num_steps_grid": list(num_steps_grid)}


def tune_and_sample_hmc_grid(key, target, n_chains: int = 4,
                             target_ess: int = 1000, batch_size: int = 2000,
                             max_samples: int = 50000,
                             warmup_steps: int = 1000,
                             num_steps_grid: Optional[list] = None) -> Dict:
    if num_steps_grid is None:
        num_steps_grid = DEFAULT_HMC_GRID
    return _tune_and_sample_trajectory_grid(
        key, target, n_chains, target_ess, batch_size, max_samples,
        warmup_steps, num_steps_grid, "hmc")


def tune_and_sample_grahmc_grid(key, target, n_chains: int = 4,
                                target_ess: int = 1000, batch_size: int = 2000,
                                max_samples: int = 50000,
                                warmup_steps: int = 1000,
                                num_steps_grid: Optional[list] = None,
                                schedule_type: str = "constant") -> Dict:
    if num_steps_grid is None:
        num_steps_grid = DEFAULT_GRAHMC_GRID
    return _tune_and_sample_trajectory_grid(
        key, target, n_chains, target_ess, batch_size, max_samples,
        warmup_steps, num_steps_grid, "grahmc", schedule_type)


def main():
    # persistent XLA compilation cache (same policy as run_benchmarks.py)
    from mcmc_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="Tune MCMC sampler hyperparameters using dual averaging")
    parser.add_argument("--sampler", type=str, required=True,
                        choices=["rwmh", "hmc", "nuts", "grahmc"],
                        help="Sampler to tune")
    parser.add_argument("--target", type=str, default="standard_normal",
                        choices=["standard_normal", "correlated_gaussian",
                                 "ill_conditioned_gaussian", "neals_funnel",
                                 "rosenbrock"],
                        help="Target distribution")
    parser.add_argument("--schedule", type=str, default="constant",
                        choices=["constant", "tanh", "sigmoid", "linear", "sine"],
                        help="Friction schedule for GRAHMC")
    parser.add_argument("--dim", type=int, default=10)
    parser.add_argument("--chains", type=int, default=4)
    parser.add_argument("--target-ess", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=2000)
    parser.add_argument("--max-samples", type=int, default=50000)
    parser.add_argument("--warmup-steps", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--max-tree-depth", type=int, default=10)
    parser.add_argument("--num-steps-grid", type=str, default=None,
                        help="Comma-separated trajectory lengths for grid search")
    parser.add_argument("--max-cycles", type=int, default=10,
                        help="(kept for flag parity; coordinate-wise tuning "
                             "is superseded by sequential ESJD tuning)")
    parser.add_argument("--plot", action="store_true",
                        help="Generate diagnostic plots")
    parser.add_argument("--output-dir", type=str, default="./tuning_output")

    args = parser.parse_args()
    jax.config.update("jax_enable_x64", True)
    key = random.PRNGKey(args.seed)
    target = get_target(args.target, dim=args.dim)

    grid = ([int(x) for x in args.num_steps_grid.split(",")]
            if args.num_steps_grid else None)

    if args.sampler == "rwmh":
        results = tune_and_sample_rwmh(
            key, target, n_chains=args.chains, target_ess=args.target_ess,
            batch_size=args.batch_size, max_samples=args.max_samples,
            warmup_steps=args.warmup_steps)
    elif args.sampler == "nuts":
        results = tune_and_sample_nuts(
            key, target, n_chains=args.chains, target_ess=args.target_ess,
            batch_size=args.batch_size, max_samples=args.max_samples,
            warmup_steps=args.warmup_steps, max_tree_depth=args.max_tree_depth)
    elif args.sampler == "hmc":
        results = tune_and_sample_hmc_grid(
            key, target, n_chains=args.chains, target_ess=args.target_ess,
            batch_size=args.batch_size, max_samples=args.max_samples,
            warmup_steps=args.warmup_steps, num_steps_grid=grid)
    else:
        results = tune_and_sample_grahmc_grid(
            key, target, n_chains=args.chains, target_ess=args.target_ess,
            batch_size=args.batch_size, max_samples=args.max_samples,
            warmup_steps=args.warmup_steps, num_steps_grid=grid,
            schedule_type=args.schedule)

    if args.plot:
        os.makedirs(args.output_dir, exist_ok=True)
        from mcmc_tpu.tuning.plots import (plot_tuning_history,
                                           plot_sampling_diagnostics,
                                           plot_grid_comparison)
        if "history" in results and isinstance(results.get("history"), dict) \
                and ("scale_history" in results["history"]
                     or "step_size_history" in results["history"]):
            plot_tuning_history(
                results["history"], args.sampler.upper(),
                os.path.join(args.output_dir,
                             f"{args.sampler}_tuning_history.png"))
        if "samples" in results:
            plot_sampling_diagnostics(
                results["samples"], results["diagnostics"],
                args.sampler.upper(),
                os.path.join(args.output_dir,
                             f"{args.sampler}_diagnostics.png"))
        if "grid_results" in results:
            plot_grid_comparison(
                results["grid_results"], results["num_steps_grid"],
                os.path.join(args.output_dir,
                             f"{args.sampler}_grid_comparison.png"))

    return results


if __name__ == "__main__":
    main()
