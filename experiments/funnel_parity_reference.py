"""Run the REFERENCE pipeline (/root/reference) on the Neal's-funnel config,
for the apples-to-apples funnel experiment (VERDICT r1 item 2).

The reference snapshot cannot run as shipped: `benchmarks/targets.py:506`
unconditionally imports the missing `benchmarks.rahmc_paper_targets`, and
`tuning/adaptation.py:282` imports the missing
`tuning.sequential_tune_grahmc`. This wrapper injects stand-in modules into
sys.modules implementing exactly the DOCUMENTED contracts
(`tuning/dual_averaging.py:684-708`: Phase 1 DA step-tune at conservative
gamma=0.5, Phase 2 ESJD coarse grid over [0.01,0.1,0.5,1.0,2.0,5.0] with 150
samples/eval; signature from `tuning/adaptation.py:286-300`), then invokes the
reference's own `run_benchmarks.main()` unmodified.

Usage:
    python experiments/funnel_parity_reference.py --output-dir /tmp/ref_funnel \
        --samplers nuts grahmc --dim 20 [--num-samples 10000 ...]
(all unrecognized flags are forwarded to the reference CLI.)
"""

import sys
import types

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import random  # noqa: E402


def _install_rahmc_paper_targets_stub():
    """The three factories exist only so `get_target` can import them; the
    funnel experiment never instantiates them."""
    mod = types.ModuleType("benchmarks.rahmc_paper_targets")

    def _missing(*a, **k):
        raise NotImplementedError(
            "rahmc_paper_targets is absent from the reference snapshot "
            "(SURVEY.md §0); this experiment does not use it")

    mod.multimodal_funnel_2d = _missing
    mod.concentric_l1_balls = _missing
    mod.nested_l1_balls = _missing
    sys.modules["benchmarks.rahmc_paper_targets"] = mod


def _install_sequential_tune_grahmc():
    """Documented-contract implementation using only reference components."""
    from samplers.GRAHMC import rahmc_run, get_friction_schedule
    from tuning.dual_averaging import da_init, da_update

    def _da_tune_step(key, log_prob_fn, position, num_steps, gamma,
                      schedule_type, steepness, target_accept, init_step,
                      inv_mass_matrix, max_iter):
        schedule = get_friction_schedule(schedule_type)
        da = da_init(init_step)
        batch = 100
        for it in range(max(1, max_iter // batch)):
            key, k = random.split(key)
            out = rahmc_run(k, log_prob_fn, position, step_size=float(
                np.exp(da.log_step)), num_steps=num_steps, gamma=gamma,
                steepness=steepness, num_samples=batch, burn_in=0,
                inv_mass_matrix=inv_mass_matrix, friction_schedule=schedule)
            position = out[3].position
            da = da_update(da, float(out[2].mean()), target_accept)
        return float(np.exp(da.log_step_bar)), position, key

    def sequential_tune_grahmc(key, log_prob_fn, grad_log_prob_fn,
                               init_position, num_steps,
                               schedule_type="constant", target_accept=0.65,
                               max_iter_step=1000, inv_mass_matrix=None,
                               init_step_size=0.1, gamma_coarse_values=None,
                               gamma_samples_per_eval=150):
        if gamma_coarse_values is None:
            gamma_coarse_values = [0.01, 0.1, 0.5, 1.0, 2.0, 5.0]
        steepness = {"tanh": 5.0, "sigmoid": 10.0}.get(schedule_type, 1.0)
        schedule = get_friction_schedule(schedule_type)

        # Phase 1: DA step-size tune at conservative gamma = 0.5
        step, position, key = _da_tune_step(
            key, log_prob_fn, init_position, num_steps, 0.5, schedule_type,
            steepness, target_accept, init_step_size, inv_mass_matrix,
            max_iter_step)

        # Phase 2: ESJD grid over gamma (short per-gamma step re-tune, then
        # 150-sample ESJD evaluation via the track_proposals path)
        history = {"gammas": [], "esjd": [], "steps": []}
        best = (-np.inf, step, gamma_coarse_values[0])
        for gamma in gamma_coarse_values:
            g_step, g_pos, key = _da_tune_step(
                key, log_prob_fn, position, num_steps, gamma, schedule_type,
                steepness, target_accept, step, inv_mass_matrix, 300)
            key, k = random.split(key)
            out = rahmc_run(k, log_prob_fn, g_pos, step_size=g_step,
                            num_steps=num_steps, gamma=gamma,
                            steepness=steepness,
                            num_samples=gamma_samples_per_eval, burn_in=0,
                            inv_mass_matrix=inv_mass_matrix,
                            friction_schedule=schedule, track_proposals=True)
            pre, prop, delta_h = out[4], out[6], out[8]
            alpha = jnp.exp(jnp.minimum(0.0, -delta_h))
            jumps = jnp.sum((prop - pre) ** 2, axis=-1)
            esjd = float(jnp.mean(alpha * jumps))
            history["gammas"].append(gamma)
            history["esjd"].append(esjd)
            history["steps"].append(g_step)
            if esjd > best[0]:
                best = (esjd, g_step, gamma)

        return best[1], best[2], steepness, history

    mod = types.ModuleType("tuning.sequential_tune_grahmc")
    mod.sequential_tune_grahmc = sequential_tune_grahmc
    sys.modules["tuning.sequential_tune_grahmc"] = mod


def _install_arviz_stub():
    """arviz is absent from this image; inject the numpy implementation of
    the same published diagnostics (experiments/_arviz_stub.py)."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _arviz_stub
    sys.modules["arviz"] = _arviz_stub


def main():
    _install_rahmc_paper_targets_stub()
    _install_sequential_tune_grahmc()
    _install_arviz_stub()
    import run_benchmarks
    sys.argv = ["run_benchmarks.py"] + sys.argv[1:]
    run_benchmarks.main()


if __name__ == "__main__":
    main()
