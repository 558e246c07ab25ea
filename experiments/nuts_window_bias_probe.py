"""Window-level emission-bias probe for the persistent-NUTS machine
(round 5; pins the residual z=7-10 the native-matrix log_gamma reparam
rows exposed at ~10M-ESS z-test power).

Mechanism: the persistent machine emits ONE draw per snapshot window
(uniform reservoir over the window's completed transitions), so a
transition's emission probability is 1/k(window). States with long
trajectories (large tau) see fewer completed transitions per window and
are oversampled — a milder cousin of the documented pi(x)E[tau] occupancy
bias of snapshot_mode='last'. Prediction: the transformed-mean bias
scales ~1/steps_per_sample (window length in slots).

Measured on expGamma (log_gamma_unconstrained, dim=10, 1024 chains,
10k draws, step 0.7523, multinomial scheme, 2026-08-21):

    sps=16   mean bias -0.00555   z_mean -20.2   (mode='uniform')
    sps=64   mean bias -0.00230   z_mean  -9.0
    sps=256  mean bias -0.00070   z_mean  -2.8
    sps=512  mean bias -0.000343  z_max    2.4   <- PASSES the gate
    sps=64   mean bias -0.00570   z_mean -22.5   (mode='last', the known
                                                  occupancy bias, for scale)

Remedy: --nuts-steps-per-sample 512 (or larger) drives the bias below
the Bonferroni z-gate's resolution even at 10M-ESS power; exact
per-transition emission (transition-count cadence instead of slot-count
cadence) would remove it exactly but changes the machine's fixed-dispatch
contract. Documented in BASELINE.md's bias audit.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
import jax.random as random
from scipy.special import digamma

from mcmc_tpu.targets import get_target
from mcmc_tpu.samplers import nuts_run_persistent
from mcmc_tpu.diagnostics import compute_diagnostics


def main():
    t = get_target('log_gamma_unconstrained', dim=10)
    init = t.init_sampler(random.PRNGKey(0), 1024)
    inv_mass = jnp.full(10, 0.651, jnp.float32)
    true_mean = float(digamma(2.0))

    for sps, mode in ((16, 'uniform'), (64, 'uniform'), (256, 'uniform'),
                      (512, 'uniform'), (64, 'last')):
        r = nuts_run_persistent(
            random.PRNGKey(42), t.log_prob_fn, init, step_size=0.7523,
            num_samples=10000, steps_per_sample=sps,
            burn_in_steps=2048, inv_mass_matrix=inv_mass, max_tree_depth=10,
            value_and_grad_fn=t.value_and_grad_fn,
            proposal_scheme='multinomial', snapshot_mode=mode)
        d = compute_diagnostics(np.asarray(r.samples))
        means = np.asarray(d['summary']['mean'])
        mcse = np.asarray(d['summary']['mcse_mean'])
        z = (means - true_mean) / mcse
        print(json.dumps({
            'sps': sps, 'mode': mode,
            'mean_bias': round(float(means.mean() - true_mean), 6),
            'z_max': round(float(np.abs(z).max()), 2),
            'z_mean_signed': round(float(z.mean()), 2),
            'ess_min': round(float(d['ess_bulk_min'])),
        }), flush=True)


if __name__ == '__main__':
    main()
