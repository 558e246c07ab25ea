"""Trajectory visualization: per-substep tracers + side-by-side animations."""

from mcmc_tpu.animations.animation import (
    hmc_proposal_trace, rahmc_proposal_trace, grahmc_proposal_trace,
    animate_sampler_comparison,
)

__all__ = [
    "hmc_proposal_trace", "rahmc_proposal_trace", "grahmc_proposal_trace",
    "animate_sampler_comparison",
]
