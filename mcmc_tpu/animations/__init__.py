"""Trajectory visualization: per-substep tracers + side-by-side and overlay
animations (reference animations/animation.py + animation_alt.py)."""

from mcmc_tpu.animations.animation import (
    hmc_proposal_trace, rahmc_proposal_trace, grahmc_proposal_trace,
    animate_sampler_comparison,
)
from mcmc_tpu.animations.animation_alt import animate_overlay_comparison

__all__ = [
    "hmc_proposal_trace", "rahmc_proposal_trace", "grahmc_proposal_trace",
    "animate_sampler_comparison", "animate_overlay_comparison",
]
