"""Utilities: profiling, timers, throughput counters."""

from mcmc_tpu.utils.profiling import (
    wall_timer, device_trace, force_completion, throughput_counters,
    enable_compilation_cache,
)

__all__ = ["wall_timer", "device_trace", "force_completion",
           "throughput_counters", "enable_compilation_cache"]
