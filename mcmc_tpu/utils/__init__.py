"""Utilities: profiling, timers, throughput counters."""

import os

from mcmc_tpu.utils.profiling import (
    wall_timer, device_trace, force_completion, throughput_counters,
    enable_compilation_cache,
)

__all__ = ["wall_timer", "device_trace", "force_completion",
           "throughput_counters", "enable_compilation_cache",
           "setup_headless_backend"]


def setup_headless_backend():
    """Force matplotlib's Agg backend ONLY in headless environments.

    Library modules must not hijack an interactive session's backend
    (a module-level `matplotlib.use("Agg")` silently breaks plt.show()
    for the user's own figures); but headless CLI/test runs must not
    let matplotlib pick a GUI backend (tkinter imports fine here and
    then fails at figure time without a display)."""
    if not os.environ.get("DISPLAY") and not os.environ.get("MPLBACKEND"):
        import matplotlib
        matplotlib.use("Agg")
