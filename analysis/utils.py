"""Loading and filtering of benchmark result JSON (API parity with the
reference's analysis/utils.py: same function names and semantics)."""

import json
import os
from typing import Dict, List

from mcmc_tpu.utils import setup_headless_backend  # noqa: F401 (re-export)

PLOT_DPI = 120


def sampler_label(r: Dict) -> str:
    """'grahmc-tanh'-style label distinguishing GRAHMC schedule variants."""
    return r["sampler"] + (f"-{r['schedule']}" if r.get("schedule") else "")


def get_unique_sampler_labels(results: List[Dict]) -> List[str]:
    return sorted({sampler_label(r) for r in results if r.get("sampler")})


def save_figure(fig, output_dir: str, stem: str, save_format: str):
    """Save a figure as png/pdf/both under output_dir and close it."""
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    for fmt in (["png", "pdf"] if save_format == "both" else [save_format]):
        path = os.path.join(output_dir, f"{stem}.{fmt}")
        fig.savefig(path, bbox_inches="tight")
        print(f"  saved {path}")
    plt.close(fig)


def load_benchmark_results(results_path: str) -> List[Dict]:
    """Load benchmark_results.json and expand grid_search_info into
    grid_results / selected_L / selection_tier / has_grid_search fields."""
    json_path = os.path.join(results_path, "benchmark_results.json")
    if not os.path.exists(json_path):
        raise FileNotFoundError(
            f"No benchmark results found at {json_path}. "
            f"Run benchmarks first or check the path.")

    with open(json_path) as f:
        results = json.load(f)

    for r in results:
        info = r.get("grid_search_info")
        if info is not None:
            r["grid_results"] = info.get("all_results", [])
            r["selected_L"] = info.get("selected_L")
            r["selection_tier"] = info.get("selection_tier")
            r["has_grid_search"] = len(r["grid_results"]) > 0
        else:
            r["grid_results"] = []
            r["selected_L"] = r.get("num_steps")
            r["selection_tier"] = None
            r["has_grid_search"] = False
    return results


def filter_by_sampler(results: List[Dict], sampler: str) -> List[Dict]:
    return [r for r in results if r.get("sampler") == sampler]


def filter_by_target(results: List[Dict], target: str) -> List[Dict]:
    return [r for r in results if r.get("target") == target]


def filter_by_schedule(results: List[Dict], schedule: str) -> List[Dict]:
    return [r for r in results
            if r.get("sampler") in ("grahmc", "rahmc")
            and r.get("schedule") == schedule]


def filter_usable_only(results: List[Dict]) -> List[Dict]:
    return [r for r in results if r.get("usable", False)]


def filter_quality_only(results: List[Dict]) -> List[Dict]:
    return [r for r in results if r.get("quality_pass", False)]


def filter_with_grid_search(results: List[Dict]) -> List[Dict]:
    return [r for r in results if r.get("has_grid_search", False)]


def get_unique_samplers(results: List[Dict]) -> List[str]:
    return sorted({r.get("sampler") for r in results if r.get("sampler")})


def get_unique_targets(results: List[Dict]) -> List[str]:
    return sorted({r.get("target") for r in results if r.get("target")})


def get_unique_schedules(results: List[Dict]) -> List[str]:
    return sorted({r.get("schedule") for r in results
                   if r.get("sampler") in ("grahmc", "rahmc") and r.get("schedule")})


def summarize_results(results: List[Dict]) -> Dict:
    total = len(results)
    usable = len(filter_usable_only(results))
    quality = len(filter_quality_only(results))
    grid = len(filter_with_grid_search(results))
    return {
        "total_runs": total,
        "usable_runs": usable,
        "quality_runs": quality,
        "grid_search_runs": grid,
        "usable_rate": usable / total if total else 0,
        "quality_rate": quality / total if total else 0,
        "grid_search_rate": grid / total if total else 0,
        "samplers": get_unique_samplers(results),
        "targets": get_unique_targets(results),
        "schedules": get_unique_schedules(results),
    }
