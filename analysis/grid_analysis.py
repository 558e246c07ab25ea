"""Trajectory-length (L) grid-search analysis plots.

Same outputs as the reference's analysis/grid_analysis.py: a 2x3 metric grid
per sampler-target pair, a winner histogram + heatmap, and a boundary-coverage
report with grid recommendations.
"""

from collections import Counter
from typing import Dict, List, Optional

import numpy as np

from analysis.utils import (
    PLOT_DPI, filter_with_grid_search, get_unique_targets,
    get_unique_sampler_labels, sampler_label,
    save_figure as _save, setup_headless_backend,
)

setup_headless_backend()
import matplotlib.pyplot as plt  # noqa: E402


def plot_L_selection_analysis(
    results: List[Dict],
    output_dir: str = "analysis_output",
    sampler: Optional[str] = None,
    target: Optional[str] = None,
    save_format: str = "png",
):
    """One 2x3 figure per (sampler, target) with grid data: ESS/grad, W2,
    tail ESS / R-hat, accept rate, warmup time — each vs L, with the selected
    L marked."""
    grid_runs = filter_with_grid_search(results)
    if sampler:
        grid_runs = [r for r in grid_runs if r.get("sampler") == sampler]
    if target:
        grid_runs = [r for r in grid_runs if r.get("target") == target]

    for run in grid_runs:
        rows = run["grid_results"]
        if not rows:
            continue
        Ls = [g.get("num_steps") for g in rows]
        sel = run.get("selected_L")
        name = sampler_label(run)

        fig, axes = plt.subplots(2, 3, figsize=(15, 10), dpi=PLOT_DPI)
        fig.suptitle(f"Trajectory Length Analysis: {name.upper()} on {run['target']}",
                     fontsize=15, fontweight="bold")

        panels = [
            ("ess_per_gradient", "ESS / Gradient", "Efficiency: ESS per Gradient"),
            ("sliced_w2", "Sliced W2 Distance", "Quality: W2 Distance to Reference"),
            ("ess_tail_min", "ESS Tail (min)", "Tail Behavior: ESS Tail Min"),
            ("rhat_max", "R-hat (max)", "Convergence: R-hat Maximum"),
            ("accept_rate", "Acceptance Rate", "Tuning Health: Acceptance Rate"),
            ("warmup_time", "Warmup Time (seconds)", "Cost: Warmup Time"),
        ]
        for ax, (field, ylabel, title) in zip(axes.flat, panels):
            ys = [g.get(field) for g in rows]
            pairs = [(l, y) for l, y in zip(Ls, ys) if y is not None]
            if pairs:
                xs, vals = zip(*pairs)
                ax.plot(xs, vals, "o-", linewidth=2)
                if sel is not None and sel in xs:
                    ax.axvline(sel, color="red", linestyle="--", alpha=0.6,
                               label=f"selected L={sel}")
                    ax.legend()
            ax.set_xlabel("Trajectory Length (L)")
            ax.set_ylabel(ylabel)
            ax.set_title(title)
            ax.grid(alpha=0.3)
        if "rhat_max" in [p[0] for p in panels]:
            axes[1, 0].axhline(1.01, color="green", linestyle=":", alpha=0.6)
            axes[1, 0].axhline(1.05, color="orange", linestyle=":", alpha=0.6)

        fig.tight_layout()
        stem = f"L_analysis_{name}_{run['target']}".replace("/", "_")
        _save(fig, output_dir, stem, save_format)


def plot_L_winner_distribution(
    results: List[Dict],
    output_dir: str = "analysis_output",
    save_format: str = "png",
):
    """Histogram of selected L values + target x sampler heatmap."""
    grid_runs = [r for r in filter_with_grid_search(results)
                 if r.get("selected_L") is not None]
    if not grid_runs:
        print("  no grid-search winners to plot")
        return

    winners = [r["selected_L"] for r in grid_runs]
    counts = Counter(winners)
    fig, ax = plt.subplots(1, 1, figsize=(10, 6), dpi=PLOT_DPI)
    Ls = sorted(counts)
    ax.bar([str(l) for l in Ls], [counts[l] for l in Ls])
    ax.set_xlabel("Selected Trajectory Length (L)")
    ax.set_ylabel("Frequency")
    ax.set_title("Distribution of Winning L Values Across All Benchmarks")
    _save(fig, output_dir, "L_winner_distribution", save_format)

    # Heatmap of winning L per (target, sampler-schedule). Keyed by the
    # schedule-qualified label: grahmc-tanh and grahmc-sine select their
    # own L and must not overwrite each other's cell.
    samplers = get_unique_sampler_labels(grid_runs)
    targets = get_unique_targets(grid_runs)
    mat = np.full((len(targets), len(samplers)), np.nan)
    for r in grid_runs:
        i = targets.index(r["target"])
        j = samplers.index(sampler_label(r))
        mat[i, j] = r["selected_L"]

    fig, ax = plt.subplots(
        1, 1, figsize=(max(8, len(samplers) * 1.5), max(6, len(targets) * 0.8)),
        dpi=PLOT_DPI)
    im = ax.imshow(mat, cmap="viridis", aspect="auto")
    ax.set_xticks(range(len(samplers)), samplers, rotation=45, ha="right")
    ax.set_yticks(range(len(targets)), targets)
    for i in range(len(targets)):
        for j in range(len(samplers)):
            if np.isfinite(mat[i, j]):
                ax.text(j, i, f"{int(mat[i, j])}", ha="center", va="center",
                        color="white")
    ax.set_xlabel("Sampler")
    ax.set_ylabel("Target")
    ax.set_title("Optimal Trajectory Length (L) by Target and Sampler")
    fig.colorbar(im, label="L")
    _save(fig, output_dir, "L_winner_heatmap", save_format)


def _get_grid_recommendation(boundary_rate: float) -> str:
    if boundary_rate > 0.3:
        return ("EXPAND GRID: >30% of winners sit on the grid boundary — the "
                "optimum is likely outside the tested range")
    if boundary_rate > 0.1:
        return "CONSIDER EXPANDING: some winners on the boundary"
    return "GRID OK: winners are interior"


def analyze_L_grid_coverage(results: List[Dict]) -> Dict:
    """Terminal report: how often the winning L lies on the grid boundary."""
    grid_runs = [r for r in filter_with_grid_search(results)
                 if r.get("selected_L") is not None]
    if not grid_runs:
        print("  no grid-search results to analyze")
        return {"n_runs": 0}

    boundary_hits = []
    for r in grid_runs:
        tested = sorted(g.get("num_steps") for g in r["grid_results"]
                        if g.get("num_steps") is not None)
        if not tested:
            continue
        on_boundary = r["selected_L"] in (tested[0], tested[-1])
        boundary_hits.append(on_boundary)
        if on_boundary:
            name = sampler_label(r)
            print(f"  boundary winner: {name} on {r['target']}: "
                  f"L={r['selected_L']} (grid {tested[0]}..{tested[-1]})")

    rate = float(np.mean(boundary_hits)) if boundary_hits else 0.0
    rec = _get_grid_recommendation(rate)
    print(f"\nL GRID COVERAGE: {len(boundary_hits)} runs, "
          f"boundary-winner rate {rate:.1%}")
    print(f"  {rec}")
    return {"n_runs": len(boundary_hits), "boundary_rate": rate,
            "recommendation": rec}
