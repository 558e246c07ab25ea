"""Research-grade comparison plots (same outputs as the reference's
analysis/research_plots.py: sampler box plots, GRAHMC schedule comparison,
efficiency-vs-quality scatter, winner matrix, summary table CSV+MD)."""

import os
from collections import defaultdict
from typing import Dict, List

import numpy as np

from analysis.utils import (
    PLOT_DPI, filter_usable_only, filter_quality_only,
    get_unique_targets, get_unique_schedules,
    sampler_label as _sampler_label, save_figure as _save,
    setup_headless_backend,
)

setup_headless_backend()
import matplotlib.pyplot as plt  # noqa: E402


def plot_sampler_comparison(
    results: List[Dict],
    output_dir: str = "analysis_output",
    metric: str = "all",
    quality_only: bool = True,
    save_format: str = "png",
):
    """Box plots of per-sampler metric distributions across targets."""
    pool = filter_quality_only(results) if quality_only else filter_usable_only(results)
    pool_label = " (quality runs)" if quality_only else ""
    if not pool:
        pool = filter_usable_only(results)
        if pool and quality_only:
            print("  no quality runs; falling back to usable runs")
            pool_label = " (usable runs — none passed quality gates)"
    if not pool:
        print("  no usable runs to compare")
        return

    metrics = (["ess_per_gradient", "ess_bulk_min", "sliced_w2", "rhat_max"]
               if metric == "all" else [metric])
    groups = defaultdict(lambda: defaultdict(list))
    for r in pool:
        for m in metrics:
            if r.get(m) is not None:
                groups[m][_sampler_label(r)].append(r[m])

    n = len(metrics)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 6), dpi=PLOT_DPI)
    if n == 1:
        axes = [axes]
    fig.suptitle("Cross-Sampler Comparison" + pool_label,
                 fontsize=15, fontweight="bold")
    for ax, m in zip(axes, metrics):
        labels = sorted(groups[m])
        data = [groups[m][l] for l in labels]
        if data:
            ax.boxplot(data, tick_labels=labels)
            ax.tick_params(axis="x", rotation=60)
        ax.set_title(m)
        ax.grid(alpha=0.3)
        if m == "ess_per_gradient":
            ax.set_yscale("log")
    fig.tight_layout()
    _save(fig, output_dir, "sampler_comparison", save_format)


def plot_schedule_comparison(
    results: List[Dict],
    output_dir: str = "analysis_output",
    save_format: str = "png",
):
    """2x3 GRAHMC schedule comparison: ESS/grad, W2, win rate / quality rate,
    accept distribution, tuned-gamma distribution."""
    gr = [r for r in results if r.get("sampler") in ("grahmc", "rahmc")
          and r.get("schedule")]
    if not gr:
        print("  no GRAHMC results")
        return
    schedules = get_unique_schedules(gr)

    def by_schedule(rows, field):
        out = {s: [] for s in schedules}
        for r in rows:
            if r.get(field) is not None:
                out[r["schedule"]].append(r[field])
        return out

    usable = filter_usable_only(gr)
    fig, axes = plt.subplots(2, 3, figsize=(16, 10), dpi=PLOT_DPI)
    fig.suptitle("GRAHMC Schedule Comparison", fontsize=16, fontweight="bold")

    ax = axes[0, 0]
    d = by_schedule(usable, "ess_per_gradient")
    if any(d.values()):
        ax.boxplot([d[s] for s in schedules], tick_labels=schedules)
        ax.set_yscale("log")
    ax.set_title("Efficiency: ESS/Gradient")

    ax = axes[0, 1]
    quality = filter_quality_only(gr)
    d = by_schedule(quality or usable, "sliced_w2")
    if any(d.values()):
        ax.boxplot([d[s] for s in schedules], tick_labels=schedules)
        ax.set_title("Quality: W2 Distance (Quality Runs)" if quality
                     else "Quality: W2 Distance (Usable Runs — "
                          "none passed quality gates)")
    else:
        ax.set_title("Quality: W2 Distance (No Data)")

    # win rate: best ESS/grad per target among schedules
    ax = axes[0, 2]
    wins = {s: 0 for s in schedules}
    for target in get_unique_targets(usable):
        rows = [r for r in usable if r["target"] == target]
        if rows:
            best = max(rows, key=lambda r: r.get("ess_per_gradient", 0))
            wins[best["schedule"]] += 1
    ax.bar(schedules, [wins[s] for s in schedules])
    ax.set_title("Win Rate (Best ESS/Grad per Target)")

    ax = axes[1, 0]
    rates = []
    for s in schedules:
        rows = [r for r in gr if r["schedule"] == s]
        q = sum(1 for r in rows if r.get("quality_pass"))
        rates.append(q / len(rows) if rows else 0)
    ax.bar(schedules, rates)
    ax.set_ylim(0, 1)
    ax.set_title("Quality Pass Rate")

    ax = axes[1, 1]
    d = by_schedule(gr, "accept_rate")
    if any(d.values()):
        ax.boxplot([d[s] for s in schedules], tick_labels=schedules)
    ax.set_title("Acceptance Rate Distribution")

    ax = axes[1, 2]
    d = by_schedule(gr, "gamma")
    if any(d.values()):
        try:
            ax.violinplot([d[s] or [np.nan] for s in schedules])
            ax.set_xticks(range(1, len(schedules) + 1), schedules)
            ax.set_title("Tuned Gamma Distribution")
        except Exception:
            ax.set_title("Tuned Gamma (No Data)")
    else:
        ax.set_title("Tuned Gamma (No Data)")

    for ax in axes.flat:
        ax.grid(alpha=0.3)
        ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    _save(fig, output_dir, "schedule_comparison", save_format)


def plot_efficiency_quality_tradeoff(
    results: List[Dict],
    output_dir: str = "analysis_output",
    save_format: str = "png",
):
    """Scatter: ESS/gradient vs Sliced-W2, one marker family per sampler."""
    pool = [r for r in filter_usable_only(results)
            if r.get("sliced_w2") is not None and r.get("ess_per_gradient")]
    if not pool:
        print("  no usable runs with W2 for the trade-off plot")
        return
    fig, ax = plt.subplots(figsize=(10, 7), dpi=PLOT_DPI)
    samplers = sorted({_sampler_label(r) for r in pool})
    cmap = plt.cm.tab20(np.linspace(0, 1, max(len(samplers), 2)))
    for color, s in zip(cmap, samplers):
        rows = [r for r in pool if _sampler_label(r) == s]
        ax.scatter([r["ess_per_gradient"] for r in rows],
                   [r["sliced_w2"] for r in rows],
                   label=s, color=color, s=60, alpha=0.8)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("ESS per Gradient (efficiency) →")
    ax.set_ylabel("Sliced W2 (lower = better quality)")
    ax.set_title("Efficiency vs Quality Trade-off", fontsize=14, fontweight="bold")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    _save(fig, output_dir, "efficiency_quality_tradeoff", save_format)


def generate_winner_matrix(
    results: List[Dict],
    output_dir: str = "analysis_output",
    save_format: str = "png",
):
    """Heatmap: best sampler per target by ESS/gradient (usable runs)."""
    pool = filter_usable_only(results)
    if not pool:
        print("  no usable runs for winner matrix")
        return
    targets = get_unique_targets(pool)
    labels = sorted({_sampler_label(r) for r in pool})
    mat = np.zeros((len(targets), len(labels)))
    winners = {}
    for i, t in enumerate(targets):
        rows = [r for r in pool if r["target"] == t]
        for r in rows:
            j = labels.index(_sampler_label(r))
            mat[i, j] = max(mat[i, j], r.get("ess_per_gradient", 0))
        best = max(rows, key=lambda r: r.get("ess_per_gradient", 0))
        winners[t] = _sampler_label(best)

    fig, ax = plt.subplots(
        figsize=(max(8, len(labels) * 1.2), max(5, len(targets) * 0.8)),
        dpi=PLOT_DPI)
    with np.errstate(divide="ignore"):
        im = ax.imshow(np.log10(np.where(mat > 0, mat, np.nan)),
                       cmap="viridis", aspect="auto")
    ax.set_xticks(range(len(labels)), labels, rotation=60, ha="right")
    ax.set_yticks(range(len(targets)), targets)
    for i, t in enumerate(targets):
        j = labels.index(winners[t])
        ax.add_patch(plt.Rectangle((j - 0.5, i - 0.5), 1, 1, fill=False,
                                   edgecolor="red", linewidth=2))
    ax.set_title("Winner Matrix: Best Sampler per Target (by ESS/Gradient)",
                 fontweight="bold")
    fig.colorbar(im, label="log10 ESS/gradient")
    _save(fig, output_dir, "winner_matrix", save_format)


def generate_summary_table(
    results: List[Dict],
    output_dir: str = "analysis_output",
):
    """Summary table as CSV + Markdown."""
    import pandas as pd

    rows = []
    for r in results:
        rows.append({
            "sampler": _sampler_label(r),
            "target": r.get("target"),
            "L": r.get("num_steps"),
            "ess_bulk_min": r.get("ess_bulk_min"),
            "ess_per_gradient": r.get("ess_per_gradient"),
            "rhat_max": r.get("rhat_max"),
            "sliced_w2": r.get("sliced_w2"),
            "accept_rate": r.get("accept_rate"),
            "divergence_rate": r.get("divergence_rate"),
            "usable": r.get("usable"),
            "quality_pass": r.get("quality_pass"),
            "total_time": r.get("total_time"),
        })
    df = pd.DataFrame(rows)
    os.makedirs(output_dir, exist_ok=True)
    csv_path = os.path.join(output_dir, "summary_table.csv")
    df.to_csv(csv_path, index=False)
    print(f"  saved {csv_path}")
    md_path = os.path.join(output_dir, "summary_table.md")
    with open(md_path, "w") as f:
        f.write(_to_markdown(df))
    print(f"  saved {md_path}")


def _to_markdown(df) -> str:
    """GitHub-flavored markdown table (df.to_markdown needs the optional
    'tabulate' package, which is not in the declared dependencies)."""
    def fmt(v):
        if v is None or v != v:          # None / NaN
            return ""
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    cols = list(df.columns)
    body = [[fmt(v) for v in row] for row in df.itertuples(index=False)]
    widths = [max(len(c), *(len(r[j]) for r in body)) if body else len(c)
              for j, c in enumerate(cols)]
    def line(cells):
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"
    out = [line(cols), line(["-" * w for w in widths])]
    out += [line(r) for r in body]
    return "\n".join(out) + "\n"
