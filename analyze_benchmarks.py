#!/usr/bin/env python
"""Analysis CLI for MCMC benchmark results (flag parity with the reference).

Usage:
    python analyze_benchmarks.py results_dir --L-analysis --output plots/
    python analyze_benchmarks.py results_dir --L-winners --output plots/
    python analyze_benchmarks.py results_dir --L-coverage
    python analyze_benchmarks.py results_dir --L-all --output plots/
    python analyze_benchmarks.py results_dir --research
    python analyze_benchmarks.py results_dir --summary
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from analysis.utils import (
    load_benchmark_results, summarize_results, filter_with_grid_search,
)
from analysis.grid_analysis import (
    plot_L_selection_analysis, plot_L_winner_distribution,
    analyze_L_grid_coverage,
)
from analysis.research_plots import (
    plot_sampler_comparison, plot_schedule_comparison,
    plot_efficiency_quality_tradeoff, generate_winner_matrix,
    generate_summary_table,
)


def parse_args():
    parser = argparse.ArgumentParser(
        description="Analyze MCMC benchmark results with focus on grid search analysis",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog=__doc__,
    )
    parser.add_argument("results_dir", type=str,
                        help="Directory containing benchmark_results.json")

    analysis_group = parser.add_argument_group("Analysis options")
    analysis_group.add_argument("--L-analysis", action="store_true",
                                help="L selection analysis plots (2x3 grid per sampler-target)")
    analysis_group.add_argument("--L-winners", action="store_true",
                                help="Plot distribution of winning L values")
    analysis_group.add_argument("--L-coverage", action="store_true",
                                help="Analyze L grid coverage (terminal output)")
    analysis_group.add_argument("--L-all", action="store_true",
                                help="All L analyses")
    analysis_group.add_argument("--research", action="store_true",
                                help="All research plots")
    analysis_group.add_argument("--sampler-comparison", action="store_true",
                                help="Cross-sampler comparison box plots")
    analysis_group.add_argument("--schedule-comparison", action="store_true",
                                help="GRAHMC schedule comparison plots")
    analysis_group.add_argument("--tradeoff", action="store_true",
                                help="Efficiency vs quality trade-off scatter")
    analysis_group.add_argument("--winner-matrix", action="store_true",
                                help="Winner matrix heatmap")
    analysis_group.add_argument("--summary", action="store_true",
                                help="Print summary statistics")

    filter_group = parser.add_argument_group("Filtering options")
    filter_group.add_argument("--sampler", type=str, default=None,
                              help="Filter to specific sampler")
    filter_group.add_argument("--target", type=str, default=None,
                              help="Filter to specific target")

    output_group = parser.add_argument_group("Output options")
    output_group.add_argument("--output", "-o", type=str,
                              default="analysis_output",
                              help="Output directory for plots")
    output_group.add_argument("--format", type=str,
                              choices=["png", "pdf", "both"], default="png",
                              help="Output format for plots")

    args = parser.parse_args()
    if not any([args.L_analysis, args.L_winners, args.L_coverage, args.L_all,
                args.research, args.sampler_comparison,
                args.schedule_comparison, args.tradeoff, args.winner_matrix,
                args.summary]):
        parser.error("At least one analysis option must be specified")
    return args


def main():
    args = parse_args()
    print("=" * 70)
    print("MCMC BENCHMARK ANALYSIS")
    print("=" * 70)
    print(f"Results directory: {args.results_dir}\n")

    try:
        results = load_benchmark_results(args.results_dir)
        print(f"Loaded {len(results)} benchmark results\n")
    except FileNotFoundError as e:
        print(f"ERROR: {e}")
        return 1

    if args.summary:
        s = summarize_results(results)
        print(f"Total runs: {s['total_runs']}")
        print(f"Usable runs: {s['usable_runs']} ({s['usable_rate']:.1%})")
        print(f"Quality runs: {s['quality_runs']} ({s['quality_rate']:.1%})")
        print(f"Grid search runs: {s['grid_search_runs']} "
              f"({s['grid_search_rate']:.1%})")
        print(f"Samplers: {', '.join(s['samplers'])}")
        print(f"Targets: {', '.join(s['targets'])}")
        if s["schedules"]:
            print(f"Schedules (GRAHMC): {', '.join(s['schedules'])}")
        print()

    if args.L_all:
        args.L_analysis = args.L_winners = args.L_coverage = True
    if args.research:
        args.sampler_comparison = args.schedule_comparison = True
        args.tradeoff = args.winner_matrix = True

    needs_grid = args.L_analysis or args.L_winners or args.L_coverage
    if needs_grid and not filter_with_grid_search(results):
        print("WARNING: no results with grid search data found")
        if not any([args.sampler_comparison, args.schedule_comparison,
                    args.tradeoff, args.winner_matrix, args.summary]):
            return 1

    steps = [
        (args.L_analysis, "L SELECTION ANALYSIS",
         lambda: plot_L_selection_analysis(results, args.output, args.sampler,
                                           args.target, args.format)),
        (args.L_winners, "L WINNER DISTRIBUTION",
         lambda: plot_L_winner_distribution(results, args.output, args.format)),
        (args.L_coverage, "L GRID COVERAGE",
         lambda: analyze_L_grid_coverage(results)),
        (args.sampler_comparison, "CROSS-SAMPLER COMPARISON",
         lambda: plot_sampler_comparison(results, args.output, "all", True,
                                         args.format)),
        (args.schedule_comparison, "GRAHMC SCHEDULE COMPARISON",
         lambda: plot_schedule_comparison(results, args.output, args.format)),
        (args.tradeoff, "EFFICIENCY VS QUALITY TRADE-OFF",
         lambda: plot_efficiency_quality_tradeoff(results, args.output,
                                                  args.format)),
        (args.winner_matrix, "WINNER MATRIX",
         lambda: (generate_winner_matrix(results, args.output, args.format),
                  generate_summary_table(results, args.output))),
    ]
    for enabled, title, fn in steps:
        if not enabled:
            continue
        print("=" * 70)
        print(title)
        print("=" * 70)
        try:
            fn()
            print()
        except Exception as e:
            import traceback
            print(f"ERROR in {title}: {e}")
            traceback.print_exc()
            print()

    print("=" * 70)
    print("ANALYSIS COMPLETE")
    print(f"Plots saved to: {args.output}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
