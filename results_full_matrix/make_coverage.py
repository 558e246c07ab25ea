"""Tally results_full_matrix coverage into COVERAGE.json.

Run after (each segment of) the canonical matrix:
    python results_full_matrix/make_coverage.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
ALL_TARGETS = ["standard_normal", "correlated_gaussian",
               "ill_conditioned_gaussian", "student_t", "log_gamma",
               "rosenbrock", "neals_funnel", "gaussian_mixture"]
SCHEDULES = ["constant", "tanh", "sigmoid", "linear", "sine"]
# configs per target: rwmh x2 + nuts x2 + hmc x2 + grahmc 5x2 (each hmc/
# grahmc config is one row selected from a 7-point L grid)
CONFIGS_PER_TARGET = 2 + 2 + 2 + 10


def main():
    with open(os.path.join(HERE, "benchmark_results.json")) as f:
        rows = json.load(f)
    # rows carry DISPLAY names (e.g. "IllConditioned10D_kappa100"); map
    # back to registry keys explicitly
    DISPLAY = {"standardnormal": "standard_normal",
               "correlatedgaussian": "correlated_gaussian",
               "illconditioned": "ill_conditioned_gaussian",
               "studentt": "student_t",
               "loggamma": "log_gamma",
               "rosenbrock": "rosenbrock",
               "nealsfunnel": "neals_funnel",
               "gaussianmixture": "gaussian_mixture"}

    def to_key(display):
        d = display.lower()
        for pref, k in DISPLAY.items():
            if d.startswith(pref):
                return k
        return display
    per_target = {}
    for r in rows:
        per_target.setdefault(to_key(r["target"]), []).append(r)
    cov = {"rows": len(rows),
           "grid_cells_executed": sum(
               len((r.get("grid_search_info") or {}).get(
                   "tested_L_values", []) or []) or 1 for r in rows),
           "configs_per_target_expected": CONFIGS_PER_TARGET,
           "targets": {}}
    for t in ALL_TARGETS:
        rs = per_target.get(t, [])
        cov["targets"][t] = {
            "configs_done": len(rs),
            "complete": len(rs) >= CONFIGS_PER_TARGET,
            "quality_pass": sum(1 for r in rs if r.get("quality_pass")),
            "usable": sum(1 for r in rs if r.get("usable")),
            "failures": sum(1 for r in rs if r.get("error")),
        }
    with open(os.path.join(HERE, "COVERAGE.json"), "w") as f:
        json.dump(cov, f, indent=1)
    print(json.dumps(cov, indent=1))


if __name__ == "__main__":
    main()
