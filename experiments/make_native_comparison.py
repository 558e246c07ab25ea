"""Build results_full_matrix_native/README.md: the per-cell comparison of

  - the reference-protocol arm (results_full_matrix/ — this framework
    running the reference's own protocol, honest gates),
  - the TPU-native rescue arm (results_full_matrix_native/ — the same
    budgets with the framework's own remedies), and
  - the reference-implementation adjudication arm
    (results_reference_adjudication/ — the ACTUAL reference code on CPU,
    4 chains, via experiments/funnel_parity_reference.py shims),

for every canonical-matrix cell that failed the honest gates
(round 5, VERDICT r4 #2/#3). Run after experiments/run_native_rescue_arm.sh
and experiments/run_reference_adjudication.sh complete (partial results
render with '—' placeholders; re-run any time).
"""

import json
import os
from collections import OrderedDict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MATRIX = os.path.join(REPO, "results_full_matrix/benchmark_results.json")
NATIVE = os.path.join(REPO, "results_full_matrix_native/benchmark_results.json")
REFARM = os.path.join(REPO,
                      "results_reference_adjudication/benchmark_results.json")
OUT = os.path.join(REPO, "results_full_matrix_native/README.md")


def load(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def base_family(target_name):
    t = str(target_name)
    for fam in ("LogGamma", "NealsFunnel", "Rosenbrock",
                "CorrelatedGaussian", "StandardNormal", "IllConditioned",
                "StudentT", "GaussianMixture"):
        if t.startswith(fam):
            return fam
    return t


def cell_key(row):
    mass = row.get("mass_matrix_learned")
    if mass == "dense":
        mass = True       # a dense-metric remedy row rescues the learned cell
    return (base_family(row.get("target")), row.get("sampler"),
            row.get("schedule"), bool(mass))


def outcome(row):
    if row is None:
        return "—"
    if row.get("quality_pass"):
        s = "**PASS**"
    elif row.get("usable"):
        s = "USABLE"
    else:
        s = "FAIL"
    bits = []
    if row.get("rhat_max") is not None:
        bits.append(f"R̂={row['rhat_max']:.4f}")
    if row.get("ess_bulk_min") is not None:
        bits.append(f"ESS={row['ess_bulk_min']:.0f}")
    if row.get("divergence_rate") is not None:
        bits.append(f"div={100 * row['divergence_rate']:.2f}%")
    if row.get("z_score_max") is not None:
        bits.append(f"z={row['z_score_max']:.2f}")
    return f"{s} ({', '.join(bits)})"


def remedy(row):
    if row is None:
        return "—"
    if row.get("reparam") == "log":
        if row.get("nuts_proposal") == "multinomial":
            return "log-reparam + multinomial NUTS"
        return "log-reparam (`--reparam auto`)"
    if str(row.get("target", "")).startswith("NealsFunnelNonCentered"):
        return "non-centered param"
    if row.get("mass_matrix_learned") == "dense":
        return "dense metric"
    if row.get("trajectory_tuner") == "chees":
        return "ChEES + joint-γ"
    if row.get("sampler") == "smc":
        return "SMC evidence (reparam)"
    return "(same protocol)"


def main():
    matrix = load(MATRIX)
    native = load(NATIVE)
    refarm = load(REFARM)

    m_by_cell = {cell_key(r): r for r in matrix}

    def grade(r):
        return 2 if r.get("quality_pass") else 1 if r.get("usable") else 0

    # several remedies can target one cell (e.g. endpoint vs multinomial
    # NUTS): keep the best-graded row
    n_by_cell = {}
    for r in native:
        k = cell_key(r)
        if k not in n_by_cell or grade(r) > grade(n_by_cell[k]):
            n_by_cell[k] = r
    ref_by_cell = {cell_key(r): r for r in refarm}

    failing = OrderedDict()
    for r in matrix:
        if not r.get("usable"):
            failing[cell_key(r)] = r

    lines = [
        "# TPU-native rescue arm for the canonical matrix's failing cells",
        "",
        "`results_full_matrix/` runs the REFERENCE protocol with honest "
        "gates and fails 38/128 rows. This directory re-runs those cells "
        "with the framework's own remedies at the SAME budgets (dim=10, "
        "1024 chains, 2500 warmup, 10,000 draws, seed 42, same gates), "
        "plus the reference-implementation adjudication arm "
        "(`results_reference_adjudication/`: the actual reference code, "
        "4 chains on CPU, documented-contract shims) showing what the "
        "reference would have reported on the configurations the honest "
        "gate fails. The reference hard-codes divergence_rate = 0.0 "
        "(reference run_benchmarks.py:706-710), so its rows CANNOT fail "
        "the divergence gate by construction — every `div=0.00%` in its "
        "column below is a placeholder, not a measurement.",
        "",
        "Produced by `experiments/run_native_rescue_arm.sh`, "
        "`experiments/run_reference_adjudication.sh`, and "
        "`experiments/make_native_comparison.py`.",
        "",
        "| Cell (target, sampler, schedule, mass) | Reference protocol "
        "(honest gates) | Native remedy | Native outcome | Reference "
        "implementation reports |",
        "|---|---|---|---|---|",
    ]
    n_rescued = n_total = 0
    for key, mrow in failing.items():
        nrow = n_by_cell.get(key)
        rrow = ref_by_cell.get(key)
        fam, sampler, schedule, mass = key
        cell = f"{fam} / {sampler}" + (f" [{schedule}]" if schedule else "") \
            + (" / learned" if mass else " / identity")
        n_total += 1
        if nrow is not None and nrow.get("usable"):
            n_rescued += 1
        lines.append(f"| {cell} | {outcome(mrow)} | {remedy(nrow)} | "
                     f"{outcome(nrow)} | {outcome(rrow)} |")

    # native rows that rescue cells not in the failing set (quality
    # upgrades, SMC evidence) — list separately
    extra = [r for r in native if cell_key(r) not in failing]
    if extra:
        lines += ["", "## Additional native rows (quality upgrades / "
                  "beyond-reference)", "",
                  "| Row | Remedy | Outcome |", "|---|---|---|"]
        for r in extra:
            label = f"{r.get('target')} / {r.get('sampler')}" + (
                f" [{r.get('schedule')}]" if r.get("schedule") else "")
            extra_bits = outcome(r)
            if r.get("sampler") == "smc" and r.get("log_z") is not None:
                extra_bits += f", log Z={r['log_z']:.4f}"
            lines.append(f"| {label} | {remedy(r)} | {extra_bits} |")

    lines += [
        "",
        f"## Summary: {n_rescued}/{n_total} failing cells usable under "
        f"the native stack",
        "",
        "The RWMH cells (rosenbrock ×2, correlated_gaussian ×2) have no "
        "remedy in the toolkit by construction: a position-independent "
        "Gaussian proposal uses neither gradients, a metric, nor a "
        "reparameterization's geometry — its failure on strongly curved "
        "or correlated targets is the textbook motivation for the "
        "gradient samplers, and the reference protocol fails there "
        "identically.",
        "",
        "Superseded attempts stay archived in benchmark_results.json "
        "(the table shows each cell's best-graded remedy): ChEES + "
        "joint-γ on the rosenbrock GRAHMC cells ran away (R̂ 1.60-1.70 "
        "— the flat-valley criterion failure ChEES's grid fallback "
        "exists for) before the dense metric rescued those cells to "
        "quality, and the endpoint-NUTS reparam rows (z=31-35) precede "
        "the multinomial ones (z=7-10). The multinomial NUTS residual "
        "was subsequently PINNED as the snapshot machine's window-level "
        "emission bias — it scales 1/steps-per-sample and vanishes below "
        "the gate at `--nuts-steps-per-sample 512` (z_max 2.4 at full "
        "10M-ESS power; `experiments/nuts_window_bias_probe.py`, "
        "BASELINE.md bias audit #4).",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}: {n_rescued}/{n_total} rescued, "
          f"{len(extra)} extra rows, adjudication rows: {len(refarm)}")


if __name__ == "__main__":
    main()
