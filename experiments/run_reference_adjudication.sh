#!/bin/bash
# Reference-arm adjudication of the canonical matrix's failure rows
# (round 5, VERDICT r4 #3).
#
# The matrix README argues the reference could never fail these runs
# because its divergence rate is hard-coded 0.0 (reference
# run_benchmarks.py:706-710) — but that was an argument, not a
# measurement. This script RUNS the reference implementation (via the
# documented-contract shims in experiments/funnel_parity_reference.py) on
# the failing targets with its own protocol (4 chains, CPU, 2500 warmup,
# 10000 draws, default learned-mass mode) and archives what it reports,
# next to the matrix rows it corresponds to, in
# results_reference_adjudication/.
#
# Expected outcome (to be adjudicated in the README): the reference
# reports usable/quality rows on exactly the configurations the rebuild's
# real |dH| > 1000 gate fails — i.e. it false-passes sampling runs whose
# trajectories diverge at the support boundary / funnel neck.
#
# The reference resumes by signature too; re-run after any interruption.
set -u
cd "$(dirname "$0")/.."
OUT=results_reference_adjudication

set -x
# log_gamma + centered funnel: every sampler, reference default mass mode
nice -n 19 python experiments/funnel_parity_reference.py \
    --targets log_gamma neals_funnel --samplers rwmh hmc nuts grahmc \
    --dim 10 --n-chains 4 --output-dir $OUT

# rosenbrock: exactly the failing arms (hmc learned-mass, grahmc
# linear/sigmoid/sine learned-mass, rwmh)
nice -n 19 python experiments/funnel_parity_reference.py \
    --targets rosenbrock --samplers rwmh hmc grahmc \
    --schedules linear sigmoid sine \
    --dim 10 --n-chains 4 --output-dir $OUT
set +x
echo "reference adjudication complete -> $OUT/"
