"""Fused persistent-NUTS window kernel (ops/fused_nuts.py).

Parity: the kernel (interpret mode, injected host randomness) must reproduce
the XLA state machine (`nuts_persistent._make_window_step`) iteration-for-
iteration when fed identical random streams — positions, endpoints, proposal,
and every per-chain counter. Plus RunResult schema / determinism / moments
through the `backend='pallas'` path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.random as random
from jax import lax

from mcmc_tpu.ops import fused_nuts
from mcmc_tpu.samplers import nuts_run_persistent
from mcmc_tpu.samplers.base import init_chain_state
from mcmc_tpu.samplers.nuts_persistent import (_init_pstate,
                                               _make_window_step)
from mcmc_tpu.targets import neals_funnel, standard_normal

F32 = jnp.float32


def _run_both(target, dim, n_chains, n_iters, step_size, seed=0,
              max_tree_depth=6, inv_mass=None, proposal_scheme="endpoint"):
    """Run the fused window and the XLA machine on identical random streams;
    return (TState, _PState)."""
    multinomial = proposal_scheme == "multinomial"
    key = random.PRNGKey(seed)
    init = (random.normal(random.PRNGKey(seed + 100), (n_chains, dim))
            * 0.5).astype(F32)
    state0 = init_chain_state(init, target.log_prob_fn,
                              target.value_and_grad_fn)
    q0 = state0.position.astype(F32)
    lp0 = jnp.asarray(state0.log_prob, F32)
    g0 = state0.grad_log_prob.astype(F32)
    if inv_mass is None:
        inv_mass = jnp.ones(dim, F32)

    d_pad = fused_nuts._round_up(dim, fused_nuts.SUBLANE)
    ts = fused_nuts.pack_state(q0, lp0, g0, d_pad, multinomial=multinomial,
                               max_tree_depth=max_tree_depth)
    window = fused_nuts.make_fused_nuts_window(
        target.value_and_grad_fn, n_iters, max_tree_depth, n_chains, dim,
        interpret=True, dense=jnp.ndim(inv_mass) == 2,
        proposal_scheme=proposal_scheme)
    ts = window(key, ts, step_size, inv_mass)

    # identical draws, converted to the XLA machine's xs layout
    kp, kd, kd2, ks, ku, kr = random.split(key, 6)
    p0 = random.normal(kp, (n_iters, d_pad, n_chains), F32)
    dirs = random.bernoulli(kd, 0.5, (n_iters, n_chains)).astype(F32)
    dirs2 = random.bernoulli(kd2, 0.5, (n_iters, n_chains)).astype(F32)
    swaps = random.uniform(ks, (n_iters, n_chains), F32)
    slices = random.uniform(ku, (n_iters, n_chains), F32,
                            minval=jnp.finfo(F32).tiny)
    ress = random.uniform(kr, (n_iters, n_chains), F32)
    xs = (jnp.transpose(p0, (0, 2, 1))[:, :, :dim],
          dirs > 0.5, dirs2 > 0.5, swaps, slices, ress)

    def vag_f32(q):
        lp, g = target.value_and_grad_fn(q)
        return jnp.asarray(lp, F32), g.astype(F32)

    step = _make_window_step(vag_f32, jnp.asarray(step_size, F32), inv_mass,
                             max_tree_depth, 1000.0, F32,
                             proposal_scheme=proposal_scheme)
    ps = _init_pstate(q0, lp0, g0, F32, multinomial=multinomial,
                      max_tree_depth=max_tree_depth)
    ps = lax.scan(step, ps, xs)[0]
    return ts, ps


def _assert_machine_parity(ts, ps, dim):
    def tvals(a):  # kernel layout -> (C, D)
        return np.asarray(a[:dim].T)

    rows = np.asarray(ts.rows)
    # continuous state (f32 round-off tolerance; formulations differ in
    # reduction order between the padded transposed vag and the batched vag)
    np.testing.assert_allclose(tvals(ts.q), np.asarray(ps.q),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(tvals(ts.q_c), np.asarray(ps.q_c),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(tvals(ts.q_l), np.asarray(ps.q_l),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(tvals(ts.q_r), np.asarray(ps.q_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(rows[fused_nuts.R_LP], np.asarray(ps.lp),
                               rtol=2e-4, atol=2e-4)
    # discrete machine state must agree exactly
    np.testing.assert_array_equal(rows[fused_nuts.R_TRANSITIONS],
                                  np.asarray(ps.transitions, np.float32))
    np.testing.assert_array_equal(rows[fused_nuts.R_DIVERGENCES],
                                  np.asarray(ps.divergences, np.float32))
    np.testing.assert_array_equal(rows[fused_nuts.R_DEPTH],
                                  np.asarray(ps.depth, np.float32))
    np.testing.assert_array_equal(rows[fused_nuts.R_STEPS_LEFT],
                                  np.asarray(ps.steps_left, np.float32))
    np.testing.assert_array_equal(rows[fused_nuts.R_N_VALID],
                                  np.asarray(ps.n_valid, np.float32))
    np.testing.assert_array_equal(rows[fused_nuts.R_DEPTH_ACC],
                                  np.asarray(ps.depth_acc, np.float32))
    np.testing.assert_array_equal(rows[fused_nuts.R_NEEDS_START],
                                  np.asarray(ps.needs_start, np.float32))
    np.testing.assert_allclose(rows[fused_nuts.R_ALPHA_ACC],
                               np.asarray(ps.alpha_acc), rtol=2e-4, atol=2e-4)
    # snapshot reservoir: count exact, state within f32 round-off
    np.testing.assert_array_equal(rows[fused_nuts.R_K_RES],
                                  np.asarray(ps.k_res, np.float32))
    np.testing.assert_allclose(tvals(ts.q_res), np.asarray(ps.q_res),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(rows[fused_nuts.R_LP_RES],
                               np.asarray(ps.lp_res), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("factory,dim,step", [
    (standard_normal, 7, 0.5),
    (neals_funnel, 10, 0.2),
])
def test_fused_window_matches_xla_machine(factory, dim, step):
    target = factory(dim)
    ts, ps = _run_both(target, dim, n_chains=16, n_iters=48, step_size=step)
    _assert_machine_parity(ts, ps, dim)


def test_fused_window_dense_matches_xla_machine():
    """DENSE metric parity: the kernel's VMEM L^{-T} @ z unwhitening /
    M^{-1} p velocity matmuls must reproduce the XLA machine's
    metric-polymorphic window step (z @ L^{-1}, dense kinetic) on identical
    injected random streams — same discrete machine state, same continuous
    state to f32 round-off."""
    dim = 6
    target = standard_normal(dim)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(dim, dim)).astype(np.float32)
    inv_mass = jnp.asarray(a @ a.T / dim + 0.5 * np.eye(dim), F32)
    ts, ps = _run_both(target, dim, n_chains=16, n_iters=48, step_size=0.3,
                       inv_mass=inv_mass)
    _assert_machine_parity(ts, ps, dim)


def _assert_multinomial_parity(ts, ps, dim):
    """Extra multinomial machine state: reservoir, log weights, subtree
    validity flags — kernel vs XLA machine on identical streams."""
    rows = np.asarray(ts.rows)
    np.testing.assert_allclose(np.asarray(ts.q_sub[:dim].T),
                               np.asarray(ps.q_sub), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(rows[fused_nuts.R_LP_SUB],
                               np.asarray(ps.lp_sub), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(rows[fused_nuts.R_LW_TREE],
                               np.asarray(ps.lw_tree), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(rows[fused_nuts.R_LW_SUB],
                               np.asarray(ps.lw_sub), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(rows[fused_nuts.R_DIV_SUB],
                                  np.asarray(ps.div_sub, np.float32))
    np.testing.assert_array_equal(rows[fused_nuts.R_TURN_SUB],
                                  np.asarray(ps.turn_sub, np.float32))


@pytest.mark.parametrize("factory,dim,step", [
    (standard_normal, 7, 0.5),
    (neals_funnel, 10, 0.2),
])
def test_fused_window_multinomial_matches_xla_machine(factory, dim, step):
    """Stan-scheme parity: the kernel's per-leaf weighted reservoir, biased
    subtree merges and iterative sub-U-turn checkpoint stacks must
    reproduce the XLA multinomial machine iteration-for-iteration on
    identical injected random streams — including the f32 floor/halve
    bit fields (parity/popcount/trailing-ones) matching the XLA machine's
    int32 population_count formulation."""
    target = factory(dim)
    ts, ps = _run_both(target, dim, n_chains=16, n_iters=48, step_size=step,
                       proposal_scheme="multinomial")
    _assert_machine_parity(ts, ps, dim)
    _assert_multinomial_parity(ts, ps, dim)


def test_fused_window_multinomial_dense_matches_xla_machine():
    """Multinomial scheme composes with the dense metric in-kernel."""
    dim = 6
    target = standard_normal(dim)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(dim, dim)).astype(np.float32)
    inv_mass = jnp.asarray(a @ a.T / dim + 0.5 * np.eye(dim), F32)
    ts, ps = _run_both(target, dim, n_chains=16, n_iters=48, step_size=0.3,
                       inv_mass=inv_mass, proposal_scheme="multinomial")
    _assert_machine_parity(ts, ps, dim)
    _assert_multinomial_parity(ts, ps, dim)


def test_multinomial_steps_per_iter_unroll():
    """W=4 multinomial: slot freezing and the per-slot slice indexing
    (i*W+k) keep the machine consistent — counters within bounds,
    reservoir draws present, moments sane, deterministic. (Bit-level
    parity vs the XLA machine is pinned at W=1 above; trajectories at
    W>1 consume different uniform positions so cross-W bit equality is
    not defined.)"""
    t = standard_normal(5)
    pos = (random.normal(random.PRNGKey(1), (32, 5)) * 0.1).astype(F32)
    kw = dict(step_size=0.4, num_samples=48, steps_per_sample=16,
              burn_in_steps=32, value_and_grad_fn=t.value_and_grad_fn,
              backend="pallas", proposal_scheme="multinomial")
    res4 = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                               steps_per_iter=4, **kw)
    slots = (32 + 48 * 16) * 32
    exec4 = int(res4.info["n_leapfrogs"])
    assert int(res4.info["n_leapfrog_slots"]) == slots
    # slot 0 of every iteration always executes; later slots may freeze
    assert slots // 4 <= exec4 <= slots
    assert np.all(np.asarray(res4.info["transitions"]) >= 1)
    flat = np.asarray(res4.samples).reshape(-1, 5)
    assert np.all(np.isfinite(flat))
    assert np.all(np.abs(flat.mean(0)) < 0.2)
    assert np.all(np.abs(flat.var(0) - 1.0) < 0.35)
    res4b = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                                steps_per_iter=4, **kw)
    np.testing.assert_array_equal(np.asarray(res4.samples),
                                  np.asarray(res4b.samples))


def test_pallas_backend_schema_and_determinism():
    t = standard_normal(4)
    pos = (random.normal(random.PRNGKey(1), (8, 4)) * 0.1).astype(F32)
    kw = dict(step_size=0.5, num_samples=10, steps_per_sample=8,
              burn_in_steps=8, value_and_grad_fn=t.value_and_grad_fn,
              backend="pallas")
    res = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos, **kw)
    assert res.samples.shape == (10, 8, 4)
    assert res.log_probs.shape == (10, 8)
    for k in ("divergence_count", "total_divergences", "divergence_rate",
              "transitions", "mean_accept_probs", "mean_tree_depth",
              "n_leapfrogs", "final_positions"):
        assert k in res.info, k
    # default steps_per_iter auto-selects W=4 here: every slot is accounted,
    # executed leapfrogs never exceed slots
    slots = (8 + 10 * 8) * 8
    assert int(res.info["n_leapfrog_slots"]) == slots
    assert 0 < int(res.info["n_leapfrogs"]) <= slots
    assert np.all(np.isfinite(np.asarray(res.samples)))
    res2 = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos, **kw)
    np.testing.assert_array_equal(np.asarray(res.samples),
                                  np.asarray(res2.samples))


def test_pallas_backend_collect_prefix_and_counters():
    t = standard_normal(3)
    pos = (random.normal(random.PRNGKey(1), (16, 3)) * 0.1).astype(F32)
    res = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                              step_size=0.5, num_samples=6, steps_per_sample=8,
                              value_and_grad_fn=t.value_and_grad_fn,
                              backend="pallas", collect_chains=4)
    assert res.samples.shape == (6, 4, 3)
    assert res.final_state.position.shape == (16, 3)
    assert np.all(np.asarray(res.info["transitions"]) >= 1)
    acc = np.asarray(res.info["mean_accept_probs"])
    assert np.all((acc >= 0) & (acc <= 1))


@pytest.mark.slow
def test_pallas_backend_moments():
    t = standard_normal(5)
    pos = (random.normal(random.PRNGKey(1), (32, 5)) * 0.1).astype(F32)
    res = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                              step_size=0.4, num_samples=300,
                              steps_per_sample=12, burn_in_steps=120,
                              value_and_grad_fn=t.value_and_grad_fn,
                              backend="pallas")
    flat = np.asarray(res.samples).reshape(-1, 5)
    assert np.all(np.abs(flat.mean(0)) < 0.12)
    assert np.all(np.abs(flat.var(0) - 1.0) < 0.25)


def test_steps_per_iter_unroll():
    """W>1 amortizes bookkeeping; trajectories remain valid NUTS — posteriors
    agree with W=1 and executed-leapfrog accounting is consistent."""
    t = standard_normal(5)
    pos = (random.normal(random.PRNGKey(1), (32, 5)) * 0.1).astype(F32)
    kw = dict(step_size=0.4, num_samples=64, steps_per_sample=16,
              burn_in_steps=32, value_and_grad_fn=t.value_and_grad_fn,
              backend="pallas")
    res1 = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                               steps_per_iter=1, **kw)
    res4 = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                               steps_per_iter=4, **kw)
    slots = (32 + 64 * 16) * 32
    assert int(res1.info["n_leapfrogs"]) == slots
    assert int(res1.info["n_leapfrog_slots"]) == slots
    # W=4 masks unrollable slots but must execute most of them
    exec4 = int(res4.info["n_leapfrogs"])
    assert 0.5 * slots < exec4 < slots
    for res in (res1, res4):
        flat = np.asarray(res.samples).reshape(-1, 5)
        assert np.all(np.abs(flat.mean(0)) < 0.15)
        assert np.all(np.abs(flat.var(0) - 1.0) < 0.3)
        assert np.all(np.asarray(res.info["transitions"]) >= 1)
    # comparable dynamics: mean terminal tree depth agrees
    d1 = float(np.mean(np.asarray(res1.info["mean_tree_depth"])))
    d4 = float(np.mean(np.asarray(res4.info["mean_tree_depth"])))
    assert abs(d1 - d4) < 1.0


def test_steps_per_iter_requires_divisibility_and_pallas():
    t = standard_normal(3)
    pos = (random.normal(random.PRNGKey(1), (8, 3)) * 0.1).astype(F32)
    with pytest.raises(ValueError, match="divisible"):
        nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                            step_size=0.4, num_samples=4, steps_per_sample=6,
                            value_and_grad_fn=t.value_and_grad_fn,
                            backend="pallas", steps_per_iter=4)
    with pytest.raises(ValueError, match="pallas"):
        nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                            step_size=0.4, num_samples=4, steps_per_sample=8,
                            value_and_grad_fn=t.value_and_grad_fn,
                            backend="xla", steps_per_iter=4)
