"""Chain-state / warmup checkpointing (beyond the reference: its chain state
is never persisted, SURVEY.md §5 — only result rows resume)."""

import numpy as np
import pytest
import jax.numpy as jnp
import jax.random as random

from mcmc_tpu.utils.checkpoint import (
    save_state_tree, load_state_tree, save_warmup, load_warmup,
    warmup_signature,
)


def test_state_tree_roundtrip_chainstate(tmp_path):
    from mcmc_tpu.samplers.base import init_chain_state
    from mcmc_tpu.targets import standard_normal

    t = standard_normal(5)
    state = init_chain_state(
        random.normal(random.PRNGKey(0), (8, 5)), t.log_prob_fn,
        t.value_and_grad_fn)
    path = str(tmp_path / "cs")
    save_state_tree(path, state, meta={"draws": 42})
    restored, meta = load_state_tree(path, like=state)
    assert meta == {"draws": 42}
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_tree_missing_leaf_raises(tmp_path):
    path = str(tmp_path / "t")
    save_state_tree(path, {"a": jnp.ones(3)})
    with pytest.raises(ValueError, match="missing leaves"):
        load_state_tree(path, like={"a": jnp.ones(3), "b": jnp.ones(2)})


def test_warmup_roundtrip(tmp_path):
    sig = warmup_signature("grahmc", "neals_funnel", "tanh", 16, True, 32, 10)
    pos = random.normal(random.PRNGKey(1), (32, 10))
    inv_mass = jnp.linspace(0.5, 2.0, 10)
    save_warmup(str(tmp_path), sig, 0.123, inv_mass, pos,
                {"gamma": 0.5, "steepness": 2.0, "accept_trace": [0.6]})
    step, im, p, info = load_warmup(str(tmp_path), sig)
    assert step == pytest.approx(0.123)
    np.testing.assert_allclose(np.asarray(im), np.asarray(inv_mass))
    np.testing.assert_allclose(np.asarray(p), np.asarray(pos))
    assert info == {"gamma": 0.5, "steepness": 2.0}
    # absent signature -> None (caller re-runs warmup)
    assert load_warmup(str(tmp_path), "nope") is None


def test_warmup_roundtrip_no_mass_matrix(tmp_path):
    sig = warmup_signature("rwmh", "standard_normal", None, 20, False, 4, 5)
    save_warmup(str(tmp_path), sig, 0.75, None,
                jnp.zeros((4, 5)), {"scale": 0.75})
    step, im, p, info = load_warmup(str(tmp_path), sig)
    assert step == pytest.approx(0.75) and im is None
    assert info == {"scale": 0.75}


@pytest.mark.slow
def test_runner_restores_warmup_from_cache(tmp_path):
    """Second invocation of the same configuration restores Phase 1 from the
    checkpoint (warmup_restored flag + identical tuned step) instead of
    re-running warmup."""
    from mcmc_tpu.benchmark import run_single_benchmark_with_L
    from mcmc_tpu.targets import get_target

    t = get_target("standard_normal", dim=4)
    kw = dict(n_chains=4, num_warmup=100, num_samples=200,
              schedule_type="constant", num_steps=20,
              warmup_cache_dir=str(tmp_path))
    r1 = run_single_benchmark_with_L(
        "rwmh", t, "standard_normal", random.PRNGKey(0), **kw)
    assert r1.get("error") is None
    assert r1["warmup_restored"] is False

    r2 = run_single_benchmark_with_L(
        "rwmh", t, "standard_normal", random.PRNGKey(0), **kw)
    assert r2.get("error") is None
    assert r2["warmup_restored"] is True
    assert r2["scale"] == pytest.approx(r1["scale"])
    assert r2["warmup_time"] < r1["warmup_time"]
    # seed-reproducibility across crash-resume (review r3 finding): the
    # warmup key is consumed unconditionally, so the cache-hit run draws
    # the same sampling keys and reproduces the uninterrupted run exactly
    assert r2["accept_rate"] == pytest.approx(r1["accept_rate"])
    assert r2["rhat_max"] == pytest.approx(r1["rhat_max"])
    assert r2["ess_bulk_min"] == pytest.approx(r1["ess_bulk_min"], rel=1e-6)


def test_warmup_signature_distinguishes_budget_and_backend():
    """A 200-step quick-test checkpoint must not satisfy a 2500-step re-run,
    nor a classic-NUTS warmup a persistent one (review r3 finding)."""
    base = dict(sampler="nuts", target_name="standard_normal", schedule=None,
                num_steps=20, learn_mass=True, n_chains=8, dim=4)
    sigs = {
        warmup_signature(**base, num_warmup=200, backend="classic"),
        warmup_signature(**base, num_warmup=2500, backend="classic"),
        warmup_signature(**base, num_warmup=2500, backend="persistent"),
        # a multinomial-scheme warmup runs a different machine (sub-U-turn
        # termination): its checkpoint must not satisfy an endpoint run —
        # the runner keys it as "<backend>-multinomial"
        warmup_signature(**base, num_warmup=2500,
                         backend="persistent-multinomial"),
        warmup_signature(**base),
    }
    assert len(sigs) == 5


def test_load_warmup_foreign_sidecar_returns_none(tmp_path):
    """A sidecar/npz written by another save_state_tree caller (or an
    older format) under the same path must degrade to None = re-run
    warmup, not raise KeyError into the benchmark loop (review finding)."""
    import json
    save_warmup(str(tmp_path), "sig", 0.3, None, np.zeros((4, 2)), {})
    (tmp_path / "sig.json").write_text(json.dumps({"foreign": True}))
    assert load_warmup(str(tmp_path), "sig") is None

    # npz missing the 'position' leaf
    save_state_tree(str(tmp_path / "sig2"), {"other": np.zeros(3)},
                    meta={"step_size": 0.1, "has_inv_mass": False})
    assert load_warmup(str(tmp_path), "sig2") is None


def test_load_state_tree_casts_to_like_dtype(tmp_path):
    """With `like`, restored leaves take like's dtypes so the state is
    interchangeable with a fresh one (x64 checkpoints restore cleanly in
    x64-off processes; review finding on the dtype contract)."""
    save_state_tree(str(tmp_path / "st"), {"x": np.arange(3, dtype=np.float64)})
    tree, _ = load_state_tree(str(tmp_path / "st"),
                              like={"x": jnp.zeros(3, dtype=jnp.bfloat16)})
    assert tree["x"].dtype == jnp.bfloat16


def test_mid_sampling_checkpoint_resume_is_draw_exact(tmp_path, monkeypatch):
    """Kill-mid-sampling resume (round 5, VERDICT r4 #4): a run preempted
    between convergence checkpoints resumes from the last persisted
    checkpoint — not the start of the sampling phase — and reproduces the
    uninterrupted run's draws exactly (same RNG key sequence; bitwise on
    this deterministic CPU backend). Closes the SURVEY §5 reference gap
    "Chain state itself is NOT checkpointed mid-run"."""
    import os
    from mcmc_tpu.benchmark import runner as runner_mod
    from mcmc_tpu.benchmark import run_single_benchmark_with_L
    from mcmc_tpu.targets import get_target
    from mcmc_tpu.utils.checkpoint import SamplingCheckpoint

    t = get_target("standard_normal", dim=4)
    kw = dict(n_chains=4, num_warmup=100, num_samples=400,
              schedule_type="constant", num_steps=10,
              track_convergence=True, convergence_base=1.5,
              mesh_devices="off")

    # Arm A: uninterrupted
    ra = run_single_benchmark_with_L(
        "hmc", t, "standard_normal", random.PRNGKey(0),
        warmup_cache_dir=str(tmp_path / "a"), **kw)
    assert ra.get("error") is None

    # Arm B: preempt after the 2nd checkpoint save (the runner's
    # try/except converts the kill into an error row, like a real crash
    # would leave the process)
    calls = {"n": 0}
    real_save = SamplingCheckpoint.save

    def killing_save(self, *args, **kwargs):
        if calls["n"] >= 2:
            raise RuntimeError("simulated preemption")
        calls["n"] += 1
        return real_save(self, *args, **kwargs)

    monkeypatch.setattr(SamplingCheckpoint, "save", killing_save)
    rb_killed = run_single_benchmark_with_L(
        "hmc", t, "standard_normal", random.PRNGKey(0),
        warmup_cache_dir=str(tmp_path / "b"), **kw)
    assert "simulated preemption" in str(rb_killed.get("error"))
    monkeypatch.setattr(SamplingCheckpoint, "save", real_save)

    # the checkpoint survives the crash with 2 checkpoints' worth of state
    ckpt_dirs = [d for d in os.listdir(tmp_path / "b")
                 if d.endswith("_sampling")]
    assert len(ckpt_dirs) == 1

    # Arm B resumed: must do strictly less sampling work...
    chunks = {"n": 0}
    real_sample = runner_mod._sample

    def counting_sample(*args, **kwargs):
        chunks["n"] += 1
        return real_sample(*args, **kwargs)

    monkeypatch.setattr(runner_mod, "_sample", counting_sample)
    rb = run_single_benchmark_with_L(
        "hmc", t, "standard_normal", random.PRNGKey(0),
        warmup_cache_dir=str(tmp_path / "b"), **kw)
    assert rb.get("error") is None
    assert rb["warmup_restored"] is True
    total_chunks = 400 // min(50, 400 // 4)
    assert 0 < chunks["n"] < total_chunks

    # ...and reproduce the uninterrupted run bitwise
    for field in ("accept_rate", "rhat_max", "ess_bulk_min", "ess_tail_min",
                  "z_score_max", "total_divergences", "sliced_w2"):
        assert rb[field] == ra[field], field
    assert rb["convergence_trace"] == ra["convergence_trace"]

    # success clears the (large) partial-history checkpoint
    assert not any(d.endswith("_sampling")
                   for d in os.listdir(tmp_path / "b"))
