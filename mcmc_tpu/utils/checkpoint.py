"""Chain-state / warmup checkpointing.

The reference checkpoints only RESULTS (incremental CSV/JSON append +
resume-by-signature, reference run_benchmarks.py:938-1023,1063-1090); the
sampler state itself is never persisted (SURVEY.md §5), so a crash mid-grid
repays every 2500-step warmup. Here warmup products (tuned step size,
learned inverse mass matrix, warmed positions, GRAHMC friction parameters)
are persisted per run signature, making the benchmark pipeline resumable
WITHIN a configuration, and arbitrary chain-state pytrees can be saved and
restored across processes.

Format: one .npz per checkpoint (arrays keyed by flattened pytree paths,
host-gathered — fine at checkpoint cadence; sharded training states re-shard
on load via the caller's device_put) plus a JSON sidecar for scalar
metadata. No orbax dependency: MCMC state is a handful of dense arrays, not
a parameter tree with layout metadata.
"""

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _flatten_with_names(tree) -> Dict[str, Any]:
    """Flatten a pytree to {path-string: leaf} with stable, readable keys."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p))))
            for p in path) or "_root"
        out[key] = leaf
    return out


def save_state_tree(path: str, tree, meta: Optional[Dict] = None) -> None:
    """Save a pytree of arrays to `<path>.npz` (+ `<path>.json` metadata).

    Leaves are host-gathered with np.asarray; scalar/None metadata goes to
    the JSON sidecar. Atomic: written to a temp file then renamed, so a
    crash mid-write never leaves a truncated checkpoint behind.
    """
    arrays = {k: np.asarray(v) for k, v in _flatten_with_names(tree).items()}
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path + ".npz")
    if meta is not None:
        tmp_j = path + ".tmp.json"
        with open(tmp_j, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp_j, path + ".json")


def load_state_tree(path: str, like=None) -> Tuple[Any, Optional[Dict]]:
    """Load `<path>.npz` back.

    With `like` (a pytree of the same structure, e.g. a freshly initialized
    state), the arrays are reassembled into that structure with each leaf
    cast to the corresponding `like` leaf's dtype, so the restored state is
    interchangeable with a fresh one (a leaf of `like` without a dtype —
    e.g. a Python scalar — gets jnp's canonical dtype instead: float64 on
    disk becomes float32 when x64 is off). Without `like`, the raw
    {path: numpy array} dict is returned with on-disk dtypes untouched.
    Returns (state_or_dict, metadata_or_None).
    """
    with np.load(path + ".npz") as z:
        arrays = {k: z[k] for k in z.files}
    meta = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    if like is None:
        return arrays, meta
    named_like = _flatten_with_names(like)
    missing = [n for n in named_like if n not in arrays]
    if missing:
        raise ValueError(f"checkpoint {path} missing leaves: {missing}")
    leaves = [jnp.asarray(arrays[n], dtype=getattr(ref, "dtype", None))
              for n, ref in named_like.items()]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


# ---------------------------------------------------------------------------
# Warmup checkpoints (benchmark runner integration)
# ---------------------------------------------------------------------------

def warmup_signature(sampler: str, target_name: str, schedule, num_steps,
                     learn_mass: bool, n_chains: int, dim: int,
                     num_warmup: int = 0, backend: str = "") -> str:
    """Filesystem-safe key for one warmup configuration (mirrors the
    runner's resume-by-signature tuple, plus every setting that changes what
    the warmup produces: shape facts, the warmup budget, and the stepping
    backend — a 200-step quick-test checkpoint must never satisfy a
    2500-step production re-run, nor a classic-NUTS one a persistent run)."""
    sched = schedule if schedule else "none"
    tail = f"_w{num_warmup}" if num_warmup else ""
    if backend:
        tail += f"_{backend}"
    # learn_mass: False/True (diagonal) or "dense" — the dense metric
    # must NOT share a checkpoint with the diagonal one (a (D,) inv_mass
    # restored into a dense run would silently sample the wrong metric)
    mass_tag = "dense" if learn_mass == "dense" else int(bool(learn_mass))
    return (f"{sampler}_{target_name}_{sched}_L{num_steps}_"
            f"mass{mass_tag}_c{n_chains}_d{dim}{tail}")


def save_warmup(cache_dir: str, signature: str, step_size: float, inv_mass,
                position, warmup_info: Dict) -> None:
    """Persist one warmup's products under `cache_dir/<signature>`."""
    os.makedirs(cache_dir, exist_ok=True)
    tree = {"position": position}
    if inv_mass is not None:
        tree["inv_mass"] = inv_mass
    meta = {
        "step_size": float(step_size),
        "has_inv_mass": inv_mass is not None,
        "gamma": float(warmup_info["gamma"]) if "gamma" in warmup_info else None,
        "steepness": (float(warmup_info["steepness"])
                      if "steepness" in warmup_info else None),
        "scale": float(warmup_info["scale"]) if "scale" in warmup_info else None,
        # ChEES tuner products (absent for grid warmups)
        "trajectory_length": (float(warmup_info["trajectory_length"])
                              if "trajectory_length" in warmup_info else None),
        "num_steps": (int(warmup_info["num_steps"])
                      if "num_steps" in warmup_info else None),
        "halton_offset": (int(warmup_info["halton_offset"])
                          if "halton_offset" in warmup_info else None),
        "max_steps_cap_hit": (bool(warmup_info["max_steps_cap_hit"])
                              if "max_steps_cap_hit" in warmup_info else None),
        # which friction tuner produced gamma (round 4: 'joint' SPSA vs
        # 'grid'; restored rows must still record it)
        "gamma_tuner": warmup_info.get("gamma_tuner"),
    }
    save_state_tree(os.path.join(cache_dir, signature), tree, meta)


# ---------------------------------------------------------------------------
# Mid-sampling checkpoints (benchmark runner Phase-2 integration)
# ---------------------------------------------------------------------------

class SamplingCheckpoint:
    """Persist chain state + partial sample history + RNG keys at the
    benchmark runner's log-spaced convergence checkpoints, so a preemption
    mid-sampling resumes from the last checkpoint instead of rewinding the
    configuration's whole sampling phase (closing the reference gap SURVEY
    §5 flags: "Chain state itself is NOT checkpointed mid-run").

    Layout under ``<dir>/``: ``state.npz`` (position, the loop RNG key, the
    W2 tracker key, optional tempered-replica positions), ``meta.json``
    (completed-draw cursor, per-piece stats, the convergence trace so far,
    and a config stamp that must match on restore), and one
    ``piece_<i>.npz`` per completed checkpoint batch (append-style: each
    save writes only the NEW draws, so checkpoint IO is O(batch), not
    O(history)).

    Resume is draw-exact: the loop key is saved AFTER the completed
    chunk's split, so the resumed run consumes the identical key sequence
    and (on a deterministic backend) reproduces the uninterrupted run
    bitwise — asserted by tests/test_checkpoint.py.
    """

    def __init__(self, cache_dir: str, signature: str, config: Dict):
        self.dir = os.path.join(cache_dir, signature + "_sampling")
        self.config = {k: (v if isinstance(v, (str, bool, type(None)))
                           else float(v) if isinstance(v, float) else int(v))
                       for k, v in config.items()}
        self._n_pieces = 0

    def load(self):
        """Return the restored loop state dict, or None (fresh start /
        config mismatch / unreadable). Keys: prev, key, w2_key, position,
        replica_pos, halton_cursor, chees_leapfrogs, convergence_trace,
        piece_samples, piece_stats."""
        meta_path = os.path.join(self.dir, "meta.json")
        if not os.path.exists(meta_path):
            return None
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            if meta["config"] != self.config:
                return None
            arrays, _ = load_state_tree(os.path.join(self.dir, "state"))
            piece_samples = []
            for i in range(meta["n_pieces"]):
                with np.load(os.path.join(self.dir, f"piece_{i}.npz")) as z:
                    piece_samples.append(jnp.asarray(z["samples"]))
            self._n_pieces = meta["n_pieces"]
            return {
                "prev": meta["prev"],
                "key": jnp.asarray(arrays["key"]),
                "w2_key": jnp.asarray(arrays["w2_key"]),
                "position": jnp.asarray(arrays["position"]),
                "replica_pos": (jnp.asarray(arrays["replica_pos"])
                                if "replica_pos" in arrays else None),
                "halton_cursor": meta["halton_cursor"],
                "chees_leapfrogs": meta["chees_leapfrogs"],
                "convergence_trace": meta["convergence_trace"],
                "piece_samples": piece_samples,
                "piece_stats": meta["piece_stats"],
            }
        except Exception:
            return None

    def save(self, prev, key, w2_key, position, replica_pos, halton_cursor,
             chees_leapfrogs, convergence_trace, piece_samples, piece_stats):
        """Persist loop state after a completed checkpoint. Only pieces not
        yet on disk are written; meta.json is replaced atomically LAST, so
        a crash mid-save leaves the previous checkpoint intact."""
        os.makedirs(self.dir, exist_ok=True)
        for i in range(self._n_pieces, len(piece_samples)):
            tmp = os.path.join(self.dir, f"piece_{i}.tmp.npz")
            with open(tmp, "wb") as f:
                np.savez(f, samples=np.asarray(piece_samples[i]))
            os.replace(tmp, os.path.join(self.dir, f"piece_{i}.npz"))
        self._n_pieces = len(piece_samples)
        tree = {"position": position, "key": key, "w2_key": w2_key}
        if replica_pos is not None:
            tree["replica_pos"] = replica_pos
        save_state_tree(os.path.join(self.dir, "state"), tree)
        meta = {
            "config": self.config,
            "prev": int(prev),
            "n_pieces": len(piece_samples),
            "halton_cursor": int(halton_cursor),
            "chees_leapfrogs": int(chees_leapfrogs),
            "convergence_trace": convergence_trace,
            "piece_stats": piece_stats,
        }
        tmp = os.path.join(self.dir, "meta.tmp.json")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.dir, "meta.json"))

    def clear(self):
        """Delete the checkpoint after the row is saved — the sample
        history is large and the benchmark's own resume-by-signature takes
        over once the result row exists."""
        import shutil
        shutil.rmtree(self.dir, ignore_errors=True)


def load_warmup(cache_dir: str, signature: str):
    """Load a warmup checkpoint: (step_size, inv_mass, position, info) or
    None when absent/corrupt (callers fall back to re-running warmup)."""
    path = os.path.join(cache_dir, signature)
    if not os.path.exists(path + ".npz"):
        return None
    try:
        arrays, meta = load_state_tree(path)
        if meta is None:
            return None
        # Key lookups stay inside the try: a sidecar/npz written by an
        # older format (or another save_state_tree caller under the same
        # path) must degrade to "re-run warmup", not fail the whole run.
        inv_mass = (jnp.asarray(arrays["inv_mass"])
                    if meta["has_inv_mass"] else None)
        info = {k: meta[k]
                for k in ("gamma", "steepness", "scale", "trajectory_length",
                          "num_steps", "halton_offset", "max_steps_cap_hit",
                          "gamma_tuner")
                if meta.get(k) is not None}
        return meta["step_size"], inv_mass, jnp.asarray(arrays["position"]), info
    except Exception:
        return None
