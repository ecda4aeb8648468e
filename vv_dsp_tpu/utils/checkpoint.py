"""Checkpoint/resume for streaming pipelines.

The reference has no checkpointing (SURVEY.md section 5.4); its streaming
filter state structs (vv_dsp_fir_state src/filter/fir.h:28-33, biquad z1/z2
src/filter/iir.h:14-17) are exactly the state a long-running pipeline must
persist. Here every streaming state is a jax pytree, so checkpointing is
generic:

- save/load to a single .npz (host-side, atomic rename) for simple cases,
- orbax-checkpoint integration when available (async, multi-host aware) for
  production pipelines.

State trees are whatever the vv_dsp_tpu.streaming *_init functions return,
plus any user bookkeeping (sample counters, block indices).
"""

from __future__ import annotations

import os

import numpy as np
import jax


def _leaf_paths(tree) -> list[str]:
    """Stable per-leaf key-path strings (e.g. \"['fir']\", \"['stft'][0]\").

    Key paths are semantic (dict keys / sequence indices / field names), so
    they survive jax upgrades and custom-node re-registration — unlike
    ``repr(treedef)``, whose format is an implementation detail."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(path) for path, _ in flat]


def save(path: str, state_tree) -> None:
    """Persist a pytree of arrays to `path` (.npz, atomic)."""
    flat, _ = jax.tree_util.tree_flatten(state_tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__paths__"] = np.array(_leaf_paths(state_tree))
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    # numpy appends .npz to the temp name
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load(path: str, like_tree):
    """Restore a pytree saved by :func:`save`; `like_tree` supplies the
    structure (e.g. a freshly *_init'ed state). Validates leaf count,
    per-leaf key paths, shapes and dtypes against `like_tree` so a config
    mismatch fails loudly instead of scrambling or silently casting state."""
    flat_like, treedef = jax.tree_util.tree_flatten(like_tree)
    like_paths = _leaf_paths(like_tree)
    with np.load(path) as data:
        n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
        if n_saved != len(flat_like):
            raise ValueError(
                f"checkpoint has {n_saved} leaves but like_tree has "
                f"{len(flat_like)} — was it saved with a different config?")
        if "__paths__" in data.files:
            saved_paths = [str(p) for p in data["__paths__"]]
            if saved_paths != like_paths:
                diff = next((i, a, b) for i, (a, b)
                            in enumerate(zip(saved_paths, like_paths))
                            if a != b)
                raise ValueError(
                    "checkpoint tree structure differs from like_tree at "
                    f"leaf {diff[0]}: saved {diff[1]!r} != expected "
                    f"{diff[2]!r}")
        flat = [data[f"leaf_{i}"] for i in range(len(flat_like))]
    for i, (a, b) in enumerate(zip(flat, flat_like)):
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"checkpoint leaf {i} ({like_paths[i]}) shape {a.shape} != "
                f"expected {np.shape(b)} — was it saved with a different "
                "config?")
        want = np.result_type(b)
        if a.dtype != want:
            raise ValueError(
                f"checkpoint leaf {i} ({like_paths[i]}) dtype {a.dtype} != "
                f"expected {want} — refusing a silent cast; was it saved "
                "under a different dtype config?")
    import jax.numpy as jnp
    flat = [jnp.asarray(a) for a in flat]
    return jax.tree_util.tree_unflatten(treedef, flat)


def save_orbax(path: str, state_tree) -> bool:
    """Async-capable orbax save; returns False if orbax is unavailable."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state_tree, force=True)
    ckptr.wait_until_finished()
    return True


def load_orbax(path: str, like_tree):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like_tree)
