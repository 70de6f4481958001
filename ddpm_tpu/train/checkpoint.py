"""Checkpoint save/load with the reference's roster semantics.

The reference stores a single ``.pt`` dict of state_dicts for the trainee
roster {model, optimizer, ema, scheduler} plus extra info, with the epoch
number rewritten into the filename (ddpm_torch/utils/train.py:236-276).

Here the entire :class:`~ddpm_tpu.train.state.TrainState` pytree (params /
opt_state / EMA / step — the scheduler is a pure function of ``step`` so it
needs no state) is saved via **Orbax** into ``chkpt_dir/<epoch>/`` with the
same epoch-keyed naming, plus a JSON sidecar of the extra info (epoch, loss,
metrics). Leader-only writes under multi-host come from Orbax itself.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "latest_epoch", "resolve_checkpoint"]


def resolve_checkpoint(path: str) -> Tuple[str, Optional[int]]:
    """Normalize a user-supplied checkpoint path.

    Accepts either a run directory containing epoch-numbered subdirs, or a
    specific epoch directory itself (``.../<run>/<epoch>``) — the latter
    matches the reference's ``--chkpt-path`` pointing at one exact artifact
    (generate.py:72-93). Returns ``(run_dir, epoch_or_None)``.
    """
    path = os.path.abspath(path)
    base = os.path.basename(os.path.normpath(path))
    # an epoch directory is a digit-named dir that actually holds an orbax
    # artifact — a digit-named RUN dir (e.g. --exp-name 128) contains epoch
    # subdirs instead and must resolve to (itself, None)
    is_orbax = os.path.isdir(path) and any(
        os.path.exists(os.path.join(path, marker))
        for marker in ("_CHECKPOINT_METADATA", "manifest.ocdbt", "_METADATA")
    )
    if base.isdigit() and is_orbax:
        return os.path.dirname(os.path.normpath(path)), int(base)
    return path, None


def _checkpointer() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


def _state_to_tree(state) -> dict:
    """Array-only pytree of the train state (static fields excluded)."""
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    return tree


def save_checkpoint(state, chkpt_dir: str, epoch: int, extra: Optional[dict] = None) -> str:
    """Write state under ``chkpt_dir/<epoch>``; returns the path."""
    path = os.path.join(os.path.abspath(chkpt_dir), str(epoch))
    _checkpointer().save(path, _state_to_tree(state), force=True)
    meta = {"epoch": epoch, **(extra or {})}
    with open(os.path.join(path, "info.json"), "w") as f:
        json.dump(meta, f, default=float)
    return path


def latest_epoch(chkpt_dir: str) -> Optional[int]:
    if not os.path.isdir(chkpt_dir):
        return None
    epochs = [int(d) for d in os.listdir(chkpt_dir) if d.isdigit()]
    return max(epochs) if epochs else None


def load_checkpoint(state, chkpt_dir: str, epoch: Optional[int] = None) -> Tuple[Any, int]:
    """Restore into the (template) ``state``; returns (state, start_epoch).

    Mirrors Trainer.load_checkpoint's resume contract
    (ddpm_torch/utils/train.py:249-262): the restored ``epoch`` becomes the
    epoch to resume *from*.
    """
    if epoch is None:
        chkpt_dir, epoch = resolve_checkpoint(chkpt_dir)
    if epoch is None:
        epoch = latest_epoch(chkpt_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {chkpt_dir}")
    path = os.path.join(os.path.abspath(chkpt_dir), str(epoch))
    template = _state_to_tree(state)
    # tolerate EMA presence mismatch: a run trained without --use-ema can be
    # loaded into an EMA-carrying state (EMA falls back to the raw params —
    # reference generate.py:72-93 fallback order) and vice versa
    try:
        meta = _checkpointer().metadata(path)
        tree = getattr(getattr(meta, "item_metadata", meta), "tree", None)
        saved_keys = set(tree.keys()) if tree is not None else set(template.keys())
    except Exception:
        saved_keys = set(template.keys())
    if "ema_params" in template and "ema_params" not in saved_keys:
        template.pop("ema_params")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    # the reverse mismatch (checkpoint saved WITH ema, template without)
    # needs a partial restore — the extra saved subtree is simply skipped
    extra_saved = saved_keys - set(template.keys())
    if extra_saved:
        try:
            restored = _checkpointer().restore(path, item=abstract, partial_restore=True)
        except TypeError:
            # orbax < ~0.11 has no partial_restore: restore with a template
            # widened by shape structs for the extra subtrees, then drop
            # them. The structs come from the checkpoint *metadata* (already
            # fetched above — extra_saved non-empty implies tree is not
            # None), so normally no throwaway full restore is needed; only
            # an unexpected metadata layout falls back to one.
            widened = dict(abstract)
            try:
                for k in extra_saved:
                    widened[k] = jax.tree.map(
                        lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype),
                        tree[k],
                    )
            except (AttributeError, TypeError, KeyError) as e:
                # metadata layout surprise: fall back to a throwaway restore.
                # Narrowed to shape-introspection failures and logged so a
                # genuinely corrupt checkpoint isn't silently converted into
                # an expensive full restore with a less clear error.
                print(
                    f"checkpoint metadata widening failed ({e!r}); "
                    "falling back to a full restore for shape structs",
                    flush=True,
                )
                full_meta = _checkpointer().restore(path)
                for k in extra_saved:
                    widened[k] = jax.tree.map(ocp.utils.to_shape_dtype_struct, full_meta[k])
            restored = _checkpointer().restore(path, item=widened)
            restored = {k: v for k, v in restored.items() if k not in extra_saved}
    else:
        restored = _checkpointer().restore(path, item=abstract)
    ema = restored.get("ema_params")
    if ema is None and state.ema_params is not None:
        ema = jax.tree.map(np.copy, restored["params"])
    new_state = state.replace(
        step=np.asarray(restored["step"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=ema,
    )
    return new_state, epoch
