"""Orbax checkpointing with the reference's rolling/periodic/best/final trio.

Reference behavior (``/root/reference/ITS/train.py:110-131``, SURVEY.md §5.4):

- ``model.pkl``   — rolling {model, optimizer, epoch}, overwritten every epoch
- ``model_N.pkl`` — model-only snapshot every ``save_freq`` epochs
- ``Best.pkl``    — model-only, written when validation PSNR improves
- ``Final.pkl``   — model-only, written at the end

Here each name becomes an Orbax directory under ``save_dir``.  Orbax is the
TPU-native choice: sharded arrays save/restore without host gathering, and the
rolling checkpoint gives the same manual ``--resume`` crash recovery
(``ITS/main.py:79``, ``train.py:25-31``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """``async_save=True`` (default) uses Orbax's AsyncCheckpointer: the
    device→host snapshot happens synchronously inside ``save`` (so the next
    train step may freely donate the arrays), while serialization/IO runs in
    a background thread — the epoch loop no longer stalls ~1 s per rolling
    save.  Each save waits for the previous one (rolling overwrites the same
    directory); call :meth:`wait` before relying on files on disk."""

    def __init__(self, save_dir: str, async_save: bool = True):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckpt = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if async_save
            else ocp.PyTreeCheckpointer()
        )

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    def wait(self) -> None:
        """Block until any in-flight async save is durably on disk."""
        w = getattr(self._ckpt, "wait_until_finished", None)
        if w is not None:
            w()

    def _save(self, name: str, tree: Any) -> None:
        self.wait()
        self._ckpt.save(self._path(name), tree, force=True)

    def save_rolling(self, params: Any, opt_state: Any, epoch: int) -> None:
        """model.pkl equivalent: full train state, overwritten per epoch."""
        self._save(
            "model", {"params": params, "opt_state": opt_state, "epoch": epoch}
        )

    def save_snapshot(self, params: Any, epoch: int) -> None:
        """model_N.pkl equivalent (every save_freq epochs)."""
        self._save(f"model_{epoch}", {"params": params})

    def save_best(self, params: Any) -> None:
        self._save("Best", {"params": params})

    def save_final(self, params: Any) -> None:
        self._save("Final", {"params": params})

    def restore(self, name: str = "model", template: Optional[Any] = None) -> Any:
        """Restore a checkpoint by name.  ``template`` (a matching pytree of
        arrays) restores with correct dtypes/shardings when given."""
        self.wait()
        path = self._path(name)
        if template is not None:
            return self._ckpt.restore(path, item=template)
        return self._ckpt.restore(path)

    def has(self, name: str = "model") -> bool:
        self.wait()
        return os.path.isdir(self._path(name))


def load_params(path: str) -> Any:
    """Load a model-only checkpoint ({"params": ...}) from an Orbax dir —
    the ``--test_model`` entry point (``ITS/eval.py:16-17``)."""
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))["params"]
