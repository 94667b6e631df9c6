"""Orbax checkpointing of the full GAN TrainState.

Replaces the reference's raw per-epoch ``state_dict`` saves
(``train_gan.py:328-334``: ``netG_{e:03d}.pth`` / ``netD_{e:03d}.pth`` after
epoch 50, optimizer files *overwritten* every epoch).  Public semantics kept:
save every epoch once ``epoch > save_after`` (default 50), resume by epoch
number.  The reference quirk where resuming to an older epoch pairs it with the
*latest* optimizer state (``train_gan.py:331-332,490-493``) is fixed — each
step saves the complete ``TrainState`` (G/D params, both optimizer states,
spectral-norm state, step counter) atomically — and recorded here per
SURVEY.md §5 ("pair each model checkpoint with its optimizer state").

Multi-host: Orbax writes shard-parallel and commits atomically; every process
must call ``save``/``restore`` collectively (standard Orbax contract).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Epoch-indexed checkpoints of a pytree state under ``directory``."""

    def __init__(self, directory: str, max_to_keep: int | None = None):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, epoch: int, state: Any, *, force: bool = False) -> bool:
        return self._mgr.save(epoch, args=ocp.args.StandardSave(state), force=force)

    def restore(self, template: Any, epoch: int | None = None) -> tuple[Any, int]:
        """Restore ``epoch`` (or the latest); ``template`` supplies the tree
        structure/shardings (e.g. a fresh ``create_train_state`` output)."""
        if epoch is None:
            epoch = self.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(f"No checkpoints under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        state = self._mgr.restore(epoch, args=ocp.args.StandardRestore(abstract))
        return state, epoch

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def all_epochs(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def wait(self) -> None:
        """Block until async writes are committed (call before process exit)."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
