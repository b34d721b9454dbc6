"""Orbax checkpointing with step metadata.

Replaces the reference's ``tf.train.Saver`` flow: checkpoint every
``save_every`` iterations plus a final save (train.py:551-552,626), resume
restoring the latest step when the stored net name matches
(train.py:528-534 parses the step out of the checkpoint filename; Orbax
tracks steps natively).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, net_name: str = "net", max_to_keep: int = 3):
        self.directory = os.path.abspath(os.path.join(directory, net_name))
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Tuple[Any, int]:
        """Restore into the template's structure; returns (state, step).
        Returns (template, 0) when no checkpoint exists (the reference resumes
        only on a name match, else trains from scratch, train.py:528-534)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state_template, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, int(step)

    def close(self):
        self._mgr.close()
