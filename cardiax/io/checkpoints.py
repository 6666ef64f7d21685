"""Checkpoint/resume: params + optimizer state + epoch counter (orbax).

The reference has save-only persistence (state_dicts at the end; best model
kept via in-memory deepcopy; resume effectively absent — SURVEY.md section
5.4). Here checkpointing is a real subsystem: periodic saves of the full
training state, retention policy, and exact resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional


class CheckpointManager:
    """Thin wrapper over orbax's CheckpointManager for the engine's state."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3,
                 save_interval_epochs: int = 1):
        import orbax.checkpoint as ocp
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_interval = max(1, int(save_interval_epochs))
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(str(self.directory), options=options)

    def save(self, epoch: int, params: Any, opt_states: Any,
             extra: Optional[Dict[str, Any]] = None, force: bool = False) -> bool:
        if not force and epoch % self.save_interval != 0:
            return False
        import orbax.checkpoint as ocp
        state = {"params": params, "opt_states": opt_states,
                 "extra": extra or {}}
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        return True

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, epoch: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        import orbax.checkpoint as ocp
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
