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
             extra: Optional[Dict[str, Any]] = None, force: bool = False,
             best_params: Any = None) -> bool:
        if not force and epoch % self.save_interval != 0:
            return False
        import orbax.checkpoint as ocp
        state = {"params": params, "opt_states": opt_states,
                 "extra": extra or {}}
        if best_params is not None:
            # full early-stop state: a resumed run must keep tracking the
            # SAME best snapshot the uninterrupted run would
            state["best_params"] = best_params
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
            try:
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(template))
            except (ValueError, KeyError) as e:
                raise ValueError(
                    f"checkpoint at {self.directory} (epoch {step}) does not "
                    f"match the current model's param/opt-state tree. If it "
                    f"was written by round<=2 code: the UNet/strain-head tree "
                    f"layout changed in round 3 (packed-conv refactor) and "
                    f"old checkpoints cannot be restored. Original error: {e}"
                ) from e
        return self._mgr.restore(step)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
