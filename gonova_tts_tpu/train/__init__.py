"""Training subsystem: losses, sharded train steps, checkpointing."""

from .checkpoint import latest_step_dir, restore_params, save_params

__all__ = ["latest_step_dir", "restore_params", "save_params"]
