"""Checkpoint save/restore (orbax).

The reference is inference-only; its weights come from `from_pretrained` downloads
(services/tts/core/synthesizer.py:185) and its only durable state is the voices dir
(SURVEY.md §5.4).  The rebuild owns its model, so checkpoints are first-class: params
(and optionally optimizer state) as orbax PyTree checkpoints, loadable by the engine via
`model.model_path` in config.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_params(path: str, params: Any, step: Optional[int] = None) -> str:
    """Save a params pytree; returns the checkpoint directory written."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(path: str, template: Optional[Any] = None) -> Any:
    """Restore a params pytree. If `template` is given, restores with its
    structure/shardings; otherwise restores as saved."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


def latest_step_dir(root: str) -> Optional[str]:
    """Find the newest step_NNNNNNNN subdir under root, or None."""
    if not os.path.isdir(root):
        return None
    steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
    return os.path.join(root, steps[-1]) if steps else None
