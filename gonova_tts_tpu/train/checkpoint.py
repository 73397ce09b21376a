"""Checkpoint save/restore (orbax).

The reference is inference-only; its weights come from `from_pretrained` downloads
(services/tts/core/synthesizer.py:185) and its only durable state is the voices dir
(SURVEY.md §5.4).  The rebuild owns its model, so checkpoints are first-class: params
(and optionally optimizer state) as orbax PyTree checkpoints, loadable by the engine via
`model.model_path` in config.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

_META_FILE = "tts_meta.json"  # orbax-dir sidecar
_META_KEY = "__meta__"  # npz-embedded JSON bytes


def _default_meta() -> Dict[str, Any]:
    """Frontend-mode facts the serving engine must replay to feed the checkpoint
    the token inventory it was trained on (ADVICE r3: a stress-trained checkpoint
    served without TTS_STRESS=1 silently gets ids it never saw)."""
    from ..text import frontend

    return {"format_version": 1, "stress": frontend.stress_enabled()}


def save_params(
    path: str,
    params: Any,
    step: Optional[int] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Save a params pytree; returns the checkpoint directory written. Frontend
    metadata (stress mode) is recorded alongside — pass `meta` to override."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    try:
        with open(os.path.join(path, _META_FILE), "w") as fh:
            json.dump(meta if meta is not None else _default_meta(), fh)
    except OSError:
        pass  # metadata is advisory; params are the checkpoint
    return path


def restore_params(path: str, template: Optional[Any] = None) -> Any:
    """Restore a params pytree from an orbax dir, a training root (descends to the
    newest step_NNNNNNNN subdir), or a compact .npz (see save_params_npz)."""
    path = os.path.abspath(path)
    if path.endswith(".npz"):
        return restore_params_npz(path)
    latest = latest_step_dir(path)
    if latest is not None:
        path = latest

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


def save_params_npz(
    path: str, params: Any, dtype="float16", meta: Optional[Dict[str, Any]] = None
) -> str:
    """Compact single-file checkpoint: '/'-joined tree paths → (by default) f16
    arrays, zip-compressed. ~4× smaller than f32 orbax — the repo-committable
    format for demo checkpoints. Restore upcasts to f32. Frontend metadata is
    embedded as JSON bytes under a reserved key (see load_meta)."""
    import numpy as np
    import jax

    flat = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = []
        for k in key_path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        flat["/".join(parts)] = np.asarray(leaf).astype(dtype)
    payload = json.dumps(meta if meta is not None else _default_meta())
    flat[_META_KEY] = np.frombuffer(payload.encode("utf-8"), dtype=np.uint8)
    np.savez_compressed(path, **flat)
    return path


def load_meta(path: str) -> Dict[str, Any]:
    """Frontend metadata recorded at save time ({} for pre-metadata checkpoints).
    Accepts the same path forms as restore_params."""
    import numpy as np

    path = os.path.abspath(path)
    try:
        if path.endswith(".npz"):
            with np.load(path) as z:
                if _META_KEY not in z.files:
                    return {}
                return json.loads(bytes(np.asarray(z[_META_KEY])).decode("utf-8"))
        latest = latest_step_dir(path)
        meta_path = os.path.join(latest or path, _META_FILE)
        if os.path.isfile(meta_path):
            with open(meta_path) as fh:
                return json.load(fh)
    except (OSError, ValueError, json.JSONDecodeError):
        pass
    return {}


def restore_params_npz(path: str) -> Any:
    """Rebuild the nested pytree from a save_params_npz file (f32 leaves).
    All-digit key levels become lists (model blocks are lists of dicts)."""
    import numpy as np

    with np.load(path) as z:
        flat = {
            k: np.asarray(z[k], np.float32) for k in z.files if k != _META_KEY
        }
    root: dict = {}
    for key, leaf in flat.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    def listify(node):
        if not isinstance(node, dict):
            return node
        out = {k: listify(v) for k, v in node.items()}
        if out and all(k.isdigit() for k in out):
            idx = sorted(int(k) for k in out)
            if idx != list(range(len(out))):
                raise ValueError(
                    f"npz checkpoint has non-contiguous list indices {idx} — "
                    "file is truncated or hand-edited"
                )
            return [out[str(i)] for i in idx]
        return out

    return listify(root)


def latest_step_dir(root: str) -> Optional[str]:
    """Find the newest step_NNNNNNNN subdir under root, or None."""
    if not os.path.isdir(root):
        return None
    steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
    return os.path.join(root, steps[-1]) if steps else None
