"""Model registry: named model families with init/apply entry points.

Lets the service/config select a model family by name ("the reference's analog is the
external `from_pretrained` model selection, services/tts/core/synthesizer.py:185) and
gives tooling one place to enumerate what the framework ships.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

from . import acoustic, speaker, tts, vocoder, vocos


@dataclass(frozen=True)
class ModelFamily:
    name: str
    kind: str  # "acoustic" | "vocoder" | "speaker" | "pipeline"
    description: str
    init: Callable
    forward: Callable


_REGISTRY: Dict[str, ModelFamily] = {}


def register(family: ModelFamily) -> None:
    _REGISTRY[family.name] = family


def get(name: str) -> ModelFamily:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model family {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available() -> Dict[str, ModelFamily]:
    return dict(_REGISTRY)


register(
    ModelFamily(
        name="novaspeech",
        kind="acoustic",
        description="FastPitch-class non-AR acoustic model (phonemes+speaker → mel)",
        init=acoustic.init,
        forward=acoustic.forward,
    )
)
def _novagan_forward(params, mel, cfg, dtype=None):
    """Honors cfg.hifigan_folded via tts.hifigan_forward_fn — the one routing rule
    shared with the pipeline, so the two call paths cannot drift."""
    from . import tts

    kw = {} if dtype is None else {"dtype": dtype}
    return tts.hifigan_forward_fn(cfg)(params, mel, cfg, **kw)


register(
    ModelFamily(
        name="novagan",
        kind="vocoder",
        description="HiFi-GAN-class generator (mel → 24 kHz waveform; lane-folded by default)",
        init=vocoder.init,
        forward=_novagan_forward,
    )
)
register(
    ModelFamily(
        name="novavocos",
        kind="vocoder",
        description="iSTFT-head frame-rate vocoder (Vocos-class, TPU flagship)",
        init=vocos.init,
        forward=vocos.forward,
    )
)
register(
    ModelFamily(
        name="novaspk",
        kind="speaker",
        description="Speaker encoder for one-shot voice cloning (mel → 256-d embedding)",
        init=speaker.init,
        forward=speaker.forward,
    )
)
register(
    ModelFamily(
        name="novatts",
        kind="pipeline",
        description="Full pipeline: acoustic + vocoder + speaker encoder",
        init=tts.init,
        forward=tts.synthesize,
    )
)
