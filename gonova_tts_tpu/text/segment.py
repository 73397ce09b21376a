"""Sentence segmentation with the reference's exact semantics.

Reproduces services/tts/core/synthesizer.py:48-99 behavior (regex fallback path — the
spaCy path is an optional accuracy upgrade there, and spaCy is not in this image):

  1. split on whitespace following `.`/`!`/`?` when the next char is uppercase,
  2. any sentence longer than `max_chars` is re-split on `[,;]\\s+` and greedily
     re-merged into chunks of at most `max_chars`, joined with ", ".

Chunks longer than `max_chars` with no comma/semicolon are kept whole, as in the
reference.  An extra hard-wrap pass (`hard_max_chars`) is our TPU extension: the engine's
largest token bucket is finite, so pathological unpunctuated inputs are wrapped on word
boundaries instead of overflowing the bucket. Set hard_max_chars=None for exact
reference behavior.
"""

from __future__ import annotations

import re
from typing import List, Optional

_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+(?=[A-Z])")
_CLAUSE_SPLIT = re.compile(r"[,;]\s+")


def split_into_sentences(
    text: str,
    max_chars: int = 150,
    hard_max_chars: Optional[int] = 400,
) -> List[str]:
    """Split text into streamable sentence chunks (reference semantics)."""
    text = text.strip()
    if not text:
        return []

    sentences = [s.strip() for s in _SENT_BOUNDARY.split(text) if s.strip()]

    result: List[str] = []
    for sentence in sentences:
        if len(sentence) <= max_chars:
            result.append(sentence)
            continue
        parts = _CLAUSE_SPLIT.split(sentence)
        current = ""
        for part in parts:
            if not current:
                current = part
            elif len(current) + len(part) + 2 <= max_chars:
                current += ", " + part
            else:
                result.append(current)
                current = part
        if current:
            result.append(current)

    if hard_max_chars is None:
        return result

    wrapped: List[str] = []
    for chunk in result:
        while len(chunk) > hard_max_chars:
            cut = chunk.rfind(" ", 1, hard_max_chars)
            if cut <= 0:
                cut = hard_max_chars
            wrapped.append(chunk[:cut].strip())
            chunk = chunk[cut:].strip()
        if chunk:
            wrapped.append(chunk)
    return wrapped
