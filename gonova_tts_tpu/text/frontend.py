"""End-to-end text frontend: raw text → padded token id arrays.

Pipeline: normalize → (optionally segment) → G2P → tokenize → bucket-pad.
This is the host-side stage of the engine; everything downstream is jit-compiled.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from . import g2p, normalize, segment, symbols


def text_to_ids(text: str, add_bos_eos: bool = True) -> List[int]:
    """Raw text → phoneme token ids (single chunk; no segmentation)."""
    norm = normalize.normalize_text(text)
    phones = g2p.text_to_phonemes(norm)
    return symbols.encode(phones, add_bos_eos=add_bos_eos)


def segment_text(text: str, max_chars: int = 150) -> List[str]:
    """Reference-semantics sentence segmentation (see segment.py)."""
    return segment.split_into_sentences(text, max_chars=max_chars)


def pick_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket that fits `length`; the largest bucket if none do (inputs are
    hard-wrapped upstream so this is a backstop, not truncation in the common path)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def pad_to_bucket(
    ids: Sequence[int], buckets: Sequence[int]
) -> Tuple[np.ndarray, int, int]:
    """Token ids → (padded int32 array of bucket size, true length, bucket)."""
    bucket = pick_bucket(len(ids), buckets)
    ids = list(ids)[:bucket]
    arr = np.full((bucket,), symbols.PAD_ID, dtype=np.int32)
    arr[: len(ids)] = ids
    return arr, len(ids), bucket


def batch_to_bucket(
    id_lists: Sequence[Sequence[int]], buckets: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pad a batch of token id lists into one [B, bucket] array (shared bucket =
    the one fitting the longest member). Returns (tokens, lengths, bucket)."""
    longest = max(len(ids) for ids in id_lists)
    bucket = pick_bucket(longest, buckets)
    batch = np.full((len(id_lists), bucket), symbols.PAD_ID, dtype=np.int32)
    lengths = np.zeros((len(id_lists),), dtype=np.int32)
    for i, ids in enumerate(id_lists):
        ids = list(ids)[:bucket]
        batch[i, : len(ids)] = ids
        lengths[i] = len(ids)
    return batch, lengths, bucket
