"""iBOT block-wise mask sampling + collate (reference: dinov2/data/masking.py:11-86
and dinov2/data/collate.py:10-49).

MaskingGenerator samples rectangular blocks with log-uniform aspect ratio until a
target count of masked patches is reached; collate_masks draws per-image masking
ratios in [mask_ratio_min, mask_ratio_max] for a mask_probability subset of the
batch, and emits the flat index list + weights the iBOT loss consumes.

Host-side numpy (runs in the input pipeline like the reference's collate_fn).
"""

from __future__ import annotations

import math
import random
from typing import NamedTuple, Optional, Tuple

import numpy as np


class MaskingGenerator:
    def __init__(self, input_size: Tuple[int, int], num_masking_patches: Optional[int] = None,
                 min_num_patches: int = 4, max_num_patches: Optional[int] = None,
                 min_aspect: float = 0.3, max_aspect: Optional[float] = None):
        self.height, self.width = input_size
        self.num_patches = self.height * self.width
        self.num_masking_patches = num_masking_patches
        self.min_num_patches = min_num_patches
        self.max_num_patches = num_masking_patches if max_num_patches is None else max_num_patches
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))

    def _mask_block(self, mask: np.ndarray, max_mask_patches: int, rng: random.Random) -> int:
        delta = 0
        for _ in range(10):
            target_area = rng.uniform(self.min_num_patches, max_mask_patches)
            aspect_ratio = math.exp(rng.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect_ratio)))
            w = int(round(math.sqrt(target_area / aspect_ratio)))
            if w < self.width and h < self.height:
                top = rng.randint(0, self.height - h - 1)
                left = rng.randint(0, self.width - w - 1)
                num_masked = mask[top : top + h, left : left + w].sum()
                if 0 < h * w - num_masked <= max_mask_patches:
                    mask[top : top + h, left : left + w] = 1
                    delta += h * w - num_masked
            if delta > 0:
                break
        return delta

    def __call__(self, num_masking_patches: int = 0, seed: Optional[int] = None) -> np.ndarray:
        rng = random.Random(seed)
        mask = np.zeros((self.height, self.width), dtype=bool)
        count = 0
        while count < num_masking_patches:
            max_mask = min(num_masking_patches - count, self.max_num_patches)
            delta = self._mask_block(mask, max_mask, rng)
            if delta == 0:
                break
            count += delta
        return mask


def collate_masks(batch_size: int, n_tokens: int, mask_generator: MaskingGenerator,
                  mask_ratio_range: Tuple[float, float] = (0.1, 0.5),
                  mask_probability: float = 0.5, seed: Optional[int] = None):
    """collate_data_and_cast's mask sampling (collate.py:25-48): for a
    mask_probability subset of samples, draw a ratio and generate a block mask;
    returns (B, n_tokens) bool + per-token weights 1/(n_masked · B_masked-ish)."""
    rng = np.random.default_rng(seed)
    n_samples_masked = int(batch_size * mask_probability)
    probs = np.linspace(*mask_ratio_range, n_samples_masked + 1)
    masks = []
    upperbound = 0
    for i in range(n_samples_masked):
        prob_min, prob_max = probs[i], probs[i + 1]
        ratio = rng.uniform(prob_min, prob_max)
        masks.append(mask_generator(int(n_tokens * ratio), seed=None if seed is None else seed + i).flatten())
        upperbound += int(n_tokens * prob_max)
    for _ in range(batch_size - n_samples_masked):
        masks.append(np.zeros(n_tokens, dtype=bool))
    masks = np.stack(masks)
    order = rng.permutation(batch_size)
    return masks[order]


class MaskInfo(NamedTuple):
    """Static-shape masked-token plumbing for the iBOT path — the TPU form of
    the reference collate's {collated_masks, mask_indices_list, masks_weight,
    upperbound, n_masked_patches} (collate.py:24-48).

    The reference gathers masked patch tokens into an `upperbound`-row buffer
    before the iBOT head (ssl_meta_arch.py:169-181, 252-260) so the 65536-wide
    head runs on ~15% of tokens instead of all of them; `indices`/`weights`
    here are that buffer's plumbing with a STATIC row count (upperbound depends
    only on the collate configuration, so every step compiles to the same
    program). Padding rows carry index 0 and weight 0 — they ride through the
    head and are zero-weighted out of the loss and the center update."""

    masks: np.ndarray      # (B, n_tokens) bool — backbone mask-token substitution
    indices: np.ndarray    # (upperbound,) int32 flat indices into (B·n_tokens)
    weights: np.ndarray    # (upperbound,) f32: 1/n_masked(sample) per token; 0 = pad
    n_masked: np.ndarray   # () int32 — real rows in indices/weights


def mask_upperbound(batch_size: int, n_tokens: int,
                    mask_ratio_range: Tuple[float, float] = (0.1, 0.5),
                    mask_probability: float = 0.5) -> int:
    """The reference collate's `upperbound` (collate.py:24-30): a static bound
    on the total masked-token count, Σ_i int(n_tokens · prob_max_i)."""
    n_samples_masked = int(batch_size * mask_probability)
    probs = np.linspace(*mask_ratio_range, n_samples_masked + 1)
    return int(sum(int(n_tokens * probs[i + 1]) for i in range(n_samples_masked)))


def collate_masks_with_indices(batch_size: int, n_tokens: int,
                               mask_generator: MaskingGenerator,
                               mask_ratio_range: Tuple[float, float] = (0.1, 0.5),
                               mask_probability: float = 0.5,
                               seed: Optional[int] = None) -> MaskInfo:
    """collate_masks plus the gathered-token plumbing (collate.py:37-48):
    flat nonzero indices (sample-major, like torch .nonzero on the flat mask)
    and per-token weights 1/n_masked(sample) (= the reference `masks_weight`),
    both padded to the static `mask_upperbound`."""
    masks = collate_masks(batch_size, n_tokens, mask_generator,
                          mask_ratio_range, mask_probability, seed)
    ub = mask_upperbound(batch_size, n_tokens, mask_ratio_range, mask_probability)
    flat = masks.reshape(-1)
    idx = np.nonzero(flat)[0].astype(np.int32)
    n_masked = idx.shape[0]
    assert n_masked <= ub, (n_masked, ub)
    per_sample = masks.sum(axis=1).clip(min=1).astype(np.float32)  # (B,)
    w = (1.0 / per_sample)[idx // n_tokens]
    indices = np.zeros(ub, np.int32)
    weights = np.zeros(ub, np.float32)
    indices[:n_masked] = idx
    weights[:n_masked] = w
    return MaskInfo(masks=masks, indices=indices, weights=weights,
                    n_masked=np.int32(n_masked))
