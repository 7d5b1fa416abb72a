"""Data layer: samplers (resumability), loader, on-device augmentation, CLAHE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptersis_tpu.data import (
    DataLoader,
    EpochSampler,
    ShardedInfiniteSampler,
    SyntheticSeg,
    clahe_rgb,
    train_augment,
    val_preprocess,
)


def test_epoch_sampler_shards_partition():
    s0 = EpochSampler(20, seed=1, rank=0, world_size=2)
    s1 = EpochSampler(20, seed=1, rank=1, world_size=2)
    s0.set_epoch(3)
    s1.set_epoch(3)
    a, b = list(s0), list(s1)
    assert len(a) == len(b) == 10
    assert set(a).isdisjoint(b)
    s0.set_epoch(4)
    assert list(s0) != a  # reshuffled per epoch


def test_sharded_infinite_sampler_resume():
    import itertools
    full = list(itertools.islice(iter(ShardedInfiniteSampler(10, seed=7)), 25))
    resumed = list(itertools.islice(iter(ShardedInfiniteSampler(10, seed=7, advance=13)), 12))
    assert full[13:25] == resumed, "mid-stream resume must reproduce the stream"


def test_sharded_infinite_sampler_positional_shards():
    """Ranks take POSITIONAL slices of one global permutation (reference
    dinov2/data/samplers.py:129-131,214-219) — index-value sharding would pin
    each rank to a congruence class (correlated for sequential video frames)."""
    import itertools
    w0 = list(itertools.islice(iter(ShardedInfiniteSampler(20, seed=3, rank=0, world_size=2)), 10))
    w1 = list(itertools.islice(iter(ShardedInfiniteSampler(20, seed=3, rank=1, world_size=2)), 10))
    # first window: the two ranks partition the full permutation
    assert set(w0).isdisjoint(w1)
    assert len(set(w0) | set(w1)) == 20
    # NOT congruence-class sharding: rank 0 must see both parities eventually
    assert {i % 2 for i in w0} == {0, 1}
    # per-rank resume: whole windows skip by global count, remainder by per-rank yields
    full = list(itertools.islice(iter(ShardedInfiniteSampler(20, seed=3, rank=1, world_size=2)), 30))
    resumed = list(itertools.islice(
        iter(ShardedInfiniteSampler(20, seed=3, rank=1, world_size=2, advance=25)), 10))
    # advance=25 → skip 1 window (20 global) + 5 per-rank yields → stream[15:]
    assert full[15:25] == resumed


def test_loader_batches():
    ds = SyntheticSeg(n=10, imsize=56)
    loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    imgs, masks, idx = batches[0]
    assert imgs.shape == (4, 56, 56, 3) and imgs.dtype == np.uint8
    assert masks.shape == (4, 56, 56) and masks.dtype == np.int32


def test_train_augment_shapes_and_determinism():
    ds = SyntheticSeg(n=4, imsize=64)
    imgs = np.stack([ds[i][0] for i in range(4)])
    masks = np.stack([ds[i][1] for i in range(4)])
    rng = jax.random.PRNGKey(0)
    out1, m1 = train_augment(jnp.asarray(imgs), jnp.asarray(masks), rng, use_clahe=True)
    out2, m2 = train_augment(jnp.asarray(imgs), jnp.asarray(masks), rng, use_clahe=True)
    assert out1.shape == (4, 64, 64, 3) and out1.dtype == jnp.float32
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))  # same key → same aug
    out3, m3 = train_augment(jnp.asarray(imgs), jnp.asarray(masks), jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))
    # masks stay label-valued
    assert set(np.unique(np.asarray(m1))) <= set(np.unique(masks))


def test_mask_crop_follows_image_crop():
    """Crop+resize must keep image/mask aligned: use a half-plane mask."""
    S = 64
    img = np.zeros((1, S, S, 3), np.uint8)
    img[:, :, S // 2 :, :] = 255
    mask = np.zeros((1, S, S), np.int32)
    mask[:, :, S // 2 :] = 1
    rng = jax.random.PRNGKey(3)
    out, m = train_augment(jnp.asarray(img), jnp.asarray(mask), rng, use_clahe=False)
    # wherever the (augmented) image is bright, the mask must be 1 (away from the
    # interpolation boundary); check 90%+ agreement
    bright = np.asarray(out)[0, :, :, 0] > 0.5
    agree = (bright == (np.asarray(m)[0] == 1)).mean()
    assert agree > 0.9, agree


@pytest.mark.parametrize("shape", [(96, 96), (100, 80)])
def test_clahe_matches_cv2(shape):
    import cv2

    rng = np.random.default_rng(1)
    img = (np.cumsum(rng.standard_normal(shape), axis=1) * 10 + 128).clip(0, 255).astype(np.uint8)
    from adaptersis_tpu.data.clahe import clahe_channel

    want = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8)).apply(img)
    got = np.asarray(clahe_channel(jnp.asarray(img)))
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1, d.max()


def test_lab_roundtrip_matches_cv2():
    import cv2

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    from adaptersis_tpu.data.clahe import rgb_to_lab

    lab_cv = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB).astype(np.float64)
    lab = np.asarray(rgb_to_lab(jnp.asarray(rgb.astype(np.float32) / 255.0)))
    L8 = np.round(np.clip(lab[..., 0] * 255 / 100, 0, 255))
    assert np.abs(L8 - lab_cv[..., 0]).max() <= 2
    assert np.abs(np.round(lab[..., 1]) + 128 - lab_cv[..., 1]).max() <= 2


def test_val_preprocess():
    x = np.full((1, 4, 4, 3), 255, np.uint8)
    out = np.asarray(val_preprocess(jnp.asarray(x)))
    assert out.max() == 1.0 and out.dtype == np.float32
