"""Depth encoder-decoder + windowed attention + slide inference."""

import numpy as np

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.depther import DepthEncoderDecoder
from adaptersis_tpu.models.layers import _sdpa_einsum, windowed_sdpa
from adaptersis_tpu.models.m2f_loss import m2f_total_loss, semantic_to_instances, slide_inference
from adaptersis_tpu.models.vit import DinoVisionTransformer


def test_depth_encoder_decoder_linear_and_dpt():
    bb = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=64, depth=4,
                               num_heads=4)
    for head in ("linear", "dpt"):
        m = DepthEncoderDecoder(backbone=bb, head=head, n_bins=16)
        x = jnp.zeros((1, 56, 56, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        d = m.apply(v, x, train=False)
        assert d.shape == (1, 56, 56, 1), head
        dn = np.asarray(d)
        assert (dn >= 0.001 - 1e-5).all() and (dn <= 10.0 + 1e-5).all()


def test_windowed_attention_matches_full_when_window_covers():
    rng = np.random.default_rng(0)
    B, h, w, H, Dh = 1, 4, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((B, h * w, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, h * w, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, h * w, H, Dh)), jnp.float32)
    full = _sdpa_einsum(q, k, v, 0.5, jnp.float32)
    win = windowed_sdpa(q, k, v, 0.5, (h, w), window=4, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(win), np.asarray(full), rtol=1e-5, atol=1e-5)
    # small window differs from full attention but stays finite + right shape
    win2 = windowed_sdpa(q, k, v, 0.5, (h, w), window=2, dtype=jnp.float32)
    assert win2.shape == full.shape
    assert np.isfinite(np.asarray(win2)).all()
    assert not np.allclose(np.asarray(win2), np.asarray(full))


def test_m2f_loss_decreases_for_perfect_prediction():
    rng = np.random.default_rng(0)
    B, Q, C, h = 1, 6, 3, 16
    gt_mask = np.zeros((B, 2, 32, 32), np.float32)
    gt_mask[:, 0, :16] = 1
    gt_mask[:, 1, 16:] = 1
    gt_labels = np.asarray([[0, 2]], np.int32)

    def mk(cls_logit_good):
        cls = np.full((B, Q, C + 1), -5.0, np.float32)
        cls[..., -1] = 5.0  # default: no-object
        masks = np.full((B, Q, h, h), -8.0, np.float32)
        if cls_logit_good:
            cls[0, 0, :] = -5.0; cls[0, 0, 0] = 8.0; cls[0, 0, -1] = -5.0
            cls[0, 1, :] = -5.0; cls[0, 1, 2] = 8.0; cls[0, 1, -1] = -5.0
            masks[0, 0, :8] = 8.0
            masks[0, 1, 8:] = 8.0
        return jnp.asarray(cls), jnp.asarray(masks)

    cg, mg = mk(True)
    cb, mb = mk(False)
    good, _ = m2f_total_loss([cg], [mg], jnp.asarray(gt_mask), jnp.asarray(gt_labels),
                             jax.random.PRNGKey(0), num_points=64)
    bad, _ = m2f_total_loss([cb], [mb], jnp.asarray(gt_mask), jnp.asarray(gt_labels),
                            jax.random.PRNGKey(0), num_points=64)
    assert float(good) < float(bad)


def test_semantic_to_instances_and_slide():
    mask = jnp.zeros((16, 16), jnp.int32).at[:8].set(1).at[8:, 8:].set(3)
    masks, labels = semantic_to_instances(mask, num_classes=4, max_segments=5)
    assert masks.shape == (5, 16, 16)
    lab = np.asarray(labels)
    assert lab[0] == 1 and lab[2] == 3 and lab[1] == -1  # class 2 absent

    def fwd(crop):
        return jnp.ones(crop.shape[:3] + (2,))

    out = slide_inference(fwd, jnp.zeros((1, 16, 16, 3)), window=8, stride=4,
                          num_classes=2)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)
