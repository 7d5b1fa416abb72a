"""BNHead / DPT / depth losses / misc utils / attention visualization hook."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.heads import BNHead, DPTHead, gradient_loss, sig_loss
from adaptersis_tpu.utils.misc import MultiCropWrapper, clip_gradients, lars


def fake_taps(B=2, hw=8, C=32, n=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (jnp.asarray(rng.standard_normal((B, hw, hw, C)), jnp.float32),
         jnp.asarray(rng.standard_normal((B, C)), jnp.float32))
        for _ in range(n)
    ]


def test_bnhead():
    taps = fake_taps()
    head = BNHead(num_classes=3)
    v = head.init(jax.random.PRNGKey(0), taps, train=False)
    out = head.apply(v, taps, train=False)
    assert out.shape == (2, 8, 8, 3)


def test_dpt_head():
    taps = fake_taps(C=64)
    head = DPTHead(embed_dim=64, channels=32, post_process_channels=(16, 32, 64, 128),
                   max_depth=10.0)
    v = head.init(jax.random.PRNGKey(0), taps, train=False)
    out = head.apply(v, taps, train=False)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    o = np.asarray(out)
    assert (o >= 0.001).all() and (o <= 10.0).all()


def test_sig_loss_scale_invariance_property():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(1, 5, (2, 16, 16)), jnp.float32)
    # perfect prediction → 0
    assert float(sig_loss(t, t)) < 1e-4
    # sigma=1 would make it fully scale-invariant; at 0.85 a constant scale gives
    # a small but nonzero penalty — must be far below a random prediction's
    p_scaled = t * 2.0
    p_rand = jnp.asarray(rng.uniform(1, 5, (2, 16, 16)), jnp.float32)
    assert float(sig_loss(p_scaled, t)) < float(sig_loss(p_rand, t))
    assert float(gradient_loss(t, t)) < 1e-5


def test_lars_matches_torch_lars_shape_behavior():
    # 1-D params: no wd, no trust scaling (reference utils.py:571-577)
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    grads = {"w": jnp.full((4, 4), 0.1), "b": jnp.full((4,), 0.1)}
    tx = lars(0.1, momentum=0.9, weight_decay=1e-4)
    st = tx.init(params)
    upd, st = tx.update(grads, st, params)
    assert upd["b"].shape == (4,)
    # bias update is plain momentum-sgd step: -lr * g
    np.testing.assert_allclose(np.asarray(upd["b"]), -0.1 * 0.1 * np.ones(4), rtol=1e-5)


def test_clip_gradients():
    g = {"a": jnp.full((3,), 10.0)}
    c = clip_gradients(g, clip=1.0)
    assert float(jnp.linalg.norm(c["a"])) <= 1.0 + 1e-5


def test_multicrop_wrapper_groups_by_resolution():
    calls = []

    def backbone(x):
        calls.append(x.shape)
        return x.mean(axis=(1, 2))

    wrapper = MultiCropWrapper(backbone, lambda z: z)
    crops = [jnp.ones((2, 8, 8, 3)), jnp.ones((2, 8, 8, 3)), jnp.ones((2, 4, 4, 3))]
    out = wrapper(crops)
    assert out.shape == (6, 3)
    assert len(calls) == 2  # two distinct resolutions → two forwards


def test_get_last_selfattention():
    from adaptersis_tpu.models.vit import DinoVisionTransformer

    m = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2)
    x = jnp.zeros((1, 28, 28, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    attn = m.apply(v, x, method=m.get_last_selfattention)
    assert attn.shape == (1, 2, 5, 5)  # 4 patches + cls
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, rtol=1e-5)
