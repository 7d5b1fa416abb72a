"""Trainer integration on the 8-device virtual CPU mesh: data-parallel step parity
with single-device math, loss decrease, checkpoint roundtrip (SURVEY §4)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptersis_tpu.data import SyntheticSeg
from adaptersis_tpu.models import AdapterSegmentor
from adaptersis_tpu.models.vit import DinoVisionTransformer
from adaptersis_tpu.parallel.mesh import get_mesh
from adaptersis_tpu.train import Trainer, TrainerConfig, restore_checkpoint, save_checkpoint


def make_trainer(n_devices=None, fsdp=1, **cfg_kw):
    backbone = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=64,
                                     depth=5, num_heads=4)
    model = AdapterSegmentor(backbone=backbone, num_classes=2, n_last_blocks=4)
    devices = jax.devices()[:n_devices] if n_devices else None
    mesh = get_mesh(devices=devices, fsdp=fsdp)
    return Trainer(model, TrainerConfig(use_clahe=False, **cfg_kw), mesh=mesh)


def make_batch(n=8, s=56, seed=0):
    ds = SyntheticSeg(n=n, imsize=s, seed=seed)
    imgs = np.stack([ds[i][0] for i in range(n)])
    masks = np.stack([ds[i][1] for i in range(n)])
    return imgs, masks


def test_dp8_matches_dp1():
    """The 8-way data-parallel step must equal the single-device step on the same
    global batch (grad all-reduce == full-batch gradient)."""
    imgs, masks = make_batch(8)
    rng = jax.random.PRNGKey(0)

    t8 = make_trainer(n_devices=8)
    s8 = t8.init_state((imgs, masks))
    s8, loss8 = t8.train_step(s8, imgs, masks, rng, epoch=0)

    t1 = make_trainer(n_devices=1)
    s1 = t1.init_state((imgs, masks))
    s1, loss1 = t1.train_step(s1, imgs, masks, rng, epoch=0)

    assert abs(float(loss8) - float(loss1)) < 1e-5
    p8 = jax.tree_util.tree_leaves(jax.device_get(s8["params"]))
    p1 = jax.tree_util.tree_leaves(jax.device_get(s1["params"]))
    for a, b in zip(p8, p1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fsdp_matches_replicated():
    imgs, masks = make_batch(8)
    rng = jax.random.PRNGKey(0)
    t_f = make_trainer(n_devices=8, fsdp=2)
    s_f = t_f.init_state((imgs, masks))
    s_f, loss_f = t_f.train_step(s_f, imgs, masks, rng, epoch=0)
    t_r = make_trainer(n_devices=8, fsdp=1)
    s_r = t_r.init_state((imgs, masks))
    s_r, loss_r = t_r.train_step(s_r, imgs, masks, rng, epoch=0)
    assert abs(float(loss_f) - float(loss_r)) < 1e-5


def test_loss_decreases_and_eval_runs():
    imgs, masks = make_batch(8)
    trainer = make_trainer(n_devices=8, lr=0.05)
    state = trainer.init_state((imgs, masks))
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(6):
        rng, k = jax.random.split(rng)
        state, loss = trainer.train_step(state, imgs, masks, k, epoch=0)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    metrics, preds = trainer.eval_step(state, imgs, masks)
    assert 0.0 <= float(metrics["acc1"]) <= 1.0
    assert preds.shape == masks.shape


def test_eval_valid_mask_excludes_padded_rows():
    """Padded duplicate rows (valid=False) must not skew validation metrics: with
    rows [a, b, a, b], masking either (a, b) pair gives the same averages, and
    masking down to only `a` gives a genuinely different value."""
    imgs, masks = make_batch(4)
    imgs = np.stack([imgs[0], imgs[1], imgs[0], imgs[1]])
    masks = np.stack([masks[0], masks[1], masks[0], masks[1]])
    trainer = make_trainer(n_devices=4)
    state = trainer.init_state((imgs, masks))
    m_first, _ = trainer.eval_step(state, imgs, masks, np.array([1, 1, 0, 0], bool))
    m_last, _ = trainer.eval_step(state, imgs, masks, np.array([0, 0, 1, 1], bool))
    m_all, _ = trainer.eval_step(state, imgs, masks)
    m_one, _ = trainer.eval_step(state, imgs, masks, np.array([1, 0, 0, 0], bool))
    for k in m_first:
        assert abs(float(m_first[k]) - float(m_last[k])) < 1e-5, k
        assert abs(float(m_first[k]) - float(m_all[k])) < 1e-5, k
    assert any(abs(float(m_one[k]) - float(m_all[k])) > 1e-6 for k in m_one)


def test_checkpoint_roundtrip(tmp_path):
    imgs, masks = make_batch(4)
    trainer = make_trainer(n_devices=4)
    state = trainer.init_state((imgs, masks))
    state, _ = trainer.train_step(state, imgs, masks, jax.random.PRNGKey(0), epoch=0)
    host_state = jax.device_get(state)
    save_checkpoint(str(tmp_path), host_state)
    restored = restore_checkpoint(str(tmp_path), host_state)
    assert restored is not None
    for a, b in zip(jax.tree_util.tree_leaves(host_state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restore_checkpoint(str(tmp_path / "nope"), host_state) is None


def test_torch_sgd_semantics():
    """Our optax chain must reproduce torch SGD(momentum=.99, wd=3e-5) updates."""
    import torch

    w0 = np.asarray([1.0, -2.0, 3.0], np.float32)
    gs = [np.asarray([0.1, 0.2, -0.3], np.float32), np.asarray([-0.5, 0.1, 0.0], np.float32)]

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.SGD([tw], lr=0.01, momentum=0.99, weight_decay=3e-5)
    for g in gs:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    trainer = make_trainer(n_devices=1)
    tx = trainer.tx
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in gs:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + 0.01 * u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-6, atol=1e-7)


def test_precast_frozen_bf16():
    """precast_frozen stores the frozen backbone in the compute dtype
    (trainer.py init_state): identical step numerics (flax casts params at
    every use anyway), pos_embed kept fp32 for the interpolation read
    (vit.py:95)."""
    imgs, masks = make_batch(4)
    rng = jax.random.PRNGKey(0)

    def bf16_trainer(precast):
        backbone = DinoVisionTransformer(img_size=56, patch_size=14,
                                         embed_dim=64, depth=5, num_heads=4,
                                         dtype=jnp.bfloat16)
        model = AdapterSegmentor(backbone=backbone, num_classes=2,
                                 n_last_blocks=4, dtype=jnp.bfloat16)
        mesh = get_mesh(devices=jax.devices()[:1], fsdp=1)
        return Trainer(model, TrainerConfig(use_clahe=False,
                                            precast_frozen=precast), mesh=mesh)

    t_pc = bf16_trainer(True)
    s_pc = t_pc.init_state((imgs, masks))
    dtypes = {p[-1].key: l.dtype
              for p, l in jax.tree_util.tree_leaves_with_path(s_pc["frozen"])}
    assert dtypes.pop("pos_embed") == jnp.dtype(jnp.float32)
    assert set(dtypes.values()) == {jnp.dtype(jnp.bfloat16)}

    t_ref = bf16_trainer(False)
    s_ref = t_ref.init_state((imgs, masks))
    _, loss_pc = t_pc.train_step(s_pc, imgs, masks, rng, epoch=0)
    _, loss_ref = t_ref.train_step(s_ref, imgs, masks, rng, epoch=0)
    # same bf16 compute path: the only delta is where the fp32→bf16 round
    # happens, which is value-identical for params already representable
    np.testing.assert_allclose(float(loss_pc), float(loss_ref), atol=2e-3)
