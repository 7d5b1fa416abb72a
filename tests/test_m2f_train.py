"""Mask2Former end-to-end training step (tiny config): loss computes, grads flow,
Hungarian matching callback works under jit."""

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from adaptersis_tpu.models.mask2former import Mask2FormerHead
from adaptersis_tpu.models.m2f_loss import m2f_total_loss, semantic_to_instances
from adaptersis_tpu.models.vit import DinoVisionTransformer
from adaptersis_tpu.models.vit_adapter import ViTAdapter


def test_m2f_train_step_decreases_loss():
    bb = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=64, depth=3,
                               num_heads=4)

    class Model(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feats = ViTAdapter(backbone=bb, freeze_vit=True, name="adapter")(x, train=train)
            return Mask2FormerHead(num_classes=3, num_queries=8, feat_channels=32,
                                   num_decoder_layers=1, name="head")(feats, train=train)

    model = Model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 112, 112, 3)), jnp.float32)
    mask = jnp.zeros((1, 112, 112), jnp.int32).at[:, :56].set(1)
    gt_masks, gt_labels = jax.vmap(lambda m: semantic_to_instances(m, 3, 3))(mask)

    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt, key):
        def loss_fn(p):
            (cls_all, mask_all), mut = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True, mutable=["batch_stats"])
            total, _ = m2f_total_loss(cls_all, mask_all, gt_masks, gt_labels, key,
                                      num_points=32)
            return total, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), new_bs, new_opt, loss

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(4):
        key, k = jax.random.split(key)
        params, bs, opt, loss = step(params, bs, opt, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
