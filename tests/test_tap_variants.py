"""TapSegmentor eval-script variants: shapes, jit, gradient routing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptersis_tpu.losses import LOSSES
from adaptersis_tpu.models import TapSegmentor
from adaptersis_tpu.models.vit import DinoVisionTransformer


def tiny_backbone():
    return DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=64,
                                 depth=4, num_heads=4)


IMG = 112


@pytest.mark.parametrize("variant", ["setr", "unet", "masktrans", "unet_fuse", "setr_ete"])
def test_variant_forward(variant):
    model = TapSegmentor(backbone=tiny_backbone(), num_classes=2, n_last_blocks=4,
                         decoder=variant, train_backbone=(variant == "setr_ete"))
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, IMG, IMG, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, IMG, IMG, 2)
    assert np.isfinite(np.asarray(logits)).all()


def _grad_norms(model, variant_loss="ce_dc"):
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, IMG, IMG, 3)), jnp.float32)
    y = jnp.zeros((1, IMG, IMG), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    bs = variables.get("batch_stats", {})

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": bs}, x, train=True,
                          mutable=["batch_stats"])[0]
        return LOSSES[variant_loss](out, y)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    norms = {}
    for path, g in flat:
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        top = name.split("/")[0]
        norms[top] = norms.get(top, 0.0) + float(jnp.sum(jnp.abs(g)))
    return norms


def test_frozen_tap_variant_freezes_backbone():
    model = TapSegmentor(backbone=tiny_backbone(), decoder="setr")
    norms = _grad_norms(model)
    assert norms["backbone"] == 0.0
    assert norms["head"] > 0.0


def test_ete_variant_trains_backbone():
    model = TapSegmentor(backbone=tiny_backbone(), decoder="setr_ete", train_backbone=True)
    norms = _grad_norms(model)
    assert norms["backbone"] > 0.0
    assert norms["head"] > 0.0


def test_masktrans_loss_grad_from_ce_only():
    """The argmax-dice term must contribute value but no gradient (reference
    quirk, eval_dinov2_masktrans.py:307-311)."""
    from adaptersis_tpu.losses import masktrans_train_loss, weighted_ce_pair

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (1, 8, 8)), jnp.int32)
    g_full = jax.grad(lambda l: masktrans_train_loss(l, y))(logits)
    g_ce = jax.grad(lambda l: weighted_ce_pair(l, y))(logits)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_ce), rtol=1e-6)
    assert float(masktrans_train_loss(logits, y)) != float(weighted_ce_pair(logits, y))
