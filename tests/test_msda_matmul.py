"""Dense-matmul MSDA (custom VJP): forward + all gradients vs the gather core's
autodiff, including out-of-bounds sampling locations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptersis_tpu.ops.ms_deform_attn import ms_deform_attn_core
from adaptersis_tpu.ops.msda_matmul import msda_matmul


@pytest.mark.parametrize("shapes,Lq", [([(8, 8), (4, 4), (2, 2)], 9), ([(6, 5)], 12)])
def test_matmul_msda_matches_gather_fwd_and_grads(shapes, Lq):
    rng = np.random.default_rng(0)
    L = len(shapes)
    B, M, D, P = 2, 2, 8, 4
    S = sum(h * w for h, w in shapes)
    v = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Lq, M, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), jnp.float32)

    a = ms_deform_attn_core(v, shapes, loc, aw)
    b = msda_matmul(v, loc, aw, tuple(shapes))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    t = jnp.asarray(rng.standard_normal(a.shape), jnp.float32)
    g1 = jax.grad(lambda v_, l_, w_: (ms_deform_attn_core(v_, shapes, l_, w_) * t).sum(),
                  argnums=(0, 1, 2))(v, loc, aw)
    g2 = jax.grad(lambda v_, l_, w_: (msda_matmul(v_, l_, w_, tuple(shapes)) * t).sum(),
                  argnums=(0, 1, 2))(v, loc, aw)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-4)


def test_msda_module_matmul_impl():
    from adaptersis_tpu.models.adapters import get_reference_points
    from adaptersis_tpu.ops.ms_deform_attn import MSDeformAttn

    shapes = [(6, 6), (3, 3)]
    S = sum(h * w for h, w in shapes)
    q = jnp.ones((1, 5, 32))
    feat = jnp.ones((1, S, 32))
    ref = jnp.broadcast_to(jnp.asarray(get_reference_points([(5, 1)])), (1, 5, 2, 2))
    outs = {}
    for impl in ("gather", "matmul"):
        mod = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2, impl=impl)
        params = mod.init(jax.random.PRNGKey(0), q, ref, feat, shapes)
        outs[impl] = np.asarray(mod.apply(params, q, ref, feat, shapes))
    np.testing.assert_allclose(outs["gather"], outs["matmul"], rtol=1e-5, atol=1e-5)


def test_train_step_impl_equivalence():
    """A tiny fp32 train step must produce the same loss under both MSDA impls."""
    import numpy as np
    from adaptersis_tpu.data import SyntheticSeg
    from adaptersis_tpu.models import AdapterSegmentor
    from adaptersis_tpu.models.vit import DinoVisionTransformer
    from adaptersis_tpu.parallel.mesh import get_mesh
    from adaptersis_tpu.train import Trainer, TrainerConfig

    ds = SyntheticSeg(n=4, imsize=56, seed=0)
    imgs = np.stack([ds[i][0] for i in range(4)])
    masks = np.stack([ds[i][1] for i in range(4)])
    losses = {}
    for impl in ("gather", "matmul"):
        bb = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=64,
                                   depth=5, num_heads=4)
        model = AdapterSegmentor(backbone=bb, num_classes=2, n_last_blocks=4,
                                 msda_impl=impl)
        tr = Trainer(model, TrainerConfig(use_clahe=False),
                     mesh=get_mesh(devices=jax.devices()[:1]))
        state = tr.init_state((imgs, masks))
        state, loss = tr.train_step(state, imgs, masks, jax.random.PRNGKey(0), epoch=0)
        losses[impl] = float(loss)
    assert abs(losses["gather"] - losses["matmul"]) < 1e-5, losses
