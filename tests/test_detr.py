"""Generic DETR stack + DynamicConv
(reference utils/transformer.py:223-989 behaviors)."""

import numpy as np

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.detr import (DetrTransformer,
                                        DeformableDetrTransformerDecoder,
                                        DynamicConv, inverse_sigmoid)


def test_inverse_sigmoid_roundtrip_and_clamp():
    x = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))),
                               np.asarray(x), rtol=1e-5)
    assert np.isfinite(float(inverse_sigmoid(jnp.asarray(0.0))))
    assert np.isfinite(float(inverse_sigmoid(jnp.asarray(1.0))))


def test_detr_transformer_shapes_and_mask_invariance():
    B, H, W, C, nq = 2, 6, 5, 32, 7
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    qe = jnp.asarray(rng.standard_normal((nq, C)), jnp.float32)
    model = DetrTransformer(embed_dim=C, num_encoder_layers=2,
                            num_decoder_layers=2, heads=4, ffn_dim=64)
    params = model.init(jax.random.PRNGKey(0), x, None, qe, pos)

    out, memory = model.apply(params, x, None, qe, pos)
    assert out.shape == (2, B, nq, C)            # per-layer activation stack
    assert memory.shape == (B, H, W, C)

    # padded pixels must not influence the decoder output: perturb ONLY the
    # masked positions and compare
    mask = np.zeros((B, H, W), bool)
    mask[:, -2:, :] = True
    x2 = np.asarray(x).copy()
    x2[:, -2:, :, :] += 37.0
    o1, _ = model.apply(params, x, jnp.asarray(mask), qe, pos)
    o2, _ = model.apply(params, jnp.asarray(x2), jnp.asarray(mask), qe, pos)
    # encoder self-attn lets masked QUERIES update themselves, but decoder
    # queries only read unmasked keys → identical decoder outputs
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-4,
                               atol=1e-4)


def test_deformable_decoder_refines_reference_points():
    B, nq, C, L = 2, 5, 32, 2
    shapes = ((8, 8), (4, 4))
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, nq, C)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((B, S, C)), jnp.float32)
    refs = jnp.asarray(rng.uniform(0.2, 0.8, (B, nq, L, 2)), jnp.float32)

    dec = DeformableDetrTransformerDecoder(num_layers=2, heads=4, ffn_dim=64,
                                           n_points=2, n_levels=L)

    class Reg:
        def __init__(self):
            import flax.linen as fnn

            self.mod = fnn.Dense(2)
            self.params = None

    # reg branch as a closure over fixed params (the reference passes shared
    # reg_branches modules)
    import flax.linen as fnn

    reg = fnn.Dense(2)
    reg_params = reg.init(jax.random.PRNGKey(2), q)

    def reg_branch(t):
        return reg.apply(reg_params, t)

    params = dec.init(jax.random.PRNGKey(0), q, mem, refs, shapes,
                      reg_branch=reg_branch)
    out, out_refs = dec.apply(params, q, mem, refs, shapes,
                              reg_branch=reg_branch)
    assert out.shape == (2, B, nq, C)
    assert out_refs.shape == (2, B, nq, L, 2)
    # refinement must actually move the points, staying in [0, 1]
    assert not np.allclose(np.asarray(out_refs[0]), np.asarray(refs))
    assert float(out_refs.min()) >= 0.0 and float(out_refs.max()) <= 1.0

    # without a reg branch the points are passed through unchanged
    params2 = dec.init(jax.random.PRNGKey(0), q, mem, refs, shapes)
    _, refs2 = dec.apply(params2, q, mem, refs, shapes)
    np.testing.assert_allclose(np.asarray(refs2[-1]), np.asarray(refs))


def test_dynamic_conv_matches_manual_math():
    N, HW, cin, cf = 3, 49, 16, 8
    rng = np.random.default_rng(2)
    pf = jnp.asarray(rng.standard_normal((N, cin)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((N, HW, cin)), jnp.float32)
    dc = DynamicConv(in_channels=cin, feat_channels=cf, input_feat_shape=7)
    params = dc.init(jax.random.PRNGKey(0), pf, feat)
    out = dc.apply(params, pf, feat)
    assert out.shape == (N, cin)

    # manual recomputation of the two dynamic matmuls + LN + ReLU + proj
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    gen = pf @ p["dynamic_layer"]["kernel"] + p["dynamic_layer"]["bias"]
    p_in = np.asarray(gen[:, :cin * cf]).reshape(N, cin, cf)
    p_out = np.asarray(gen[:, cin * cf:]).reshape(N, cf, cin)

    def ln(x, w):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-6) * w["scale"] + w["bias"]

    f = np.einsum("nhc,ncf->nhf", np.asarray(feat), p_in)
    f = np.maximum(ln(f, p["norm_in"]), 0)
    f = np.einsum("nhf,nfo->nho", f, p_out)
    f = np.maximum(ln(f, p["norm_out"]), 0)
    f = f.reshape(N, -1) @ p["fc_layer"]["kernel"] + p["fc_layer"]["bias"]
    f = np.maximum(ln(f, p["fc_norm"]), 0)
    np.testing.assert_allclose(np.asarray(out), f, rtol=2e-4, atol=2e-4)

    # with_proj=False keeps the (N, HW, out) map (transformer.py:944-948)
    dc2 = DynamicConv(in_channels=cin, feat_channels=cf, with_proj=False)
    p2 = dc2.init(jax.random.PRNGKey(1), pf, feat)
    assert dc2.apply(p2, pf, feat).shape == (N, HW, cin)
