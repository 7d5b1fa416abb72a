"""SSL stack: loss math oracles, centering, masking, meta-arch step on tiny config."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptersis_tpu.ssl import (
    MaskingGenerator,
    SSLConfig,
    SSLMetaArch,
    collate_masks,
    dino_loss,
    ibot_patch_loss,
    koleo_loss,
    sinkhorn_knopp,
    softmax_center_teacher,
    update_center,
)


def test_dino_loss_matches_torch():
    rng = np.random.default_rng(0)
    s = [rng.standard_normal((4, 16)).astype(np.float32) for _ in range(2)]
    t = [np.abs(rng.standard_normal((4, 16))).astype(np.float32) for _ in range(2)]
    t = [x / x.sum(-1, keepdims=True) for x in t]
    want = 0.0
    for si in s:
        lsm = F.log_softmax(torch.from_numpy(si) / 0.1, dim=-1)
        for ti in t:
            want -= (torch.from_numpy(ti) * lsm).sum(-1).mean().item()
    got = float(dino_loss([jnp.asarray(x) for x in s], [jnp.asarray(x) for x in t]))
    assert abs(got - want) < 1e-4


def test_center_update_and_softmax_center():
    rng = np.random.default_rng(1)
    out = rng.standard_normal((8, 16)).astype(np.float32)
    center = np.zeros((1, 16), np.float32)
    new = np.asarray(update_center(jnp.asarray(center), jnp.asarray(out)))
    want = center * 0.9 + out.mean(0, keepdims=True) * 0.1
    np.testing.assert_allclose(new, want, rtol=1e-5, atol=1e-6)
    sm = np.asarray(softmax_center_teacher(jnp.asarray(out), jnp.asarray(new), 0.07))
    np.testing.assert_allclose(sm.sum(-1), 1.0, rtol=1e-5)


def test_sinkhorn_columns_sum_to_one():
    rng = np.random.default_rng(2)
    out = rng.standard_normal((16, 8)).astype(np.float32)
    Q = np.asarray(sinkhorn_knopp(jnp.asarray(out), 0.07))
    np.testing.assert_allclose(Q.sum(-1), 1.0, rtol=1e-4, atol=1e-4)


def test_ibot_loss_ignores_unmasked():
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
    t = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32))
    mask0 = jnp.zeros((2, 6), bool)
    assert float(ibot_patch_loss(s, t, mask0)) == 0.0
    mask = mask0.at[0, :3].set(True)
    v = float(ibot_patch_loss(s, t, mask))
    assert v > 0.0
    # changing an unmasked position's logits must not change the loss
    s2 = s.at[1, 5].set(100.0)
    assert abs(float(ibot_patch_loss(s2, t, mask)) - v) < 1e-6


def test_koleo_matches_torch_reference_math():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    tx = F.normalize(torch.from_numpy(x), dim=-1, eps=1e-8)
    dots = tx @ tx.t()
    n = tx.shape[0]
    dots.view(-1)[:: n + 1] = -1
    I = dots.max(dim=1)[1]
    d = F.pairwise_distance(tx, tx[I], 2, eps=1e-8)
    want = -torch.log(d + 1e-8).mean().item()
    got = float(koleo_loss(jnp.asarray(x)))
    assert abs(got - want) < 1e-4


def test_masking_generator_and_collate():
    gen = MaskingGenerator((8, 8), num_masking_patches=32)
    m = gen(20, seed=0)
    assert m.shape == (8, 8)
    assert 0 < m.sum() <= 32
    batch = collate_masks(batch_size=6, n_tokens=64, mask_generator=gen,
                          mask_probability=0.5, seed=1)
    assert batch.shape == (6, 64)
    masked_samples = (batch.sum(1) > 0).sum()
    assert masked_samples == 3  # half the batch


def test_meta_arch_step_runs_and_teacher_ema():
    from adaptersis_tpu.models.vit import DinoVisionTransformer

    bb = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32, depth=2,
                               num_heads=2)
    cfg = SSLConfig(dino_out_dim=64, ibot_out_dim=64, n_local_crops=2,
                    koleo_loss_weight=0.1)
    arch = SSLMetaArch(bb, cfg)
    state = arch.init_state(jax.random.PRNGKey(0), 28, 28)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(8, 4)) > 0.5)
    schedules = {k: np.full(10, v) for k, v in
                 [("lr", 1e-3), ("wd", 0.04), ("momentum", 0.9),
                  ("teacher_temp", 0.04), ("last_layer_lr", 1e-3)]}
    s0_student = jax.device_get(state["student"])
    state, metrics = arch.train_step(state, g, l, masks, schedules, 0)
    assert np.isfinite(float(metrics["total_loss"]))
    # teacher must move toward the updated student: t = 0.9 t + 0.1 s_new
    s_new = jax.device_get(state["student"])
    t_new = jax.device_get(state["teacher"])
    leaf = lambda tree: jax.tree_util.tree_leaves(tree)[0]
    np.testing.assert_allclose(
        leaf(t_new), 0.9 * leaf(s0_student) + 0.1 * leaf(s_new), rtol=2e-4, atol=2e-6)
    # center must have moved off zero
    assert float(jnp.abs(state["dino_center"]).sum()) > 0.0


def test_ssl_step_dp8_matches_dp1():
    """The SSL train step must produce identical losses and updated params on an
    8-device data-parallel mesh and a single device (GSPMD batch sharding +
    XLA-inserted collectives for loss means and center EMAs)."""
    from adaptersis_tpu.models.vit import DinoVisionTransformer
    from adaptersis_tpu.parallel.mesh import get_mesh

    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(8, 4)) > 0.5)
    schedules = {k: np.full(4, v) for k, v in
                 [("lr", 1e-3), ("wd", 0.04), ("momentum", 0.9),
                  ("teacher_temp", 0.04), ("last_layer_lr", 1e-3)]}

    results = {}
    for name, devices in (("dp1", jax.devices()[:1]), ("dp8", jax.devices())):
        bb = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                                   depth=2, num_heads=2)
        cfg = SSLConfig(dino_out_dim=64, ibot_out_dim=64, n_local_crops=2,
                        koleo_loss_weight=0.0)  # koleo pairs within-batch: DP-dependent in ref too
        arch = SSLMetaArch(bb, cfg, mesh=get_mesh(devices=devices))
        state = arch.init_state(jax.random.PRNGKey(0), 28, 28)
        state, metrics = arch.train_step(state, g, l, masks, schedules, 0)
        results[name] = (float(metrics["total_loss"]),
                         jax.device_get(state["student"]))

    assert abs(results["dp1"][0] - results["dp8"][0]) < 1e-5
    # params: cross-device psum reduction order vs a single-device sum shifts
    # grads by float-epsilon, which Adam's rsqrt amplifies — bound, not bitwise
    a = jax.tree_util.tree_leaves(results["dp1"][1])
    b = jax.tree_util.tree_leaves(results["dp8"][1])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-2, atol=1e-3)


def test_ssl_packed_crops_match_separate():
    """forward_packed_crops (segment-id block-diagonal attention, the
    BlockDiagonalMask equivalent) must equal two separate backbone forwards,
    and the SSL step with packed_crops on/off must produce the same loss."""
    from adaptersis_tpu.models.vit import DinoVisionTransformer

    rng = np.random.default_rng(11)
    B2, k = 8, 2
    g = jnp.asarray(rng.standard_normal((B2, 28, 28, 3)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((B2 * k, 14, 14, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(B2, 4)) > 0.5)

    bb = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                               depth=2, num_heads=2)
    variables = bb.init(jax.random.PRNGKey(0), g)
    gd, ld = bb.apply(variables, g, l, masks=masks,
                      method=bb.forward_packed_crops)
    gsep = bb.apply(variables, g, masks=masks, method=bb.forward_with_masks)
    lsep = bb.apply(variables, l, method=bb.forward_with_masks)
    np.testing.assert_allclose(np.asarray(gd["x_norm_clstoken"]),
                               np.asarray(gsep["x_norm_clstoken"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd["x_norm_patchtokens"]),
                               np.asarray(gsep["x_norm_patchtokens"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld["x_norm_clstoken"]),
                               np.asarray(lsep["x_norm_clstoken"]),
                               rtol=1e-5, atol=1e-5)

    schedules = {kk: np.full(2, v) for kk, v in
                 [("lr", 1e-3), ("wd", 0.04), ("momentum", 0.9),
                  ("teacher_temp", 0.04), ("last_layer_lr", 1e-3)]}
    losses = {}
    mask_tok = jnp.asarray(rng.uniform(size=(B2, 4)) > 0.5)
    for packed in (False, True):
        bb2 = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                                    depth=2, num_heads=2)
        cfg = SSLConfig(dino_out_dim=64, ibot_out_dim=64,
                        n_local_crops=2 * k,  # 16 locals / (B2/2) samples
                        packed_crops=packed)
        arch = SSLMetaArch(bb2, cfg)
        state = arch.init_state(jax.random.PRNGKey(0), 28, 14)
        _, metrics = arch.train_step(state, g, l, mask_tok, schedules, 0)
        losses[packed] = float(metrics["total_loss"])
    assert abs(losses[True] - losses[False]) < 1e-5, losses


def test_ssl_step_fsdp_matches_dp1():
    """(data:4 × fsdp:2) must match a single device: FSDP is a pure layout
    change — XLA all-gathers params per layer and reduce-scatters grads
    (reference FULL_SHARD, dinov2/fsdp/__init__.py:22-54). Also asserts the
    state really IS sharded over the fsdp axis."""
    from adaptersis_tpu.models.vit import DinoVisionTransformer
    from adaptersis_tpu.parallel.mesh import get_mesh

    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(8, 4)) > 0.5)
    schedules = {k: np.full(4, v) for k, v in
                 [("lr", 1e-3), ("wd", 0.04), ("momentum", 0.9),
                  ("teacher_temp", 0.04), ("last_layer_lr", 1e-3)]}

    results = {}
    for name, mesh in (("dp1", get_mesh(devices=jax.devices()[:1])),
                       ("fsdp", get_mesh(devices=jax.devices(), fsdp=2))):
        bb = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                                   depth=2, num_heads=2)
        cfg = SSLConfig(dino_out_dim=64, ibot_out_dim=64, n_local_crops=2,
                        koleo_loss_weight=0.0)
        arch = SSLMetaArch(bb, cfg, mesh=mesh)
        state = arch.init_state(jax.random.PRNGKey(0), 28, 28)
        if name == "fsdp":
            # at least one large leaf must actually live sharded on "fsdp"
            sharded = [x for x in jax.tree_util.tree_leaves(state["student"])
                       if any("fsdp" in str(s) for s in
                              getattr(x.sharding, "spec", ()))]
            assert sharded, "no student leaf sharded over the fsdp axis"
        state, metrics = arch.train_step(state, g, l, masks, schedules, 0)
        results[name] = (float(metrics["total_loss"]),
                         jax.device_get(state["student"]))

    assert abs(results["dp1"][0] - results["fsdp"][0]) < 1e-5
    a = jax.tree_util.tree_leaves(results["dp1"][1])
    b = jax.tree_util.tree_leaves(results["fsdp"][1])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-2, atol=1e-3)


def test_ssl_scheduled_wd_is_applied():
    """A huge scheduled weight decay must shrink decayed params; wd=0 must not
    (regression: round-1 computed the schedule but dropped it as wd_unused)."""
    from adaptersis_tpu.models.vit import DinoVisionTransformer

    rng = np.random.default_rng(4)
    g = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(8, 4)) > 0.5)

    def run_lr(wd):
        bb = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                                   depth=2, num_heads=2)
        cfg = SSLConfig(dino_out_dim=64, ibot_out_dim=64, n_local_crops=2)
        arch = SSLMetaArch(bb, cfg)
        schedules = {k: np.full(4, v) for k, v in
                     [("lr", 1e-3), ("wd", wd), ("momentum", 1.0),
                      ("teacher_temp", 0.04), ("last_layer_lr", 1e-3)]}
        state = arch.init_state(jax.random.PRNGKey(0), 28, 28)
        state, _ = arch.train_step(state, g, l, masks, schedules, 0)
        return jax.device_get(state["student"]["backbone"])

    p0 = run_lr(0.0)
    p1 = run_lr(100.0)
    w0 = p0["blocks_0"]["attn"]["qkv"]["kernel"]
    w1 = p1["blocks_0"]["attn"]["qkv"]["kernel"]
    # wd=100 with lr=1e-3 multiplies decayed weights by ~(1 − 0.1·lr_mult) more
    assert not np.allclose(w0, w1)
    assert np.abs(w1).mean() < np.abs(w0).mean()
    # bias is wd-masked: identical under both runs
    b0 = p0["blocks_0"]["attn"]["qkv"]["bias"]
    b1 = p1["blocks_0"]["attn"]["qkv"]["bias"]
    np.testing.assert_allclose(b0, b1, rtol=1e-6, atol=1e-8)


def test_ibot_masked_form_matches_full_form():
    """The gathered (MaskInfo) iBOT loss and masked-only center update must
    equal the full-tensor forms exactly (same math, different layout) —
    reference forward_masked == forward, ibot_patch_loss.py:91-126."""
    from adaptersis_tpu.ssl import (ibot_patch_loss_masked, update_center_masked)

    rng = np.random.default_rng(3)
    B, N, K = 6, 16, 32
    s = rng.standard_normal((B, N, K)).astype(np.float32)
    t = rng.standard_normal((B, N, K)).astype(np.float32)
    masks = rng.uniform(size=(B, N)) > 0.7
    masks[0] = False  # one unmasked crop — must contribute zero
    full = float(ibot_patch_loss(jnp.asarray(s), jnp.asarray(t),
                                 jnp.asarray(masks)))

    flat_idx = np.nonzero(masks.reshape(-1))[0].astype(np.int32)
    U = flat_idx.shape[0] + 5  # padded budget
    idx = np.zeros(U, np.int32)
    w = np.zeros(U, np.float32)
    idx[:flat_idx.shape[0]] = flat_idx
    per_sample = masks.sum(1).clip(min=1).astype(np.float32)
    w[:flat_idx.shape[0]] = (1.0 / per_sample)[flat_idx // N]
    sg = jnp.take(jnp.asarray(s).reshape(-1, K), jnp.asarray(idx), axis=0)
    tg = jnp.take(jnp.asarray(t).reshape(-1, K), jnp.asarray(idx), axis=0)
    got = float(ibot_patch_loss_masked(sg, tg, jnp.asarray(w), B))
    assert abs(got - full) < 1e-5

    # masked-only center: mean over masked rows == weighted full-tensor mean
    center = rng.standard_normal((1, K)).astype(np.float32)
    new = np.asarray(update_center_masked(
        jnp.asarray(center), tg, jnp.asarray(w),
        jnp.asarray(np.int32(flat_idx.shape[0]))))
    want = center * 0.9 + t.reshape(-1, K)[flat_idx].mean(0, keepdims=True) * 0.1
    np.testing.assert_allclose(new, want, rtol=1e-5, atol=1e-6)


def test_meta_arch_gathered_masks_match_full_path():
    """train_step with MaskInfo (gathered iBOT heads) must match the legacy
    bool-mask path: same losses, same ibot_center, same updated params."""
    from adaptersis_tpu.models.vit import DinoVisionTransformer
    from adaptersis_tpu.ssl import MaskInfo

    bb = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32, depth=2,
                               num_heads=2)
    cfg = SSLConfig(dino_out_dim=64, ibot_out_dim=64, n_local_crops=2,
                    koleo_loss_weight=0.1)
    rng = np.random.default_rng(5)
    g = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((8, 28, 28, 3)), jnp.float32)
    masks_np = rng.uniform(size=(8, 4)) > 0.5
    schedules = {k: np.full(10, v) for k, v in
                 [("lr", 1e-3), ("wd", 0.04), ("momentum", 0.9),
                  ("teacher_temp", 0.04), ("last_layer_lr", 1e-3)]}

    def run(masks):
        arch = SSLMetaArch(bb, cfg)
        state = arch.init_state(jax.random.PRNGKey(0), 28, 28)
        state, metrics = arch.train_step(state, g, l, masks, schedules, 0)
        return state, metrics

    state_a, m_a = run(jnp.asarray(masks_np))

    N = 4
    flat_idx = np.nonzero(masks_np.reshape(-1))[0].astype(np.int32)
    U = flat_idx.shape[0] + 3
    idx = np.zeros(U, np.int32)
    w = np.zeros(U, np.float32)
    idx[:flat_idx.shape[0]] = flat_idx
    per_sample = masks_np.sum(1).clip(min=1).astype(np.float32)
    w[:flat_idx.shape[0]] = (1.0 / per_sample)[flat_idx // N]
    info = MaskInfo(masks=jnp.asarray(masks_np), indices=jnp.asarray(idx),
                    weights=jnp.asarray(w),
                    n_masked=jnp.asarray(np.int32(flat_idx.shape[0])))
    state_b, m_b = run(info)

    assert abs(float(m_a["ibot"]) - float(m_b["ibot"])) < 1e-5
    assert abs(float(m_a["total_loss"]) - float(m_b["total_loss"])) < 1e-5
    np.testing.assert_allclose(np.asarray(state_a["ibot_center"]),
                               np.asarray(state_b["ibot_center"]),
                               rtol=1e-5, atol=1e-7)
    # NOTE: updated params are NOT compared — the two layouts run the head as
    # (B·N, E) vs (U, E) matmuls whose ~1e-7 fp tiling differences Adam
    # sign-amplifies on near-zero-grad leaves. Gradient equality is asserted
    # exactly in test_ibot_gathered_gradients_match_full below.


def test_ibot_gathered_gradients_match_full():
    """d(loss)/d(head params) must agree between the full-tensor and gathered
    iBOT forms on IDENTICAL per-token math (no Adam in the loop)."""
    from adaptersis_tpu.ssl import ibot_patch_loss_masked

    rng = np.random.default_rng(11)
    B, N, E, K = 4, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((B, N, E)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, N, K)), jnp.float32)
    wmat = jnp.asarray(rng.standard_normal((E, K)) * 0.1, jnp.float32)
    masks = rng.uniform(size=(B, N)) > 0.6
    masks[0] = False
    flat_idx = np.nonzero(masks.reshape(-1))[0].astype(np.int32)
    U = flat_idx.shape[0] + 4
    idx = np.zeros(U, np.int32)
    w = np.zeros(U, np.float32)
    idx[:flat_idx.shape[0]] = flat_idx
    per_sample = masks.sum(1).clip(min=1).astype(np.float32)
    w[:flat_idx.shape[0]] = (1.0 / per_sample)[flat_idx // N]

    def loss_full(wm):
        s = x @ wm
        return ibot_patch_loss(s.reshape(B, N, K), t, jnp.asarray(masks))

    def loss_gather(wm):
        xg = jnp.take(x.reshape(-1, E), jnp.asarray(idx), axis=0)
        tg = jnp.take(t.reshape(-1, K), jnp.asarray(idx), axis=0)
        return ibot_patch_loss_masked(xg @ wm, tg, jnp.asarray(w), B)

    gf = jax.grad(loss_full)(wmat)
    gg = jax.grad(loss_gather)(wmat)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gg),
                               rtol=1e-5, atol=1e-7)


def test_collate_masks_with_indices_static_budget():
    from adaptersis_tpu.ssl import collate_masks_with_indices, mask_upperbound

    gen = MaskingGenerator((8, 8), num_masking_patches=32)
    ub = mask_upperbound(6, 64)
    for seed in (0, 1, 2):
        info = collate_masks_with_indices(6, 64, gen, seed=seed)
        assert info.indices.shape == (ub,)          # static across steps
        assert info.weights.shape == (ub,)
        n = int(info.n_masked)
        assert (info.weights[:n] > 0).all() and (info.weights[n:] == 0).all()
        # indices/weights agree with the bool mask
        flat = info.masks.reshape(-1)
        np.testing.assert_array_equal(np.nonzero(flat)[0], info.indices[:n])
        per = info.masks.sum(1).clip(min=1)
        np.testing.assert_allclose(
            info.weights[:n], (1.0 / per)[info.indices[:n] // 64], rtol=1e-6)


def test_ibot_masked_loss_matches_torch_reference_formula():
    """Independent torch oracle of the reference iBOTPatchLoss.forward_masked
    pipeline (ibot_patch_loss.py:105-126 + the meta-arch's
    ×loss_scales×ibot_loss_scale = ×1 net, ssl_meta_arch.py:154,323-335):
        loss = Σ_masked (1/n_masked(sample)) · −⟨t, log_softmax(s/τ)⟩ / B2."""
    rng = np.random.default_rng(21)
    B, N, K = 6, 12, 24
    temp = 0.1
    s_full = rng.standard_normal((B, N, K)).astype(np.float32)
    t_full = np.abs(rng.standard_normal((B, N, K))).astype(np.float32)
    t_full /= t_full.sum(-1, keepdims=True)
    masks = rng.uniform(size=(B, N)) > 0.6
    masks[1] = False

    # ---- torch side: index_select the masked rows, weight, divide by B ----
    ms = torch.from_numpy(masks)
    idx_t = ms.flatten().nonzero().flatten()
    s_m = torch.index_select(torch.from_numpy(s_full).flatten(0, 1), 0, idx_t)
    t_m = torch.index_select(torch.from_numpy(t_full).flatten(0, 1), 0, idx_t)
    per = -(t_m * F.log_softmax(s_m / temp, dim=-1)).sum(-1)
    mw = (1 / ms.sum(-1).clamp(min=1.0)).unsqueeze(-1).expand_as(ms)[ms]
    want = (per * mw).sum().item() / B

    # ---- ours, padded static budget ----
    from adaptersis_tpu.ssl import ibot_patch_loss_masked

    idx = np.zeros(idx_t.shape[0] + 6, np.int32)
    w = np.zeros(idx_t.shape[0] + 6, np.float32)
    idx[:idx_t.shape[0]] = idx_t.numpy()
    per_sample = masks.sum(1).clip(min=1).astype(np.float32)
    w[:idx_t.shape[0]] = (1.0 / per_sample)[idx[:idx_t.shape[0]] // N]
    sg = jnp.take(jnp.asarray(s_full).reshape(-1, K), jnp.asarray(idx), axis=0)
    tg = jnp.take(jnp.asarray(t_full).reshape(-1, K), jnp.asarray(idx), axis=0)
    got = float(ibot_patch_loss_masked(sg, tg, jnp.asarray(w), B, temp))
    assert abs(got - want) < 1e-5

    # the full-tensor form must agree too (reference `forward` ≡ forward_masked)
    got_full = float(ibot_patch_loss(jnp.asarray(s_full), jnp.asarray(t_full),
                                     jnp.asarray(masks), temp))
    assert abs(got_full - want) < 1e-5
