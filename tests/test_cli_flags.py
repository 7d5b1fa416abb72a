"""Regression tests: CLI flags that silently no-op'd in round 1 must act.

- --opts dotlist merges onto the YAML config (dinov2/utils/config.py:40-46)
- --mla_last_block_bug reaches AdapterSegmentor and changes the forward
  (train_mla.py:339-341 re-runs blocks[-2:-1] instead of the final block)
- masktrans input normalization (eval_dinov2_masktrans.py:144-154 + the :74-75
  /255-after-Normalize dataset quirk)
"""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _train_mod():
    """Load /root/repo/train.py by path — other tests put /root/reference on
    sys.path, where a same-named train.py lives."""
    if "repo_train" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "repo_train", "/root/repo/train.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["repo_train"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["repo_train"]


def _args(**kw):
    train_mod = _train_mod()

    parser = train_mod.get_args_parser()
    args = parser.parse_args([])
    for k, v in kw.items():
        setattr(args, k, v)
    return args


def test_opts_dotlist_overrides_arch(tmp_path):
    train_mod = _train_mod()

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("student:\n  arch: vit_base\n  patch_size: 14\n")
    # YAML wins over the CLI default
    a = _args(config_file=str(cfg))
    assert train_mod._arch_from_config(a) == ("vit_base", 14)
    # --opts dotlist wins over the YAML
    a = _args(config_file=str(cfg), opts=["student.arch=vit_large",
                                          "student.patch_size=16"])
    assert train_mod._arch_from_config(a) == ("vit_large", 16)
    # --opts works with no config file at all
    a = _args(opts=["student.arch=vit_small"])
    assert train_mod._arch_from_config(a)[0] == "vit_small"


def test_opts_rejects_malformed():
    train_mod = _train_mod()

    with pytest.raises(SystemExit):
        train_mod._merge_dotlist({}, ["no_equals_sign"])


def test_mla_last_block_bug_changes_forward():
    from adaptersis_tpu.models import AdapterSegmentor
    from adaptersis_tpu.models.vit import DinoVisionTransformer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 56, 56, 3)), jnp.float32)
    outs = {}
    for bug in (False, True):
        bb = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=64,
                                   depth=6, num_heads=4)
        model = AdapterSegmentor(backbone=bb, num_classes=2, n_last_blocks=4,
                                 decoder_type="mla", mla_last_block_bug=bug)
        params = model.init(jax.random.PRNGKey(0), x, train=False)
        outs[bug] = np.asarray(model.apply(params, x, train=False))
    assert not np.allclose(outs[False], outs[True]), \
        "mla_last_block_bug must change which block round 4 runs"


def test_imagenet_div255_input_norm_matches_torch_formula():
    from adaptersis_tpu.data.augment import (IMAGENET_MEAN, IMAGENET_STD,
                                             apply_input_norm)

    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
    x01 = jnp.asarray(u8, jnp.float32) / 255.0
    got = np.asarray(apply_input_norm(x01, "imagenet_div255"))
    # torch: Normalize(ToTensor(img)) / 255  (the dataset's extra /255, :74-75)
    want = ((u8.astype(np.float32) / 255.0
             - np.asarray(IMAGENET_MEAN, np.float32))
            / np.asarray(IMAGENET_STD, np.float32)) / 255.0
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # default mode is the identity
    np.testing.assert_allclose(np.asarray(apply_input_norm(x01, "none")),
                               np.asarray(x01))


def test_trainer_input_norm_changes_eval_inputs():
    """TrainerConfig.input_norm must reach the eval step (the round-1 gap: all
    variants fed /255 regardless of the masktrans transform)."""
    from adaptersis_tpu.data import SyntheticSeg
    from adaptersis_tpu.models import AdapterSegmentor
    from adaptersis_tpu.models.vit import DinoVisionTransformer
    from adaptersis_tpu.parallel.mesh import get_mesh
    from adaptersis_tpu.train import Trainer, TrainerConfig

    ds = SyntheticSeg(n=2, imsize=56, seed=0)
    imgs = np.stack([ds[i][0] for i in range(2)])
    masks = np.stack([ds[i][1] for i in range(2)])
    losses = {}
    for mode in ("none", "imagenet_div255"):
        bb = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=32,
                                   depth=2, num_heads=2)
        model = AdapterSegmentor(backbone=bb, num_classes=2, n_last_blocks=2)
        tr = Trainer(model, TrainerConfig(use_clahe=False, input_norm=mode),
                     mesh=get_mesh(devices=jax.devices()[:1]))
        state = tr.init_state((imgs, masks))
        out = tr.eval_step(state, imgs, masks, np.ones((2,), np.float32))
        losses[mode] = float(jax.tree_util.tree_leaves(out)[0])
    assert losses["none"] != losses["imagenet_div255"]
