"""On-device EDT vs scipy.ndimage.distance_transform_edt (the reference's CPU
dependency, segloss/hausdorff.py:36-38)."""

import numpy as np
from scipy.ndimage import distance_transform_edt

import jax.numpy as jnp

from adaptersis_tpu.ops.edt import edt, penalized_distance_map


def test_edt_matches_scipy():
    rng = np.random.default_rng(3)
    mask = rng.uniform(size=(3, 37, 23)) > 0.7
    want = np.stack([distance_transform_edt(m) for m in mask])
    got = np.asarray(edt(jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_edt_all_foreground_and_empty():
    ones = np.ones((1, 8, 8), bool)
    zeros = np.zeros((1, 8, 8), bool)
    # all-foreground: scipy returns large distances only bounded by image; our row
    # pass returns _BIG-capped values — just check empty-bg doesn't produce NaN.
    assert np.isfinite(np.asarray(edt(jnp.asarray(zeros)))).all()
    assert (np.asarray(edt(jnp.asarray(zeros))) == 0).all()
    assert np.isfinite(np.asarray(edt(jnp.asarray(ones)))).all()


def test_penalized_distance_map_matches_reference_math():
    rng = np.random.default_rng(4)
    gt = rng.uniform(size=(2, 19, 17)) > 0.6

    def ref(GT):
        res = np.zeros(GT.shape)
        for i in range(GT.shape[0]):
            posmask = GT[i]
            negmask = ~posmask
            pos_edt = distance_transform_edt(posmask)
            pos_edt = (np.max(pos_edt) - pos_edt) * posmask
            neg_edt = distance_transform_edt(negmask)
            neg_edt = (np.max(neg_edt) - neg_edt) * negmask
            res[i] = pos_edt / np.max(pos_edt) + neg_edt / np.max(neg_edt)
        return res

    want = ref(gt)
    got = np.asarray(penalized_distance_map(jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
