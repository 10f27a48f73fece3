"""Grasp proposal: clustering, pose math, and relevancy selection."""

import numpy as np
import jax.numpy as jnp

from gaussiangrasper_tpu.scripts.grasp import (
    gaussian_relevancy,
    largest_cluster,
    propose_grasp,
)


def test_largest_cluster_separates_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.01, (200, 3))            # big blob at origin
    b = rng.normal(0, 0.01, (50, 3)) + 1.0       # small blob far away
    pts = np.concatenate([a, b])
    mask = largest_cluster(pts, voxel=0.05)
    assert mask[:200].all()
    assert not mask[200:].any()


def test_propose_grasp_on_flat_patch():
    rng = np.random.default_rng(1)
    # a thin patch in the xy plane, normals +z, elongated along x
    pts = np.stack(
        [rng.uniform(-0.1, 0.1, 400), rng.uniform(-0.02, 0.02, 400),
         rng.normal(0, 0.002, 400)], -1,
    )
    normals = np.tile([0.0, 0.0, 1.0], (400, 1))
    opac = np.ones(400)
    g = propose_grasp(pts, normals, opac)
    np.testing.assert_allclose(g["position"], [0, 0, 0], atol=0.02)
    np.testing.assert_allclose(g["approach"], [0, 0, -1.0], atol=1e-5)
    # closing axis along the long direction (x), width ≈ 0.18
    assert abs(g["axis"][0]) > 0.99
    assert 0.1 < g["width"] < 0.25


def test_relevancy_selects_matching_gaussians():
    from gaussiangrasper_tpu.models.efd import init_mlp, mlp_apply
    import jax

    params = init_mlp(jax.random.PRNGKey(0), 8, 512, (16,))
    feats = jnp.concatenate([jnp.ones((10, 8)), -jnp.ones((10, 8))])
    # query = the lifted embedding of the first group -> they must win
    q = mlp_apply(params, jnp.ones((1, 8)))[0]
    canon = jnp.zeros((1, 512))
    rel = np.asarray(gaussian_relevancy(params, feats, q, canon))
    assert rel[:10].min() > rel[10:].max()
