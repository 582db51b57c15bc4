"""Mesh preprocessing pipeline (SURVEY.md §2 'Preprocessing tools'):
OBJ IO, BVH raycaster (native vs numpy), mesh depth vs sphere-traced
depth, and the full preprocess -> loader -> normalized-frame consistency
round trip the reference's ShapeNet preprocessing provides."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from dist_renderer_tpu.eval.mesh import extract_mesh, save_obj
from dist_renderer_tpu.eval.raycast import (
    deepsdf_normalization, load_obj, raycast_depth_numpy, render_mesh_depth,
)
from dist_renderer_tpu.models.analytic import sphere_sdf
from dist_renderer_tpu.ops.camera import Camera, pixel_rays


@pytest.fixture(scope="module")
def sphere_mesh():
    sdf = sphere_sdf(0.6)
    verts, faces = extract_mesh(lambda p: sdf(None, p), resolution=48)
    assert len(faces) > 100
    return verts, faces


def test_obj_roundtrip(tmp_path, sphere_mesh):
    verts, faces = sphere_mesh
    path = os.path.join(tmp_path, "m.obj")
    save_obj(path, verts, faces)
    v2, f2 = load_obj(path)
    assert v2.shape == verts.shape and f2.shape == faces.shape
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_native_raycaster_matches_numpy(sphere_mesh):
    from dist_renderer_tpu.eval.native import raycast_depth_native

    verts, faces = sphere_mesh
    rng = np.random.RandomState(0)
    origins = rng.randn(200, 3).astype(np.float32) * 0.2
    origins[:, 2] -= 2.0
    dirs = -origins + rng.randn(200, 3).astype(np.float32) * 0.1
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    ref = raycast_depth_numpy(verts, faces, origins, dirs)
    nat = raycast_depth_native(verts, faces, origins, dirs)
    if nat is None:
        pytest.skip("native library unavailable")
    hit_r, hit_n = np.isfinite(ref), np.isfinite(nat)
    np.testing.assert_array_equal(hit_r, hit_n)
    np.testing.assert_allclose(nat[hit_n], ref[hit_r], atol=1e-4)
    assert hit_r.sum() > 50


def test_mesh_depth_matches_analytic(sphere_mesh):
    """Raycast depth of the extracted sphere mesh == analytic ray-sphere
    distance, to grid-cell tolerance (the mesh is a 48^3 MT approximation)."""
    verts, faces = sphere_mesh
    img = 32
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=img * 1.2,
                            img_hw=(img, img))
    depth, mask = render_mesh_depth(verts, faces, cam, (img, img))
    o, v = pixel_rays(cam, img, img)
    o, v = np.asarray(o), np.asarray(v)
    # analytic: |o + t v| = 0.6
    b = np.sum(o * v, axis=1)
    c = np.sum(o * o, axis=1) - 0.36
    disc = b * b - c
    hit_a = (disc > 0).reshape(img, img)
    t_a = np.where(disc > 0, -b - np.sqrt(np.maximum(disc, 0)), 0.0)
    interior = hit_a & mask  # rim pixels may flip either way
    assert interior.sum() > 50
    err = np.abs(depth - t_a.reshape(img, img))[interior]
    cell = 2.0 / 47
    assert np.percentile(err, 95) < cell, np.percentile(err, 95)
    # masks agree except near the silhouette
    assert (mask != hit_a).mean() < 0.05


def test_preprocess_loader_roundtrip(tmp_path, sphere_mesh):
    """Full tool path: UNNORMALIZED mesh -> preprocess (depth renders +
    normalization.npz) -> ShapeNetDepthDataset -> observation lands in the
    DeepSDF-normalized frame the tracer uses."""
    from dist_renderer_tpu.data.datasets import ShapeNetDepthDataset
    from dist_renderer_tpu.tasks.preprocess_shapenet import preprocess_mesh

    verts, faces = sphere_mesh
    # put the mesh in an arbitrary original frame
    verts_raw = verts * 3.1 + np.array([0.5, -0.25, 0.8], np.float32)
    obj = os.path.join(tmp_path, "meshes", "chair0.obj")
    save_obj(obj, verts_raw, faces)

    out_root = os.path.join(tmp_path, "data")
    s = preprocess_mesh(obj, out_root, views=2, img=24,
                        write_multiview=True)
    assert len(s["instances"]) == 2

    ds = ShapeNetDepthDataset(os.path.join(out_root, "depth"))
    assert len(ds) == 2
    obs = ds[0]
    assert obs.depth.shape == (24, 24)
    assert obs.mask.sum() > 20

    # consistency: the loader's normalized depth must equal raycasting the
    # NORMALIZED mesh with the loader's transformed camera
    offset, scale = deepsdf_normalization(verts_raw)
    verts_n = (verts_raw - offset) * scale
    d_n, m_n = render_mesh_depth(verts_n, faces, obs.camera, (24, 24))
    both = m_n & obs.valid
    assert both.sum() > 20
    np.testing.assert_allclose(
        obs.depth[both], d_n[both], rtol=1e-4, atol=1e-5
    )
    # normalized mesh must live inside the DeepSDF unit sphere
    assert np.linalg.norm(verts_n, axis=1).max() <= 1.0 / 1.02

    # multiview layout loads too
    from dist_renderer_tpu.data.datasets import PMOMultiViewDataset

    mv = PMOMultiViewDataset(os.path.join(out_root, "multiview"))
    m_obs = mv[0]
    assert m_obs.images.shape == (2, 24, 24, 3)
    assert m_obs.masks[0].sum() > 20


def test_mesh_dataset_drives_multiview_fit(tmp_path, sphere_mesh):
    """End-to-end: mesh -> jittered-camera multiview dataset (non-ring
    rig) -> the REAL PMO loader -> a few silhouette-fitting steps reduce
    the loss. This is the reference's config #3 pipeline from raw geometry
    with no synthetic-render fallback anywhere."""
    import jax
    import jax.numpy as jnp

    from dist_renderer_tpu.config import (
        DecoderConfig, GradConfig, MarchConfig, RenderConfig,
    )
    from dist_renderer_tpu.data.datasets import PMOMultiViewDataset
    from dist_renderer_tpu.eval.raycast import deepsdf_normalization
    from dist_renderer_tpu.models.analytic import latent_sphere_sdf
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.renderer import render_rays
    from dist_renderer_tpu.tasks.preprocess_shapenet import preprocess_mesh
    from dist_renderer_tpu.utils.losses import silhouette_loss

    verts, faces = sphere_mesh
    obj = os.path.join(tmp_path, "m", "shape.obj")
    save_obj(obj, verts, faces)
    out_root = os.path.join(tmp_path, "data")
    preprocess_mesh(obj, out_root, views=3, img=20, write_depth=False,
                    camera_jitter=0.3)

    ds = PMOMultiViewDataset(os.path.join(out_root, "multiview"))
    obs = ds[0]
    assert obs.images.shape[0] == 3
    # jittered rig: views must NOT be an exact ring (distinct distances)
    centers = np.stack([np.asarray(c.center) for c in obs.cameras])
    dists = np.linalg.norm(centers, axis=1)
    assert np.ptp(dists) > 1e-3

    # normalize cameras into the decoder frame (what a consumer does with
    # the recorded normalization params)
    offset, scale = deepsdf_normalization(verts)
    cams_n = [
        Camera(K=c.K, R=c.R,
               T=(c.T + c.R @ jnp.asarray(offset)) * scale)
        for c in obs.cameras
    ]

    # fit a latent sphere's radius from the silhouettes alone. In the
    # DECODER frame the unit-sphere normalization maps the mesh to radius
    # 1/1.03 ~= 0.971 regardless of its original size — that is the truth
    # the masks encode.
    sdf = latent_sphere_sdf()
    cfg = RenderConfig(img_h=20, img_w=20, march=MarchConfig(max_steps=32),
                       grad=GradConfig(mode="ift"))

    def loss(z):
        total = 0.0
        for cam, m in zip(cams_n, obs.masks):
            o, v = pixel_rays(cam, 20, 20)
            out = render_rays(sdf, z, o, v, cfg)
            # positive margin: without it the outside term only fires
            # after penetration and the radius overshoots before turning
            total = total + silhouette_loss(
                out.min_sdf, jnp.asarray(m.reshape(-1)), margin=0.02)
        return total / len(cams_n)

    import optax

    z = jnp.array([0.3])
    tx = optax.adam(2e-2)
    st = tx.init(z)
    l0 = float(loss(z))
    step = jax.jit(lambda z, st: (lambda g: (
        optax.apply_updates(z, tx.update(g, st, z)[0]),
        tx.update(g, st, z)[1]))(jax.grad(loss)(z)))
    for _ in range(80):
        z, st = step(z, st)
    l1 = float(loss(z))
    assert l1 < 0.5 * l0, (l0, l1)
    # The normalized mesh fills the unit sphere (radius 0.971), so many
    # silhouette-adjacent rays never ENTER the march's bounding sphere.
    # Since round 3 their margin VALUE is the geometric sphere distance
    # (the reference marks such rays immediate background — SURVEY.md
    # §3.1) with the decoder pull-back kept in the GRADIENT only; the
    # hinge equilibrium of this bounding-sphere-filling scene therefore
    # sits slightly high (~1.08). The test's purpose is the dataset
    # plumbing (mesh -> preprocess -> loader -> fit), not the margin
    # semantics of never-sampled rays.
    assert abs(float(z[0]) - 1.0 / 1.03) < 0.15, float(z[0])
