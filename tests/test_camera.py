"""Camera/geometry unit tests (SURVEY.md §7 step 2: 'unit-tested against
analytic geometry')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.ops.camera import (
    Camera,
    camera_from_pose,
    matrix_to_rot6d,
    pixel_rays,
    pose_from_camera,
    project,
    ray_sphere_entry,
    rot6d_to_matrix,
    so3_exp,
    so3_log,
)


def test_looking_at_geometry():
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=100.0, img_hw=(64, 64))
    # camera center recovered
    np.testing.assert_allclose(
        np.asarray(cam.center), [0.0, 0.0, -2.0], atol=1e-6
    )
    # R is a rotation
    RtR = np.asarray(cam.R @ cam.R.T)
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-6)
    assert np.linalg.det(np.asarray(cam.R)) > 0.99


def test_center_pixel_ray_points_at_target():
    cam = Camera.looking_at((1.0, 1.0, -2.0), target=(0.0, 0.0, 0.0),
                            focal=100.0, img_hw=(65, 65))
    o, v = pixel_rays(cam, 65, 65)
    center = v.reshape(65, 65, 3)[32, 32]
    expected = -np.asarray(cam.center)
    expected = expected / np.linalg.norm(expected)
    np.testing.assert_allclose(np.asarray(center), expected, atol=1e-5)


def test_rays_unit_norm():
    cam = Camera.looking_at((0.0, 0.5, -1.5), focal=40.0, img_hw=(16, 16))
    _, v = pixel_rays(cam, 16, 16)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(v, axis=-1)), 1.0, atol=1e-6
    )


def test_ray_sphere_entry_cases():
    o = jnp.array([[0.0, 0.0, -2.0], [0.0, 5.0, -2.0], [0.0, 0.0, 0.0]])
    v = jnp.array([[0.0, 0.0, 1.0]] * 3)
    t_near, t_far, hit = ray_sphere_entry(o, v, 1.0)
    assert bool(hit[0]) and not bool(hit[1]) and bool(hit[2])
    np.testing.assert_allclose(float(t_near[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(t_far[0]), 3.0, atol=1e-6)
    # origin inside the sphere: near clamps to 0
    np.testing.assert_allclose(float(t_near[2]), 0.0, atol=1e-6)


def test_so3_roundtrip():
    for w in ([0.3, -0.2, 0.5], [1e-8, 0, 0], [0, 2.0, 0]):
        w = jnp.asarray(w, jnp.float32)
        R = so3_exp(w)
        np.testing.assert_allclose(
            np.asarray(R @ R.T), np.eye(3), atol=1e-5
        )
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_rot6d_roundtrip():
    w = jnp.array([0.4, -0.1, 0.7])
    R = so3_exp(w)
    r6 = matrix_to_rot6d(R)
    R2 = rot6d_to_matrix(r6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


@pytest.mark.parametrize("param", ["so3", "rot6d"])
def test_pose_roundtrip(param):
    cam = Camera.looking_at((0.5, -0.3, -1.8), focal=50.0, img_hw=(32, 32))
    pose = pose_from_camera(cam, param)
    cam2 = camera_from_pose(pose, cam.K, param)
    np.testing.assert_allclose(np.asarray(cam2.R), np.asarray(cam.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam2.T), np.asarray(cam.T), atol=1e-5)


def test_project_unproject_consistency():
    """Points on pixel rays project back to their pixels."""
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=60.0, img_hw=(32, 32))
    o, v = pixel_rays(cam, 32, 32)
    pts = o + 1.7 * v
    uv, z = project(cam, pts)
    ys, xs = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    np.testing.assert_allclose(np.asarray(uv[:, 0]), xs.reshape(-1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[:, 1]), ys.reshape(-1), atol=1e-3)
    assert (np.asarray(z) > 0).all()
