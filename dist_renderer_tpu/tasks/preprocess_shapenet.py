"""Preprocessing tool: render depth-completion / multi-view datasets from
MESHES (the reference's real preprocessing path).

Reference analog: the reference ships scripts that arrange ShapeNet depth
renders + DeepSDF normalization params for the depth-completion task
(SURVEY.md §2 'Preprocessing tools' — produced there by external
renderers). This tool is self-contained: it raycasts each mesh with the
C++ BVH renderer (native/mesh_kernels.cpp; numpy fallback), computes
DeepSDF-style unit-sphere normalization params, and writes BOTH on-disk
layouts that data/datasets.py reads:

  depth-completion:  <out>/depth/<mesh>_v<k>/{depth.npy, mask.npy,
                     camera.json, normalization.npz}
  multi-view (PMO):  <out>/multiview/<mesh>/{view*.png, mask*.png,
                     cameras.json}   (normal-shaded renders)

Cameras are written in the ORIGINAL mesh frame with per-instance
normalization params — exercising the loaders' normalization transform
exactly as published DeepSDF assets would.

  python -m dist_renderer_tpu.tasks.preprocess_shapenet \\
      --meshes path/with/objs --out data/shapenet --views 6 --img 256
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from dist_renderer_tpu.eval.raycast import (
    deepsdf_normalization, load_obj, render_mesh_depth,
)
from dist_renderer_tpu.ops.camera import Camera


def _cam_json(cam: Camera) -> dict:
    return {
        "K": np.asarray(cam.K).tolist(),
        "R": np.asarray(cam.R).tolist(),
        "T": np.asarray(cam.T).tolist(),
    }


def ring_cameras_around(
    center: np.ndarray, radius: float, img: int, n_views: int,
    elevation: float = 0.35, jitter: float = 0.0, seed: int = 0,
) -> list:
    """Ring of cameras around an arbitrary center (original mesh frame).

    jitter > 0 perturbs each viewpoint's azimuth/elevation/radius (a
    fraction of their nominal values) — real capture rigs are not perfect
    rings, and downstream consumers must not assume one."""
    rng = np.random.RandomState(seed)
    cams = []
    for k in range(n_views):
        az = 2.0 * np.pi * k / max(n_views, 1)
        el, r = elevation, radius
        if jitter > 0.0:
            az += jitter * rng.uniform(-np.pi, np.pi) / max(n_views, 1)
            el += jitter * rng.uniform(-0.5, 0.5)
            r *= 1.0 + jitter * rng.uniform(-0.2, 0.2)
        eye = center + r * np.array(
            [np.cos(az) * np.cos(el), np.sin(el), np.sin(az) * np.cos(el)],
            np.float32,
        )
        cams.append(Camera.looking_at(
            tuple(eye), tuple(center), focal=img * 1.2, img_hw=(img, img)
        ))
    return cams


def preprocess_mesh(
    obj_path: str, out_root: str, views: int, img: int,
    write_depth: bool = True, write_multiview: bool = True,
    use_native: bool = True, camera_jitter: float = 0.0,
) -> dict:
    """One mesh -> dataset instances. Returns a summary dict."""
    name = os.path.splitext(os.path.basename(obj_path))[0]
    verts, faces = load_obj(obj_path)
    if len(faces) == 0:
        raise ValueError(f"{obj_path}: no faces")
    offset, scale = deepsdf_normalization(verts)
    # camera ring in the ORIGINAL frame, sized to see the whole object
    radius = 2.5 / scale
    import zlib

    # stable per-mesh seed (Python's str hash is salted per process)
    cams = ring_cameras_around(offset, radius, img, views,
                               jitter=camera_jitter,
                               seed=zlib.crc32(name.encode()) & 0x7FFFFFFF)

    summary = {"name": name, "views": views, "instances": []}
    if write_depth:
        for k, cam in enumerate(cams):
            depth, mask = render_mesh_depth(
                verts, faces, cam, (img, img), use_native
            )
            inst = f"{name}_v{k:02d}"
            d = os.path.join(out_root, "depth", inst)
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, "depth.npy"), depth)
            np.save(os.path.join(d, "mask.npy"), mask)
            with open(os.path.join(d, "camera.json"), "w") as f:
                json.dump(_cam_json(cam), f)
            np.savez(os.path.join(d, "normalization.npz"),
                     offset=offset, scale=np.float32(scale))
            summary["instances"].append(inst)

    if write_multiview:
        from PIL import Image

        from dist_renderer_tpu.eval.raycast import raycast_depth
        from dist_renderer_tpu.ops.camera import pixel_rays

        m_dir = os.path.join(out_root, "multiview", name)
        os.makedirs(m_dir, exist_ok=True)
        cams_json = []
        # face normals for shaded renders
        fa = verts[faces[:, 0]]
        fn = np.cross(verts[faces[:, 1]] - fa, verts[faces[:, 2]] - fa)
        fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
        for k, cam in enumerate(cams):
            o, v = pixel_rays(cam, img, img)
            o, v = np.asarray(o), np.asarray(v)
            t = raycast_depth(verts, faces, o, v, use_native)
            mask = np.isfinite(t).reshape(img, img)
            # headlight shading from depth slope: a cheap Lambertian-like
            # stand-in texture (matches the synthetic generator's role)
            d_img = np.where(np.isfinite(t), t, 0.0).reshape(img, img)
            gy, gx = np.gradient(d_img)
            shade = 1.0 / np.sqrt(1.0 + 25.0 * (gx ** 2 + gy ** 2))
            rgb = (np.stack([shade] * 3, axis=-1) * mask[..., None] * 255)
            Image.fromarray(rgb.astype(np.uint8)).save(
                os.path.join(m_dir, f"view{k:02d}.png"))
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                os.path.join(m_dir, f"mask{k:02d}.png"))
            cams_json.append(_cam_json(cam))
        with open(os.path.join(m_dir, "cameras.json"), "w") as f:
            json.dump(cams_json, f)
        # multiview consumers read normalization from the depth layout or
        # work in the original frame; record it here too for completeness
        np.savez(os.path.join(m_dir, "normalization.npz"),
                 offset=offset, scale=np.float32(scale))
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--meshes", required=True,
                    help="directory of .obj meshes (or a single .obj)")
    ap.add_argument("--out", default="data/shapenet")
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--no-depth", action="store_true")
    ap.add_argument("--no-multiview", action="store_true")
    ap.add_argument("--no-native", action="store_true",
                    help="force the numpy raycaster")
    ap.add_argument("--camera-jitter", type=float, default=0.0,
                    help="perturb the camera ring (0.3 = realistic rig)")
    args = ap.parse_args(argv)

    if os.path.isfile(args.meshes):
        objs = [args.meshes]
    else:
        objs = sorted(
            os.path.join(args.meshes, f)
            for f in os.listdir(args.meshes) if f.endswith(".obj")
        )
    if not objs:
        raise SystemExit(f"no .obj meshes under {args.meshes}")
    for p in objs:
        s = preprocess_mesh(
            p, args.out, args.views, args.img,
            write_depth=not args.no_depth,
            write_multiview=not args.no_multiview,
            use_native=not args.no_native,
            camera_jitter=args.camera_jitter,
        )
        print(f"{s['name']}: {len(s['instances'])} depth instances"
              + ("" if args.no_multiview else f" + {args.views} views"))
    print(f"done: {len(objs)} meshes -> {args.out}")


if __name__ == "__main__":
    main()
