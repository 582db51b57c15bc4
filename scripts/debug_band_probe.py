"""Debug: band-probe margin fidelity vs the full march's own sampled min
vs the TRUE ray minimum (dense sampling). Replicates the test_proxy
fixture scene."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.analytic import sphere_sdf
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.models.pretrain import fit_decoder_to_sdf
from dist_renderer_tpu.models.proxy import default_proxy_cfg, distill_proxy
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

IMG = 32
dcfg = DecoderConfig(latent_size=8, hidden_dims=(48,) * 4, latent_in=(2,))
params, z0 = fit_decoder_to_sdf(
    lambda p: sphere_sdf(0.5)(None, p), dcfg, steps=400, batch=2048)
pcfg = default_proxy_cfg(dcfg, width=32, depth=3)
proxy, pcfg = distill_proxy(params, dcfg, z0[None], proxy_cfg=pcfg,
                            steps=1500, batch=2048, lr=2e-3)

cam = Camera.looking_at((0.0, 0.0, -2.0), focal=40.0, img_hw=(IMG, IMG))
o, v = pixel_rays(cam, IMG, IMG)
F = 2
lat = jnp.stack([z0, z0])
ob = jnp.broadcast_to(o[None], (F,) + o.shape)
vb = jnp.broadcast_to(v[None], (F,) + v.shape)
march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                    coarse_to_fine=True)
kw = dict(img_hw=(IMG, IMG), march=march, strides=(4,), shared_origin=True,
          interpret=True)
d_full, hit_full, ms_full = render_batched_c2f(
    params, dcfg, lat, ob, vb, **kw)[:3]
d_prox, hit_prox, ms_prox = render_batched_c2f(
    params, dcfg, lat, ob, vb, proxy=(proxy, pcfg), **kw)[:3]

# true per-ray min over dense samples (full decoder, fp32)
ts = jnp.linspace(0.8, 3.2, 2401)          # step 1e-3
def ray_min(oo, vv):
    pts = oo[None] + ts[:, None] * vv[None]
    return jnp.min(decoder_apply(params, z0, pts, dcfg))
true_min = jax.lax.map(lambda i: ray_min(o[i], v[i]),
                       jnp.arange(o.shape[0]))
true_min = np.asarray(true_min)

hf, hp = np.asarray(hit_full), np.asarray(hit_prox)
msf, msp = np.asarray(ms_full), np.asarray(ms_prox)
mboth = ~hf & ~hp
near = msf < MarchConfig().proxy_band
sel = (mboth & near)[0]
tm = true_min
print(f"band rays: {sel.sum()}")
err_march = np.abs(msf[0][sel] - tm[sel])
err_probe = np.abs(msp[0][sel] - tm[sel])
dd = np.abs(msp[0] - msf[0])[sel]
print(f"march-vs-true : p50 {np.median(err_march):.2e} p95 "
      f"{np.percentile(err_march, 95):.2e} max {err_march.max():.2e}")
print(f"probe-vs-true : p50 {np.median(err_probe):.2e} p95 "
      f"{np.percentile(err_probe, 95):.2e} max {err_probe.max():.2e}")
print(f"probe-vs-march: p50 {np.median(dd):.2e} p95 "
      f"{np.percentile(dd, 95):.2e} max {dd.max():.2e}")
k = np.argsort(-dd)[:8]
idx = np.nonzero(sel)[0][k]
for i, j in zip(k, idx):
    print(f"  ray {j}: march {msf[0][sel][i]:+.4f} probe "
          f"{msp[0][sel][i]:+.4f} true {tm[sel][i]:+.4f}")
