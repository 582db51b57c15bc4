"""DeepSDF architecture variants the specs.json reader can produce:
xyz_in_all, use_tanh, multiple latent_in skips — plain vs folded parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import decoder_apply, init_decoder_params
from dist_renderer_tpu.models.folded import fold_latent, folded_apply


VARIANTS = [
    DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,)),
    DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,),
                  use_tanh=True),
    DecoderConfig(latent_size=8, hidden_dims=(32,) * 6, latent_in=(2, 4)),
    DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(),
                  final_tanh=False),
    DecoderConfig(latent_size=8, hidden_dims=(32,) * 4, latent_in=(2,),
                  xyz_in_all=True),
]


@pytest.mark.parametrize("cfg", VARIANTS, ids=[
    "skip2", "use_tanh", "double_skip", "no_skip_no_tanh", "xyz_in_all",
])
def test_variant_forward_and_folded_parity(cfg):
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (cfg.latent_size,)) * 0.2
    pts = jax.random.normal(jax.random.PRNGKey(2), (33, 3)) * 0.4
    ref = decoder_apply(params, z, pts, cfg)
    assert ref.shape == (33,)
    assert np.isfinite(np.asarray(ref)).all()
    if cfg.final_tanh:
        assert np.abs(np.asarray(ref)).max() <= 1.0

    got = folded_apply(fold_latent(params, z, cfg), pts, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_variant_layer_dims_double_skip():
    cfg = DecoderConfig(latent_size=8, hidden_dims=(32,) * 6, latent_in=(2, 4))
    dims = cfg.layer_dims
    # layers feeding each skip shrink by input_dim (11)
    assert dims[1] == (32, 32 - 11)
    assert dims[3] == (32, 32 - 11)
    assert dims[2] == (32, 32)
