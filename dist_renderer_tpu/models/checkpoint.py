"""Checkpoint I/O: DeepSDF experiment dirs (PyTorch) -> JAX params, plus
orbax save/restore for our own optimization state.

Reference analog (SURVEY.md §2 "Decoder I/O", §5 "Checkpoint / resume"):
``core/utils/decoder_utils.py::load_decoder`` reads a DeepSDF experiment
directory — ``specs.json`` (architecture), ``ModelParameters/<epoch>.pth``
(weights), ``LatentCodes/<epoch>.pth`` (per-shape latents). We read the same
layout so published DeepSDF experiment dirs drop in unchanged.

Weight-norm folding: DeepSDF stores weight-norm'd linears as
(weight_g, weight_v) with w = g * v / ||v||_rows. The reference keeps the
reparameterization at inference; since DIST only ever *freezes* the decoder,
folding into a plain weight is numerically identical and kernel-friendly
(SURVEY.md §7 step 1)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig
from dist_renderer_tpu.models.decoder import Params


def read_specs(experiment_dir: str) -> DecoderConfig:
    """Parse DeepSDF ``specs.json`` -> DecoderConfig."""
    with open(os.path.join(experiment_dir, "specs.json")) as f:
        specs = json.load(f)
    ns = specs.get("NetworkSpecs", {})
    return DecoderConfig(
        latent_size=int(specs.get("CodeLength", 256)),
        hidden_dims=tuple(ns.get("dims", [512] * 8)),
        latent_in=tuple(ns.get("latent_in", [4])),
        xyz_in_all=bool(ns.get("xyz_in_all", False)),
        use_tanh=bool(ns.get("use_tanh", False)),
        clamp_dist=float(specs.get("ClampingDistance", 0.1)),
    )


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v|| with the norm over each output row (PyTorch
    weight_norm dim=0 on a [out, in] weight)."""
    norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1, keepdims=True)
    return (g.reshape(-1, 1) * v.reshape(v.shape[0], -1) / norm).reshape(v.shape)


def convert_torch_state_dict(
    state_dict: Dict[str, Any], cfg: DecoderConfig
) -> Params:
    """Convert a DeepSDF decoder state_dict to our params pytree.

    Accepts tensors or numpy arrays. Handles both weight-norm'd
    (``linN.weight_g``/``linN.weight_v``) and plain (``linN.weight``) layers,
    with or without a ``decoder.``/``module.`` prefix. PyTorch stores linear
    weights as [out, in]; we transpose to [in, out] for x @ W."""

    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, dtype=np.float32)

    # normalize key prefixes
    sd = {}
    for k, val in state_dict.items():
        for pref in ("module.", "decoder."):
            if k.startswith(pref):
                k = k[len(pref):]
        sd[k] = val

    layers = []
    n_layers = len(cfg.layer_dims)
    for i in range(n_layers):
        base = f"lin{i}"
        if f"{base}.weight_v" in sd:
            w = fold_weight_norm(to_np(sd[f"{base}.weight_g"]), to_np(sd[f"{base}.weight_v"]))
        elif f"{base}.weight" in sd:
            w = to_np(sd[f"{base}.weight"])
        else:
            raise KeyError(f"missing weights for layer {base} in state_dict")
        b = to_np(sd[f"{base}.bias"])
        d_in, d_out = cfg.layer_dims[i]
        if w.shape != (d_out, d_in):
            raise ValueError(
                f"layer {i}: weight shape {w.shape} != expected {(d_out, d_in)}"
            )
        layers.append({"w": jnp.asarray(w.T), "b": jnp.asarray(b)})
    return {"layers": layers}


def load_decoder(
    experiment_dir: str, checkpoint: str = "latest"
) -> Tuple[Params, DecoderConfig]:
    """Load a DeepSDF experiment dir (rebuild of the reference's
    ``load_decoder``). Requires torch (cpu) to unpickle the .pth."""
    import torch  # local import: torch is only needed for conversion

    cfg = read_specs(experiment_dir)
    path = os.path.join(experiment_dir, "ModelParameters", f"{checkpoint}.pth")
    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data["model_state_dict"] if "model_state_dict" in data else data
    return convert_torch_state_dict(sd, cfg), cfg


def load_latent_codes(experiment_dir: str, checkpoint: str = "latest") -> jnp.ndarray:
    """Load the DeepSDF per-shape latent code table [num_shapes, code_len]."""
    import torch

    path = os.path.join(experiment_dir, "LatentCodes", f"{checkpoint}.pth")
    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "latent_codes" in data:
        lat = data["latent_codes"]
        if isinstance(lat, dict) and "weight" in lat:  # newer DeepSDF format
            lat = lat["weight"]
    else:
        lat = data
    if hasattr(lat, "detach"):
        lat = lat.detach().cpu().numpy()
    arr = np.asarray(lat, dtype=np.float32)
    return jnp.asarray(arr.reshape(arr.shape[0], -1))


def save_deepsdf_experiment(
    experiment_dir: str,
    params: Params,
    cfg: DecoderConfig,
    latents: Optional[jnp.ndarray] = None,
    checkpoint: str = "latest",
) -> None:
    """Export params as a DeepSDF experiment dir (the reverse of
    ``load_decoder``): specs.json + ModelParameters/<ckpt>.pth (+
    LatentCodes/<ckpt>.pth). Decoders trained with models/train_deepsdf.py
    round-trip into any DeepSDF-ecosystem tool, including the reference.

    Weights are written as plain ``linN.weight``/``linN.bias`` (weight
    norm folded — ``convert_torch_state_dict`` accepts both forms)."""
    import torch

    os.makedirs(os.path.join(experiment_dir, "ModelParameters"), exist_ok=True)
    specs = {
        "Description": "exported by dist_renderer_tpu",
        "CodeLength": cfg.latent_size,
        "ClampingDistance": cfg.clamp_dist,
        "NetworkArch": "deep_sdf_decoder",
        "NetworkSpecs": {
            "dims": list(cfg.hidden_dims),
            "latent_in": list(cfg.latent_in),
            "xyz_in_all": cfg.xyz_in_all,
            "use_tanh": cfg.use_tanh,
            "dropout": [],
            "dropout_prob": 0.0,
            "norm_layers": [],
            "weight_norm": False,
            "latent_dropout": False,
        },
    }
    with open(os.path.join(experiment_dir, "specs.json"), "w") as f:
        json.dump(specs, f, indent=2)

    sd = {}
    for i, layer in enumerate(params["layers"]):
        sd[f"lin{i}.weight"] = torch.from_numpy(
            np.asarray(layer["w"]).T.copy()
        )
        sd[f"lin{i}.bias"] = torch.from_numpy(np.asarray(layer["b"]).copy())
    torch.save(
        {"model_state_dict": sd},
        os.path.join(experiment_dir, "ModelParameters", f"{checkpoint}.pth"),
    )
    if latents is not None:
        os.makedirs(os.path.join(experiment_dir, "LatentCodes"), exist_ok=True)
        torch.save(
            {"latent_codes": {"weight": torch.from_numpy(np.array(latents))}},
            os.path.join(experiment_dir, "LatentCodes", f"{checkpoint}.pth"),
        )


# ----------------------------------------------------------------------------
# orbax checkpointing of our own optimization state (SURVEY.md §5 failure
# detection: long-running inverse-rendering loops checkpoint latent/pose/opt
# state every N steps and resume idempotently).
# ----------------------------------------------------------------------------

def save_state(path: str, state: Any, step: int) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def restore_state(path: str, template: Any, step: Optional[int] = None) -> Tuple[Any, int]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mngr:
        step = mngr.latest_step() if step is None else step
        if step is None:
            return template, 0
        state = mngr.restore(step, args=ocp.args.StandardRestore(template))
        return state, step
