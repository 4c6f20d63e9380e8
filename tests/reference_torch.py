"""Utilities to load the *reference* PyTorch implementation (read-only at
/root/reference) for golden parity tests, and to convert its state_dicts
into our JAX parameter pytrees.

The reference is only imported inside tests — never by the framework.
Missing cosmetic deps (icecream, termcolor, mcubes, skimage) are stubbed.
"""

import sys
import types

import numpy as np

REFERENCE = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def import_reference():
    _stub("icecream", ic=lambda *a, **k: None)
    _stub("termcolor", colored=lambda s, *a, **k: s)
    _stub("mcubes", marching_cubes=None)
    _stub("skimage", measure=None)
    _stub("skimage.measure", marching_cubes=None)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import models.fields as ref_fields  # noqa
    import models.udf_renderer_blending as ref_renderer  # noqa
    import models.patch_projector as ref_projector  # noqa
    return ref_fields, ref_renderer, ref_projector


def wn_linear_to_jax(sd, prefix):
    """torch weight_norm Linear state_dict -> {'v','g','b'} (transposed)."""
    v = sd[f"{prefix}.weight_v"].detach().numpy()
    g = sd[f"{prefix}.weight_g"].detach().numpy()
    b = sd[f"{prefix}.bias"].detach().numpy()
    return {"v": v.T.copy(), "g": g[:, 0].copy(), "b": b.copy()}


def linear_to_jax(sd, prefix):
    w = sd[f"{prefix}.weight"].detach().numpy()
    b = sd[f"{prefix}.bias"].detach().numpy()
    return {"w": w.T.copy(), "b": b.copy()}


def udf_state_to_jax(net):
    sd = net.state_dict()
    params = {}
    n_layers = net.num_layers - 1
    for l in range(n_layers):
        key = f"lin{l}"
        if f"{key}.weight_v" in sd:
            params[key] = wn_linear_to_jax(sd, key)
        else:
            params[key] = linear_to_jax(sd, key)
    return params


def residual_color_state_to_jax(net):
    sd = net.state_dict()
    params = {"base": {}, "main": {}}
    n = net.num_layers - 1
    for l in range(n):
        params["main"][f"lin{l}"] = (
            wn_linear_to_jax(sd, f"lin{l}") if f"lin{l}.weight_v" in sd else linear_to_jax(sd, f"lin{l}")
        )
        params["base"][f"lin{l}"] = (
            wn_linear_to_jax(sd, f"lin_base{l}")
            if f"lin_base{l}.weight_v" in sd
            else linear_to_jax(sd, f"lin_base{l}")
        )
    return params


def nerf_state_to_jax(net):
    sd = net.state_dict()
    params = {"pts": {}, "views": {}}
    for i in range(net.D):
        params["pts"][f"lin{i}"] = linear_to_jax(sd, f"pts_linears.{i}")
    params["views"]["lin0"] = linear_to_jax(sd, "views_linears.0")
    params["feature"] = linear_to_jax(sd, "feature_linear")
    params["alpha"] = linear_to_jax(sd, "alpha_linear")
    params["rgb"] = linear_to_jax(sd, "rgb_linear")
    return params


def to_np(x):
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)
