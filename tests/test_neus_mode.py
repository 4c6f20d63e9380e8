"""model_type='neus' (signed / NeuS-SDF comparison mode).

The reference switches the distance net + extraction sign per mode
(ref: exp_runner_blending.py:764-780 — MeshUDF on |sdf| with sdf gradients;
:810-824 — raw sdf closures for the field dumps). Here the signed semantics
flow through the `signed` flag of the mesh/grid subsystem and the runner's
model_type.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuraludf_tpu.config import UDFNetworkConfig
from neuraludf_tpu.nets import fields

SDF_CFG = UDFNetworkConfig(
    d_out=17, d_hidden=16, n_layers=3, skip_in=(), multires=2,
    udf_type="sdf", inside_outside=True,
)


def _sdf_params():
    return {"udf": fields.init_distance_field(jax.random.PRNGKey(0), SDF_CFG)}


def test_signed_grid_values_and_gradients():
    """|sdf| values + sign(sdf)-flipped normalized gradients == the unsigned
    pattern MeshUDF expects from a genuine UDF."""
    from neuraludf_tpu.mesh import grid as grid_mod

    params = _sdf_params()
    pts = np.random.RandomState(0).uniform(-0.9, 0.9, (256, 3)).astype(np.float32)

    raw = np.asarray(fields.distance_value(params["udf"], jnp.asarray(pts), SDF_CFG))[:, 0]
    assert (raw < 0).any() and (raw > 0).any(), "geometric init must be signed"

    v_signed = grid_mod.query_udf_at(params, SDF_CFG, pts, signed=True)
    np.testing.assert_allclose(v_signed, np.abs(raw), rtol=1e-5, atol=1e-6)

    g_raw = np.asarray(fields.distance_gradient(params["udf"], jnp.asarray(pts), SDF_CFG))
    g_signed = np.asarray(grid_mod._grad_chunk_fn(SDF_CFG, True)(params["udf"], jnp.asarray(pts)))
    expect = np.sign(raw)[:, None] * g_raw
    expect = expect / (np.linalg.norm(expect, axis=-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(g_signed, expect, rtol=1e-4, atol=1e-5)


def test_neus_meshudf_extracts_zero_level_set():
    """MeshUDF through the |sdf| route places every vertex on the SIGNED
    field's zero-level set (the init net's zero set is anisotropic — the
    contract is zero-crossing fidelity, not sphericity)."""
    from neuraludf_tpu.mesh.meshudf import get_mesh_udf

    cfg = dataclasses.replace(
        SDF_CFG, d_out=33, d_hidden=32, n_layers=4, skip_in=(2,), multires=4
    )
    params = {"udf": fields.init_distance_field(jax.random.PRNGKey(0), cfg)}
    res = 48
    verts, faces = get_mesh_udf(params, cfg, resolution=res, signed=True)
    assert len(verts) > 300 and len(faces) > 300
    v = np.asarray(fields.distance_value(params["udf"], jnp.asarray(verts), cfg))[:, 0]
    voxel = 2.0 / (res - 1)
    # vertices sit on the zero crossing of the SIGNED field, far below a voxel
    assert np.abs(v).max() < voxel / 4, np.abs(v).max()
    assert np.median(np.abs(v)) < voxel / 50
    # and the signed values straddle zero across the surface (true crossing)
    n_pos = int((v > 0).sum())
    assert 0 < n_pos < len(v)


def test_runner_neus_smoke(tmp_path):
    """End-to-end smoke of the neus-mode Runner surfaces the reference
    implements (ref: exp_runner_blending.py:764-780, :810-824 — extraction
    closures + field dumps on a signed checkpoint; the reference never
    TRAINS in neus mode — its runner has no NeuS density path):
    validate_mesh (classic MC on −sdf), extract_udf_mesh (MeshUDF on
    |sdf|), validate_fields (raw signed dump)."""
    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.data.synthetic import generate_scene
    from neuraludf_tpu.train.runner import Runner

    scene_dir = str(tmp_path / "scene")
    generate_scene(scene_dir, kind="sphere", n_views=4, H=36, W=44, focal=60.0)

    cfg = config_mod.load("confs/synthetic_smoke.conf", case="ignored")
    cfg = dataclasses.replace(
        cfg,
        general=dataclasses.replace(
            cfg.general, base_exp_dir=str(tmp_path / "exp"), model_type="neus"
        ),
        dataset=dataclasses.replace(cfg.dataset, data_dir=scene_dir),
        train=dataclasses.replace(
            cfg.train, end_iter=2, batch_size=32, save_freq=10**6,
            val_freq=10**6, val_mesh_freq=10**6, report_freq=1,
        ),
        model=dataclasses.replace(
            cfg.model,
            nerf=dataclasses.replace(cfg.model.nerf, D=2, W=16, multires=2,
                                     multires_view=2, skips=(0,)),
            udf_network=dataclasses.replace(
                cfg.model.udf_network, d_out=17, d_hidden=16, n_layers=3,
                skip_in=(), multires=2,
            ),
            rendering_network=dataclasses.replace(
                cfg.model.rendering_network, d_feature=16, d_hidden=16, n_layers=2
            ),
            udf_renderer=dataclasses.replace(
                cfg.model.udf_renderer, n_samples=8, n_importance=4, n_outside=2,
                up_sample_steps=2,
            ),
        ),
    )
    runner = Runner(cfg, seed=0, mode="validate_mesh")
    # the neus mode must have switched the field to signed semantics
    assert runner.cfg.model.udf_network.udf_type == "sdf"
    assert runner.model_type == "neus"
    p1 = runner.validate_mesh(world_space=False, resolution=32, threshold=0.005)
    p2 = runner.extract_udf_mesh(world_space=False, resolution=32)
    p3 = runner.validate_fields(resolution=16)
    from neuraludf_tpu.mesh.ply import load_ply

    v1, f1 = load_ply(p1)
    v2, f2 = load_ply(p2)
    assert len(v1) > 0 and len(v2) > 0
    # the field dump keeps the SIGNED values (ref sdf closure, :810-817)
    dumped = np.load(p3)
    assert (dumped < 0).any() and (dumped > 0).any()
