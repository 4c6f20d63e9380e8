"""Production multi-scan runner: windowed dispatch, per-scan checkpoints,
resume, per-scan mesh export (VERDICT r2 #6)."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


pytestmark = pytest.mark.slow  # full-suite acceptance lane


def _tiny_cfg(end_iter, tmp_path, **train_kw):
    from neuraludf_tpu.utils.testing import tiny_config

    cfg = tiny_config(batch_size=16)
    return dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(cfg.dataset, dataset_name="general"),
        train=dataclasses.replace(
            cfg.train, end_iter=end_iter, save_freq=4, val_freq=10**9,
            val_mesh_freq=10**9, report_freq=4, **train_kw,
        ),
    )


@pytest.fixture(scope="module")
def scan_dirs(tmp_path_factory):
    from neuraludf_tpu.data.synthetic import generate_scene

    root = tmp_path_factory.mktemp("scans")
    dirs = []
    for i, kind in enumerate(("sphere", "capsule")):
        d = str(root / f"scan{i}")
        generate_scene(d, kind=kind, n_views=4, H=36, W=44, focal=60.0)
        dirs.append(d)
    return dirs


def test_multi_scan_runner_train_ckpt_resume_mesh(scan_dirs, tmp_path):
    from neuraludf_tpu.mesh.ply import load_ply
    from neuraludf_tpu.parallel.multi_scan import MultiScanRunner
    from neuraludf_tpu.parallel.sharding import make_mesh

    out = str(tmp_path / "ms")
    cfg = _tiny_cfg(8, tmp_path)
    mesh = make_mesh(2)

    hooks = []
    runner = MultiScanRunner(
        cfg, scan_dirs, case_names=["scan0", "scan1"], mesh=mesh,
        out_dir=out, seed=0,
    )
    runner.train(report_hook=lambda it, m: hooks.append((it, m)))
    assert runner.iter_step == 8
    # per-scan metrics reported, and scans differ (different scenes/params)
    assert hooks and hooks[-1][0] == 8
    losses = hooks[-1][1]["loss"]
    assert losses.shape == (2,) and np.isfinite(losses).all()

    # per-scan checkpoints in the single-scan Runner's format
    runner.save_checkpoints()
    for case in ("scan0", "scan1"):
        d = os.path.join(out, case, "checkpoints")
        names = sorted(os.listdir(d))
        assert "ckpt_000008.ckpt" in names
    import pickle

    with open(os.path.join(out, "scan0", "checkpoints", "ckpt_000008.ckpt"), "rb") as f:
        payload = pickle.load(f)
    assert payload["iter_step"] == 8
    assert {"params", "opt_state", "rng"} <= set(payload)

    # a plain single-scan Runner can load the per-scan checkpoint
    from neuraludf_tpu.data.dataset import Dataset
    from neuraludf_tpu.train.runner import Runner

    cfg0 = dataclasses.replace(
        cfg,
        general=dataclasses.replace(cfg.general, base_exp_dir=str(tmp_path / "single")),
        dataset=dataclasses.replace(cfg.dataset, data_dir=scan_dirs[0]),
    )
    single = Runner(cfg0, mode="validate", seed=0)
    single.load_checkpoint(os.path.join(out, "scan0", "checkpoints", "ckpt_000008.ckpt"))
    assert single.iter_step == 8
    for a, b in zip(
        jax.tree_util.tree_leaves(single.params),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x[0], runner.params)
        ),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # resume: a fresh runner picks up the common iteration + params
    runner2 = MultiScanRunner(
        cfg, scan_dirs, case_names=["scan0", "scan1"], mesh=mesh,
        out_dir=out, seed=0, is_continue=True,
    )
    assert runner2.iter_step == 8
    for a, b in zip(
        jax.tree_util.tree_leaves(runner2.params),
        jax.tree_util.tree_leaves(runner.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # per-scan mesh export through the shadow runners
    meshes = runner.final_meshes(resolution=32)
    assert len(meshes) == 2
    for p in meshes:
        v, f = load_ply(p)
        assert len(v) > 0


def test_best_mesh_size():
    from neuraludf_tpu.parallel.multi_scan import best_mesh_size

    assert best_mesh_size(8, 8) == 8
    assert best_mesh_size(6, 4) == 3  # ADVICE r3: 6 scans on 4 chips
    assert best_mesh_size(7, 4) == 1  # prime scan count
    assert best_mesh_size(4, 8) == 4  # fewer scans than chips
    assert best_mesh_size(12, 8) == 6


def test_multi_scan_blending_fallback_matches_scan_window(scan_dirs, tmp_path):
    """Blending multi-scan training must produce identical params whether
    dispatched as pipelined single steps (the TPU-safe default, ADVICE r3)
    or as a lax.scan window (blend_scan_window=True)."""
    from neuraludf_tpu.config import ColorLossConfig
    from neuraludf_tpu.parallel.multi_scan import MultiScanRunner
    from neuraludf_tpu.parallel.sharding import make_mesh

    def run(blend_scan_window, out):
        cfg = _tiny_cfg(4, tmp_path, blend_scan_window=blend_scan_window)
        cfg = dataclasses.replace(
            cfg,
            color_loss=ColorLossConfig(
                color_base_weight=0.01, color_weight=1.0,
                color_pixel_weight=0.1, color_patch_weight=0.1,
                h_patch_size=2,
            ),
            model=dataclasses.replace(
                cfg.model,
                udf_renderer=dataclasses.replace(
                    cfg.model.udf_renderer, h_patch_size=2
                ),
            ),
        )
        r = MultiScanRunner(
            cfg, scan_dirs, case_names=["scan0", "scan1"], mesh=make_mesh(2),
            out_dir=str(tmp_path / out), seed=0, is_finetune=True,
        )
        r.train()
        assert r.iter_step == 4
        return r.params

    p_pipe = run(False, "ms_pipe")
    p_scan = run(True, "ms_scan")
    for a, b in zip(jax.tree_util.tree_leaves(p_pipe),
                    jax.tree_util.tree_leaves(p_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_multi_scan_runner_matches_single_runs(scan_dirs, tmp_path):
    """Two scans trained by the multi-scan runner == the same two scans
    trained by independent single-scan Runners (same seeds, same iters)."""
    from neuraludf_tpu.data.dataset import Dataset
    from neuraludf_tpu.parallel.multi_scan import MultiScanRunner
    from neuraludf_tpu.parallel.sharding import make_mesh
    from neuraludf_tpu.train.runner import Runner, init_params
    from neuraludf_tpu.train.optim import init_adam_state
    from neuraludf_tpu.train.schedules import compute_step_schedules
    from neuraludf_tpu.train.step import build_train_step

    cfg = _tiny_cfg(4, tmp_path)
    mesh = make_mesh(2)
    ms = MultiScanRunner(
        cfg, scan_dirs, case_names=["scan0", "scan1"], mesh=mesh,
        out_dir=str(tmp_path / "ms_eq"), seed=0,
    )
    ms.train()

    # replicate scan i's stream manually with the single-scan step
    from neuraludf_tpu.render.renderer import UDFRenderer

    renderer = UDFRenderer(cfg.model)
    step = build_train_step(cfg, renderer, blending=False)
    for i in range(2):
        ds = Dataset(dataclasses.replace(cfg.dataset, data_dir=scan_dirs[i]))
        params = init_params(jax.random.PRNGKey(0 + i), cfg)
        opt = init_adam_state(params)
        rng = jax.random.split(jax.random.PRNGKey(0), 2)[i]
        perm_rng = np.random.RandomState(i)
        perm = perm_rng.permutation(ds.n_images)
        # window of 4: one base key split into 4 per-iter keys
        rng, base = jax.random.split(rng)
        keys = jax.random.split(base, 4)
        for j in range(4):
            s = compute_step_schedules(
                j, cfg.train, cfg.color_loss.color_base_weight,
                cfg.color_loss.color_weight, cfg.color_loss.color_pixel_weight,
                cfg.color_loss.color_patch_weight,
                is_finetune=False, reg_weights_schedule=False,
                same_lr=cfg.train.same_lr, beta_trainable=True,
                variance_trainable=True,
            )
            idx = perm[j % ds.n_images]
            params, opt, m = step(
                params, opt, ds.scene, ds.ref_src_pairs,
                jnp.asarray(idx), keys[j], dict(s.__dict__),
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x[i], ms.params)
            ),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )


def test_multi_scan_sweep_overrides_match_single_runs(scan_dirs, tmp_path):
    """Sweep mode: the SAME scan with per-scan train_overrides (the
    reference's per-scan -s sweep as one program,
    ref bashs/bash_garment_blending.sh:32-36) == single-scan replication
    with each override applied. Only schedule-borne fields diverge, so
    both sweep points share one compiled step."""
    from neuraludf_tpu.data.dataset import Dataset
    from neuraludf_tpu.parallel.multi_scan import MultiScanRunner
    from neuraludf_tpu.parallel.sharding import make_mesh
    from neuraludf_tpu.render.renderer import UDFRenderer
    from neuraludf_tpu.train.optim import init_adam_state
    from neuraludf_tpu.train.runner import init_params
    from neuraludf_tpu.train.schedules import compute_step_schedules
    from neuraludf_tpu.train.step import build_train_step

    cfg = _tiny_cfg(4, tmp_path)
    overrides = [{"sparse_weight": 0.0},
                 {"sparse_weight": 0.3, "learning_rate": 2e-3}]
    ms = MultiScanRunner(
        cfg, [scan_dirs[0], scan_dirs[0]], case_names=["s0", "s1"],
        mesh=make_mesh(2), out_dir=str(tmp_path / "sweep"), seed=0,
        train_overrides=overrides,
    )
    ms.train()

    renderer = UDFRenderer(cfg.model)
    step = build_train_step(cfg, renderer, blending=False)
    ds = Dataset(dataclasses.replace(cfg.dataset, data_dir=scan_dirs[0]))
    for i, ov in enumerate(overrides):
        tc = dataclasses.replace(cfg.train, **ov)
        params = init_params(jax.random.PRNGKey(0 + i), cfg)
        opt = init_adam_state(params)
        rng = jax.random.split(jax.random.PRNGKey(0), 2)[i]
        perm = np.random.RandomState(i).permutation(ds.n_images)
        rng, base = jax.random.split(rng)
        keys = jax.random.split(base, 4)
        for j in range(4):
            s = compute_step_schedules(
                j, tc, cfg.color_loss.color_base_weight,
                cfg.color_loss.color_weight, cfg.color_loss.color_pixel_weight,
                cfg.color_loss.color_patch_weight,
                is_finetune=False, reg_weights_schedule=False,
                same_lr=tc.same_lr, beta_trainable=True,
                variance_trainable=True,
            )
            params, opt, m = step(
                params, opt, ds.scene, ds.ref_src_pairs,
                jnp.asarray(perm[j % ds.n_images]), keys[j], dict(s.__dict__),
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x[i], ms.params)
            ),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )


def test_multi_scan_sweep_rejects_structural_overrides(scan_dirs, tmp_path):
    from neuraludf_tpu.parallel.multi_scan import MultiScanRunner
    from neuraludf_tpu.parallel.sharding import make_mesh

    cfg = _tiny_cfg(4, tmp_path)
    with pytest.raises(AssertionError, match="batch_size"):
        MultiScanRunner(
            cfg, [scan_dirs[0], scan_dirs[0]], case_names=["a", "b"],
            mesh=make_mesh(2), out_dir=str(tmp_path / "bad"), seed=0,
            train_overrides=[{}, {"batch_size": 8}],
        )
