"""End-to-end smoke: synthetic sphere scene → short training run → loss
drops, state machine ticks, checkpoint round-trips, mesh extraction runs."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from neuraludf_tpu import config as config_mod
from neuraludf_tpu.config import (
    BetaNetworkConfig,
    ColorLossConfig,
    Config,
    DatasetConfig,
    GeneralConfig,
    ModelConfig,
    NeRFConfig,
    RendererConfig,
    RenderingNetworkConfig,
    TrainConfig,
    UDFNetworkConfig,
    VarianceConfig,
)
from neuraludf_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene") / "sphere"
    generate_scene(str(d), kind="sphere", n_views=6, H=60, W=72, focal=96.0)
    return str(d)


def tiny_config(scene_dir, exp_dir, end_iter=40) -> Config:
    return Config(
        general=GeneralConfig(base_exp_dir=exp_dir, expname="smoke"),
        dataset=DatasetConfig(data_dir=scene_dir, dataset_name="general"),
        train=TrainConfig(
            learning_rate=5e-4, learning_rate_geo=2e-4, end_iter=end_iter,
            batch_size=64, warm_up_end=10, anneal_end=20, fix_geo_end=2,
            save_freq=1000000, val_freq=1000000, val_mesh_freq=1000000,
            report_freq=10, validate_resolution_level=8,
        ),
        color_loss=ColorLossConfig(),
        model=ModelConfig(
            nerf=NeRFConfig(D=2, W=32, multires=4, multires_view=2, skips=(0,)),
            udf_network=UDFNetworkConfig(d_out=33, d_hidden=32, n_layers=4, skip_in=(2,), multires=4),
            variance_network=VarianceConfig(),
            rendering_network=RenderingNetworkConfig(d_feature=32, d_hidden=32, n_layers=2),
            beta_network=BetaNetworkConfig(),
            udf_renderer=RendererConfig(
                n_samples=16, n_importance=10, n_outside=4, up_sample_steps=5
            ),
        ),
    )


def test_dataset_loads(scene_dir):
    from neuraludf_tpu.data.dataset import Dataset, near_far_from_sphere

    ds = Dataset(DatasetConfig(data_dir=scene_dir, dataset_name="general"))
    assert ds.n_images == 6
    assert ds.scene["images"].shape == (6, 60, 72, 3)
    sample = ds.gen_random_rays_patches_at(0, jax.random.PRNGKey(0), 32)
    rays = np.asarray(sample["rays"])
    assert rays.shape == (32, 10)
    # directions are unit
    np.testing.assert_allclose(np.linalg.norm(rays[:, 3:6], axis=-1), 1.0, rtol=1e-5)
    # mask pixels come from the rendered sphere silhouette
    near, far = near_far_from_sphere(sample["rays"][:, :3], sample["rays"][:, 3:6])
    assert float(near.min()) > 0.0
    # full-image rays
    ro, rv = ds.gen_rays_at(0, resolution_level=4)
    assert ro.shape == (15, 18, 3)
    # patch cropping
    s2 = ds.gen_random_rays_patches_at(1, jax.random.PRNGKey(1), 16, crop_patch=True, h_patch_size=2)
    assert np.asarray(s2["rays_patch_color"]).shape == (16, 25, 3)


def test_ray_pixel_consistency(scene_dir):
    """A ray generated at pixel (x,y) must project back to (x,y)."""
    from neuraludf_tpu.data.dataset import Dataset

    ds = Dataset(DatasetConfig(data_dir=scene_dir, dataset_name="general"))
    x, y = 30, 20
    data = np.asarray(ds.gen_one_ray_at(0, x, y))
    ro, rv = data[0, :3], data[0, 3:6]
    # march along the ray and project with K [R|t]
    K = np.asarray(ds.scene["intrinsics"][0])[:3, :3]
    w2c = np.linalg.inv(np.asarray(ds.scene["poses"][0]))
    pt = ro + rv * 1.7
    pc = K @ (w2c[:3, :3] @ pt + w2c[:3, 3])
    uv = pc[:2] / pc[2]
    np.testing.assert_allclose(uv, [x, y], atol=1e-3)


@pytest.mark.slow
def test_smoke_train_and_mesh(scene_dir, tmp_path):
    from neuraludf_tpu.train.runner import Runner

    cfg = tiny_config(scene_dir, str(tmp_path / "exp"))
    runner = Runner(cfg, seed=0)
    losses = []
    runner.train(report_hook=lambda step, m: losses.append(m["loss"]))
    assert len(losses) >= 3
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.05, losses  # not diverging

    # checkpoint round-trip
    runner.save_checkpoint()
    runner2 = Runner(cfg, is_continue=True)
    assert runner2.iter_step == runner.iter_step
    a = jax.tree_util.tree_leaves(runner.params)
    b = jax.tree_util.tree_leaves(runner2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # validation image rendering
    runner.validate(idx=0, resolution_level=8)
    val_dir = os.path.join(runner.base_exp_dir, "validations_fine")
    assert len(os.listdir(val_dir)) == 1

    # mesh extraction paths run end-to-end (geometry quality needs more iters)
    p1 = runner.validate_mesh(world_space=False, resolution=32, threshold=0.1)
    assert os.path.exists(p1)
    p2 = runner.extract_udf_mesh(resolution=32, dist_threshold_ratio=5.0)
    assert os.path.exists(p2)

    # ray statistics debug plot
    p3 = runner.visualize_one_ray(0, cfg_px(scene_dir), 30)
    assert os.path.exists(p3)


def cfg_px(scene_dir):
    return 36


def test_finetune_restart(scene_dir, tmp_path):
    from neuraludf_tpu.train.runner import Runner

    cfg = tiny_config(scene_dir, str(tmp_path / "exp2"), end_iter=6)
    r = Runner(cfg, seed=0)
    r.train()
    r.save_checkpoint()
    # finetune: restore params but reset the schedule clock (ref: :479-480)
    r2 = Runner(cfg, is_continue=True, is_finetune=True)
    assert r2.iter_step == 0


def test_field_dumps_and_novel_view(scene_dir, tmp_path):
    """validate_fields, save_hdf5, validate_novel_image run end-to-end."""
    import h5py

    from neuraludf_tpu.train.runner import Runner

    cfg = tiny_config(scene_dir, str(tmp_path / "exp3"), end_iter=2)
    r = Runner(cfg)
    p = r.validate_fields(resolution=24)
    u = np.load(p)
    assert u.shape == (24, 24, 24) and np.isfinite(u).all()

    ph = r.save_hdf5(resolution=16)
    with h5py.File(ph) as f:
        assert f["16_sdf"].shape == (17, 17, 17)

    r.validate_novel_image(0, 1, 0.5, out_idx=0, resolution_level=8)
    assert os.path.exists(os.path.join(r.base_exp_dir, "render", "0.png"))


def test_file_backup_and_colorize_depth(scene_dir, tmp_path, monkeypatch):
    """file_backup snapshots .py sources + resolved config into the
    experiment dir (ref: exp_runner_blending.py:449-465); colorize_depth
    maps a depth image through a matplotlib colormap (ref: :847-865)."""
    from neuraludf_tpu.train.runner import Runner, colorize_depth

    workdir = tmp_path / "src"
    workdir.mkdir()
    (workdir / "models").mkdir()
    (workdir / "models" / "a.py").write_text("x = 1\n")
    (workdir / "models" / "skip.txt").write_text("not python\n")
    monkeypatch.chdir(workdir)

    cfg = tiny_config(scene_dir, str(tmp_path / "exp4"), end_iter=2)
    cfg = dataclasses.replace(
        cfg, general=dataclasses.replace(cfg.general, recording=("models",))
    )
    r = Runner(cfg)
    r.file_backup()
    rec = os.path.join(r.base_exp_dir, "recording")
    assert os.path.exists(os.path.join(rec, "models", "a.py"))
    assert not os.path.exists(os.path.join(rec, "models", "skip.txt"))
    assert "end_iter=2" in open(os.path.join(rec, "config.txt")).read()

    depth = np.linspace(0.0, 2.0, 12).reshape(3, 4)
    rgb = colorize_depth(depth)
    assert rgb.shape == (3, 4, 3) and rgb.dtype == np.uint8
    assert not np.array_equal(rgb[0, 0], rgb[-1, -1])  # colormap varies
    flat = colorize_depth(np.ones((2, 2)))  # vmin == vmax guard
    assert np.isfinite(flat).all()


def test_bmvs_layout(tmp_path):
    """The bmvs (jpg) dataset layout loads."""
    import shutil

    from neuraludf_tpu.config import DatasetConfig
    from neuraludf_tpu.data.dataset import Dataset
    from neuraludf_tpu.data.synthetic import generate_scene
    import cv2 as cv

    src = str(tmp_path / "src")
    generate_scene(src, kind="sphere", n_views=3, H=40, W=48, focal=64.0)
    dst = tmp_path / "bmvs"
    (dst / "blended_images").mkdir(parents=True)
    (dst / "masks").mkdir()
    for i in range(3):
        img = cv.imread(f"{src}/image/{i:03d}.png")
        msk = cv.imread(f"{src}/mask/{i:03d}.png")
        cv.imwrite(str(dst / "blended_images" / f"{i:03d}.jpg"), img)
        cv.imwrite(str(dst / "masks" / f"{i:03d}.jpg"), msk)
    shutil.copy(f"{src}/cameras.npz", dst / "cameras.npz")
    ds = Dataset(DatasetConfig(data_dir=str(dst), dataset_name="bmvs"))
    assert ds.n_images == 3 and ds.scene["images"].shape == (3, 40, 48, 3)
