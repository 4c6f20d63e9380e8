"""End-to-end smoke of the finetune (blending) training path: pixel + patch
warps active in the train step, patch GT cropping, ranked-drop patch loss."""

import dataclasses

import numpy as np
import pytest

import jax

from neuraludf_tpu.config import ColorLossConfig, DatasetConfig
from neuraludf_tpu.data.synthetic import generate_scene
from neuraludf_tpu.train.runner import Runner

from test_train_smoke import tiny_config


pytestmark = pytest.mark.slow  # full-suite acceptance lane


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene_ft") / "sphere"
    # >9 views so each reference view has 8 source views + in-bounds patches
    generate_scene(str(d), kind="capsule", n_views=10, H=56, W=64, focal=90.0)
    return str(d)


def test_finetune_blending_train(scene_dir, tmp_path):
    cfg = tiny_config(scene_dir, str(tmp_path / "exp"), end_iter=10)
    cfg = dataclasses.replace(
        cfg,
        color_loss=ColorLossConfig(
            color_base_weight=0.01, color_weight=1.0,
            color_pixel_weight=0.1, color_patch_weight=0.1, h_patch_size=2,
        ),
        model=dataclasses.replace(
            cfg.model,
            udf_renderer=dataclasses.replace(cfg.model.udf_renderer, h_patch_size=2),
        ),
    )
    runner = Runner(cfg, is_finetune=True)
    losses = []
    runner.train(report_hook=lambda step, m: losses.append(m))
    assert losses, "no reports"
    last = losses[-1]
    assert np.isfinite(last["loss"])
    # blending losses must actually contribute
    assert last["color_pixel_loss"] != 0.0
    assert last["color_patch_loss"] != 0.0

    # validation renders the pixel-blended pass too (n_images > 8)
    runner.validate(idx=0, resolution_level=8)
