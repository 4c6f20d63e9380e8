"""Bit-exact checkpoint/resume: save at iter k, reload, continue — must
reproduce the uninterrupted run's parameters exactly."""

import dataclasses

import numpy as np
import pytest

import jax

from neuraludf_tpu.train.runner import Runner

from test_train_smoke import tiny_config


pytestmark = pytest.mark.slow  # full-suite acceptance lane


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from neuraludf_tpu.data.synthetic import generate_scene

    d = tmp_path_factory.mktemp("scene_resume") / "sphere"
    generate_scene(str(d), kind="sphere", n_views=5, H=40, W=48, focal=64.0)
    return str(d)


def test_bit_exact_resume(scene_dir, tmp_path):
    cfg20 = tiny_config(scene_dir, str(tmp_path / "a"), end_iter=20)
    r_full = Runner(cfg20, seed=3)
    r_full.train()

    cfg10 = dataclasses.replace(
        cfg20,
        general=dataclasses.replace(cfg20.general, base_exp_dir=str(tmp_path / "b")),
        train=dataclasses.replace(cfg20.train, end_iter=10),
    )
    r_half = Runner(cfg10, seed=3)
    r_half.train()
    r_half.save_checkpoint()

    cfg_resume = dataclasses.replace(
        cfg10, train=dataclasses.replace(cfg10.train, end_iter=20)
    )
    r_resumed = Runner(cfg_resume, is_continue=True, seed=999)  # seed ignored on load
    assert r_resumed.iter_step == 10
    r_resumed.train()

    a = jax.tree_util.tree_leaves(r_full.params)
    b = jax.tree_util.tree_leaves(r_resumed.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
