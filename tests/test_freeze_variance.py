"""train.freeze_variance (TPU-repo extension, see config.py): the variance
scalar stays untrainable for the whole run — overriding the config's
requires_grad, the reference's it>20000 auto-enable (ref exp_runner:353-359),
and the trainability recorded in a loaded checkpoint."""

import dataclasses

import pytest

from neuraludf_tpu.train.runner import Runner
from test_train_smoke import scene_dir, tiny_config  # noqa: F401  (fixture)


class _StubWriter:
    def add_scalar(self, *a, **k):
        pass


def _cfg(scene_dir, exp_dir, freeze):
    cfg = tiny_config(scene_dir, exp_dir, end_iter=20)
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, freeze_variance=freeze)
    )


def test_freeze_variance_overrides_init_and_state_machine(scene_dir, tmp_path):
    r = Runner(_cfg(scene_dir, str(tmp_path / "a"), freeze=True), seed=0)
    assert r.cfg.model.variance_network.requires_grad  # conf wants it trainable
    assert not r.variance_trainable  # freeze wins at init

    # the reference's it>20000 auto-enable must not fire under freeze
    r.writer = _StubWriter()
    m = {"loss": 0.1, "mask_loss": 0.0, "gradient_error": 0.0,
         "variance": 0.3, "beta": 0.5, "psnr": 20.0, "color_fine_loss": 0.1,
         "sparse_error": 0.0, "sparse_scale_factor": 1.0, "weight_sum": 0.5}
    r._post_step_host(20001, m, t_start=0.0, report_hook=None)
    assert not r.variance_trainable

    # without freeze the same tick flips it on
    r2 = Runner(_cfg(scene_dir, str(tmp_path / "b"), freeze=False), seed=0)
    r2.variance_trainable = False
    r2.writer = _StubWriter()
    r2._post_step_host(20001, m, t_start=0.0, report_hook=None)
    assert r2.variance_trainable


def test_freeze_variance_overrides_checkpoint_payload(scene_dir, tmp_path):
    # a non-frozen runner records variance_trainable=True in its checkpoint
    donor = Runner(_cfg(scene_dir, str(tmp_path / "d"), freeze=False), seed=0)
    assert donor.variance_trainable
    donor.save_checkpoint()
    ck = donor._latest_checkpoint()
    assert ck

    r = Runner(_cfg(scene_dir, str(tmp_path / "d"), freeze=True), seed=1)
    r.load_checkpoint(ck)
    assert not r.variance_trainable
