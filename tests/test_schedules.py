"""Schedule formulas vs hand-computed reference values
(ref: exp_runner_blending.py:167-251)."""

import numpy as np

from neuraludf_tpu.config import TrainConfig
from neuraludf_tpu.train import schedules as S

CFG = TrainConfig(
    learning_rate=5e-4, learning_rate_geo=1e-4, learning_rate_alpha=0.05,
    end_iter=300_000, warm_up_end=5000, anneal_end=25000, fix_geo_end=500,
    igr_ns_weight=0.01, sparse_weight=0.001,
)


def test_lr_factor():
    assert S.lr_factor(0, CFG) == 0.0
    assert S.lr_factor(2500, CFG) == 0.5
    assert S.lr_factor(5000, CFG) == 1.0
    # cosine tail: at end_iter the factor equals alpha
    np.testing.assert_allclose(S.lr_factor(300_000, CFG), 0.05, rtol=1e-6)
    mid = (np.cos(np.pi * 0.5) + 1) * 0.5 * 0.95 + 0.05
    np.testing.assert_allclose(S.lr_factor(152_500, CFG), mid, rtol=1e-6)


def test_lr_factor_geo():
    assert S.lr_factor_geo(0, CFG) == 0.0  # frozen until fix_geo_end
    assert S.lr_factor_geo(499, CFG) == 0.0
    np.testing.assert_allclose(S.lr_factor_geo(5000, CFG), 0.5)  # 2x warmup
    assert S.lr_factor_geo(10_000, CFG) == 1.0
    assert S.lr_factor_geo(149_999, CFG) == 1.0  # flat until 50%
    np.testing.assert_allclose(S.lr_factor_geo(300_000, CFG), 0.05, rtol=1e-6)


def test_cos_anneal():
    assert S.cos_anneal_ratio(0, CFG) == 0.0
    assert S.cos_anneal_ratio(12_500, CFG) == 0.5
    assert S.cos_anneal_ratio(50_000, CFG) == 1.0
    cfg0 = TrainConfig(anneal_end=0.0)
    assert S.cos_anneal_ratio(0, cfg0) == 1.0


def test_flip_saturation():
    assert S.flip_saturation(0, CFG, is_finetune=False) == 0.0
    assert S.flip_saturation(9_999, CFG, is_finetune=False) == 0.0
    assert S.flip_saturation(10_000, CFG, is_finetune=False) == 0.9
    assert S.flip_saturation(150_000, CFG, is_finetune=False) == 1.0
    assert S.flip_saturation(0, CFG, is_finetune=True) == 1.0


def test_color_weight_factor():
    assert S.color_weight_factor(0, is_finetune=False) == 0.0
    assert S.color_weight_factor(15_000, is_finetune=False) == 0.5
    assert S.color_weight_factor(25_000, is_finetune=False) == 1.0
    assert S.color_weight_factor(0, is_finetune=True) == 1.0


def test_regularization_weights():
    # end1 = 60k, end2 = 150k
    assert S.regularization_weights(0, CFG) == (0.0, 0.0)
    igr_ns, sparse = S.regularization_weights(90_000, CFG)
    np.testing.assert_allclose(igr_ns, 0.01 * 0.5)
    assert sparse == 0.0
    igr_ns, sparse = S.regularization_weights(150_000, CFG)
    np.testing.assert_allclose(igr_ns, 0.01)
    assert sparse == 0.001


def test_base_weight_ramp_rule():
    """color_base only ramps when smaller than color weight
    (ref: exp_runner_blending.py:241-244)."""
    s = S.compute_step_schedules(
        0, CFG, 0.01, 1.0, 0.0, 0.0,
        is_finetune=False, reg_weights_schedule=False, same_lr=False,
        beta_trainable=True, variance_trainable=True,
    )
    assert s.color_base_weight == 0.0  # 0.01 < 1.0 -> ramps (factor 0)
    s2 = S.compute_step_schedules(
        0, CFG, 1.0, 1.0, 0.0, 0.0,
        is_finetune=False, reg_weights_schedule=False, same_lr=False,
        beta_trainable=True, variance_trainable=True,
    )
    assert s2.color_base_weight == 1.0  # not smaller -> constant
