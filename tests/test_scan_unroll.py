"""lax.scan `unroll` in the train window is a scheduling knob: the
unrolled window must match unroll=1 numerically (the unroll exists to
overlap in-scan weight re-staging on TPU, see train/step.py
build_train_window). Unrolling duplicates the loop body in the HLO and
changes fusion decisions, so low-bit float drift is expected — the test
asserts tight allclose, not bit equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuraludf_tpu.data.dataset import Dataset
from neuraludf_tpu.render.renderer import UDFRenderer
from neuraludf_tpu.train.optim import init_adam_state
from neuraludf_tpu.train.runner import init_params
from neuraludf_tpu.train.schedules import compute_step_schedules
from neuraludf_tpu.train.step import build_train_window

from test_train_smoke import tiny_config


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from neuraludf_tpu.data.synthetic import generate_scene

    d = tmp_path_factory.mktemp("scene_unroll") / "sphere"
    generate_scene(str(d), kind="sphere", n_views=5, H=40, W=48, focal=64.0)
    return str(d)


def _run_window(cfg, ds, unroll, window=4, flat_adam=False):
    import dataclasses

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, flat_adam=flat_adam))
    renderer = UDFRenderer(cfg.model)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = init_adam_state(params)
    rows = []
    for j in range(window):
        r = compute_step_schedules(
            j, cfg.train, 0.01, 1.0, 0.0, 0.0,
            is_finetune=False, reg_weights_schedule=False, same_lr=False,
            beta_trainable=True, variance_trainable=True,
        )
        rows.append(dict(r.__dict__))
    sr = {k: np.asarray([row[k] for row in rows], np.float32) for k in rows[0]}
    wf = build_train_window(cfg, renderer, blending=False, window=window,
                            unroll=unroll)
    params, opt, mrows = wf(params, opt, ds.scene, ds.ref_src_pairs,
                            jnp.zeros((window,), jnp.int32),
                            jax.random.PRNGKey(7), sr)
    return params, np.asarray(mrows)


def test_unroll_bit_identical(scene_dir, tmp_path):
    cfg = tiny_config(scene_dir, str(tmp_path / "exp"))
    ds = Dataset(cfg.dataset)
    p1, m1 = _run_window(cfg, ds, unroll=1)
    p2, m2 = _run_window(cfg, ds, unroll=2)
    np.testing.assert_allclose(m1, m2, rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-7)


def test_flat_adam_window_trajectory(scene_dir, tmp_path, monkeypatch):
    """The flat (single-kernel) Adam yields the same training trajectory
    through the scan window as the per-leaf Adam. The optimizer math is
    bit-identical (test_optim.py); end-to-end the fusion boundaries differ,
    so tight allclose like the unroll test."""
    monkeypatch.delenv("NEURALUDF_FLAT_ADAM", raising=False)
    cfg = tiny_config(scene_dir, str(tmp_path / "exp_flat"))
    ds = Dataset(cfg.dataset)
    p1, m1 = _run_window(cfg, ds, unroll=1, flat_adam=False)
    p2, m2 = _run_window(cfg, ds, unroll=1, flat_adam=True)
    np.testing.assert_allclose(m1, m2, rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-7)


def test_unroll_must_divide_window(scene_dir, tmp_path):
    cfg = tiny_config(scene_dir, str(tmp_path / "exp2"))
    renderer = UDFRenderer(cfg.model)
    with pytest.raises(ValueError):
        build_train_window(cfg, renderer, blending=False, window=4, unroll=3)
