"""Probe: does the blending train step survive inside a lax.scan window on
the real chip now that the strip kernel's origins are packed (round-4 SMEM
fix)? Round 3 observed a hard worker crash and defaulted the single-scan
Runner to pipelined per-step dispatch for blending (cfg.train.
blend_scan_window gate).

RUN LAST in a TPU session queue: a worker hard-crash wedges the chip for
~20-40 min (verify skill, "Wedged chip").
"""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neuraludf_tpu.utils import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

t0 = time.time()
np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
log("chip alive after", f"{time.time()-t0:.0f}s")

from neuraludf_tpu import config as config_mod
from neuraludf_tpu.config import ColorLossConfig
from neuraludf_tpu.data.dataset import Dataset
from neuraludf_tpu.render.renderer import UDFRenderer
from neuraludf_tpu.train.optim import init_adam_state
from neuraludf_tpu.train.runner import init_params
from neuraludf_tpu.train.schedules import compute_step_schedules
from neuraludf_tpu.train.step import build_train_step, build_train_window

cfg = config_mod.load("confs/synthetic_smoke.conf", case="lobed")
cfg = dataclasses.replace(
    cfg,
    train=dataclasses.replace(cfg.train, batch_size=512),
    color_loss=ColorLossConfig(
        color_base_weight=0.01, color_weight=1.0,
        color_pixel_weight=0.1, color_patch_weight=0.1,
        pixel_loss_type="l1", patch_loss_type="ssim", h_patch_size=5),
    model=dataclasses.replace(
        cfg.model,
        udf_renderer=dataclasses.replace(cfg.model.udf_renderer, h_patch_size=5)),
)
ds = Dataset(cfg.dataset)
renderer = UDFRenderer(cfg.model)
params = init_params(jax.random.PRNGKey(0), cfg)
opt = init_adam_state(params)

# single-step baseline with the round-4 kernel (wb=16 + fused_dot)
st = build_train_step(cfg, renderer, blending=True)
s = compute_step_schedules(100, cfg.train, 0.01, 1.0, 0.1, 0.1,
    is_finetune=True, reg_weights_schedule=True, same_lr=False,
    beta_trainable=True, variance_trainable=True)
sched = dict(s.__dict__)
k = jax.random.PRNGKey(2)
t0 = time.time()
params, opt, m = st(params, opt, ds.scene, ds.ref_src_pairs, jnp.asarray(0), k, sched)
_ = np.asarray(m["loss"])
log(f"ft single-step compile {time.time()-t0:.0f}s")
t0 = time.time()
for i in range(20):
    k = jax.random.fold_in(k, i)
    params, opt, m = st(params, opt, ds.scene, ds.ref_src_pairs, jnp.asarray(0), k, sched)
_ = np.asarray(m["loss"])
log(f"ft pipelined (round-4 kernel): {1000*(time.time()-t0)/20:.1f} ms/step, "
    f"cover={float(np.asarray(m['blend_strip_cover'])):.4f}")

# the scan window that crashed the worker in round 3
window = 10
wstep = build_train_window(cfg, renderer, blending=True, window=window)
rows = []
for j in range(window):
    r = compute_step_schedules(100 + j, cfg.train, 0.01, 1.0, 0.1, 0.1,
        is_finetune=True, reg_weights_schedule=True, same_lr=False,
        beta_trainable=True, variance_trainable=True)
    rows.append(dict(r.__dict__))
sr = {kk: np.asarray([row[kk] for row in rows], np.float32) for kk in rows[0]}
idxs = jnp.zeros((window,), jnp.int32)
t0 = time.time()
params, opt, mrows = wstep(params, opt, ds.scene, ds.ref_src_pairs, idxs,
                           jax.random.PRNGKey(3), sr)
_ = np.asarray(mrows)
log(f"ft scan-window compile+first {time.time()-t0:.0f}s")
t0 = time.time()
for i in range(3):
    params, opt, mrows = wstep(params, opt, ds.scene, ds.ref_src_pairs, idxs,
                               jax.random.fold_in(jax.random.PRNGKey(4), i), sr)
    _ = np.asarray(mrows)
log(f"ft scan-window: {1000*(time.time()-t0)/(3*window):.1f} ms/step")
log("BLEND_SCAN_PROBE_DONE")
