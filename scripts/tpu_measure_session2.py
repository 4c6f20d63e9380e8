"""Follow-up TPU session (round 4): stage-1 step with the new 512/256
fused-kernel blocks, measured both single-step-pipelined and through the
production lax.scan window (window=50, the bench.py path), plus a windowed
trace for residual-gap analysis. Run AFTER tpu_measure_session.py exits
(single-tenant chip)."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neuraludf_tpu.utils import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

t0 = time.time()
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
log("chip alive:", float(np.asarray(x)[0, 0]), f"after {time.time()-t0:.0f}s")

from neuraludf_tpu import config as config_mod
from neuraludf_tpu.data.dataset import Dataset
from neuraludf_tpu.render.renderer import UDFRenderer
from neuraludf_tpu.train.optim import init_adam_state
from neuraludf_tpu.train.runner import init_params
from neuraludf_tpu.train.schedules import compute_step_schedules
from neuraludf_tpu.train.step import build_train_step, build_train_window

cfg = config_mod.load("confs/synthetic_smoke.conf", case="sphere")
cfg = dataclasses.replace(cfg, dataset=dataclasses.replace(cfg.dataset, data_dir="data/bench/sphere"))
ds = Dataset(cfg.dataset)
renderer = UDFRenderer(cfg.model)
params = init_params(jax.random.PRNGKey(0), cfg)
opt = init_adam_state(params)
s = compute_step_schedules(1000, cfg.train, 0.01, 1.0, 0.0, 0.0,
    is_finetune=False, reg_weights_schedule=False, same_lr=False,
    beta_trainable=True, variance_trainable=True)
sched = dict(s.__dict__)

# ---- single-step pipelined (same protocol as session 1) -------------------
step = build_train_step(cfg, renderer, blending=False)
key = jax.random.PRNGKey(1)
t0 = time.time()
params, opt, m = step(params, opt, ds.scene, ds.ref_src_pairs, jnp.asarray(0), key, sched)
log("stage1 first step:", float(np.asarray(m["loss"])), f"{time.time()-t0:.1f}s")
for i in range(10):
    key = jax.random.fold_in(key, i)
    params, opt, m = step(params, opt, ds.scene, ds.ref_src_pairs, jnp.asarray(0), key, sched)
_ = np.asarray(m["loss"])
t0 = time.time()
for i in range(30):
    key = jax.random.fold_in(key, 100 + i)
    params, opt, m = step(params, opt, ds.scene, ds.ref_src_pairs, jnp.asarray(0), key, sched)
_ = np.asarray(m["loss"])
log(f"stage1 pipelined (blocks 512/256): {1000*(time.time()-t0)/30:.2f} ms/step")

# ---- windowed (the bench.py / production dispatch path) --------------------
window = 50
wstep = build_train_window(cfg, renderer, blending=False, window=window)

def sched_rows(start):
    rows = []
    for j in range(window):
        r = compute_step_schedules(start + j, cfg.train, 0.01, 1.0, 0.0, 0.0,
            is_finetune=False, reg_weights_schedule=False, same_lr=False,
            beta_trainable=True, variance_trainable=True)
        rows.append(dict(r.__dict__))
    return {k: np.asarray([row[k] for row in rows], np.float32) for k in rows[0]}

sr = sched_rows(1000)
idxs = jnp.zeros((window,), jnp.int32)
t0 = time.time()
params, opt, mrows = wstep(params, opt, ds.scene, ds.ref_src_pairs, idxs, jax.random.PRNGKey(2), sr)
_ = np.asarray(mrows)
log(f"windowed compile+first: {time.time()-t0:.1f}s")
t0 = time.time()
for i in range(4):
    params, opt, mrows = wstep(params, opt, ds.scene, ds.ref_src_pairs, idxs, jax.random.fold_in(jax.random.PRNGKey(3), i), sr)
    _ = np.asarray(mrows)
log(f"stage1 windowed (blocks 512/256): {1000*(time.time()-t0)/(4*window):.2f} ms/step")

import shutil
shutil.rmtree("/tmp/trace_s1w", ignore_errors=True)
with jax.profiler.trace("/tmp/trace_s1w", create_perfetto_link=False):
    params, opt, mrows = wstep(params, opt, ds.scene, ds.ref_src_pairs, idxs, jax.random.PRNGKey(9), sr)
    _ = np.asarray(mrows)
log("windowed TRACE_DONE -> /tmp/trace_s1w")

# ---- strip microbench, hoisted-iota + packed-origin kernel -----------------
from neuraludf_tpu.ops.strip_sample import prepare_images, strip_sample
V, NW, P = 8, 2048, 1024
H, W = 1200, 1600
kk = jax.random.PRNGKey(0)
imgs4 = prepare_images(jax.random.uniform(kk, (V, 3, H, W), jnp.float32))
kc, ko = jax.random.split(jax.random.fold_in(kk, 1))
cx = jax.random.uniform(kc, (V, NW, 1), minval=0.0, maxval=W - 1.0)
cy = jax.random.uniform(jax.random.fold_in(kc, 1), (V, NW, 1), minval=0.0, maxval=H - 1.0)
gx = jnp.clip(cx + jax.random.uniform(ko, (V, NW, P), minval=-50.0, maxval=50.0), 0, W - 1.0)
gy = jnp.clip(cy + jax.random.uniform(jax.random.fold_in(ko, 1), (V, NW, P), minval=-10.0, maxval=10.0), 0, H - 1.0)

def timeit(fn, *args, n=5):
    out = fn(*args); np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.time(); out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]); ts.append(time.time() - t0)
    return 1000 * min(ts)

for sh2, wb2, fd in ((64, 8, False), (64, 16, False), (64, 8, True), (64, 16, True)):
    f = jax.jit(lambda i, x, y, s=sh2, b=wb2, d=fd:
                strip_sample(i, x, y, sh=s, wb=b, fused_dot=d)[0].sum())
    try:
        log(f"strip(hoist+pack) sh={sh2} wb={wb2} fused={int(fd)}: {timeit(f, imgs4, gx, gy):.1f} ms")
    except Exception as e:
        log(f"strip(hoist+pack) sh={sh2} wb={wb2} fused={int(fd)}: FAIL {type(e).__name__}: {str(e)[:160]}")

# ---- validation-scale SMEM check: NW=16384 single segment ------------------
NWV = 16384
cxv = jax.random.uniform(kc, (V, NWV, 1), minval=0.0, maxval=W - 1.0)
cyv = jax.random.uniform(jax.random.fold_in(kc, 3), (V, NWV, 1), minval=0.0, maxval=H - 1.0)
gxv = jnp.clip(cxv + jax.random.uniform(ko, (V, NWV, 128), minval=-3.0, maxval=3.0), 0, W - 1.0)
gyv = jnp.clip(cyv + jax.random.uniform(jax.random.fold_in(ko, 3), (V, NWV, 128), minval=-3.0, maxval=3.0), 0, H - 1.0)
fv = jax.jit(lambda i, x, y: strip_sample(i, x, y)[0].sum())
try:
    log(f"strip val-scale NW=16384 P=128: {timeit(fv, imgs4, gxv, gyv):.1f} ms (SMEM fix confirmed)")
except Exception as e:
    log(f"strip val-scale: FAIL {type(e).__name__}: {str(e)[:200]}")

log("SESSION2_DONE")
