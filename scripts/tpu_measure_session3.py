"""Round-4 TPU session 3: (a) lax.scan `unroll` A/B on the production
stage-1 window — the round-4 windowed trace attributed ~3.6 ms/step of the
17.12 ms wall to in-scan weight-prefetch copy stalls (Adam rewrites every
weight each iteration, so each scan step re-stages all MLP weights to
VMEM); unrolling the scan body lets XLA overlap that re-staging with the
previous iteration's tail compute. (b) strip-sampler cost at the
blend_top_k=16 geometry (NW halves: 2048 -> 1024 work chunks).

Run on an idle chip (single-tenant)."""
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
from neuraludf_tpu.train.step import build_train_window

cfg = config_mod.load("confs/synthetic_smoke.conf", case="sphere")
cfg = dataclasses.replace(cfg, dataset=dataclasses.replace(cfg.dataset, data_dir="data/bench/sphere"))
ds = Dataset(cfg.dataset)
renderer = UDFRenderer(cfg.model)
window = 50

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

# ---- unroll A/B through the production window ------------------------------
for unroll in (1, 2, 5):
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = init_adam_state(params)
    wstep = build_train_window(cfg, renderer, blending=False, window=window,
                               unroll=unroll)
    try:
        t0 = time.time()
        params, opt, mrows = wstep(params, opt, ds.scene, ds.ref_src_pairs,
                                   idxs, jax.random.PRNGKey(2), sr)
        _ = np.asarray(mrows)
        log(f"unroll={unroll} compile+first: {time.time()-t0:.1f}s "
            f"loss {float(np.asarray(mrows)[-1, 0]):.4f}")
        t0 = time.time()
        for i in range(4):
            params, opt, mrows = wstep(params, opt, ds.scene, ds.ref_src_pairs,
                                       idxs, jax.random.fold_in(jax.random.PRNGKey(3), i), sr)
            _ = np.asarray(mrows)
        log(f"stage1 windowed unroll={unroll}: "
            f"{1000*(time.time()-t0)/(4*window):.2f} ms/step")
    except Exception as e:
        log(f"unroll={unroll}: FAIL {type(e).__name__}: {str(e)[:200]}")

# ---- strip sampler at the blend_top_k=16 geometry ---------------------------
from neuraludf_tpu.ops.strip_sample import prepare_images, strip_sample
V, P = 8, 1024
H, W = 1200, 1600
kk = jax.random.PRNGKey(0)
imgs4 = prepare_images(jax.random.uniform(kk, (V, 3, H, W), jnp.float32))
kc, ko = jax.random.split(jax.random.fold_in(kk, 1))

def timeit(fn, *args, n=5):
    out = fn(*args); np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.time(); out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]); ts.append(time.time() - t0)
    return 1000 * min(ts)

for NW in (2048, 1024):  # top_k 32 vs 16 at 512 rays, chunk 8
    cx = jax.random.uniform(kc, (V, NW, 1), minval=0.0, maxval=W - 1.0)
    cy = jax.random.uniform(jax.random.fold_in(kc, 1), (V, NW, 1), minval=0.0, maxval=H - 1.0)
    gx = jnp.clip(cx + jax.random.uniform(ko, (V, NW, P), minval=-50.0, maxval=50.0), 0, W - 1.0)
    gy = jnp.clip(cy + jax.random.uniform(jax.random.fold_in(ko, 1), (V, NW, P), minval=-10.0, maxval=10.0), 0, H - 1.0)
    f = jax.jit(lambda i, x, y: strip_sample(i, x, y)[0].sum())
    try:
        log(f"strip NW={NW} (top_k={NW*8//512}): {timeit(f, imgs4, gx, gy):.1f} ms")
    except Exception as e:
        log(f"strip NW={NW}: FAIL {type(e).__name__}: {str(e)[:160]}")

log("SESSION3_DONE")
