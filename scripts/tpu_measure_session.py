"""One TPU session: wait for chip health, then run all queued measurements
sequentially with incremental prints. Never killed externally — avoids
re-wedging the relay by killing in-flight dispatches."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neuraludf_tpu.utils import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

# ---- 1. chip health (blocks until the relay serves again) ----------------
t0 = time.time()
x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
log("chip alive:", float(np.asarray(x)[0, 0]), f"after {time.time()-t0:.0f}s")

from neuraludf_tpu import config as config_mod
from neuraludf_tpu.config import ColorLossConfig
from neuraludf_tpu.data.dataset import Dataset
from neuraludf_tpu.render.renderer import UDFRenderer
from neuraludf_tpu.train.optim import init_adam_state
from neuraludf_tpu.train.runner import init_params
from neuraludf_tpu.train.schedules import compute_step_schedules
from neuraludf_tpu.train.step import build_train_step

# ---- 2. stage-1 single-step timing + trace -------------------------------
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
log(f"stage1 pipelined: {1000*(time.time()-t0)/30:.2f} ms/step")
import shutil
shutil.rmtree("/tmp/trace_s1", ignore_errors=True)
with jax.profiler.trace("/tmp/trace_s1", create_perfetto_link=False):
    for i in range(5):
        key = jax.random.fold_in(key, 200 + i)
        params, opt, m = step(params, opt, ds.scene, ds.ref_src_pairs, jnp.asarray(0), key, sched)
    _ = np.asarray(m["loss"])
log("stage1 TRACE_DONE -> /tmp/trace_s1")

# ---- 2b. stage-1 remat A/B (HBM activation spills vs recompute) ----------
for remat in ("color", "bg", "color+bg"):
    c = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, udf_renderer=dataclasses.replace(
            cfg.model.udf_renderer, remat=remat)))
    st = build_train_step(c, UDFRenderer(c.model), blending=False)
    p = init_params(jax.random.PRNGKey(0), c)
    o = init_adam_state(p)
    k = jax.random.PRNGKey(1)
    p, o, mm = st(p, o, ds.scene, ds.ref_src_pairs, jnp.asarray(0), k, sched)
    _ = np.asarray(mm["loss"])
    for i in range(10):
        k = jax.random.fold_in(k, i)
        p, o, mm = st(p, o, ds.scene, ds.ref_src_pairs, jnp.asarray(0), k, sched)
    _ = np.asarray(mm["loss"])
    t0 = time.time()
    for i in range(30):
        k = jax.random.fold_in(k, 100 + i)
        p, o, mm = st(p, o, ds.scene, ds.ref_src_pairs, jnp.asarray(0), k, sched)
    _ = np.asarray(mm["loss"])
    log(f"stage1 remat={remat}: {1000*(time.time()-t0)/30:.2f} ms/step, "
        f"loss={float(np.asarray(mm['loss'])):.4f}")

# ---- 2c. fused-kernel block-size sweep (fwd_block, bwd_block) ------------
from neuraludf_tpu.ops.fused_distance import (
    distance_value_feat_grad_fused, effective_weights,
)

ucfg = cfg.model.udf_network
fparams = init_params(jax.random.PRNGKey(0), cfg)["udf"]
xpts = jax.random.uniform(jax.random.PRNGKey(7), (58368, 3), jnp.float32,
                          minval=-0.6, maxval=0.6)

def loss_of(fwd_b, bwd_b):
    def f(p, x):
        u, ft, gr = distance_value_feat_grad_fused(
            p, x, ucfg, fwd_block=fwd_b, bwd_block=bwd_b)
        return jnp.sum(u) + jnp.sum(ft * 1e-3) + jnp.sum(gr ** 2)
    return jax.jit(jax.grad(f))

for fb, bb in ((256, 128), (512, 128), (512, 256), (1024, 256), (256, 256)):
    try:
        g = loss_of(fb, bb)
        _ = np.asarray(jax.tree_util.tree_leaves(g(fparams, xpts))[0])
        t0 = time.time()
        for _ in range(10):
            out = g(fparams, xpts)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        log(f"fused blocks fwd={fb} bwd={bb}: {1000*(time.time()-t0)/10:.2f} ms/fwd+bwd")
    except Exception as e:
        log(f"fused blocks fwd={fb} bwd={bb}: FAIL {type(e).__name__}: {str(e)[:120]}")

# ---- 3. ft (blending) step: default + geometry sweep ---------------------
# The lobed scene may still be generating in a parallel CPU process
# (cameras.npz is written last, so it doubles as the completion marker).
while not os.path.exists("data/synthetic/lobed/cameras.npz"):
    log("waiting for data/synthetic/lobed generation ...")
    time.sleep(30)
ftcfg = config_mod.load("confs/synthetic_smoke.conf", case="lobed")
ftcfg = dataclasses.replace(
    ftcfg,
    train=dataclasses.replace(ftcfg.train, batch_size=512),
    color_loss=ColorLossConfig(
        color_base_weight=0.01, color_weight=1.0,
        color_pixel_weight=0.1, color_patch_weight=0.1,
        pixel_loss_type="l1", patch_loss_type="ssim", h_patch_size=5),
)
fds = Dataset(ftcfg.dataset)
fs = compute_step_schedules(100, ftcfg.train, 0.01, 1.0, 0.1, 0.1,
    is_finetune=True, reg_weights_schedule=True, same_lr=False,
    beta_trainable=True, variance_trainable=True)
fsched = dict(fs.__dict__)

def ft_latency(tag, **rc_over):
    c = dataclasses.replace(
        ftcfg,
        model=dataclasses.replace(
            ftcfg.model,
            udf_renderer=dataclasses.replace(
                ftcfg.model.udf_renderer, h_patch_size=5, **rc_over)),
    )
    r = UDFRenderer(c.model)
    st = build_train_step(c, r, blending=True)
    p = init_params(jax.random.PRNGKey(0), c)
    o = init_adam_state(p)
    k = jax.random.PRNGKey(2)
    t0 = time.time()
    p, o, mm = st(p, o, fds.scene, fds.ref_src_pairs, jnp.asarray(0), k, fsched)
    _ = np.asarray(mm["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(20):
        k = jax.random.fold_in(k, i)
        p, o, mm = st(p, o, fds.scene, fds.ref_src_pairs, jnp.asarray(0), k, fsched)
    _ = np.asarray(mm["loss"])
    log(f"ft[{tag}] pipelined: {1000*(time.time()-t0)/20:.1f} ms/step, "
        f"cover={float(np.asarray(mm['blend_strip_cover'])):.4f}, "
        f"loss={float(np.asarray(mm['loss'])):.4f}, compile={compile_s:.0f}s")

ft_latency("default sh=64 c=8")
ft_latency("sh=32", strip_height=32)
ft_latency("chunk=16", blend_chunk=16)
ft_latency("sh=32 chunk=16", strip_height=32, blend_chunk=16)

# ---- 4. strip kernel microbench incl. NEW fused_dot variant (last) -------
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

for sh, wb, fd in ((64, 8, False), (64, 16, False), (32, 8, False),
                   (64, 8, True), (32, 8, True), (32, 16, True)):
    f = jax.jit(lambda i, x, y, s=sh, b=wb, d=fd:
                strip_sample(i, x, y, sh=s, wb=b, fused_dot=d)[0].sum())
    try:
        log(f"strip sh={sh} wb={wb} fused={int(fd)}: {timeit(f, imgs4, gx, gy):.1f} ms")
    except Exception as e:
        log(f"strip sh={sh} wb={wb} fused={int(fd)}: FAIL {type(e).__name__}: {str(e)[:160]}")

log("SESSION_DONE")
