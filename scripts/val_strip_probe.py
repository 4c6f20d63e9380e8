"""Round-4 probe for VERDICT r3 weak #4: run the REAL full-frame blending
validation program with the strip warp sampler (force_gather_warp
bypassed) on the actual chip, at the production image size (lobed,
1600x1200). If this passes, the round-3 axon compile-helper crash is no
longer reproducible and the workaround can be removed."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neuraludf_tpu.utils import setup_jax
setup_jax()
import jax, jax.numpy as jnp, numpy as np

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

t0 = time.time()
np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
log("chip alive after", f"{time.time()-t0:.0f}s")

import neuraludf_tpu.train.runner as runner_mod

_orig_ro = runner_mod.RenderOptions

def _patched_ro(**kw):
    kw["force_gather_warp"] = False
    return _orig_ro(**kw)

runner_mod.RenderOptions = _patched_ro

import dataclasses
from neuraludf_tpu import config as config_mod

cfg = config_mod.load("confs/synthetic_smoke.conf", case="lobed")
cfg = dataclasses.replace(
    cfg, general=dataclasses.replace(cfg.general, base_exp_dir="exp/val_strip_probe"))
r = runner_mod.Runner(cfg, seed=0)
for lvl in (4, 2):
    t0 = time.time()
    r.validate(idx=0, resolution_level=lvl)
    log(f"validate(resolution_level={lvl}) with STRIP warps: OK in {time.time()-t0:.0f}s")
log("PROBE_DONE")
