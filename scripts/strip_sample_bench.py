"""Validate + time ops/strip_sample at the production blending shape.

Production ft shape with blend_top_k=32, chunk C=8: V=8 views,
NW = 512 rays * 4 chunks = 2048 strips/view, P = 8*128 = 1024 positions
per strip (121 patch px + 1 pixel + 6 pad per sample).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuraludf_tpu.ops.strip_sample import (
        prepare_images, strip_sample, strip_sample_reference,
    )

    V, NW, P = 8, 2048, 1024
    H, W = 1200, 1600
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (V, 3, H, W), jnp.float32)
    imgs4 = prepare_images(imgs)

    # clustered positions: strip center + <=40x100 px spread
    kc, ko = jax.random.split(jax.random.fold_in(key, 1))
    cx = jax.random.uniform(kc, (V, NW, 1), minval=0.0, maxval=W - 1.0)
    cy = jax.random.uniform(jax.random.fold_in(kc, 1), (V, NW, 1), minval=0.0, maxval=H - 1.0)
    ox = jax.random.uniform(ko, (V, NW, P), minval=-50.0, maxval=50.0)
    oy = jax.random.uniform(jax.random.fold_in(ko, 1), (V, NW, P), minval=-20.0, maxval=20.0)
    gx = jnp.clip(cx + ox, 0, W - 1.0)
    gy = jnp.clip(cy + oy, 0, H - 1.0)

    # ---- correctness on a slice ------------------------------------------
    sl = 64
    ref_colors, _ = jax.jit(strip_sample_reference)(imgs4, gx[:, :sl], gy[:, :sl])
    out, in_strip = jax.jit(strip_sample)(imgs4, gx[:, :sl], gy[:, :sl])
    m = np.broadcast_to(np.asarray(in_strip)[:, :, None, :], out.shape)
    d = np.abs(np.asarray(out) - np.asarray(ref_colors))[m]
    print(f"in_strip {np.asarray(in_strip).mean():.4f}, max|d| {d.max():.5f}, "
          f"mean|d| {d.mean():.6f}", flush=True)

    # ---- timing at full shape --------------------------------------------
    def timeit(fn, *args, n=5):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(n):
            t0 = time.time()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.time() - t0)
        return 1000 * min(ts)

    for sh, wb, fd in ((64, 8, False), (64, 8, True), (64, 16, False),
                       (32, 8, False), (32, 8, True), (32, 16, True)):
        f = jax.jit(lambda i, x, y, s=sh, b=wb, d=fd:
                    strip_sample(i, x, y, sh=s, wb=b, fused_dot=d)[0].sum())
        try:
            t = timeit(f, imgs4, gx, gy)
            print(f"sh={sh} wb={wb} fused={int(fd)}: {t:.1f} ms", flush=True)
        except Exception as e:
            print(f"sh={sh} wb={wb} fused={int(fd)}: FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # include image prep cost
    f = jax.jit(lambda i, x, y: strip_sample(prepare_images(i), x, y)[0].sum())
    print(f"incl. prepare_images: {timeit(f, imgs, gx, gy):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
