"""Attribute the 7 s blending-step cost: time the pieces in isolation on
the TPU — pixel warp, patch warp fwd, patch warp fwd+bwd, raw bilinear
gather at the production shape, and reduced-sample variants."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=3):
    import numpy as np

    out = fn(*args)
    _ = np.asarray(jax_leaf(out))  # force
    ts = []
    for _i in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax_leaf(out))
        ts.append(time.time() - t0)
    return 1000 * min(ts)


def jax_leaf(x):
    import jax

    return jax.tree_util.tree_leaves(x)[0]


def main():
    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuraludf_tpu.ops.interp import grid_sample_2d_xy
    from neuraludf_tpu.render.projector import PatchProjector

    V, B, S, HP = 8, 512, 114, 5
    NPX = (2 * HP + 1) ** 2
    H, W = 1200, 1600
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (V, 3, H, W), jnp.float32)
    proj = PatchProjector(HP)

    # ---- raw bilinear gather at production shape --------------------------
    gx = jax.random.uniform(key, (V, B, S, NPX), minval=-1, maxval=1)
    gy = jax.random.uniform(jax.random.fold_in(key, 1), (V, B, S, NPX), minval=-1, maxval=1)

    @jax.jit
    def raw_gather(imgs, gx, gy):
        return jax.vmap(lambda im, x, y: grid_sample_2d_xy(im, x, y, channels_last=False))(imgs, gx, gy).sum()

    print("raw gather [V,B,S,Npx]=%s: %.0f ms" % ((V, B, S, NPX), timeit(raw_gather, imgs, gx, gy)), flush=True)

    # reduced sample count
    for s_red in (16, 4, 1):
        gxs, gys = gx[:, :, :s_red], gy[:, :, :s_red]
        print("raw gather S=%d: %.0f ms" % (s_red, timeit(raw_gather, imgs, gxs, gys)), flush=True)

    # ---- full patch warp fwd ---------------------------------------------
    pts = jax.random.uniform(key, (B, S, 3), minval=-0.5, maxval=0.5)
    normals = jax.random.normal(key, (B, S, 3))
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    uv = jax.random.uniform(key, (B, 2), minval=-0.9, maxval=0.9)
    intr = jnp.eye(4)[None].repeat(V, 0) * 1.0
    intr = intr.at[:, 0, 0].set(2000.0).at[:, 1, 1].set(2000.0).at[:, 0, 2].set(W / 2).at[:, 1, 2].set(H / 2).at[:, 2, 2].set(1.0).at[:, 3, 3].set(1.0)
    c2ws = jnp.eye(4)[None].repeat(V, 0).at[:, 2, 3].set(-2.5)

    @jax.jit
    def warp_fwd(pts, normals, imgs):
        colors, mask = proj.patch_warp(pts, uv, normals, imgs, intr[0], intr, c2ws[0], c2ws, detach_normal=True)
        return colors.sum()

    print("patch_warp fwd: %.0f ms" % timeit(warp_fwd, pts, normals, imgs), flush=True)

    # ---- patch warp + vjp wrt pts (the train step differentiates the step;
    # pts/normals are functions of params via z-vals? check cost anyway)
    @jax.jit
    def warp_grad(pts, normals, imgs):
        return jax.grad(lambda p: warp_fwd_raw(p, normals, imgs))(pts).sum()

    def warp_fwd_raw(pts, normals, imgs):
        colors, mask = proj.patch_warp(pts, uv, normals, imgs, intr[0], intr, c2ws[0], c2ws, detach_normal=True)
        return colors.sum()

    print("patch_warp fwd+bwd(pts): %.0f ms" % timeit(warp_grad, pts, normals, imgs), flush=True)

    # ---- pixel warp for scale --------------------------------------------
    @jax.jit
    def pixel_fwd(pts, imgs):
        colors, mask = proj.pixel_warp(pts, imgs, intr, jnp.linalg.inv(c2ws))
        return colors.sum()

    print("pixel_warp fwd: %.0f ms" % timeit(pixel_fwd, pts, imgs), flush=True)


if __name__ == "__main__":
    main()
