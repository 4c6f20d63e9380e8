"""Minimal repro for the strip-kernel-inside-lax.scan compile crash
(VERDICT r3 weak #4 / next #5).

Round-3 observation: the blending VALIDATION program — a chunked lax.scan
over a full 1200x1664 frame whose body calls ops/strip_sample.py — crashes
the axon compile helper, so validation renders force the gather path
(render/renderer.py RenderOptions.force_gather_warp). This script isolates
the failing shape: a lax.scan whose body strip-samples a large prepared
image operand, at several image sizes and with the kernel in/out of scan.

Run on the real chip AFTER any other TPU session finishes (single-tenant).
Each case compiles in a SUBPROCESS so a helper crash is contained and
reported instead of killing the sweep.
"""

import json
import os
import subprocess
import sys

CASES = [
    # (tag, H, W, in_scan, chunks)
    ("small_in_scan", 256, 384, True, 4),
    ("mid_in_scan", 608, 832, True, 4),
    ("full_in_scan", 1200, 1664, True, 4),
    ("full_no_scan", 1200, 1664, False, 4),
    ("full_in_scan_1chunk", 1200, 1664, True, 1),
]


def child(tag, h, w, in_scan, chunks):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuraludf_tpu.ops.strip_sample import prepare_images, strip_sample

    V, NW, P = 8, 512, 128
    imgs4 = prepare_images(jnp.zeros((V, 3, h, w), jnp.float32))

    def body(carry, xs):
        gx, gy = xs
        colors, ok = strip_sample(imgs4, gx, gy)
        return carry + jnp.sum(colors * ok[:, :, None, :]), None

    k = jax.random.PRNGKey(0)
    gx = jax.random.uniform(k, (chunks, V, NW, P), minval=0.0, maxval=w - 1.0)
    gy = jax.random.uniform(jax.random.fold_in(k, 1), (chunks, V, NW, P),
                            minval=0.0, maxval=h - 1.0)

    if in_scan:
        fn = jax.jit(lambda x, y: jax.lax.scan(body, jnp.zeros(()), (x, y))[0])
        out = fn(gx, gy)
    else:
        fn = jax.jit(lambda x, y: body(jnp.zeros(()), (x, y))[0])
        out = fn(gx[0], gy[0])
    print("RESULT", tag, float(np.asarray(out)))


def main():
    results = {}
    for tag, h, w, in_scan, chunks in CASES:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", tag,
             str(h), str(w), str(int(in_scan)), str(chunks)],
            capture_output=True, text=True, timeout=900,
        )
        ok = p.returncode == 0 and "RESULT" in p.stdout
        results[tag] = {
            "ok": ok,
            "rc": p.returncode,
            "tail": (p.stdout + p.stderr)[-400:] if not ok else "",
        }
        print(f"[{tag}] {'OK' if ok else 'FAIL rc=' + str(p.returncode)}", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
              bool(int(sys.argv[5])), int(sys.argv[6]))
    else:
        main()
