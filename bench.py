"""Benchmark: full DTU-config training-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

PRIMARY numbers are absolute: ms/step and rays/s/chip on the flagship DTU
configuration (512 rays/iter, 64+50 samples, 32 background samples, eikonal
double backprop, Adam) over a synthetic sphere scene. Both are included in
the JSON line ("value" = rays/s, "step_ms" = absolute step time) and echoed
to stderr.

vs_baseline is SECONDARY: the reference publishes no throughput numbers
(SURVEY.md §6), so it is computed against an *estimated* 2,560 rays/s for
the reference PyTorch repo on one GPU. Derivation and error bars are in
BASELINE.md §"Throughput baseline (estimated)"; the multiplier carries
roughly ±2x uncertainty and should be read as an order-of-magnitude check,
not a measurement.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 2560.0  # estimated; see module docstring

WARMUP = 5
ITERS = 30


def _milestone(msg):
    """Stderr progress line; the watchdog treats these as liveness."""
    print(f"bench[{time.strftime('%H:%M:%S')}]: {msg}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    # Tiny health op first: if the relay is wedged (verify skill, "Wedged
    # chip"), we block HERE — visibly, before any compile — and this very
    # blocked op is what eventually drains the wedge.
    t0 = time.time()
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    _milestone(f"chip health ok ({time.time() - t0:.0f}s)")

    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.data.dataset import Dataset
    from neuraludf_tpu.data.synthetic import generate_scene
    from neuraludf_tpu.render.renderer import UDFRenderer
    from neuraludf_tpu.train.optim import init_adam_state
    from neuraludf_tpu.train.runner import init_params
    from neuraludf_tpu.train.schedules import compute_step_schedules
    scene_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bench", "sphere")
    if not os.path.exists(os.path.join(scene_dir, "cameras.npz")):
        generate_scene(scene_dir, kind="sphere", n_views=16, H=600, W=800, focal=900.0)

    cfg = config_mod.load(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "confs", "synthetic_smoke.conf"),
        case="sphere",
    )
    # flagship shapes: DTU stage-1 (512 rays, 64+50+32 samples) — already in conf
    import dataclasses

    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, data_dir=scene_dir)
    )

    from neuraludf_tpu.train.step import build_train_window

    dataset = Dataset(cfg.dataset)
    renderer = UDFRenderer(cfg.model)
    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt_state = init_adam_state(params)

    # measure the real training path: `window` iterations per dispatch
    window = 50
    # honor the production unroll resolution (env NEURALUDF_SCAN_UNROLL
    # takes priority over cfg.train.scan_unroll, mirroring
    # Runner._get_window_fn) so bench measures the same program the
    # Runner dispatches
    unroll = int(os.environ.get("NEURALUDF_SCAN_UNROLL", "0")) \
        or cfg.train.scan_unroll
    unroll = max(1, unroll)
    while window % unroll != 0:
        unroll -= 1
    step = build_train_window(
        cfg, renderer, blending=False, window=window, unroll=unroll
    )

    def sched_rows(start):
        rows = []
        for j in range(window):
            s = compute_step_schedules(
                start + j, cfg.train,
                cfg.color_loss.color_base_weight, cfg.color_loss.color_weight,
                cfg.color_loss.color_pixel_weight, cfg.color_loss.color_patch_weight,
                is_finetune=False, reg_weights_schedule=False, same_lr=False,
                beta_trainable=True, variance_trainable=True,
            )
            rows.append(dict(s.__dict__))
        return {k: np.asarray([r[k] for r in rows], np.float32) for k in rows[0]}

    def run_one(i):
        nonlocal params, opt_state
        idxs = jnp.asarray(
            np.arange(i * window, (i + 1) * window) % dataset.n_images, jnp.int32
        )
        params, opt_state, mrows = step(
            params, opt_state, dataset.scene, dataset.ref_src_pairs,
            idxs, jax.random.PRNGKey(i), sched_rows(1000 + i * window),
        )
        return mrows

    t0 = time.time()
    m = run_one(0)  # compile + warm
    np.asarray(m)  # force a real device->host transfer: on the axon relay
    # backend block_until_ready returns before execution completes
    _milestone(f"compiled + warm ({time.time() - t0:.0f}s)")

    n_windows = max(1, ITERS // window) * 2
    t0 = time.time()
    for i in range(1, 1 + n_windows):
        m = run_one(i)
        np.asarray(m)
        _milestone(
            f"window {i}/{n_windows}: "
            f"{1e3 * (time.time() - t0) / (i * window):.2f} ms/step running avg"
        )
    dt = (time.time() - t0) / (n_windows * window)

    prof_dir = os.environ.get("NEURALUDF_BENCH_PROFILE", "")
    if prof_dir:
        from neuraludf_tpu.utils.jax_setup import trace

        with trace(prof_dir):
            np.asarray(run_one(n_windows + 1))
        print(f"profiler trace written to {prof_dir}", file=sys.stderr)

    rays_per_sec = cfg.train.batch_size / dt
    step_ms = dt * 1e3
    print(
        f"absolute: {step_ms:.2f} ms/step, {rays_per_sec:,.1f} rays/s/chip "
        f"(DTU config, 512 rays/iter; vs_baseline uses the ESTIMATED "
        f"{REFERENCE_RAYS_PER_SEC:.0f} rays/s reference figure, see BASELINE.md)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip_dtu512",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "step_ms": round(step_ms, 2),
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
            }
        )
    )


def _watchdog() -> int:
    """Run the measurement in ONE monitored child process — never killed.

    Round-3 lesson (.claude/skills/verify/SKILL.md "Wedged chip"): killing a
    TPU process mid-dispatch WEDGES the remote worker for 20-40 min, and a
    kill+retry loop re-poisons it on every attempt (that is exactly how the
    round-3 bench recorded 3x480 s timeouts on a healthy build). So:

      - the child prints a liveness milestone before/after every phase;
      - the watchdog only declares a hang when NO new output has appeared
        for NEURALUDF_BENCH_STALL seconds (default 900 — a wedged relay
        recovers spontaneously in ~20-40 min, and the child's own blocked
        health op is what drains it);
      - on a hang the child is LEFT RUNNING (detached): it finishes the
        drain so the *next* bench run finds a healthy chip. We echo all
        partial output and exit 1.
    """
    import subprocess
    import tempfile

    env = dict(os.environ, NEURALUDF_BENCH_INNER="1")
    stall_s = float(os.environ.get("NEURALUDF_BENCH_STALL", "900"))
    out_f = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".bench.out", delete=False)
    err_f = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".bench.err", delete=False)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=out_f, stderr=err_f, text=True,
    )
    last_size = -1
    last_activity = time.time()
    while True:
        rc = proc.poll()
        size = os.path.getsize(err_f.name) + os.path.getsize(out_f.name)
        if size != last_size:
            last_size = size
            last_activity = time.time()
        if rc is not None:
            break
        if time.time() - last_activity > stall_s:
            sys.stderr.write(open(err_f.name).read())
            print(
                f"bench: no output for {stall_s:.0f}s — relay hang. Leaving "
                f"the measurement process (pid {proc.pid}) running to drain "
                f"the wedge; re-run bench.py once it exits.", file=sys.stderr)
            sys.stdout.write(open(out_f.name).read())
            return 1
        time.sleep(5)
    sys.stderr.write(open(err_f.name).read())
    sys.stdout.write(open(out_f.name).read())
    return rc


if __name__ == "__main__":
    if os.environ.get("NEURALUDF_BENCH_INNER") == "1":
        main()
    else:
        sys.exit(_watchdog())
