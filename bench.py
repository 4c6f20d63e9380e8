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


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

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
    step = build_train_window(cfg, renderer, blending=False, window=window)

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

    m = run_one(0)  # compile + warm
    np.asarray(m)  # force a real device->host transfer: on the axon relay
    # backend block_until_ready returns before execution completes

    n_windows = max(1, ITERS // window) * 2
    t0 = time.time()
    for i in range(1, 1 + n_windows):
        m = run_one(i)
        np.asarray(m)
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
    """Run the measurement in a child process with a timeout and retries.

    The axon relay occasionally hangs a dispatch indefinitely (see
    .claude/skills/verify/SKILL.md "Wedged chip"); a flaky hang would
    otherwise turn a healthy 18 ms/step chip into a no-result bench run.
    The child is this same file with NEURALUDF_BENCH_INNER=1.
    """
    import subprocess

    env = dict(os.environ, NEURALUDF_BENCH_INNER="1")
    timeout_s = float(os.environ.get("NEURALUDF_BENCH_TIMEOUT", "480"))
    last = None
    for attempt in range(3):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=timeout_s, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"bench attempt {attempt + 1}: timed out after "
                  f"{timeout_s:.0f}s (relay hang) — retrying", file=sys.stderr)
            time.sleep(30)
            continue
        sys.stderr.write(proc.stderr)
        last = proc
        if proc.returncode == 0 and proc.stdout.strip():
            sys.stdout.write(proc.stdout)
            return 0
        print(f"bench attempt {attempt + 1}: rc={proc.returncode} — retrying",
              file=sys.stderr)
        time.sleep(30)
    if last is not None:
        sys.stdout.write(last.stdout)
        return last.returncode or 1
    return 1


if __name__ == "__main__":
    if os.environ.get("NEURALUDF_BENCH_INNER") == "1":
        main()
    else:
        sys.exit(_watchdog())
