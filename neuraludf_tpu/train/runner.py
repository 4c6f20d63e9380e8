"""Experiment runner: training loop, validation, checkpointing, mesh export.

Mirrors the reference Runner's behavior (ref: exp_runner_blending.py:32-916)
with a TPU-native split: the per-iteration hot path is one jitted XLA
program (see step.py); the host computes schedules, drives the state
machine for beta/variance trainability, logs, and periodically renders
validation images / extracts meshes.
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import Dataset, near_far_from_sphere
from ..nets import fields
from ..render.renderer import RenderOptions, UDFRenderer
from . import schedules as sched_mod
from .optim import init_adam_state
from .step import build_train_step

log = logging.getLogger(__name__)


def init_params(key: jax.Array, cfg: Config) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "udf": fields.init_distance_field(k1, cfg.model.udf_network),
        "color": fields.init_residual_color(k2, cfg.model.rendering_network),
        "nerf": fields.init_background_nerf(k3, cfg.model.nerf),
        "variance": fields.init_variance(cfg.model.variance_network),
        "beta": fields.init_beta(cfg.model.beta_network),
    }


class Runner:
    def __init__(
        self,
        cfg: Config,
        mode: str = "train",
        *,
        is_continue: bool = False,
        is_finetune: bool = False,
        reg_weights_schedule: bool = False,
        vis_ray: bool = False,
        seed: int = 0,
        dataset: Optional[Dataset] = None,
    ):
        # model_type switches the distance-field semantics (ref:
        # exp_runner_blending.py:105-107, :764-780): 'udf' (default) is the
        # unsigned field; 'neus' trains/extracts a signed (NeuS-style SDF)
        # field — the comparison mode of the paper's ablations. For 'neus'
        # the distance net becomes a signed head with inside_outside init
        # unless the conf already configured one.
        self.model_type = cfg.general.model_type
        if self.model_type == "neus" and cfg.model.udf_network.udf_type != "sdf":
            import dataclasses

            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model,
                    udf_network=dataclasses.replace(
                        cfg.model.udf_network, udf_type="sdf", inside_outside=True
                    ),
                ),
            )
            log.info("model_type=neus: distance field switched to signed "
                     "(udf_type='sdf', inside_outside init)")
        self.cfg = cfg
        self.mode = mode
        self.is_finetune = is_finetune
        self.reg_weights_schedule = reg_weights_schedule
        self.vis_ray = vis_ray

        self.base_exp_dir = os.path.join(cfg.general.base_exp_dir, cfg.general.expname)
        os.makedirs(self.base_exp_dir, exist_ok=True)

        self.dataset = dataset if dataset is not None else Dataset(cfg.dataset)
        self.renderer = UDFRenderer(cfg.model)

        self.iter_step = 0
        self.end_iter = cfg.train.end_iter

        key = jax.random.PRNGKey(seed)
        self.rng, init_key = jax.random.split(key)
        self.params = init_params(init_key, cfg)
        self.opt_state = init_adam_state(self.params)

        # runtime trainability state machine (ref: exp_runner:353-359)
        self.beta_trainable = cfg.model.beta_network.requires_grad_beta
        self.variance_trainable = (
            cfg.model.variance_network.requires_grad and not cfg.train.freeze_variance
        )
        self._beta_flag = True

        self._train_step = None
        self._step_blending = None
        self.writer = None

        if is_continue:
            latest = self._latest_checkpoint()
            if latest is not None:
                self.load_checkpoint(latest)

        if mode.startswith("train"):
            self.file_backup()

    def file_backup(self):
        """Snapshot source .py files + resolved config into the experiment dir
        (ref: exp_runner_blending.py:449-465)."""
        import shutil

        rec_dir = os.path.join(self.base_exp_dir, "recording")
        os.makedirs(rec_dir, exist_ok=True)
        for dir_name in self.cfg.general.recording:
            if not os.path.isdir(dir_name):
                continue
            # non-recursive, like the reference (one level per listed dir)
            cur = os.path.join(rec_dir, dir_name)
            os.makedirs(cur, exist_ok=True)
            for fname in os.listdir(dir_name):
                if fname.endswith(".py"):
                    try:
                        shutil.copyfile(os.path.join(dir_name, fname), os.path.join(cur, fname))
                    except OSError:
                        pass
        with open(os.path.join(rec_dir, "config.txt"), "w") as f:
            f.write(repr(self.cfg))

    # ------------------------------------------------------------------
    # checkpointing (ref: exp_runner_blending.py:467-498)
    # ------------------------------------------------------------------

    def _ckpt_dir(self) -> str:
        d = os.path.join(self.base_exp_dir, "checkpoints")
        os.makedirs(d, exist_ok=True)
        return d

    def _latest_checkpoint(self) -> Optional[str]:
        d = self._ckpt_dir()
        names = sorted(n for n in os.listdir(d) if n.endswith(".ckpt"))
        return os.path.join(d, names[-1]) if names else None

    def save_checkpoint(self):
        payload = {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "opt_state": jax.tree_util.tree_map(np.asarray, self.opt_state),
            "iter_step": self.iter_step,
            "beta_trainable": self.beta_trainable,
            "variance_trainable": self.variance_trainable,
            "rng": np.asarray(self.rng),  # bit-exact resume of the sampling stream
        }
        path = os.path.join(self._ckpt_dir(), f"ckpt_{self.iter_step:0>6d}.ckpt")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        log.info("saved checkpoint %s", path)

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        self.params = to_dev(payload["params"])
        self.opt_state = to_dev(payload["opt_state"])
        self.iter_step = int(payload["iter_step"])
        self.beta_trainable = bool(payload.get("beta_trainable", self.beta_trainable))
        self.variance_trainable = (
            bool(payload.get("variance_trainable", True))
            and not self.cfg.train.freeze_variance
        )
        if "rng" in payload:
            self.rng = jnp.asarray(payload["rng"])
        if self.is_finetune:  # finetune restarts the schedule clock (ref: :479-480)
            self.iter_step = 0
        log.info("loaded checkpoint %s (iter %d)", path, self.iter_step)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def _get_step_fn(self, blending: bool):
        if not hasattr(self, "_step_fns"):
            self._step_fns = {}
        if blending not in self._step_fns:
            self._step_fns[blending] = build_train_step(
                self.cfg, self.renderer, blending=blending
            )
        return self._step_fns[blending]

    def _get_window_fn(self, blending: bool, window: int):
        unroll = int(os.environ.get("NEURALUDF_SCAN_UNROLL", "0")) \
            or self.cfg.train.scan_unroll
        unroll = max(1, unroll)  # guard 0/negative before the divisor walk
        while window % unroll != 0:  # windows of 50/25/10/5 vs unroll 2/4
            unroll -= 1
        key = (blending, window, unroll)
        if not hasattr(self, "_window_fns"):
            self._window_fns = {}
        if key not in self._window_fns:
            from .step import build_train_window

            self._window_fns[key] = build_train_window(
                self.cfg, self.renderer, blending=blending, window=window,
                unroll=unroll,
            )
        return self._window_fns[key]

    def _window_size(self) -> int:
        """Largest dispatch window dividing every periodic frequency —
        host↔device round trips amortize over the window."""
        t = self.cfg.train
        import math

        g = math.gcd(
            math.gcd(t.report_freq, t.save_freq), math.gcd(t.val_freq, t.val_mesh_freq)
        )
        for k in (50, 40, 25, 20, 10, 8, 5, 4, 2, 1):
            if g % k == 0:
                return k
        return 1

    def _schedules(self) -> sched_mod.StepSchedules:
        return self._schedules_at(self.iter_step)

    def _schedules_at(self, step: int) -> sched_mod.StepSchedules:
        c = self.cfg.color_loss
        return sched_mod.compute_step_schedules(
            step,
            self.cfg.train,
            c.color_base_weight, c.color_weight, c.color_pixel_weight, c.color_patch_weight,
            is_finetune=self.is_finetune,
            reg_weights_schedule=self.reg_weights_schedule,
            same_lr=self.cfg.train.same_lr,
            beta_trainable=self.beta_trainable,
            variance_trainable=self.variance_trainable,
        )

    def train(self, report_hook=None):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(os.path.join(self.base_exp_dir, "logs"))
        tcfg = self.cfg.train
        n_img = self.dataset.n_images
        perm_rng = np.random.RandomState(0)
        image_perm = perm_rng.permutation(n_img)
        # resume: fast-forward the permutation stream so a save/load cycle
        # replays the same image order as an uninterrupted run
        for _ in range(self.iter_step // n_img):
            image_perm = perm_rng.permutation(n_img)

        # Host↔device round trips are high-latency on the TPU tunnel: the
        # loop dispatches `window` iterations per call (lax.scan inside one
        # jitted program; per-iter schedules go in as stacked arrays, all
        # metrics come back as one [window, M] transfer). The reference
        # dispatches per iteration from Python; the math is identical. The
        # beta/variance state machine is checked at window granularity (at
        # most `window` iters late — immaterial over a 300k-iter schedule).
        from .step import METRIC_KEYS

        window = self._window_size()
        res_step = self.end_iter - self.iter_step
        t_start = time.time()

        # liveness signal for wedged dispatches (see utils/watchdog.py)
        from ..utils.watchdog import StallWatchdog

        if getattr(self, "_watchdog", None) is not None:
            self._watchdog.stop()  # a crashed earlier train() left one behind
        watchdog = self._watchdog = StallWatchdog(
            tcfg.stall_warn_s, tag_fn=lambda: f"iter {self.iter_step}"
        ).start()

        def next_img_indices(k: int) -> np.ndarray:
            nonlocal image_perm
            out = np.empty((k,), np.int32)
            for j in range(k):
                step = self.iter_step + j
                out[j] = image_perm[step % n_img]
                if (step + 1) % n_img == 0:
                    image_perm = perm_rng.permutation(n_img)
            return out

        def window_schedules(k: int):
            rows = [
                dataclass_dict(self._schedules_at(self.iter_step + j)) for j in range(k)
            ]
            first_active = (
                rows[0]["color_pixel_weight"] > 0 or rows[0]["color_patch_weight"] > 0
            )
            last_active = (
                rows[-1]["color_pixel_weight"] > 0 or rows[-1]["color_patch_weight"] > 0
            )
            stacked = {
                key: np.asarray([r[key] for r in rows], np.float32) for key in rows[0]
            }
            return stacked, first_active, last_active

        dataclass_dict = lambda s: dict(s.__dict__)

        # Blending iterations run inside lax.scan windows by default (round 5):
        # the round-3 worker hard-crash that forced pipelined per-step
        # dispatch was SMEM exhaustion by the strip kernel's origin operands,
        # root-caused and fixed in round 4 (origin packing + NW segmenting),
        # and the on-chip probe (scripts/blend_scan_probe.py) measures scan
        # windows at 54.9 ms/step vs 100.2 pipelined at the production ft
        # shape. The pipelined path remains for boundary windows (blending
        # activates mid-window / tails) and as the NEURALUDF_BLEND_WINDOW=0
        # opt-out; it exploits JAX's async dispatch — all k steps enqueued
        # back-to-back, ONE stacked [k, M] metric transfer at the end.
        env_bw = os.environ.get("NEURALUDF_BLEND_WINDOW")
        blend_windows_ok = (
            env_bw == "1" if env_bw in ("0", "1")
            else self.cfg.train.blend_scan_window
        )

        done = 0
        while done < res_step:
            k = min(window, res_step - done)
            scheds, first_active, last_active = window_schedules(k)
            if (
                first_active != last_active or k != window
                or (first_active and not blend_windows_ok)
            ):
                # boundary (blending activates mid-window / tail), or
                # blending with scan windows disabled: pipelined
                # single-iteration dispatches, one metric flush per window
                pending = []
                for j in range(k):
                    s = self._schedules_at(self.iter_step)
                    active = s.color_pixel_weight > 0 or s.color_patch_weight > 0
                    step_fn = self._get_step_fn(active)
                    self.rng, sk = jax.random.split(self.rng)
                    self.params, self.opt_state, metrics = step_fn(
                        self.params, self.opt_state,
                        self.dataset.scene, self.dataset.ref_src_pairs,
                        jnp.asarray(next_img_indices(1)[0]), sk, dataclass_dict(s),
                    )
                    self.iter_step += 1
                    pending.append(jnp.stack([metrics[key] for key in METRIC_KEYS]))
                mat = np.asarray(jnp.stack(pending))  # one [k, M] transfer
                watchdog.beat()
                for j in range(k):
                    self._post_step_host(
                        self.iter_step - k + 1 + j,
                        dict(zip(METRIC_KEYS, mat[j].tolist())),
                        t_start, report_hook,
                    )
                self._periodic_actions()
                done += k
                continue

            window_fn = self._get_window_fn(first_active, k)
            img_idxs = next_img_indices(k)
            self.rng, base_key = jax.random.split(self.rng)
            self.params, self.opt_state, mrows = window_fn(
                self.params, self.opt_state,
                self.dataset.scene, self.dataset.ref_src_pairs,
                jnp.asarray(img_idxs), base_key, scheds,
            )
            self.iter_step += k
            done += k

            mat = np.asarray(mrows)  # one [window, M] transfer
            watchdog.beat()
            for j in range(k):
                m = dict(zip(METRIC_KEYS, mat[j].tolist()))
                self._post_step_host(self.iter_step - k + 1 + j, m, t_start, report_hook)
            self._periodic_actions()
        watchdog.stop()
        self._watchdog = None

    def _periodic_actions(self):
        """Fire periodic actions. Range-aware: called once per dispatch
        window, it triggers an action if ANY multiple of its frequency lies
        in (last_checked_iter, iter_step] — so deferred metric flushes can
        never skip past a save/validate boundary."""
        tcfg = self.cfg.train
        since = getattr(self, "_last_periodic_iter", self.iter_step - 1)
        self._last_periodic_iter = self.iter_step
        hit = lambda freq: freq > 0 and (self.iter_step // freq) > (since // freq)
        if hit(tcfg.save_freq):
            self.save_checkpoint()
        if self.vis_ray and hit(tcfg.val_mesh_freq * 2):
            # ray-statistics probes across the center column
            # (ref: exp_runner_blending.py:435-437)
            try:
                H, W = self.dataset.H, self.dataset.W
                idx = min(33, self.dataset.n_images - 1)
                for dy in range(-H // 4, H // 4, max(20, H // 8)):
                    self.visualize_one_ray(idx, W // 2, H // 2 + dy)
            except Exception as e:
                log.warning("vis_ray failed: %s", e)
        if hit(tcfg.val_freq):
            try:
                self.validate()
            except Exception as e:  # validation must not kill training
                log.warning("validate failed: %s", e)
        if hit(tcfg.val_mesh_freq):
            try:
                self.validate_mesh()
                self.extract_udf_mesh(world_space=True, dist_threshold_ratio=2.0)
            except Exception as e:
                log.warning("mesh extraction failed: %s", e)

    def _post_step_host(self, it: int, m: Dict[str, float], t_start: float, report_hook):
        """Host-side per-iter bookkeeping, applied at metric-flush time."""
        tcfg = self.cfg.train
        # failure detection: the reference pdb-traps on NaN
        # (ref: udf_renderer_blending.py:97-101); we save a crash checkpoint
        # and stop with a diagnosable error instead
        if not np.isfinite(m["loss"]):
            path = os.path.join(self._ckpt_dir(), f"crash_{it:0>6d}.ckpt")
            try:
                self.save_checkpoint()
            except Exception:
                pass
            raise FloatingPointError(
                f"non-finite loss at iter {it}: {m} — state saved near {path}"
            )
        # beta/variance trainability state machine (ref: exp_runner:353-359)
        if (
            m["variance"] < 2 * m["beta"]
            and m["variance"] < 0.01
            and self._beta_flag
            and self.variance_trainable
        ):
            log.info("make beta trainable (iter %d)", it)
            self.beta_trainable = True
            self._beta_flag = False
        if not self.variance_trainable and it > 20000 and not tcfg.freeze_variance:
            self.variance_trainable = True

        for k in ("loss", "mask_loss", "gradient_error", "variance", "beta", "psnr"):
            self.writer.add_scalar(
                f"Loss/{k}" if "loss" in k or "error" in k else f"Sta/{k}", m[k], it
            )

        if it % tcfg.report_freq == 0:
            elapsed = time.time() - t_start
            ips = it / max(elapsed, 1e-9)
            log.info(
                "iter %d loss=%.4f color=%.4f eik=%.4f psnr=%.2f var=%.5f beta=%.5f "
                "ws=%.3f udf_min=%.5f (%.1f it/s)",
                it, m["loss"], m["color_total_loss"], m["gradient_error"],
                m["psnr"], m["variance"], m["beta"], m["weight_sum"], m["udf_min"], ips,
            )
            if report_hook:
                report_hook(it, m)

    # ------------------------------------------------------------------
    # validation rendering (ref: exp_runner_blending.py:604-719)
    # ------------------------------------------------------------------

    def _render_chunk_fn(self, pixel_blending: bool = False):
        """Chunked validation renderer. The reference always feeds source
        views so validation images include the pixel-blended color
        (ref: exp_runner_blending.py:614, :630-636)."""
        opts = RenderOptions(
            perturb=self.cfg.model.udf_renderer.perturb > 0,
            compute_random_sparse=False,
            pixel_blending=pixel_blending,
        )

        @jax.jit
        def render_chunk(params, rays_o, rays_d, near, far, key, cos_anneal,
                         scene, ref_src_pairs, img_idx):
            blending = None
            if pixel_blending:
                from ..data.dataset import ref_src_info

                ref_c2w, src_c2ws, src_intr, src_images = ref_src_info(
                    scene, ref_src_pairs, img_idx
                )
                blending = {
                    "color_maps": src_images,
                    "w2cs": jnp.linalg.inv(src_c2ws),
                    "intrinsics": src_intr,
                    "query_c2w": ref_c2w,
                    "rays_uv": None,
                    "img_index": None,
                }
            return self.renderer.render(
                params, rays_o, rays_d, near, far, key=key,
                cos_anneal_ratio=cos_anneal, flip_saturation=1.0,
                background_rgb=jnp.ones((1, 3)) if self.cfg.train.use_white_bkgd else None,
                blending=blending, opts=opts,
            )

        return render_chunk

    def _render_val_window_fn(self, pixel_blending: bool, n_chunks: int):
        """Full-frame validation as ONE dispatch per `n_chunks` chunks: a
        lax.scan over the chunk renderer, with the per-pixel normal
        reduction done in-graph so only [C, bs, {3,3,3,1}] image rows cross
        the host boundary (the eager path hauled [bs, n_samples, 3]
        gradient tensors per chunk over the TPU tunnel)."""
        chunk = self._render_chunk_fn(pixel_blending)
        n_fg = self.renderer.n_fg_samples()

        @jax.jit
        def window(params, rays_o, rays_d, near, far, keys, cos_anneal,
                   scene, ref_src_pairs, img_idx):
            def body(_, xs):
                ro, rd, nr, fr, k = xs
                ret = chunk(params, ro, rd, nr, fr, k, cos_anneal,
                            scene, ref_src_pairs, img_idx)
                normal = jnp.sum(
                    ret["gradients_flip"]
                    * ret["weights"][:, :n_fg, None]
                    * ret["inside_sphere"][..., None],
                    axis=1,
                )
                color_pixel = (
                    ret["color_pixel"] if ret.get("color_pixel") is not None
                    else jnp.zeros_like(ret["color"])
                )
                return None, (ret["color"], color_pixel, normal, ret["depth"])

            _, outs = jax.lax.scan(body, None, (rays_o, rays_d, near, far, keys))
            return outs

        return window

    def validate(self, idx: int = -1, resolution_level: int = -1, only_color: bool = False):
        import cv2 as cv

        if idx < 0:
            idx = int(np.random.randint(self.dataset.n_images))
        if resolution_level < 0:
            resolution_level = self.cfg.train.validate_resolution_level

        rays_o, rays_d = self.dataset.gen_rays_at(idx, resolution_level)
        H, W, _ = rays_o.shape
        rays_o = np.asarray(rays_o).reshape(-1, 3)
        rays_d = np.asarray(rays_d).reshape(-1, 3)

        # the pixel-blended pass needs >= 2 views to warp from
        pixel_blending = self.dataset.n_images > 8

        # large chunks amortize dispatch latency, and a lax.scan window fuses
        # several chunks into one dispatch (one transfer per window instead
        # of four per chunk)
        bs = self.cfg.train.batch_size * 8
        n = rays_o.shape[0]
        n_chunks = min(8, -(-n // bs))
        if not hasattr(self, "_val_windows"):
            self._val_windows = {}
        wkey = (pixel_blending, n_chunks)
        if wkey not in self._val_windows:
            self._val_windows[wkey] = self._render_val_window_fn(pixel_blending, n_chunks)
        window_fn = self._val_windows[wkey]

        step_rays = bs * n_chunks
        pad = (-n) % step_rays
        rays_o_p = np.concatenate([rays_o, np.zeros((pad, 3), np.float32)])
        rays_d_p = np.concatenate([rays_d, np.ones((pad, 3), np.float32)])

        cos_anneal = sched_mod.cos_anneal_ratio(self.iter_step, self.cfg.train)
        out_rgb, out_rgb_pixel, out_normal, out_depth = [], [], [], []
        for i in range(0, n + pad, step_rays):
            ro = jnp.asarray(rays_o_p[i : i + step_rays]).reshape(n_chunks, bs, 3)
            rd = jnp.asarray(rays_d_p[i : i + step_rays]).reshape(n_chunks, bs, 3)
            near, far = near_far_from_sphere(ro, rd)
            self.rng, k = jax.random.split(self.rng)
            keys = jax.random.split(k, n_chunks)
            color, color_pixel, normal, depth = window_fn(
                self.params, ro, rd, near, far, keys, cos_anneal,
                self.dataset.scene, self.dataset.ref_src_pairs, jnp.asarray(idx),
            )
            out_rgb.append(np.asarray(color).reshape(-1, 3))
            if pixel_blending:
                out_rgb_pixel.append(np.asarray(color_pixel).reshape(-1, 3))
            out_normal.append(np.asarray(normal).reshape(-1, 3))
            out_depth.append(np.asarray(depth).reshape(-1))

        img_fine = (np.concatenate(out_rgb)[:n].reshape(H, W, 3) * 256).clip(0, 255)
        normal_img = np.concatenate(out_normal)[:n]
        rot = np.linalg.inv(np.asarray(self.dataset.scene["poses"][idx, :3, :3]))
        normal_img = (
            (rot[None] @ normal_img[:, :, None]).reshape(H, W, 3) * 128 + 128
        ).clip(0, 255)
        pred_depth = np.concatenate(out_depth)[:n].reshape(H, W)

        os.makedirs(os.path.join(self.base_exp_dir, "validations_fine"), exist_ok=True)
        os.makedirs(os.path.join(self.base_exp_dir, "normals"), exist_ok=True)
        os.makedirs(os.path.join(self.base_exp_dir, "depth"), exist_ok=True)

        if only_color:
            out = os.path.join(self.base_exp_dir, "novel_view")
            os.makedirs(out, exist_ok=True)
            cv.imwrite(os.path.join(out, f"pred_{idx}.png"), img_fine.astype(np.uint8))
            cv.imwrite(
                os.path.join(out, f"gt_{idx}.png"),
                self.dataset.image_at(idx, resolution_level),
            )
            return

        gt = self.dataset.image_at(idx, resolution_level)
        rgbs = [img_fine]
        if out_rgb_pixel:
            img_pixel = (np.concatenate(out_rgb_pixel)[:n].reshape(H, W, 3) * 256).clip(0, 255)
            rgbs.append(img_pixel)
        cv.imwrite(
            os.path.join(self.base_exp_dir, "validations_fine", f"{self.iter_step:0>8d}_{idx}.png"),
            np.concatenate(rgbs + [gt]).astype(np.uint8),
        )
        cv.imwrite(
            os.path.join(self.base_exp_dir, "normals", f"{self.iter_step:0>8d}_{idx}.png"),
            normal_img[:, :, ::-1].astype(np.uint8),
        )
        depth_vis = colorize_depth(pred_depth)
        cv.imwrite(
            os.path.join(self.base_exp_dir, "depth", f"{self.iter_step:0>8d}_{idx}.png"),
            depth_vis[:, :, ::-1],
        )

    def validate_novel_image(self, idx_0: int, idx_1: int, ratio: float, out_idx: int,
                             resolution_level: int = 4):
        """Novel-view synthesis between two poses (ref: exp_runner:721-744)."""
        import cv2 as cv

        rays_o, rays_d = self.dataset.gen_rays_between(idx_0, idx_1, ratio, resolution_level)
        H, W, _ = rays_o.shape
        rays_o = np.asarray(rays_o).reshape(-1, 3)
        rays_d = np.asarray(rays_d).reshape(-1, 3)
        if not hasattr(self, "_render_chunk_plain"):
            self._render_chunk_plain = self._render_chunk_fn(pixel_blending=False)
        bs = self.cfg.train.batch_size * 8
        n = rays_o.shape[0]
        pad = (-n) % bs
        rays_o = np.concatenate([rays_o, np.zeros((pad, 3), np.float32)])
        rays_d = np.concatenate([rays_d, np.ones((pad, 3), np.float32)])
        out_rgb = []
        for i in range(0, n + pad, bs):
            ro, rd = jnp.asarray(rays_o[i : i + bs]), jnp.asarray(rays_d[i : i + bs])
            near, far = near_far_from_sphere(ro, rd)
            self.rng, k = jax.random.split(self.rng)
            ret = self._render_chunk_plain(
                self.params, ro, rd, near, far, k, 1.0,
                self.dataset.scene, self.dataset.ref_src_pairs, jnp.asarray(idx_0),
            )
            out_rgb.append(np.asarray(ret["color"]))
        img = (np.concatenate(out_rgb)[:n].reshape(H, W, 3) * 256).clip(0, 255)
        out = os.path.join(self.base_exp_dir, "render")
        os.makedirs(out, exist_ok=True)
        cv.imwrite(os.path.join(out, f"{out_idx}.png"), img)

    # ------------------------------------------------------------------
    # mesh extraction (delegates to the mesh subsystem)
    # ------------------------------------------------------------------

    def validate_mesh(self, world_space: bool = True, resolution: int = 256, threshold: float = 0.005):
        """Vanilla marching cubes on the raw UDF grid (ref: exp_runner:746-761).

        model_type='neus': classic MC runs on the NEGATED signed field at
        level 0 (the NeuS extraction convention — inside positive after
        negation), instead of thresholding an unsigned field."""
        from ..mesh import grid as mesh_grid
        from ..mesh import mc as mesh_mc
        from ..mesh.ply import export_ply

        bound_min = np.asarray(self.dataset.object_bbox_min, np.float32)
        bound_max = np.asarray(self.dataset.object_bbox_max, np.float32)
        u = mesh_grid.extract_fields(
            self.params, self.cfg.model.udf_network, bound_min, bound_max, resolution
        )
        if self.model_type == "neus":
            u, threshold = -u, 0.0
        verts, faces = mesh_mc.marching_cubes_classic(u, threshold)
        verts = verts / (resolution - 1.0) * (bound_max - bound_min)[None] + bound_min[None]
        if world_space:
            sm = self.dataset.scale_mats_np[0]
            verts = verts * sm[0, 0] + sm[:3, 3][None]
        out = os.path.join(self.base_exp_dir, "meshes")
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, f"{self.iter_step:0>8d}_thresh{threshold:.4f}_res{resolution}.ply")
        export_ply(path, verts, faces)
        return path

    def extract_udf_mesh(self, world_space: bool = False, resolution: int = 256,
                         dist_threshold_ratio: float = 1.0,
                         algorithm: str = "tets"):
        """MeshUDF gradient-aware extraction (ref: exp_runner:763-800).

        cfg.train.incremental_mesh (or NEURALUDF_INCREMENTAL_MESH=1) enables
        the incremental grid re-query between periodic extractions (ref
        capability, extract_mesh.py:108-166: only voxels around the previous
        surface are re-evaluated). Off by default — matching the reference
        runner, which always refills."""
        from ..mesh.meshudf import get_mesh_udf

        cache = None
        if (
            self.cfg.train.incremental_mesh
            or os.environ.get("NEURALUDF_INCREMENTAL_MESH") == "1"
        ):
            if not hasattr(self, "_mesh_caches"):
                self._mesh_caches = {}
            cache = self._mesh_caches.setdefault(resolution, {})
        verts, faces = get_mesh_udf(
            self.params, self.cfg.model.udf_network, resolution=resolution,
            dist_threshold_ratio=dist_threshold_ratio, cache=cache,
            signed=self.model_type == "neus", algorithm=algorithm,
        )
        if world_space:
            sm = self.dataset.scale_mats_np[0]
            verts = verts * sm[0, 0] + sm[:3, 3][None]
        from ..mesh.ply import export_ply

        out = os.path.join(self.base_exp_dir, "udf_meshes")
        os.makedirs(out, exist_ok=True)
        suffix = "" if algorithm == "tets" else f"_{algorithm}"
        path = os.path.join(
            out, f"udf_res{resolution}_step{self.iter_step}{suffix}.ply"
        )
        export_ply(path, verts, faces)
        return path

    def validate_fields(self, resolution: int = 128):
        """Dump the UDF grid to .npy (ref: exp_runner:802-817)."""
        from ..mesh import grid as mesh_grid

        out = os.path.join(self.base_exp_dir, "fields")
        os.makedirs(out, exist_ok=True)
        bound_min = np.asarray(self.dataset.object_bbox_min, np.float32)
        bound_max = np.asarray(self.dataset.object_bbox_max, np.float32)
        u = mesh_grid.extract_fields(
            self.params, self.cfg.model.udf_network, bound_min, bound_max, resolution
        )
        path = os.path.join(out, f"{self.iter_step:0>8d}_dist.npy")
        np.save(path, u)
        return path

    def save_hdf5(self, resolution: int = 128):
        """Normalized hdf5 dump (ref: exp_runner:819-841)."""
        import h5py

        from ..mesh import grid as mesh_grid

        bound_min = np.asarray(self.dataset.object_bbox_min, np.float32)
        bound_max = np.asarray(self.dataset.object_bbox_max, np.float32)
        u = mesh_grid.extract_fields(
            self.params, self.cfg.model.udf_network, bound_min, bound_max, resolution + 1
        )
        out = os.path.join(self.base_exp_dir, "hdf5")
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, "out.hdf5")
        with h5py.File(path, "w") as f:
            g = resolution
            f.create_dataset(f"{g}_sdf", [g + 1, g + 1, g + 1], np.float32, compression=9)
            f[f"{g}_sdf"][:] = u / u.max() * 0.5
        return path

    # ------------------------------------------------------------------
    # ray statistics debugging (ref: exp_runner_blending.py:500-602)
    # ------------------------------------------------------------------

    def visualize_one_ray(self, img_idx: int, px: int, py: int):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        data = self.dataset.gen_one_ray_at(img_idx, px, py)
        rays_o, rays_d = data[:, :3], data[:, 3:6]
        near, far = near_far_from_sphere(rays_o, rays_d)
        if not hasattr(self, "_render_chunk_one"):
            opts = RenderOptions(perturb=False, compute_random_sparse=False)

            @jax.jit
            def one(params, ro, rd, nr, fr, key, ca, fs):
                return self.renderer.render(
                    params, ro, rd, nr, fr, key=key, cos_anneal_ratio=ca,
                    flip_saturation=fs, opts=opts,
                )

            self._render_chunk_one = one
        self.rng, k = jax.random.split(self.rng)
        ret = self._render_chunk_one(
            self.params, rays_o, rays_d, near, far, k,
            sched_mod.cos_anneal_ratio(self.iter_step, self.cfg.train),
            sched_mod.flip_saturation(self.iter_step, self.cfg.train, is_finetune=self.is_finetune),
        )
        z_vals = np.asarray(ret["mid_z_vals"][0]) - float(near[0, 0])
        n_fg = z_vals.shape[0]
        curves = {
            "udf values": np.asarray(ret["udf"][0]),
            "udf normal magnitude": np.asarray(ret["gradient_mag"][0]),
            "cos(ray, normal)": np.asarray(ret["true_cos"][0]),
            "weights": np.asarray(ret["weights"][0])[:n_fg],
            "alpha": np.asarray(ret["alpha"][0]),
            "vis_prob": np.asarray(ret["vis_prob"][0]),
            "alpha_plus": np.asarray(ret["alpha_plus"][0]),
            "alpha_minus": np.asarray(ret["alpha_minus"][0]),
            "alpha_occ": np.asarray(ret["alpha_occ"][0]),
            "raw_occ": np.asarray(ret["raw_occ"][0]),
        }
        fig, axs = plt.subplots(len(curves), 1, figsize=(10, 42))
        for ax, (name, ys) in zip(axs, curves.items()):
            ax.title.set_text(name)
            ax.plot(z_vals[: len(ys)], ys, marker="o")
        save_dir = os.path.join(self.base_exp_dir, "ray_statis", f"step{self.iter_step}")
        os.makedirs(save_dir, exist_ok=True)
        fig_path = os.path.join(save_dir, f"statis_px{px}_py{py}.png")
        plt.savefig(fig_path)
        plt.close(fig)
        np.save(
            os.path.join(save_dir, f"statis_px{px}_py{py}.npy"),
            {"z_vals": z_vals, "udf": curves["udf values"], "cos": curves["cos(ray, normal)"]},
        )
        return fig_path


def colorize_depth(value: np.ndarray, vmin=None, vmax=None, cmap="plasma") -> np.ndarray:
    """(ref: exp_runner_blending.py:847-865)"""
    import matplotlib

    vmin = value.min() if vmin is None else vmin
    vmax = value.max() if vmax is None else vmax
    value = (value - vmin) / (vmax - vmin) if vmin != vmax else value * 0.0
    cmapper = matplotlib.colormaps[cmap]
    return cmapper(value, bytes=True)[:, :, :3]
