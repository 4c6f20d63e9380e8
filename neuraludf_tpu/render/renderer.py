"""The UDF volume renderer — occlusion-aware unsigned-distance rendering.

TPU-native redesign of the reference core (ref:
models/udf_renderer_blending.py:107-721). One pure function per stage,
all static shapes, single differentiable graph per configuration; the
runner jits `render` once per (config, blending-mode) pair.

Key algorithm (NeuralUDF, CVPR 2023):
  * occlusion density `alpha_occ` from a logistic PDF in the UDF,
  * a visibility probability `vis_prob` = cumprod(1 - alpha_occ + boost)
    estimating "the first surface has not been crossed yet",
  * section alpha = alpha_plus * vis_prob + alpha_minus * (1 - vis_prob),
    i.e. the UDF is treated as +SDF before the first crossing and -SDF
    after it,
  * standard transmittance compositing over (fg samples ++ background
    NeRF++ samples).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..nets import fields
from .alpha import sdf2alpha, transmittance_weights, udf2logistic
from .sampling import (
    _dists_with_tail,
    _ray_points,
    importance_sample_classical,
    importance_sample_mix,
    mix_total_samples,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class RenderOptions:
    """Trace-time (static) rendering switches."""
    perturb: bool = True
    pixel_blending: bool = False
    patch_blending: bool = False
    compute_random_sparse: bool = True
    # Escape hatch to the XLA gather warp path (config: warp_sampler=
    # 'gather' does it globally). Round 3 forced this for full-frame
    # validation renders after an apparent compile-helper crash; round 4
    # root-caused that to SMEM exhaustion from the strip kernel's origin
    # operands at validation NW (fixed in ops/strip_sample.py by packing
    # the origins + segmenting), so validation now uses the strip path.
    force_gather_warp: bool = False


class UDFRenderer:
    """Holds static configuration; all methods are pure in (params, inputs)."""

    def __init__(self, model_cfg: ModelConfig):
        self.cfg = model_cfg
        self.rcfg = model_cfg.udf_renderer
        from .projector import PatchProjector  # local import to avoid cycles

        self.projector = PatchProjector(self.rcfg.h_patch_size)

        # optional remat of the MLP applies: trade recompute FLOPs for the
        # [BN,256] activation spills the profiler shows dominating HBM
        # traffic (see config.UDFRendererConfig.remat)
        import os

        tags = set(
            os.environ.get("NEURALUDF_REMAT", self.rcfg.remat).split("+")
        ) - {"", "none"}
        assert tags <= {"color", "bg"}, tags
        self._color_apply = (
            jax.checkpoint(fields.residual_color_apply, static_argnums=(5,))
            if "color" in tags else fields.residual_color_apply
        )
        self._bg_apply = (
            jax.checkpoint(fields.background_nerf_apply, static_argnums=(3,))
            if "bg" in tags else fields.background_nerf_apply
        )

    # -- helpers ------------------------------------------------------------

    def udf_fn(self, params: Params):
        """Sampling-tier distance queries (no-grad upsampling rounds).

        Stays on plain XLA: a VMEM-resident Pallas kernel was measured
        SLOWER than XLA's emitter for the value-only pass (3.5 vs 2.5 ms at
        58k points, bf16 tier) — without the nested-AD activation traffic
        there is nothing for kernel fusion to save (cf. ops/fused_distance
        for the gradient path, where fusion wins 2x)."""
        ucfg = self.cfg.udf_network
        return lambda pts: fields.distance_value(params["udf"], pts, ucfg, role="sampling")[:, 0]

    def n_fg_samples(self) -> int:
        r = self.rcfg
        if r.n_importance <= 0:
            return r.n_samples
        if r.upsampling_type == "classical":
            return r.n_samples + (r.n_importance // r.up_sample_steps) * r.up_sample_steps
        return mix_total_samples(r.n_samples, r.n_importance, r.up_sample_steps)

    # -- blending warp sampler dispatch --------------------------------------

    def _strip_active(self, blending) -> bool:
        """Whether the blending warps run through the Pallas strip sampler
        (ops/strip_sample.py) instead of XLA gathers. Trace-time decision."""
        mode = self.rcfg.warp_sampler
        if mode == "gather" or blending is None:
            return False
        from ..ops.strip_sample import SW, _round_up

        _, _, h, w = blending["color_maps"].shape
        fits = (
            _round_up(h, 16) >= self.rcfg.strip_height
            and _round_up(w, 128) >= SW
            and self.rcfg.blend_top_k > 0
        )
        if mode == "strip":
            if not fits:
                raise ValueError(
                    f"warp_sampler='strip' needs images of at least "
                    f"{self.rcfg.strip_height}x{SW}, got {h}x{w}"
                )
            return True
        assert mode == "auto", mode
        return fits and jax.default_backend() == "tpu"

    def _blend_warp_strip(self, blending, pts3, normals_w, alpha_fg, opts):
        """Warp the blend_top_k highest-weight samples per ray through the
        gather-free strip sampler.

        The warp positions are constants w.r.t. the networks (z-vals are
        sampled no-grad, normals detached — ref udf_renderer_blending.py:
        637-643, patch_projector.py:45), so sampling is forward-only;
        gradients reach the loss through blending logits and compositing
        weights exactly as in the gather path.

        Returns (idx [B, K] z-sorted sample indices, pix_color [B, K, V, 3]
        | None, pix_mask, patch_color [B, K, V, 3, Npx] | None, patch_mask,
        coverage scalar = fraction of warp positions whose strip covers
        them).
        """
        from ..ops import strip_sample as ss

        rcfg = self.rcfg
        batch, n, _ = pts3.shape
        chunk = max(1, min(rcfg.blend_chunk, rcfg.blend_top_k, n))
        k = min(rcfg.blend_top_k, n)
        k -= k % chunk
        imgs = blending["color_maps"]  # [V, 3, H, W]
        v, _, h, w_img = imgs.shape

        w_sel = jax.lax.stop_gradient(transmittance_weights(alpha_fg))  # [B, n]
        _, idx = jax.lax.top_k(w_sel, k)
        idx = jnp.sort(idx, axis=-1)  # z-order: consecutive samples cluster
        take3 = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
        pts_k = take3(pts3)  # [B, K, 3]

        parts_x, parts_y = [], []
        npx = 0
        patch_geo_mask = pix_geo_valid = None
        if opts.patch_blending:
            normals_k = take3(normals_w)
            pgx, pgy, patch_geo_mask = self.projector.patch_warp_positions(
                pts_k, blending["rays_uv"], normals_k, (h, w_img),
                blending["intrinsics"][0], blending["intrinsics"],
                blending["query_c2w"], jnp.linalg.inv(blending["w2cs"]),
                detach_normal=True,
            )  # [V, B, K, Npx]
            npx = pgx.shape[-1]
            parts_x.append(pgx)
            parts_y.append(pgy)
        if opts.pixel_blending:
            xg, yg, pix_geo_valid = self.projector.pixel_warp_positions(
                pts_k, blending["intrinsics"], blending["w2cs"], (h, w_img)
            )  # [V, B, K]
            parts_x.append(xg[..., None])
            parts_y.append(yg[..., None])

        gx = jnp.concatenate(parts_x, axis=-1)  # [V, B, K, stride]
        gy = jnp.concatenate(parts_y, axis=-1)
        stride = gx.shape[-1]
        nchunks = k // chunk
        pc = chunk * stride
        p_strip = ss._round_up(pc, 128)
        gx = gx.reshape(v, batch, nchunks, pc)
        gy = gy.reshape(v, batch, nchunks, pc)
        if p_strip != pc:
            # pad with an IN-CLUSTER position (the chunk's first) so padding
            # never drags the strip origin away from the real points
            padx = jnp.broadcast_to(gx[..., :1], (v, batch, nchunks, p_strip - pc))
            pady = jnp.broadcast_to(gy[..., :1], (v, batch, nchunks, p_strip - pc))
            gx = jnp.concatenate([gx, padx], axis=-1)
            gy = jnp.concatenate([gy, pady], axis=-1)
        gx = gx.reshape(v, batch * nchunks, p_strip)
        gy = gy.reshape(v, batch * nchunks, p_strip)

        imgs4 = ss.prepare_images(imgs)
        colors, in_strip = ss.strip_sample(
            imgs4, gx, gy, sh=rcfg.strip_height,
            interpret=jax.default_backend() != "tpu",
        )  # [V, NW, 3, P], [V, NW, P]

        colors = colors.reshape(v, batch, nchunks, 3, p_strip)[..., :pc]
        colors = colors.reshape(v, batch, nchunks, 3, chunk, stride)
        colors = colors.transpose(0, 1, 2, 4, 3, 5).reshape(v, batch, k, 3, stride)
        in_strip = in_strip.reshape(v, batch, nchunks, p_strip)[..., :pc]
        in_strip = in_strip.reshape(v, batch, k, stride)

        pix_color = pix_mask = patch_color = patch_mask = None
        off = 0
        if opts.patch_blending:
            patch_color = colors[..., off:off + npx].transpose(1, 2, 0, 3, 4)
            patch_mask = (patch_geo_mask & in_strip[..., off:off + npx]).transpose(
                1, 2, 0, 3
            )  # [B, K, V, Npx]
            off += npx
        if opts.pixel_blending:
            pix_color = colors[..., off].transpose(1, 2, 0, 3)  # [B, K, V, 3]
            pix_mask = (pix_geo_valid & in_strip[..., off]).transpose(1, 2, 0)

        coverage = jnp.mean(in_strip.astype(jnp.float32))
        return idx, pix_color, pix_mask, patch_color, patch_mask, coverage

    # -- background (NeRF++) -------------------------------------------------

    def render_core_outside(
        self, params: Params, rays_o, rays_d, z_vals, sample_dist, background_rgb=None
    ):
        """Inverse-sphere background pass (ref: udf_renderer_blending.py:161-195)."""
        batch, n = z_vals.shape
        dists = _dists_with_tail(z_vals, sample_dist)
        mid_z = z_vals + dists * 0.5
        pts = _ray_points(rays_o, rays_d, mid_z)  # [B, n, 3]
        if self.rcfg.n_outside > 0:
            dist_to_center = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
            pts = jnp.concatenate([pts / dist_to_center, 1.0 / dist_to_center], axis=-1)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (batch, n, 3))
        raw, sampled_color = self._bg_apply(
            params["nerf"], pts.reshape(batch * n, -1), dirs.reshape(batch * n, 3), self.cfg.nerf
        )
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw.reshape(batch, n)) * dists)
        weights = transmittance_weights(alpha)
        sampled_color = sampled_color.reshape(batch, n, 3)
        color = jnp.sum(weights[:, :, None] * sampled_color, axis=1)
        if background_rgb is not None:
            color = color + background_rgb * (1.0 - weights.sum(-1, keepdims=True))
        return {"color": color, "sampled_color": sampled_color, "alpha": alpha, "weights": weights}

    # -- core ----------------------------------------------------------------

    def render_core(
        self,
        params: Params,
        rays_o,
        rays_d,
        z_vals,
        sample_dist,
        *,
        cos_anneal_ratio=None,
        background_rgb=None,
        background_alpha=None,
        background_sampled_color=None,
        flip_saturation=0.0,
        blending: Optional[Dict[str, Any]] = None,
        opts: RenderOptions = RenderOptions(),
    ) -> Dict[str, Any]:
        """Foreground pass (ref: udf_renderer_blending.py:327-584)."""
        rcfg = self.rcfg
        batch, n = z_vals.shape
        dists = _dists_with_tail(z_vals, sample_dist)
        mid_z = z_vals + dists * 0.5
        pts = _ray_points(rays_o, rays_d, mid_z).reshape(-1, 3)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (batch, n, 3)).reshape(-1, 3)

        udf_col, feature, gradients = fields.distance_value_and_gradient(
            params["udf"], pts, self.cfg.udf_network
        )  # [BN,1], [BN,F], [BN,3]
        udf = udf_col  # [BN, 1]

        grad_mag = jnp.linalg.norm(gradients, axis=-1, keepdims=True)
        grad_norm = gradients / (grad_mag + 1e-5)

        inv_s = jnp.clip(fields.variance_inv_s(params["variance"]), 1e-6, 1e6)  # [1]
        beta = jnp.clip(
            fields.beta_value(params["beta"], self.cfg.beta_network.beta_min), 1e-6, 1e6
        )
        gamma = jnp.clip(fields.gamma_value(params["beta"]), 1e-6, 1e6)

        if rcfg.use_norm_grad_for_cosine:
            true_cos = jnp.sum(dirs * grad_norm, axis=-1, keepdims=True)
        else:
            true_cos = jnp.sum(dirs * gradients, axis=-1, keepdims=True)

        cos = jax.lax.stop_gradient(jnp.sum(dirs * grad_norm, axis=-1, keepdims=True))
        flip_sign = -jnp.sign(cos)
        flip_sign = jnp.where(flip_sign == 0, 1.0, flip_sign)  # [BN,1]

        # occlusion probability along the ray
        raw_occ = udf2logistic(udf, beta, 1.0, 1.0).reshape(batch, n)
        alpha_occ = 1.0 - jnp.exp(-jax.nn.relu(raw_occ) * gamma * dists)

        # gradient-direction boost delays premature visibility collapse;
        # shifted one sample forward (ref: :400-405)
        vis_mask = (true_cos < 0.01).astype(z_vals.dtype).reshape(batch, n)
        vis_mask = jnp.concatenate([vis_mask[:, 1:], jnp.ones((batch, 1), z_vals.dtype)], -1)

        factor = jnp.clip(1.0 - alpha_occ + flip_saturation * vis_mask, 0.0, 1.0) + 1e-7
        vis_prob = jnp.cumprod(
            jnp.concatenate([jnp.ones((batch, 1), z_vals.dtype), factor], -1), -1
        )[:, :-1]
        vis_prob = jnp.clip(vis_prob, 0.0, 1.0)

        neg_abs_cos = -jnp.abs(true_cos)
        alpha_plus = sdf2alpha(
            udf, neg_abs_cos, dists.reshape(-1, 1), inv_s, cos_anneal_ratio,
            sdf2alpha_type=rcfg.sdf2alpha_type,
        ).reshape(batch, n)
        alpha_minus = sdf2alpha(
            -udf, neg_abs_cos, dists.reshape(-1, 1), inv_s, cos_anneal_ratio,
            sdf2alpha_type=rcfg.sdf2alpha_type,
        ).reshape(batch, n)
        alpha = alpha_plus * vis_prob + alpha_minus * (1.0 - vis_prob)

        udf_2d = udf.reshape(batch, n)

        color_base, color_s, blending_logits = self._color_apply(
            params["color"], pts, grad_norm, dirs, feature, self.cfg.rendering_network
        )
        sampled_color_base = color_base.reshape(batch, n, 3)
        sampled_color = color_s.reshape(batch, n, 3)
        blending_logits = blending_logits.reshape(batch, n, -1)

        # ------- pixel / patch blending (SparseNeuS-style) -----------------
        sampled_color_pixel = None
        sampled_color_patch = None
        sampled_color_patch_mask = None
        blend_idx = None  # [B, K] sample subset under the strip sampler
        strip_coverage = None
        if blending is not None and (opts.pixel_blending or opts.patch_blending):
            pts3 = pts.reshape(batch, n, 3)
            if not opts.force_gather_warp and self._strip_active(blending):
                normals_w = (flip_sign * grad_norm).reshape(batch, n, 3)
                (blend_idx, pix_color, pix_mask, patch_color, patch_mask,
                 strip_coverage) = self._blend_warp_strip(
                    blending, pts3, normals_w, alpha, opts
                )
                logits_sel = jnp.take_along_axis(
                    blending_logits, blend_idx[..., None], axis=1
                )  # [B, K, n_cand]
            else:
                pix_color = pix_mask = patch_color = patch_mask = None
                if opts.pixel_blending:
                    pix_color, pix_mask = self.projector.pixel_warp(
                        pts3, blending["color_maps"], blending["intrinsics"], blending["w2cs"]
                    )
                if opts.patch_blending:
                    normals_w = (flip_sign * grad_norm).reshape(batch, n, 3)
                    patch_color, patch_mask = self.projector.patch_warp(
                        pts3,
                        blending["rays_uv"],
                        normals_w,
                        blending["color_maps"],
                        blending["intrinsics"][0],
                        blending["intrinsics"],
                        blending["query_c2w"],
                        jnp.linalg.inv(blending["w2cs"]),
                        detach_normal=True,
                    )
                logits_sel = blending_logits
            pix_c, _pix_m, patch_c, patch_m = fields.color_blend(
                logits_sel,
                img_index=blending.get("img_index"),
                pts_pixel_color=pix_color,
                pts_pixel_mask=pix_mask,
                pts_patch_color=patch_color,
                pts_patch_mask=patch_mask,
            )
            if opts.pixel_blending:
                sampled_color_pixel = pix_c  # [B, n, 3] ([B, K, 3] strip)
            if opts.patch_blending:
                sampled_color_patch = patch_c  # [B, n|K, 3, Npx] channel-packed
                sampled_color_patch_mask = patch_m[..., 0]  # [B, n|K]

        # ------- eikonal terms ----------------------------------------------
        pts_norm = jnp.linalg.norm(pts, axis=-1).reshape(batch, n)
        inside_sphere = jax.lax.stop_gradient((pts_norm < 1.0).astype(z_vals.dtype))
        relax_inside = jax.lax.stop_gradient((pts_norm < 1.2).astype(z_vals.dtype))
        near_surface = jax.lax.stop_gradient((udf_2d < 0.05).astype(z_vals.dtype))

        # ------- compose with background -------------------------------------
        n_fg = n
        if background_alpha is not None:
            alpha = jnp.concatenate([alpha, background_alpha[:, n_fg:]], axis=-1)
            sampled_color_base = jnp.concatenate(
                [sampled_color_base, background_sampled_color[:, n_fg:]], axis=1
            )
            sampled_color = jnp.concatenate(
                [sampled_color, background_sampled_color[:, n_fg:]], axis=1
            )
            if sampled_color_pixel is not None and blend_idx is None:
                scp = sampled_color_pixel * inside_sphere[:, :, None] + \
                    background_sampled_color[:, :n_fg] * (1.0 - inside_sphere)[:, :, None]
                sampled_color_pixel = jnp.concatenate(
                    [scp, background_sampled_color[:, n_fg:]], axis=1
                )

        weights = transmittance_weights(alpha)
        weights_sum = weights.sum(-1, keepdims=True)

        color_base_out = jnp.sum(sampled_color_base * weights[:, :, None], axis=1)
        color_out = jnp.sum(sampled_color * weights[:, :, None], axis=1)

        # under the strip sampler blended colors exist only at the top-K
        # sample subset; composite with the SAME transmittance weights
        # gathered at those samples (the fg prefix of `weights` is
        # unaffected by the appended background samples)
        weights_k = None
        if blend_idx is not None:
            weights_k = jnp.take_along_axis(weights[:, :n_fg], blend_idx, axis=1)

        color_pixel = None
        if sampled_color_pixel is not None:
            if blend_idx is None:
                color_pixel = jnp.sum(sampled_color_pixel * weights[:, :, None], axis=1)
            elif background_alpha is not None:
                inside_k = jnp.take_along_axis(inside_sphere, blend_idx, axis=1)
                color_pixel = (
                    jnp.sum(sampled_color_pixel * (weights_k * inside_k)[:, :, None], axis=1)
                    + jnp.sum(
                        background_sampled_color[:, :n_fg]
                        * (weights[:, :n_fg] * (1.0 - inside_sphere))[:, :, None],
                        axis=1,
                    )
                    + jnp.sum(
                        background_sampled_color[:, n_fg:] * weights[:, n_fg:, None],
                        axis=1,
                    )
                )
            else:
                color_pixel = jnp.sum(sampled_color_pixel * weights_k[:, :, None], axis=1)

        fused_patch_colors = fused_patch_mask = None
        if sampled_color_patch is not None:
            # channel-packed [B, n|K, 3, Npx] fuse over samples, then a tiny
            # [B, 3, Npx] -> [B, Npx, 3] transpose for the public contract
            w_patch = weights[:, :n_fg] if blend_idx is None else weights_k
            fused_patch_colors = jnp.einsum(
                "bscp,bs->bpc", sampled_color_patch, w_patch
            )  # [B, Npx, 3]
            fused_patch_mask = jnp.sum(
                sampled_color_patch_mask.astype(weights.dtype) * w_patch, axis=1
            )  # [B]

        depth = jnp.sum(mid_z * weights[:, :n_fg], axis=-1, keepdims=True)
        if background_rgb is not None:
            color_out = color_out + background_rgb * (1.0 - weights_sum)

        grad_err_all = (jnp.linalg.norm(gradients.reshape(batch, n, 3), axis=-1) - 1.0) ** 2
        gradient_error = jnp.sum(relax_inside * grad_err_all) / (jnp.sum(relax_inside) + 1e-5)
        gradient_error_near_surface = jnp.sum(near_surface * grad_err_all) / (
            jnp.sum(near_surface) + 1e-5
        )

        gradients3 = gradients.reshape(batch, n, 3)
        gradients_flip = flip_sign.reshape(batch, n, 1) * gradients3

        # relu keeps the term finite for SIGNED distance heads
        # (model_type='neus'; exp(-s·udf) overflows on udf<0) — a no-op for
        # the unsigned 'abs'/'square' heads the reference trains
        sparse_term = jnp.exp(-rcfg.sparse_scale_factor * jnp.maximum(udf_2d, 0.0))
        if rcfg.sparse_depth_gate > 0.0:
            # exclude samples at the rendered depth on surface rays so the
            # sparse penalty cannot lift the field minimum at the
            # photometric anchor (see RendererConfig.sparse_depth_gate)
            wsum = jax.lax.stop_gradient(
                jnp.sum(weights[:, :n_fg], axis=-1, keepdims=True)
            )
            d_surf = jax.lax.stop_gradient(depth) / jnp.maximum(wsum, 1e-3)
            protect = (jnp.abs(mid_z - d_surf) <= rcfg.sparse_depth_gate) & (
                wsum > 0.5
            )
            sparse_term = jnp.where(protect, 0.0, sparse_term)
        sparse_error = jnp.mean(jnp.sum(sparse_term, axis=1))

        return {
            "color_base": color_base_out,
            "color": color_out,
            "color_pixel": color_pixel,
            "patch_colors": fused_patch_colors,
            "patch_mask": fused_patch_mask,
            "weights": weights,
            "s_val": 1.0 / inv_s,
            "beta": 1.0 / beta,
            "gamma": gamma,
            "depth": depth,
            "gradient_error": gradient_error,
            "gradient_error_near_surface": gradient_error_near_surface,
            "normals": jnp.sum(gradients_flip * weights[:, :n_fg, None], axis=1),
            "gradients": gradients3,
            "gradients_flip": gradients_flip,
            "inside_sphere": inside_sphere,
            "udf": udf_2d,
            "gradient_mag": grad_mag.reshape(batch, n),
            "true_cos": true_cos.reshape(batch, n),
            "vis_prob": vis_prob,
            "alpha": alpha[:, :n_fg],
            "alpha_plus": alpha_plus[:, :n_fg],
            "alpha_minus": alpha_minus[:, :n_fg],
            "mid_z_vals": mid_z,
            "dists": dists,
            "sparse_error": sparse_error,
            "alpha_occ": alpha_occ,
            "raw_occ": raw_occ,
            # fraction of blending warp positions covered by their strip
            # (1.0 when the strip sampler is off; see _blend_warp_strip)
            "blend_strip_cover": (
                strip_coverage if strip_coverage is not None
                else jnp.ones((), z_vals.dtype)
            ),
        }

    # -- public entry ----------------------------------------------------------

    def render(
        self,
        params: Params,
        rays_o,
        rays_d,
        near,
        far,
        *,
        key: Optional[jax.Array] = None,
        cos_anneal_ratio=None,
        flip_saturation=0.0,
        background_rgb=None,
        blending: Optional[Dict[str, Any]] = None,
        opts: RenderOptions = RenderOptions(),
    ) -> Dict[str, Any]:
        """Full forward (ref: udf_renderer_blending.py:586-721).

        near/far: [B,1]. All sampling counts are static; `opts` switches
        are trace-time constants.
        """
        rcfg = self.rcfg
        batch = rays_o.shape[0]
        dtype = rays_o.dtype
        near = jnp.broadcast_to(jnp.asarray(near, dtype), (batch, 1))
        far = jnp.broadcast_to(jnp.asarray(far, dtype), (batch, 1))

        sample_dist = jnp.mean((far - near) / rcfg.n_samples)
        t = jnp.linspace(0.0, 1.0, rcfg.n_samples, dtype=dtype)
        z_vals = near + (far - near) * t[None, :]

        z_vals_outside = None
        if rcfg.n_outside > 0:
            z_vals_outside = jnp.linspace(
                1e-3, 1.0 - 1.0 / (rcfg.n_outside + 1.0), rcfg.n_outside, dtype=dtype
            )

        if opts.perturb and rcfg.perturb > 0:
            assert key is not None, "perturbed rendering needs an rng key"
            k1, k2 = jax.random.split(key)
            t_rand = jax.random.uniform(k1, (batch, 1), dtype) - 0.5
            z_vals = z_vals + t_rand * 2.0 / rcfg.n_samples
            if rcfg.n_outside > 0:
                mids = 0.5 * (z_vals_outside[1:] + z_vals_outside[:-1])
                upper = jnp.concatenate([mids, z_vals_outside[-1:]])
                lower = jnp.concatenate([z_vals_outside[:1], mids])
                t_r = jax.random.uniform(k2, z_vals_outside.shape, dtype)
                z_vals_outside = lower + (upper - lower) * t_r

        if rcfg.n_outside > 0:
            z_vals_outside = far / jnp.flip(z_vals_outside, -1)[None, :] + 1.0 / rcfg.n_samples

        udf_fn = self.udf_fn(params)
        if rcfg.n_importance > 0:
            if rcfg.upsampling_type == "classical":
                z_vals = importance_sample_classical(
                    udf_fn, rays_o, rays_d, z_vals, sample_dist,
                    n_importance=rcfg.n_importance,
                    up_sample_steps=rcfg.up_sample_steps,
                    sdf2alpha_type=rcfg.sdf2alpha_type,
                )
            elif rcfg.upsampling_type == "mix":
                beta = jnp.clip(
                    fields.beta_value(params["beta"], self.cfg.beta_network.beta_min),
                    1e-6, 1e6,
                )
                gamma = jnp.clip(fields.gamma_value(params["beta"]), 1e-6, 1e6)
                z_vals = importance_sample_mix(
                    udf_fn, rays_o, rays_d, z_vals, sample_dist, beta, gamma,
                    n_importance=rcfg.n_importance,
                    up_sample_steps=rcfg.up_sample_steps,
                    sdf2alpha_type=rcfg.sdf2alpha_type,
                )
            else:
                raise ValueError(rcfg.upsampling_type)

        n_fg = z_vals.shape[-1]

        background_alpha = None
        background_sampled_color = None
        if rcfg.n_outside > 0:
            z_feed = jnp.sort(jnp.concatenate([z_vals, z_vals_outside], axis=-1), axis=-1)
            ret_outside = self.render_core_outside(
                params, rays_o, rays_d, z_feed, sample_dist, background_rgb
            )
            background_alpha = ret_outside["alpha"]
            background_sampled_color = ret_outside["sampled_color"]

        ret = self.render_core(
            params, rays_o, rays_d, z_vals, sample_dist,
            cos_anneal_ratio=cos_anneal_ratio,
            background_rgb=background_rgb,
            background_alpha=background_alpha,
            background_sampled_color=background_sampled_color,
            flip_saturation=flip_saturation,
            blending=blending,
            opts=opts,
        )

        out = dict(ret)
        out["variance"] = ret["s_val"]
        out["weight_sum"] = ret["weights"][:, :n_fg].sum(-1, keepdims=True)
        out["weight_sum_fg_bg"] = ret["weights"].sum(-1, keepdims=True)
        out["z_vals"] = z_vals

        # iso-surface regulariser on uniform random points
        # (ref: udf_renderer_blending.py:681-686 — returned, unused in loss)
        if opts.compute_random_sparse:
            assert key is not None
            k3 = jax.random.fold_in(key, 17)
            pts_random = jax.random.uniform(k3, (1024, 3), dtype) * 2.0 - 1.0
            udf_random = fields.distance_value(params["udf"], pts_random, self.cfg.udf_network)
            m = (udf_random < 0.01).astype(dtype)
            cnt = m.sum()
            masked_mean = jnp.sum(
                jnp.exp(-rcfg.sparse_scale_factor * jnp.maximum(udf_random, 0.0)) * m
            ) / jnp.maximum(cnt, 1.0)
            out["sparse_random_error"] = jnp.where(cnt > 10, masked_mean, 0.0)
        else:
            out["sparse_random_error"] = jnp.zeros((), dtype)
        return out
