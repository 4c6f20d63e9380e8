"""Typed configuration tree.

Mirrors the reference HOCON schema (ref: confs/udf_dtu_blending.conf:1-119,
confs/udf_garment_blending.conf) so the original .conf files load directly,
while giving the rest of the framework a typed, static view (XLA-friendly:
everything that shapes the computation graph is a Python-level constant).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from . import hocon


@dataclass(frozen=True)
class GeneralConfig:
    base_exp_dir: str = "./exp"
    expname: str = "udf"
    model_type: str = "udf"  # 'udf' | 'neus'
    recording: Tuple[str, ...] = ()


@dataclass(frozen=True)
class DatasetConfig:
    data_dir: str = ""
    render_cameras_name: str = "cameras.npz"
    object_cameras_name: str = "cameras.npz"
    dataset_name: str = "dtu"  # 'dtu' | 'deepfashion3d' | 'bmvs'
    downsample_factor: float = 1.0
    camera_outside_sphere: bool = True
    scale_mat_scale: float = 1.1


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-4
    learning_rate_geo: float = 1e-4
    learning_rate_alpha: float = 0.05
    end_iter: int = 300_000
    batch_size: int = 512
    validate_resolution_level: int = 4
    warm_up_end: float = 5000.0
    anneal_end: float = 25000.0
    use_white_bkgd: bool = False
    warmup_sample: bool = False
    same_lr: bool = False
    fix_geo_end: float = 500.0
    save_freq: int = 10_000
    val_freq: int = 2500
    val_mesh_freq: int = 2500
    report_freq: int = 100
    igr_weight: float = 0.1
    igr_ns_weight: float = 0.0
    mask_weight: float = 0.0
    sparse_weight: float = 0.0
    # capability switches (recorded in the experiment snapshot; the
    # NEURALUDF_* env vars remain as overrides only)
    blend_scan_window: bool = True  # lax.scan windows for blending steps.
    # Default ON since round 5: the round-3 worker crash was SMEM exhaustion
    # by the strip kernel's origin operands (root-caused + fixed round 4 by
    # origin packing/NW segmenting), and the on-chip probe
    # (scripts/blend_scan_probe.py) measures scan windows at 54.9 ms/step vs
    # 100.2 pipelined at the production ft shape. NEURALUDF_BLEND_WINDOW=0
    # opts back into pipelined per-step dispatch.
    stall_warn_s: float = 600.0  # warn when no dispatch completes for this
    # long (0 disables) — a TPU-worker restart leaves the in-flight RPC
    # blocked forever with zero signal; see utils/watchdog.py
    incremental_mesh: bool = False  # incremental grid re-query between extractions
    freeze_variance: bool = False  # TPU-repo extension (not a reference knob):
    # keep the variance scalar untrainable for the whole run, overriding the
    # reference's it>20000 auto-enable (exp_runner:353-359) and any trainability
    # recorded in a loaded checkpoint. Rationale: the zero-level transition
    # bias of the rendered surface scales with the converged variance
    # (scripts/udf_bias_probe.py); finetunes that re-grow variance re-inflate
    # that bias, so per-scan finetunes may pin it at the stage-1 value.
    scan_unroll: int = 1  # lax.scan unroll of the train window (overlaps the
    # per-iteration weight re-staging; env NEURALUDF_SCAN_UNROLL overrides).
    # On-chip A/B (round 4): bench.py measured 17.22 (unroll=1) vs 17.45 ms
    # (unroll=2) — the unroll does NOT recover the ~3.6 ms in-scan weight
    # re-staging stall (XLA re-stages per unrolled body copy too); negative
    # result, default stays 1. (A same-session 22.9-vs-16.9 ordering was an
    # artifact of post-wedge drain inflating the first measurement.)
    flat_adam: bool = False  # optimizer compute layout (numerics identical —
    # test_flat_adam_matches_tree): apply Adam as ONE fused update over the
    # concatenated 1.29M-element parameter vector instead of ~85 per-leaf
    # fusions. Targets the ~3.6 ms/step weight-restaging stall on the scan
    # window's backward→optimizer→forward critical path (DESIGN.md §7c).
    # On-chip A/B (back-to-back bench.py pair, fresh container): NEGATIVE —
    # 17.30 ms/step flat vs 16.88 tree. The concat/split reshuffle adds more
    # copy work than the fused update saves; the restaging stall is dominated
    # by the *forward* weight prefetch, which the flat layout does not touch.
    # Default stays False. Env NEURALUDF_FLAT_ADAM=1/0 overrides (A/B knob).


@dataclass(frozen=True)
class ColorLossConfig:
    color_base_weight: float = 0.01
    color_weight: float = 1.0
    color_pixel_weight: float = 0.0
    color_patch_weight: float = 0.0
    pixel_loss_type: str = "l1"
    patch_loss_type: str = "ssim"
    h_patch_size: int = 3


@dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    d_in: int = 4
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    output_ch: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True


@dataclass(frozen=True)
class UDFNetworkConfig:
    d_out: int = 257
    d_in: int = 3
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: Tuple[int, ...] = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    udf_type: str = "abs"  # 'abs' | 'square' | 'sdf'
    inside_outside: bool = False  # only for the NeuS/SDF variant
    udf_shift: float = 0.0  # accepted for conf parity; unused (like reference)
    predict_grad: bool = False  # accepted for conf parity; unused
    # fused Pallas render-core kernels (ops/fused_distance.py); env vars
    # NEURALUDF_FUSED_CORE / NEURALUDF_FUSED_PRECISION override these
    fused_core: str = "auto"  # 'auto' (TPU only) | 'on' | 'off'
    fused_precision: str = "default"  # 'default' (bf16 MXU) | 'high' | 'highest'


@dataclass(frozen=True)
class VarianceConfig:
    init_val: float = 0.3
    requires_grad: bool = True


@dataclass(frozen=True)
class RenderingNetworkConfig:
    d_feature: int = 256
    mode: str = "no_normal"  # 'idr' | 'no_view_dir' | 'no_normal'
    d_in: int = 6
    d_out: int = 3
    d_hidden: int = 128
    n_layers: int = 4
    weight_norm: bool = True
    multires_view: int = 4
    squeeze_out: bool = True
    blending_cand_views: int = 10


@dataclass(frozen=True)
class BetaNetworkConfig:
    init_var_beta: float = 0.5
    init_var_gamma: float = 0.3
    init_var_zeta: float = 0.3
    beta_min: float = 0.00005
    requires_grad_beta: bool = True
    requires_grad_gamma: bool = False
    requires_grad_zeta: bool = False


@dataclass(frozen=True)
class RendererConfig:
    n_samples: int = 64
    n_importance: int = 50
    n_outside: int = 32
    up_sample_steps: int = 5
    perturb: float = 1.0
    sdf2alpha_type: str = "numerical"  # 'numerical' | 'theorical'
    upsampling_type: str = "classical"  # 'classical' | 'mix'
    sparse_scale_factor: float = 25000.0
    # Depth-gated sparse loss (0.0 = reference behavior, the exact
    # udf_renderer_blending.py:597-599 term over every ray sample). When
    # > 0: ray samples within this distance of the rendered depth on
    # confidently-surface rays (stop-grad weight_sum > 0.5) are excluded
    # from the sparse penalty, so exp(-s*udf) still carves spurious
    # zero-sets (membranes sit away from the rendered depth) without
    # lifting the field minimum AT the photometric anchor — the measured
    # failure mode of strong -s finetunes (scripts/udf_bias_probe.py:
    # zero-ridge displaced ~3e-3 with the minimum lifted to ~1.7e-3 at
    # -s 0.01; RESULTS.md garment ledger).
    sparse_depth_gate: float = 0.0
    h_patch_size: int = 3
    use_norm_grad_for_cosine: bool = False
    # Blending warp sampler. 'gather' = exact XLA bilinear gathers (fast on
    # CPU, catastrophic on TPU: per-element gathers measure 7.0 s/step at
    # the production ft shape); 'strip' = the gather-free Pallas strip
    # sampler (ops/strip_sample.py) over the blend_top_k highest-weight
    # samples per ray; 'auto' = strip on TPU when the images fit a strip,
    # gather otherwise.
    warp_sampler: str = "auto"  # 'auto' | 'gather' | 'strip'
    blend_top_k: int = 32  # samples warped per ray under the strip sampler
    blend_chunk: int = 8  # consecutive samples sharing one strip DMA
    strip_height: int = 64  # strip rows (covers taller warp clusters)
    # rematerialization: recompute MLP activations in backward instead of
    # spilling them to HBM (profiler: copy-start ≈38% of the r2 step moving
    # [BN,256] activations). '+'-joined tags: 'color' (residual color net),
    # 'bg' (background NeRF). Env NEURALUDF_REMAT overrides.
    remat: str = "none"  # 'none' | 'color' | 'bg' | 'color+bg'


@dataclass(frozen=True)
class ModelConfig:
    nerf: NeRFConfig = field(default_factory=NeRFConfig)
    udf_network: UDFNetworkConfig = field(default_factory=UDFNetworkConfig)
    variance_network: VarianceConfig = field(default_factory=VarianceConfig)
    rendering_network: RenderingNetworkConfig = field(default_factory=RenderingNetworkConfig)
    beta_network: BetaNetworkConfig = field(default_factory=BetaNetworkConfig)
    udf_renderer: RendererConfig = field(default_factory=RendererConfig)


@dataclass(frozen=True)
class Config:
    general: GeneralConfig = field(default_factory=GeneralConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    color_loss: ColorLossConfig = field(default_factory=ColorLossConfig)
    model: ModelConfig = field(default_factory=ModelConfig)


_FIELD_ALIASES = {
    # HOCON key -> dataclass field (only where they differ)
}


def _build(dc_type, data: Dict[str, Any]):
    kwargs = {}
    names = {f.name: f for f in dataclasses.fields(dc_type)}
    for key, val in data.items():
        key = _FIELD_ALIASES.get(key, key)
        if key not in names:
            continue  # tolerate unknown keys, like pyhocon/get_* defaults
        f = names[key]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            val = _build(f.type, val)
        elif isinstance(val, list):
            val = tuple(val)
        kwargs[key] = val
    return dc_type(**kwargs)


def from_dict(raw: Dict[str, Any]) -> Config:
    model_raw = raw.get("model", {})
    model = ModelConfig(
        nerf=_build(NeRFConfig, model_raw.get("nerf", {})),
        udf_network=_build(UDFNetworkConfig, model_raw.get("udf_network", {})),
        variance_network=_build(VarianceConfig, model_raw.get("variance_network", {})),
        rendering_network=_build(
            RenderingNetworkConfig, model_raw.get("rendering_network", {})
        ),
        beta_network=_build(BetaNetworkConfig, model_raw.get("beta_network", {})),
        udf_renderer=_build(RendererConfig, model_raw.get("udf_renderer", {})),
    )
    return Config(
        general=_build(GeneralConfig, raw.get("general", {})),
        dataset=_build(DatasetConfig, raw.get("dataset", {})),
        train=_build(TrainConfig, raw.get("train", {})),
        color_loss=_build(ColorLossConfig, raw.get("color_loss", {})),
        model=model,
    )


def load(path: str, case: Optional[str] = None, **overrides) -> Config:
    """Load a .conf file (reference HOCON schema) into a typed Config.

    ``overrides`` are dotted paths, e.g. ``load(p, train__learning_rate=1e-4)``
    mirroring the reference CLI overrides (ref: exp_runner_blending.py:48-53).
    """
    cfg = from_dict(hocon.parse_file(path, case=case))
    for dotted, val in overrides.items():
        parts = dotted.split("__")
        cfg = _replace_path(cfg, parts, val)
    return cfg


def _replace_path(obj, parts: List[str], val):
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: val})
    sub = getattr(obj, parts[0])
    return dataclasses.replace(obj, **{parts[0]: _replace_path(sub, parts[1:], val)})
