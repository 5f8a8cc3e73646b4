"""Typed configuration for InsMOS-TPU.

Field names and defaults mirror the reference pipeline config
(/root/reference/config/config.yaml) so a reference user can port settings
1:1, plus TPU-specific static capacities (every array in the compiled graph
is fixed-shape; capacities + masks replace the reference's dynamic shapes).

``Config.from_yaml`` accepts both this package's flat YAML and the reference's
nested config.yaml schema.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence

import yaml


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class DataConfig:
    # crop applied before the 3D UNet voxelizer (reference DATA.POINT_CLOUD_RANGE)
    point_cloud_range: tuple[float, ...] = (-60.0, -50.0, -3.0, 60.0, 50.0, 1.0)
    voxel_size: tuple[float, float, float] = (0.1, 0.1, 0.1)
    transform: bool = True  # pose-align the window to the current frame
    poses_file: str = "poses.txt"
    shuffle: bool = True
    num_workers: int = 4
    delta_t_data: float = 0.1
    split_train: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7, 9, 10)
    split_val: tuple[int, ...] = (8,)
    split_test: tuple[int, ...] = (8,)

    @property
    def grid_size(self) -> tuple[int, int, int]:
        """(X, Y, Z) voxel grid dims — reference models/models.py:277-280."""
        r = self.point_cloud_range
        v = self.voxel_size
        return (
            int(round((r[3] - r[0]) / v[0])),
            int(round((r[4] - r[1]) / v[1])),
            int(round((r[5] - r[2]) / v[2])),
        )


@dataclass(frozen=True)
class MotionNetConfig:
    """4D motion backbone (reference models/backbones_3d/motionnet.py +
    models/MinkowskiEngine/customminkunet.py: MinkUNet14 with
    PLANES=(8,16,32,64,64,32,16,8), INIT_DIM=8, D=4)."""

    init_dim: int = 8
    planes: tuple[int, ...] = (8, 16, 32, 64, 64, 32, 16, 8)
    out_channels: int = 3
    # spatial crop for the 4D grid. The reference convolves the full uncropped
    # cloud; we bound it by the UNet range + a receptive-field margin so all
    # coordinates live in a fixed-capacity set. Mins are multiples of
    # 8*voxel so integer coords stay divisible-by-stride aligned.
    crop_range: tuple[float, ...] = (-64.0, -54.4, -7.2, 64.0, 54.4, 5.6)
    # 3D site-UNION capacities at strides 1/2/4/8 (the slab engine stores
    # the t axis dense per site — sparse/slab.py). Measured on a coherent
    # pose-aligned 10x122k window: 430k / 281k / 146k / 50k union sites;
    # capacities carry 15-35% headroom and overflow is COUNTED (stats),
    # never silent.
    # Sized from the HDL-64E raycast fixture's per-level site unions over
    # seeds (max L1 262k / L2 100k / L4 35k / L8 11.3k — tools/probe, 2026-08)
    # at 1.3-1.5x headroom: every XLA glue pass (BN, masking, gathers,
    # derivations) scales with CAPACITY, not live sites, so oversized caps
    # tax the whole step. Overflows are counted and hard-gated (bench.py
    # fails loudly), so an out-of-distribution scene degrades visibly, not
    # silently. L1/L2 are multiples of conv_chunk for the window engine.
    # round-5 trim: 1.5x -> 1.25x headroom at L1 (certified fixture max
    # 262k; every capacity-scale glue pass AND every dead conv block's
    # unconditional span DMA scales with the cap — the round-5 trace
    # showed ~1 GB/step of dead-block DMA at the 1.5x cap). Still a
    # multiple of conv_chunk; the bench hard-gates overflow at 0.
    site_capacities: tuple[int, ...] = (327_680, 131_072, 45_056, 14_336)
    # site capacity of the SINGLE-scan stem slab in the incremental
    # streaming mode (_incremental_stem). Distinct from the point capacity:
    # a ~125k-point HDL-64 scan occupies only ~48-55k voxels (fixture), so
    # building this slab at the point capacity (131072) paid 2.4x dead rows
    # through the stem conv + plan. Overflow is counted via build_slab's
    # drop counter and hard-gated like every other capacity.
    stem_scan_capacity: int = 65_536
    # decoder spatial pruning (inference, span engine): the decoder's
    # outputs are only consumed on the CURRENT scan's sites (reference
    # models/models.py:322-324), so blocks 6/7/8 + the up convs run on
    # dilated halos of the current scan instead of the full window union
    # (halo reach 2 per block level; measured needed-site ratios
    # I1 0.47x / I2 0.55x / I4 0.68x of the level unions — PERF.md).
    # Capacities sized at ratio x union-capacity with margin; overflow is
    # counted into the motion_dropped hard gate.
    # fixture-measured halo sizes: 120k / 55k / 23.6k (probe_dec_plans)
    # at ~1.35x headroom; overflow joins the motion_dropped hard gate
    decoder_capacities: tuple[int, ...] = (163_840, 73_728, 32_768)
    decoder_prune: bool = True

    @property
    def grid_size(self) -> tuple[int, int, int]:
        r = self.crop_range
        return (
            int(round((r[3] - r[0]) / 0.1)),
            int(round((r[4] - r[1]) / 0.1)),
            int(round((r[5] - r[2]) / 0.1)),
        )


@dataclass(frozen=True)
class BEVConfig:
    """BEV backbone (reference config.yaml:112-119 + base_bev_backbone.py)."""

    num_bev_features: int = 256  # MAP_TO_BEV.NUM_BEV_FEATURES
    layer_nums: tuple[int, ...] = (5,)
    layer_strides: tuple[int, ...] = (1,)
    num_filters: tuple[int, ...] = (128,)
    upsample_strides: tuple[int, ...] = (2,)
    num_upsample_filters: tuple[int, ...] = (256,)


@dataclass(frozen=True)
class HeadConfig:
    """CenterHead + target assigner (reference config.yaml:121-142)."""

    num_class: int = 3
    max_objs: int = 100
    out_size_factor: int = 4
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    code_weights: tuple[float, ...] = (1.0,) * 8
    # static patch half-size for vectorized gaussian splat (cap on radius)
    max_gaussian_radius: int = 31


@dataclass(frozen=True)
class PostProcessConfig:
    """NMS / recall (reference config.yaml:144-156)."""

    score_thresh: float = 0.1
    nms_thresh: float = 0.01
    nms_pre_maxsize: int = 4096
    nms_post_maxsize: int = 500
    recall_thresh_list: tuple[float, ...] = (0.3, 0.5, 0.7)
    output_raw_score: bool = False
    # per-class NMS (reference NMS_CONFIG.MULTI_CLASSES_NMS, dead-False in
    # the default config.yaml:151 but dispatched in post_process.py:159)
    multi_classes_nms: bool = False


@dataclass(frozen=True)
class ModelConfig:
    delta_t_prediction: float = 0.1
    n_past_steps: int = 10
    use_motion_loss: bool = True
    point_features: int = 4  # x, y, z, intensity
    # 3D UNet encoder channels at strides 1/2/4/8 (reference spconv_unet.py:120-158)
    unet_channels: tuple[int, ...] = (16, 32, 64, 128)
    max_voxels: int = 100_000  # reference models/models.py:287
    max_points_per_voxel: int = 5
    # capacities of derived voxel sets: voxelizer (reference caps at 100k,
    # models/models.py:287), strided conv outputs at strides 2/4/8, and the
    # z-downsampled encoded tensor. Strided 3D downsampling dilates before
    # it shrinks (spconv SparseConv3d output-site semantics); sized from the
    # HDL-64E fixture's measured DERIVED counts (L2 48.4k / L4 22.2k /
    # L8 9.6k via strided_conv_sites, +15% seed spread) at ~1.5x headroom.
    # Overflows are counted and hard-gated, so an out-of-distribution scene
    # fails loudly instead of silently truncating.
    unet_capacities: tuple[int, ...] = (100_000, 81_920, 40_960, 18_432, 12_288)
    # post-voxelizer compaction: the voxelizer keeps the reference's 100k
    # cap (drop-behavior parity), but actual HDL-64 scans occupy <=55k
    # voxels in this crop, and sites are stored sorted-key with valid rows
    # as a PREFIX — so the UNet's working set is a free slice to this
    # capacity. Every downstream pass (pair maps, plans, convs, glue)
    # scales with it. Sliced-off voxels are counted and hard-gated.
    unet_site_capacity: int = 65_536
    motionnet: MotionNetConfig = field(default_factory=MotionNetConfig)
    bev: BEVConfig = field(default_factory=BEVConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    post: PostProcessConfig = field(default_factory=PostProcessConfig)


@dataclass(frozen=True)
class TrainConfig:
    max_epoch: int = 160
    lr: float = 1e-4
    lr_epoch: int = 1
    lr_decay: float = 0.99
    weight_decay: float = 1e-4
    batch_size: int = 1
    acc_batches: int = 1
    augmentation: bool = True
    # BatchNorm running-stat momentum multiplier. 1.0 keeps the
    # reference's per-layer values (ME 0.1, spconv/BEV 0.01 -
    # spconv_unet.py:118). Short synthetic schedules (the closed-loop
    # test trains ~100 steps vs the reference's 160 epochs) need a larger
    # multiplier or eval-mode running stats never converge to the batch
    # statistics the train forward normalizes with (measured: held-out
    # moving-IoU 0.70 with batch stats vs 0.00 with stale running stats).
    bn_momentum_scale: float = 1.0


@dataclass(frozen=True)
class RuntimeConfig:
    """TPU execution parameters (no reference counterpart)."""

    max_points_per_scan: int = 131_072  # KITTI HDL-64E ceiling
    # bf16 matmul operands / f32 accumulation: measured ~8-100x faster than
    # f32 matmuls on the target TPU (tools/probe_matmul2.py); set "float32"
    # for bit-accurate oracle comparisons.
    compute_dtype: str = "bfloat16"
    conv_chunk: int = 65_536  # row-chunk for gather-conv intermediates
    # sparse conv engine: "auto" = Pallas span kernel for inference on TPU,
    # XLA windowed path for training/CPU; "window" / "span" force one.
    sparse_engine: str = "auto"
    data_axis: str = "data"  # mesh axis name for data parallelism
    # Streaming-inference stem reuse (fixed-frame deployment): cache the
    # stem's per-slot activations across window shifts and compute only the
    # new scan's slot (exact per-slot stationarity, kt=1 — PERF.md
    # "Incremental window reuse"). Requires the window to stay in ONE
    # odometry-fixed voxel frame between steps (pipeline tf must be
    # identity / an integer-voxel translation); a documented deviation from
    # the reference's per-step re-rotation when used on real poses.
    incremental_stem: bool = False


@dataclass(frozen=True)
class Config:
    experiment_id: str = "InsMOS"
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    # ------------------------------------------------------------------ io
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        def build(tp, val):
            if dataclasses.is_dataclass(tp) and isinstance(val, dict):
                defaults = tp()
                kw = {
                    f.name: build(type(getattr(defaults, f.name)), val[f.name])
                    if dataclasses.is_dataclass(getattr(defaults, f.name))
                    else (tuple(val[f.name]) if isinstance(val[f.name], list) else val[f.name])
                    for f in dataclasses.fields(tp)
                    if f.name in val
                }
                return dataclasses.replace(defaults, **kw)
            if isinstance(val, list):
                return tuple(val)
            return val

        return build(cls, d)

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path) as fh:
            raw = yaml.safe_load(fh)
        if "MODEL" in raw or "DATA" in raw:
            return cls.from_reference_dict(raw)
        return cls.from_dict(raw)

    @classmethod
    def from_reference_dict(cls, raw: dict[str, Any]) -> "Config":
        """Build from the reference's nested config.yaml schema."""
        d = raw.get("DATA", {})
        m = raw.get("MODEL", {})
        t = raw.get("TRAIN", {})
        head = m.get("DENSE_HEAD", {})
        ta = head.get("TARGET_ASSIGNER_CONFIG", {})
        lw = head.get("LOSS_CONFIG", {}).get("LOSS_WEIGHTS", {})
        pp = m.get("POST_PROCESSING", {})
        nms = pp.get("NMS_CONFIG", {})
        b2 = m.get("BACKBONE_2D", {})
        split = d.get("SPLIT", {})
        base = cls()
        return cls(
            experiment_id=raw.get("EXPERIMENT", {}).get("ID", base.experiment_id),
            data=DataConfig(
                point_cloud_range=tuple(d.get("POINT_CLOUD_RANGE", base.data.point_cloud_range)),
                voxel_size=tuple(d.get("VOXEL_SIZE", base.data.voxel_size)),
                transform=d.get("TRANSFORM", True),
                poses_file=d.get("POSES", "poses.txt"),
                shuffle=d.get("SHUFFLE", True),
                num_workers=d.get("NUM_WORKER", 4),
                delta_t_data=d.get("DELTA_T_DATA", 0.1),
                split_train=tuple(split.get("TRAIN", base.data.split_train)),
                split_val=tuple(split.get("VAL", base.data.split_val)),
                split_test=tuple(split.get("TEST", base.data.split_test)),
            ),
            model=ModelConfig(
                delta_t_prediction=m.get("DELTA_T_PREDICTION", 0.1),
                n_past_steps=m.get("N_PAST_STEPS", 10),
                use_motion_loss=m.get("USE_MOTION_LOSS", True),
                bev=BEVConfig(
                    num_bev_features=m.get("MAP_TO_BEV", {}).get("NUM_BEV_FEATURES", 256),
                    layer_nums=tuple(b2.get("LAYER_NUMS", (5,))),
                    layer_strides=tuple(b2.get("LAYER_STRIDES", (1,))),
                    num_filters=tuple(b2.get("NUM_FILTERS", (128,))),
                    upsample_strides=tuple(b2.get("UPSAMPLE_STRIDES", (2,))),
                    num_upsample_filters=tuple(b2.get("NUM_UPSAMPLE_FILTERS", (256,))),
                ),
                head=HeadConfig(
                    num_class=head.get("NUM_CLASS", 3),
                    max_objs=ta.get("MAX_OBJS", 100),
                    out_size_factor=ta.get("OUT_SIZE_FACTOR", 4),
                    gaussian_overlap=ta.get("GAUSSIAN_OVERLAP", 0.1),
                    min_radius=ta.get("MIN_RADIUS", 2),
                    cls_weight=lw.get("cls_weight", 1.0),
                    loc_weight=lw.get("loc_weight", 2.0),
                    code_weights=tuple(lw.get("code_weights", (1.0,) * 8)),
                ),
                post=PostProcessConfig(
                    score_thresh=pp.get("SCORE_THRESH", 0.1),
                    nms_thresh=nms.get("NMS_THRESH", 0.01),
                    nms_pre_maxsize=nms.get("NMS_PRE_MAXSIZE", 4096),
                    nms_post_maxsize=nms.get("NMS_POST_MAXSIZE", 500),
                    recall_thresh_list=tuple(pp.get("RECALL_THRESH_LIST", (0.3, 0.5, 0.7))),
                    multi_classes_nms=bool(nms.get("MULTI_CLASSES_NMS", False)),
                ),
            ),
            train=TrainConfig(
                max_epoch=t.get("MAX_EPOCH", 160),
                lr=t.get("LR", 1e-4),
                lr_epoch=t.get("LR_EPOCH", 1),
                lr_decay=t.get("LR_DECAY", 0.99),
                weight_decay=t.get("WEIGHT_DECAY", 1e-4),
                batch_size=t.get("BATCH_SIZE", 1),
                acc_batches=t.get("ACC_BATCHES", 1),
                augmentation=t.get("AUGMENTATION", True),
                bn_momentum_scale=t.get("BN_MOMENTUM_SCALE", 1.0),
            ),
        )

    # ------------------------------------------------------------- scaling
    def tiny(self, *, points: int = 2048, max_voxels: int = 4096) -> "Config":
        """A small-capacity clone for tests / compile checks."""
        mn = dataclasses.replace(
            self.model.motionnet,
            site_capacities=(4 * points, 2 * points, points, points),
            stem_scan_capacity=points,
        )
        model = dataclasses.replace(
            self.model,
            max_voxels=max_voxels,
            unet_capacities=(max_voxels,) + tuple(
                max(256, max_voxels // (2**i)) for i in range(1, 5)
            ),
            unet_site_capacity=max_voxels,
            motionnet=mn,
        )
        runtime = dataclasses.replace(self.runtime, max_points_per_scan=points)
        return dataclasses.replace(self, model=model, runtime=runtime)


def load_config(path: str | None = None) -> Config:
    return Config() if path is None else Config.from_yaml(path)
