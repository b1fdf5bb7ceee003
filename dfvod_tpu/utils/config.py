"""Config system — typed replacement for the reference's ~60 argparse flags.

The reference duplicates its flag surface across ``main.py:31-194``,
``main_multi.py:28-177`` and ``inference.py:36-194`` and maps the public
``--fusion_type`` onto 13 internal ``depth_type`` strings
(``deformable_detr_single.py:630-646``). Here a single frozen dataclass is
the source of truth; the CLIs build one from argparse flags with the same
names. Only the four canonical fusion modes are exposed.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

FUSION_TYPES = ("Baseline", "LateFusion", "Backbone_CrossFusion",
                "Encoder_CrossFusion")
TEMPORAL_MODES = ("none", "transvod", "transvod_pp")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model architecture configuration (reference defaults from
    ``configs/training/*.sh`` + ``main.py:31-194``)."""
    num_classes: int = 3
    num_queries: int = 300
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 1
    dec_n_points: int = 4
    enc_n_points: int = 4
    dpth_n_points: int = 4
    backbone: str = "resnet50"
    depth_backbone_type: str = "dformer"  # dformer | resnet18 (research
                                          # fallback, ``research_scripts/``)
    dformer_weights: str = ""  # DFormer pretrain .pth for the depth stem
                               # (``main.py:168``, selective loading)
    dilation: bool = True
    position_embedding: str = "sine"
    with_box_refine: bool = True
    two_stage: bool = False
    aux_loss: bool = True
    use_depth: bool = False
    fusion_type: str = "Baseline"
    # temporal (video) head
    temporal_mode: str = "none"         # none | transvod | transvod_pp
    num_ref_frames: int = 3
    n_temporal_decoder_layers: int = 1
    use_tdam: bool = False              # flag False in TransVOD (``:46``);
                                        # the ++ call site is dead code
                                        # (``..._plusplus.py:428-429``)
    interval1: int = 20
    interval2: int = 60
    fixed_pretrained_model: bool = False
    # segmentation head (``main.py:110`` --masks; dormant in the
    # reference thesis but fully wired: DETRsegm mask branch + focal/dice
    # losses + PostProcessSegm/Panoptic)
    masks: bool = False
    frozen_weights: str = ""            # seg-only training checkpoint
    # compute
    compute_dtype: str = "float32"      # float32 | bfloat16
    remat: bool = False                 # jax.checkpoint encoder layers

    def __post_init__(self):
        assert self.fusion_type in FUSION_TYPES, self.fusion_type
        assert self.temporal_mode in TEMPORAL_MODES, self.temporal_mode
        if self.fusion_type != "Baseline":
            object.__setattr__(self, "use_depth", True)
        if self.masks:
            assert self.fusion_type != "Backbone_CrossFusion", \
                "mask head needs raw backbone stage outputs"

    @property
    def transformer_fusion(self) -> str:
        return {"Baseline": "none", "LateFusion": "late",
                "Backbone_CrossFusion": "none",
                "Encoder_CrossFusion": "encoder_cf"}[self.fusion_type]

    @property
    def backbone_stages(self) -> Tuple[int, ...]:
        # reference: return layer2/3/4 for multi-level, layer4 only otherwise
        # (``backbone_scratch.py:98-100``)
        return (2, 3, 4) if self.num_feature_levels > 1 else (4,)

    @property
    def all_backbone_stages(self) -> Tuple[int, ...]:
        """Stages the backbone must compute: transformer levels plus the
        mask head's FPN laterals (layers 1-3, DETR segmentation)."""
        if self.masks:
            return tuple(sorted(set(self.backbone_stages) | {1, 2, 3}))
        return self.backbone_stages


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Criterion weights (reference ``main.py`` loss coef flags)."""
    cls_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    mask_loss_coef: float = 1.0         # ``main.py:126``
    dice_loss_coef: float = 1.0         # ``main.py:127``
    focal_alpha: float = 0.25
    set_cost_class: float = 2.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule config (``main.py:311-435``)."""
    lr: float = 1e-4
    lr_backbone: float = 1e-5
    lr_linear_proj_mult: float = 0.1
    weight_decay: float = 2e-5
    clip_max_norm: float = 0.1
    epochs: int = 20
    batch_size: int = 4
    seed: int = 42
    sgd: bool = False
    cosine_eta_min_mult: float = 0.1    # CosineAnnealingLR eta_min = 0.1*lr
    # cap the local devices in the mesh (0 = all); the launcher-side
    # counterpart of the reference's ``--nproc_per_node``
    num_devices: int = 0
    # 'bfloat16': mixed-precision training — f32 master params/optimizer,
    # bf16 params+activations inside the step (enables the Pallas hat
    # MSDA/RoIAlign kernels in training)
    train_dtype: str = "float32"
    # capture a jax.profiler trace of early train steps into this dir
    # (SURVEY.md §5: the TPU-native replacement for the reference's
    # commented time.time() probes)
    profile_dir: str = ""
    # run COCO eval every N epochs during training (the reference
    # evaluates EVERY epoch, ``main.py:587-600``; 0 keeps end-of-run
    # only). The best-mAP@0.5 checkpoint is kept under
    # ``output_dir/best``.
    eval_every: int = 0


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset config (``datasets/vid_single.py`` / ``vid_multi.py``)."""
    coco_path: str = ""
    coco_panoptic_path: str = ""        # ``main.py:144`` (panoptic anns)
    dataset_file: str = "vid_single"
    use_depth: bool = False
    num_ref_frames: int = 3
    max_boxes: int = 64                  # static padding for targets
    # static resize buckets (replaces NestedTensor variable padding):
    # (short side, max long side) -> padded static shapes
    train_short_sides: Tuple[int, ...] = (480, 512, 544, 576, 608, 640,
                                          672, 704, 736, 768, 800)
    max_size: int = 1333
    eval_short_side: int = 600
    # normalization: RGB ImageNet + depth DFormer stats
    # (``vid_single.py:133-142``)
    rgb_mean: Tuple[float, ...] = (0.485, 0.456, 0.406)
    rgb_std: Tuple[float, ...] = (0.229, 0.224, 0.225)
    depth_mean: float = 0.48
    depth_std: float = 0.28
    # ship uint8 frames; normalize/mask on device inside the jitted step
    # (``data/device_pipeline.py``) — 4x less H2D traffic
    device_preprocess: bool = False
    # host-side 2x2 space-to-depth packing of the uint8 batch
    # (``data/device_pipeline.pack_s2d``); needs device_preprocess
    pack_s2d: bool = False
    # whole-dataset in-RAM byte cache, sharded across loader workers
    # (``main.py:158`` --cache_mode + NodeDistributedSampler pairing)
    cache_mode: bool = False
    # loader worker threads (``main.py:156`` --num_workers); 0 = the
    # single double-buffering prefetch thread
    num_workers: int = 0
    # photometric distortion + MinIoURandomCrop in the train transform —
    # the reference's library extras (``transforms_multi.py:254-398``,
    # shipped but not enabled in its production pipeline). Worthwhile on
    # tiny training sets (datasets/oid_hands: 20 images).
    strong_aug: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    output_dir: str = ""
    device: str = "tpu"

    def __post_init__(self):
        # single source of truth: a depth-fusion model forces the data
        # pipeline's use_depth (the reference keeps one args namespace;
        # here the flag exists in both sub-configs)
        if self.model.use_depth and not self.data.use_depth:
            object.__setattr__(self, "data", dataclasses.replace(
                self.data, use_depth=True))
        if self.model.temporal_mode != "none" and \
                self.data.num_ref_frames != self.model.num_ref_frames:
            object.__setattr__(self, "data", dataclasses.replace(
                self.data, num_ref_frames=self.model.num_ref_frames))

    @staticmethod
    def from_flat(**kw) -> "Config":
        """Build from flat argparse-style keywords."""
        def pick(cls):
            names = {f.name for f in dataclasses.fields(cls)}
            return {k: v for k, v in kw.items() if k in names and
                    v is not None}
        return Config(
            model=ModelConfig(**pick(ModelConfig)),
            loss=LossConfig(**pick(LossConfig)),
            train=TrainConfig(**pick(TrainConfig)),
            data=DataConfig(**pick(DataConfig)),
            output_dir=kw.get("output_dir", "") or "",
        )
