"""dfvod_tpu — TPU-native RGB-D Deformable-DETR / TransVOD framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
bharathikannann/Depth-Fusion-in-Transformer-Based-Video-Object-Detection:
depth fusion (Late / Backbone-Cross / Encoder-Cross) for Deformable DETR
single-frame detection, plus TransVOD / TransVOD++ temporal video heads.

Layout
------
- ``ops``      : Pallas/XLA compute kernels (multi-scale deformable attention,
                 RoIAlign) — the TPU-native replacement for the reference's
                 CUDA extension in ``models/ops``.
- ``models``   : backbones, transformer trunk, fusion adapters, temporal heads,
                 matcher/criterion/postprocess.
- ``data``     : COCO / CocoVID parsing, paired RGB-D transforms, host loader.
- ``parallel`` : mesh construction + sharding rules (data/clip parallelism).
- ``utils``    : box ops, checkpointing, logging, config.
"""

__version__ = "0.1.0"
