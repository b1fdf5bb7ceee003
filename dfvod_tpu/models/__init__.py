"""Model factory, mirroring ``models/__init__.py:16-24`` of the reference:
``build_model(cfg)`` -> (model, criterion, postprocess). Dispatch between
single-frame and temporal variants happens via ``cfg.model.temporal_mode``
instead of the reference's ``dataset_file`` string."""
from __future__ import annotations

from dfvod_tpu.models.criterion import SetCriterion
from dfvod_tpu.models.detr import DeformableDETR
from dfvod_tpu.models.postprocess import postprocess
from dfvod_tpu.utils.config import Config


def build_model(cfg: Config):
    m = cfg.model
    if m.temporal_mode == "none":
        model = DeformableDETR(m)
    else:
        from dfvod_tpu.models.temporal import TemporalDeformableDETR
        model = TemporalDeformableDETR(m)
    criterion = SetCriterion(m.num_classes, cfg.loss,
                             dec_layers=m.dec_layers)
    return model, criterion, postprocess
