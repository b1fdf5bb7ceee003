"""Pallas TPU kernel for multi-scale deformable attention.

Strategy: the flattened multi-level ``value`` tensor for the production
configs (single level at stride 16/32, d_model=256) fits comfortably in VMEM
(e.g. 38x63 tokens x 256 ch x 4 B ~= 2.4 MB), so the kernel keeps the whole
value block resident in VMEM, blocks over queries, and performs the L x P x 4
bilinear-corner gathers as VMEM loads — avoiding the HBM gather traffic the
XLA lowering incurs.

Round 1 ships the XLA path as default; this module currently reports
``supported() == False`` until the kernel lands (kept as an explicit stub so
the dispatch surface in ``msda.py`` is stable).
"""
from __future__ import annotations


def supported(value, spatial_shapes, sampling_locations) -> bool:
    return False


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    raise NotImplementedError("Pallas MSDA kernel not yet enabled")
