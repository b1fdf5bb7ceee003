from dfvod_tpu.ops.msda import (  # noqa: F401
    level_start_index,
    ms_deform_attn,
    ms_deform_attn_flat,
    ms_deform_attn_xla,
    total_tokens,
)
from dfvod_tpu.ops.roi_align import roi_align  # noqa: F401
