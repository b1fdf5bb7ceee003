"""Video training CLI — TransVOD / TransVOD++.

Parity target: ``main_multi.py:179-484``. Differences from the single-frame
CLI are handled inside ``train_loop``: clip dataset + frame batching,
key-frame target slicing, temporal/spatial checkpoint merge
(``--transvod_temporal_weights`` / ``--spatial_weights``), and the
freeze-all-but-temporal mode (``--fixed_pretrained_model``,
``main_multi.py:380-386``) via the optimizer's label tree.

``--dataset_file vid_multi`` -> TransVOD; ``vid_multi_plusplus`` ->
TransVOD++ (mirrors ``models/__init__.py:16-24`` dispatch).
"""
from dfvod_tpu.cli.main import main

if __name__ == "__main__":
    main(video=True)
