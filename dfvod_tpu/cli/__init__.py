"""CLI layer — argparse entry points with the reference's flag surface
(``main.py:31-194``, ``main_multi.py:28-177``, ``inference.py:36-194``).

``python -m dfvod_tpu.cli.main``       — single-frame training/eval
``python -m dfvod_tpu.cli.main_multi`` — TransVOD/TransVOD++ training/eval
``python -m dfvod_tpu.cli.inference``  — image/folder/COCO inference
"""
