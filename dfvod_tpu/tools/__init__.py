"""Offline tooling (SURVEY.md §2.4 L7): monocular depth generation,
YOLO -> COCO label conversion, mean/std computation, benchmark CLI."""
