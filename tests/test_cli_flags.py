"""CLI flag-surface tests: reference flag names parse into the typed
Config correctly (``main.py:31-194`` / ``main_multi.py:28-177`` parity)."""
from dfvod_tpu.cli.flags import config_from_args, get_args_parser


def parse(argv, video=False):
    args = get_args_parser(video=video).parse_args(argv)
    return args, config_from_args(args, video=video)


class TestFlags:
    def test_defaults_match_reference(self):
        """A bare ``dfvod_tpu.cli.main`` builds the same model config as a
        bare reference ``main.py`` (``main.py:41,64,76,82`` defaults).
        Production configs pass every deviating flag explicitly."""
        _, cfg = parse([])
        assert cfg.model.hidden_dim == 256
        assert cfg.model.num_queries == 300
        assert cfg.model.num_feature_levels == 4      # main.py:82
        assert cfg.model.dilation is False            # main.py:76
        assert cfg.model.with_box_refine is False     # main.py:64
        assert cfg.train.lr == 1e-4
        assert cfg.train.lr_backbone == 2e-5          # main.py:41
        assert cfg.train.weight_decay == 2e-5
        assert cfg.model.temporal_mode == "none"

    def test_fusion_forces_depth_everywhere(self):
        _, cfg = parse(["--fusion_type", "LateFusion"])
        assert cfg.model.use_depth and cfg.data.use_depth

    def test_video_mode_dispatch(self):
        # mirrors models/__init__.py:16-24: dataset_file string selects
        # TransVOD vs TransVOD++
        _, cfg = parse(["--dataset_file", "vid_multi",
                        "--num_ref_frames", "4"], video=True)
        assert cfg.model.temporal_mode == "transvod"
        assert cfg.model.num_ref_frames == 4
        assert cfg.data.num_ref_frames == 4
        _, cfg = parse(["--dataset_file", "vid_multi_plusplus"],
                       video=True)
        assert cfg.model.temporal_mode == "transvod_pp"

    def test_cache_mode_and_num_devices(self):
        _, cfg = parse(["--cache_mode", "--num_devices", "2"])
        assert cfg.data.cache_mode
        assert cfg.train.num_devices == 2
        _, cfg = parse([])
        assert not cfg.data.cache_mode
        assert cfg.train.num_devices == 0

    def test_plain_coco_layout(self, tmp_path):
        """dataset_file='coco' selects the train2017/instances_* layout
        (``datasets/coco.py:151-161``)."""
        import dataclasses
        from dfvod_tpu.data import dataset as ds_mod
        _, cfg = parse(["--dataset_file", "coco",
                        "--coco_path", str(tmp_path)])
        captured = {}

        class Spy:
            def __init__(self, img_folder, ann_file, **kw):
                captured["img"] = img_folder
                captured["ann"] = ann_file

        orig = ds_mod.CocoDetectionDataset
        ds_mod.CocoDetectionDataset = Spy
        try:
            ds_mod.build_dataset("train", cfg)
        finally:
            ds_mod.CocoDetectionDataset = orig
        assert captured["img"].endswith("train2017")
        assert captured["ann"].endswith("instances_train2017.json")

    def test_training_knobs(self):
        _, cfg = parse(["--lr", "1e-5", "--batch_size", "6",
                        "--dropout", "0.2", "--epochs", "7", "--sgd",
                        "--two_stage", "--remat", "--device_preprocess"])
        assert cfg.train.lr == 1e-5
        assert cfg.train.batch_size == 6
        assert cfg.model.dropout == 0.2
        assert cfg.train.sgd and cfg.model.two_stage
        assert cfg.model.remat
        assert cfg.data.device_preprocess

    def test_num_workers(self):
        _, cfg = parse(["--num_workers", "4"])
        assert cfg.data.num_workers == 4
        _, cfg = parse([])
        assert cfg.data.num_workers == 0

    def test_no_aux_loss(self):
        _, cfg = parse(["--no_aux_loss"])
        assert not cfg.model.aux_loss
