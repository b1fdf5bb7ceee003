"""2-process multi-host simulation worker (spawned by test_multihost.py).

Each process runs the CPU backend with 2 virtual local devices; together
they form one 4-device global mesh — the same topology as a 2-host TPU
pod slice (multi-*device* is covered by the 8-device single-process
conftest mesh; this covers the multi-*process* surfaces the reference
drives through torch.distributed/NCCL, ``util/misc.py:441-479``):

1. ``jax.distributed`` bootstrap (coordinator rendezvous, Gloo
   collectives on CPU — stands in for DCN between TPU hosts),
2. one sharded train step over the global mesh: batch sharded over the
   ``data`` axis across BOTH processes, params replicated, the gradient
   all-reduce crossing the process boundary (DDP's NCCL all-reduce,
   ``main.py:439-443``),
3. the COCO evaluator's ``process_allgather`` detection merge — the
   reference's ``synchronize_between_processes`` (``coco_eval.py:63-66``,
   pickled byte-tensor all_gather ``util/misc.py:124-164``).

Prints ``MULTIHOST_OK rank=<r> loss=<loss> map=<mAP>`` on success; the
test asserts both ranks print identical loss/mAP.
"""
import os
import sys

proc = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dfvod_tpu.data.coco import COCO  # noqa: E402
from dfvod_tpu.data.coco_eval import COCOEvaluator  # noqa: E402
from dfvod_tpu.models import build_model  # noqa: E402
from dfvod_tpu.parallel import make_mesh, shard_batch  # noqa: E402
from dfvod_tpu.train import create_train_state, make_train_step  # noqa: E402
from dfvod_tpu.utils.config import (  # noqa: E402
    Config, ModelConfig, TrainConfig)

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2


def main():
    # ---- sharded train step across both processes -----------------------
    cfg = Config(
        model=ModelConfig(
            num_classes=3, num_queries=8, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, fusion_type="Baseline",
            with_box_refine=True, aux_loss=False),
        train=TrainConfig(lr=1e-4))
    model, criterion, _ = build_model(cfg)
    mesh = make_mesh(jax.devices())  # 4-way DP over 2 processes

    B, H, W, T = 4, 48, 48, 4
    rng = np.random.default_rng(0)  # identical on both ranks -> the
    # device_put below slices consistent global shards from each host copy
    batch = {
        "images": rng.standard_normal((B, H, W, 3)).astype(np.float32),
        "mask": np.zeros((B, H, W), bool),
        "labels": np.ones((B, T), np.int32),
        "boxes": np.tile(np.array([0.5, 0.5, 0.2, 0.2], np.float32),
                         (B, T, 1)),
        "valid": np.tile(np.arange(T) < 2, (B, 1)),
    }

    state, tx, labels = create_train_state(jax.random.PRNGKey(0), model,
                                           cfg, batch, steps_per_epoch=10)
    # init built process-local arrays; commit them to the global
    # replicated sharding (both ranks hold identical values from the
    # same PRNG, so the host->global put is consistent)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x),
                                 NamedSharding(mesh, P())), state)
    batch = shard_batch(batch, mesh)

    step = make_train_step(model, criterion, tx, mesh=mesh, donate=False,
                           labels=labels)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])          # replicated -> addressable
    gnorm = float(metrics["grad_norm"])
    assert np.isfinite(loss) and np.isfinite(gnorm), (loss, gnorm)

    # ---- evaluator merge across processes --------------------------------
    gt = COCO(dataset={
        "images": [{"id": i, "width": 100, "height": 100,
                    "file_name": f"{i}.jpg"} for i in (1, 2)],
        "annotations": [
            {"id": i, "image_id": i, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0}
            for i in (1, 2)],
        "categories": [{"id": 1, "name": "hand"}]})
    ev = COCOEvaluator(gt)
    my_img = proc + 1  # rank 0 evaluated image 1, rank 1 image 2
    ev.update({my_img: {
        "boxes": np.array([[10.0, 10.0, 30.0, 30.0]]),
        "scores": np.array([0.9]), "labels": np.array([1])}})
    ev.synchronize_between_processes()
    assert len(ev.detections) == 2, ev.detections
    assert ev._seen == {1, 2}, ev._seen
    stats = ev.summarize(verbose=False)

    print(f"MULTIHOST_OK rank={proc} loss={loss:.6f} "
          f"map={stats['mAP']:.4f}", flush=True)


if __name__ == "__main__":
    main()
