"""Worker for the 2-process multi-host test (launched by test_multihost.py).

Exercises the real multi-controller path on CPU: `jax.distributed.initialize`
over Gloo, per-process loader sharding (`datasets/base_dataset.py` strided
split), global-batch assembly (`parallel/mesh.shard_batch` via
`make_array_from_process_local_data`), and ONE jitted sharded train step
(`train/trainer.make_step_fns`) — the multi-host analog of the reference's
DDP/NCCL launch (`train.py:620-638`).

Prints one JSON line: {"pid", "items", "loss"}.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np
    import optax

    from gluefactory_tpu.datasets.base_dataset import Loader
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.parallel.mesh import make_mesh, shard_batch
    from gluefactory_tpu.train.trainer import TrainState, make_step_fns

    # --- per-process loader sharding over a toy map-style dataset ----------
    size, B_local = 64, 2

    class Toy:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            img = rng.rand(size, size, 1).astype(np.float32)
            return {
                "view0": {
                    "image": img,
                    "image_size": np.array([size, size], np.float32),
                },
                "view1": {
                    "image": img,
                    "image_size": np.array([size, size], np.float32),
                },
                "H_0to1": np.eye(3, dtype=np.float32),
                "idx": np.int64(i),
            }

    loader = Loader(
        Toy(),
        batch_size=B_local,
        shuffle=False,
        num_workers=0,
        process_index=pid,
        process_count=nproc,
    )
    batch = next(iter(loader))
    items = [int(i) for i in np.asarray(batch["idx"])]

    # --- global mesh over all processes' devices, one sharded train step ---
    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1)

    conf = {
        "name": "two_view_pipeline",
        "extractor": {
            "name": "superpoint",
            "max_num_keypoints": 32,
            "detection_threshold": 0.0,
            "channels": [8, 8, 16],
            "trainable": False,
        },
        "matcher": {
            "name": "lightglue",
            "n_layers": 2,
            "descriptor_dim": 32,
            "num_heads": 4,
        },
        "ground_truth": {"name": "homography_matcher"},
    }
    model = get_model("two_view_pipeline").from_conf(conf)
    sharded = shard_batch(batch, mesh)
    # init from the GLOBAL sharded template so every process builds identical
    # params from the same seed
    params = model.init(jax.random.PRNGKey(0), sharded, train=True)
    tx = optax.adam(1e-4)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    train_step, *_ = make_step_fns(model, tx, mesh)
    state, losses, _, _ = train_step(state, sharded)
    loss = float(jnp.mean(losses["total"]))
    print(json.dumps({"pid": pid, "items": items, "loss": loss}), flush=True)


if __name__ == "__main__":
    main()
