"""Full-scale training feasibility measurement (VERDICT round-1 #5).

One real train step at reference capacities on the current device
(windowed XLA engine — the differentiable path): reports compile time,
steady-state step time, device memory in use, and an epochs/day estimate
against the reference schedule (160 epochs x ~19k train samples at batch
size 4 on one RTX 3090; config/config.yaml:58, README.md:195).

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/measure_train_step.py [--batch 1]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _bench_cfg, make_window
    from insmos_tpu.nn import InsMOSModel
    from insmos_tpu.train import TrainState, make_train_step
    from insmos_tpu.train.optim import make_optimizer

    cfg = _bench_cfg()
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, steps_per_epoch=4768)  # ~19k samples / batch 4
    ts = TrainState(params, state, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx)

    sample = make_window(cfg, seed=0)
    # synthetic labels/boxes so every loss term is exercised
    rng = np.random.default_rng(0)
    W, P = sample["points"].shape[:2]
    sample["labels"] = rng.integers(0, 3, (W, P)).astype(np.int32)
    boxes = np.zeros_like(sample["gt_boxes"])
    boxes[:4] = np.array(
        [[10, 5, -0.8, 4.5, 1.9, 1.6, 0.3, 1],
         [-8, 2, -0.9, 4.2, 1.8, 1.5, 1.1, 1],
         [3, -12, -0.7, 0.8, 0.8, 1.7, 0.0, 2],
         [15, 8, -0.8, 1.8, 0.7, 1.6, 2.0, 3]], np.float32,
    )
    sample["gt_boxes"] = boxes
    sample["num_boxes"] = np.int32(4)
    batch = {
        k: jnp.asarray(np.broadcast_to(np.asarray(v)[None],
                                       (args.batch,) + np.asarray(v).shape))
        for k, v in sample.items()
    }

    print(f"backend={jax.default_backend()} batch={args.batch}", flush=True)
    t0 = time.perf_counter()
    ts, metrics = step(ts, batch)
    loss0 = float(metrics["loss"])
    t_compile = time.perf_counter() - t0
    print(f"first step (compile + run): {t_compile:.1f} s, loss={loss0:.3f}",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        ts, metrics = step(ts, batch)
    float(metrics["loss"])  # fence
    dt = (time.perf_counter() - t0) / args.iters
    print(f"steady step: {dt:.2f} s/step (batch {args.batch})", flush=True)

    try:
        ms = jax.devices()[0].memory_stats()
        print(f"device memory: in_use={ms.get('bytes_in_use', 0)/2**30:.2f} GiB "
              f"peak={ms.get('peak_bytes_in_use', 0)/2**30:.2f} GiB")
    except Exception as e:
        print(f"memory_stats unavailable: {e}")

    samples_per_day = 86400 / dt * args.batch
    ref_epoch = 19_130  # KITTI seqs 00-07,09,10 train scans (approx)
    print(f"epochs/day at this step time: {samples_per_day / ref_epoch:.1f} "
          f"(reference schedule: 160 epochs)")


if __name__ == "__main__":
    main()
