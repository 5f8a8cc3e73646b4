"""Capture a 2-step device trace of the vmapped S-slot pod step.

    python tools/trace_pod_step.py [S] [/tmp/jaxtrace_pod]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/insmos_jax_cache")


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace_pod"
    import jax

    from bench import _bench_cfg, _run_streams, _setup_compile_cache

    _setup_compile_cache()
    cfg = _bench_cfg()
    from insmos_tpu.nn.model import InsMOSModel

    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    import bench as B
    import time

    # reuse _run_streams internals by monkey-timing: run warm=12, iters=2
    # under the profiler via a small copy of its loop
    import jax.numpy as jnp
    import numpy as np
    from insmos_tpu.pipeline import InferencePipeline, PodInferencePipeline

    pipe = PodInferencePipeline(cfg, params, state, slots_per_device=S)
    pipe.reset()

    def step_m(buf, scan, n, tf, shift, active):
        def one(params, state, b, sc, nn, t, sh, act):
            nb, inter = pipe._single_step_motion(params, state, b, sc, nn, t, sh)
            nb = jax.tree.map(
                lambda a, bb: jnp.where(jnp.reshape(act, (1,) * a.ndim), a, bb),
                nb, b,
            )
            return nb, inter

        return jax.vmap(one, in_axes=(None, None, 0, 0, 0, 0, 0, 0))(
            pipe.params, pipe.state, buf, scan, n, tf, shift, active
        )

    def step_t(inter):
        out = jax.vmap(
            lambda params, state, it: InferencePipeline._step_tail(
                pipe, params, state, it
            ),
            in_axes=(None, None, 0),
        )(pipe.params, pipe.state, inter)
        return B._digest_and_gates(out)

    step_m = jax.jit(step_m, donate_argnums=(0,))
    step_t = jax.jit(step_t, donate_argnums=(0,))

    warm, iters = 4, 2
    n_steps = warm + iters
    streams = [B.make_stream(cfg, n_steps, seed=s) for s in range(S)]
    scans = [
        jax.device_put(np.stack([streams[s][0][i] for s in range(S)]))
        for i in range(n_steps)
    ]
    ns = [
        jnp.asarray([streams[s][1][i] for s in range(S)], jnp.int32)
        for i in range(n_steps)
    ]
    tfs = [
        jax.device_put(np.stack([streams[s][2][i] for s in range(S)]))
        for i in range(n_steps)
    ]
    shifts = [
        jax.device_put(np.stack([streams[s][3][i] for s in range(S)]))
        for i in range(n_steps)
    ]
    active = jnp.ones((S,), bool)
    buf = pipe._buf
    for i in range(warm):
        buf, inter = step_m(buf, scans[i], ns[i], tfs[i], shifts[i], active)
        digest, *_ = step_t(inter)
    float(digest)
    with jax.profiler.trace(out_dir):
        for i in range(iters):
            j = warm + i
            buf, inter = step_m(buf, scans[j], ns[j], tfs[j], shifts[j], active)
            digest, *_ = step_t(inter)
        float(digest)
    print("trace done:", out_dir)


if __name__ == "__main__":
    main()
