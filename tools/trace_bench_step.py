"""Capture a 2-step device trace of bench.py's single-stream steady state.

    python tools/trace_bench_step.py [/tmp/jaxtrace_bench]
then
    python tools/parse_trace.py /tmp/jaxtrace_bench
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/insmos_jax_cache")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_bench"
    import jax

    from bench import _bench_cfg, _digest_and_gates, _setup_compile_cache, make_stream
    from insmos_tpu.nn.model import InsMOSModel
    from insmos_tpu.pipeline import InferencePipeline

    _setup_compile_cache()
    cfg = _bench_cfg()
    model = InsMOSModel(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    pipe = InferencePipeline(cfg, params, state)
    pipe.reset()

    def step_m(buf, scan, n, tf, shift):
        return pipe._step_motion(pipe.params, pipe.state, buf, scan, n, tf, shift)

    def step_t(inter):
        out = pipe._step_tail(pipe.params, pipe.state, inter)
        return _digest_and_gates(out)

    step_m = jax.jit(step_m, donate_argnums=(0,))
    step_t = jax.jit(step_t, donate_argnums=(0,))

    def step(buf, scan, n, tf, shift):
        buf, inter = step_m(buf, scan, n, tf, shift)
        return (buf,) + step_t(inter)
    warm, iters = 12, 2
    scans, ns, tfs, shifts = make_stream(cfg, warm + iters, seed=0)
    scans = [jax.device_put(s) for s in scans]
    tfs = [jax.device_put(t) for t in tfs]
    shifts = [jax.device_put(s) for s in shifts]
    buf = pipe._buf
    for i in range(warm):
        buf, digest, *_ = step(buf, scans[i], ns[i], tfs[i], shifts[i])
    float(digest)
    with jax.profiler.trace(out_dir):
        for i in range(iters):
            j = warm + i
            buf, digest, *_ = step(buf, scans[j], ns[j], tfs[j], shifts[j])
        float(digest)
    print("trace done:", out_dir)


if __name__ == "__main__":
    main()
