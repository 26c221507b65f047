#!/usr/bin/env python
"""Fine-grained timing of the ff baseline pipeline at c5 scale (round
4): ablate_c5_update.py times the whole block at ~12.8 ms; this splits
values_ff vs normal_eq_ff vs the v-concat materialisation inside it,
and times XLA alternatives (per-block dots without the concat), to size
a fused Pallas moments kernel before building it.

Run alone (never concurrently with another TPU process).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    return float(np.asarray(x).ravel()[-1])


def _slope_time(fn, args, n_lo=4, n_hi=20, reps=3):
    import jax
    import jax.numpy as jnp

    def chain(n):
        def run(*a):
            def body(acc, _):
                eps = (acc * 1e-30).astype(a[0].dtype)
                out = fn(a[0] + eps, *a[1:])
                leaves = [jnp.sum(x.astype(jnp.float32))
                          for x in jax.tree.leaves(out)]
                return acc + sum(leaves) * 1e-20, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return jax.jit(run)

    c_lo, c_hi = chain(n_lo), chain(n_hi)
    _fetch(c_lo(*args)); _fetch(c_hi(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _fetch(c_lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(c_hi(*args))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return 1e3 * best


def main():
    import jax
    import jax.numpy as jnp

    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.models import baseline

    cfg = CONFIGS[os.environ.get("PROBE_CONFIG", "c5_multitask")]
    T, N, do = cfg.horizon, cfg.n_envs, cfg.obs_dim
    print(f"# {cfg.name}: T={T} N={N} do={do}", flush=True)

    key = jax.random.PRNGKey(0)
    obs_ff = jax.random.normal(key, (T, do, N), jnp.float32) \
        .astype(jnp.bfloat16)
    targets = jax.random.normal(jax.random.PRNGKey(1), (T, N), jnp.float32)
    w = jnp.ones(baseline.n_features(do), jnp.float32) * 0.01

    results = {}

    def report(tag, ms):
        results[tag] = ms
        print(f"{tag:28s} {ms:8.3f} ms", flush=True)

    report("values_ff", _slope_time(
        lambda o: baseline.values_ff(w, o, cfg.horizon, tn=True),
        (obs_ff,)))
    report("normal_eq_ff", _slope_time(
        lambda o, y: baseline.normal_eq_ff(o, y, cfg.horizon),
        (obs_ff, targets)))

    # the v concat alone (materialisation cost)
    def concat_only(o, y):
        v = jnp.concatenate([o, o * o, y[:, None, :].astype(o.dtype)],
                            axis=1)
        return jnp.sum(v.astype(jnp.float32))

    report("v_concat_only", _slope_time(concat_only, (obs_ff, targets)))

    # per-block dots, no concat: does XLA fuse the elementwise square
    # into the dot operand read?
    def blocks_no_concat(o, y):
        f32 = jnp.float32
        q = o * o
        yb = y.astype(o.dtype)
        G_oo = jnp.einsum("tdn,ten->de", o, o, preferred_element_type=f32)
        G_oq = jnp.einsum("tdn,ten->de", o, q, preferred_element_type=f32)
        G_qq = jnp.einsum("tdn,ten->de", q, q, preferred_element_type=f32)
        b_o = jnp.einsum("tdn,tn->d", o, yb, preferred_element_type=f32)
        b_q = jnp.einsum("tdn,tn->d", q, yb, preferred_element_type=f32)
        tau = baseline._time_features(o.shape[0], cfg.horizon, f32)
        C_o = jnp.einsum("tdn,tk->dk", o.astype(f32), tau)
        C_q = jnp.einsum("tdn,tk->dk", q.astype(f32), tau)
        b_t = jnp.einsum("tn,tk->k", y, tau)
        return (G_oo, G_oq, G_qq, b_o, b_q, C_o, C_q, b_t)

    report("blocks_no_concat", _slope_time(blocks_no_concat,
                                           (obs_ff, targets)))

    # floor: one bandwidth pass over obs_ff
    report("one_pass_sum", _slope_time(
        lambda o: jnp.sum(o.astype(jnp.float32)), (obs_ff,)))

    print(json.dumps({"config": cfg.name, "blocks_ms": results}))


if __name__ == "__main__":
    main()
