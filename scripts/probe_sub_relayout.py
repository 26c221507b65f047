#!/usr/bin/env python
"""CG-subsample relayout probe (round 4, VERDICT r3 next-4).

The ff update path hands the FVP kernel its strided Fisher subsample as
a batch-major fp32 (B/k, do) array; the shipped relayout
(trpo/update.py: transpose(sub, (0,2,1)).reshape(-1, do).astype(f32))
measured 5.6 ms at c5 — ~14x its ~0.4 ms HBM round-trip floor
(157 MB read + 630 MB write at ~800 GB/s), because XLA lowers the
(T/k, do, N) -> (T/k, N, do) minor-dim transpose as a chunked
while+dynamic-update-slice loop (the same pathology the ff pipeline
removed elsewhere, docs/performance.md).

Variants measured here at c5 scale (bf16 obs_ff in, fp32 out):
  shipped    transpose + reshape + cast (the 5.6 ms baseline)
  cast_first cast bf16->f32 before the transpose
  pallas     a tiled Pallas transpose kernel: blocks (Tk, do, bb) ->
             (Tk, bb, do); the (T/k, N, do) result reshapes for free
Run alone (one TPU client at a time).
"""
import functools
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


def pallas_ff_to_batch(sub, block_b=512, interpret=False):
    """(Ts, do, N) storage-dtype -> (Ts*N, do) fp32, sample order
    (t, n) — identical to transpose(sub,(0,2,1)).reshape(-1,do), done
    as a tiled Pallas transpose at HBM bandwidth."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Ts, do, N = sub.shape
    bb = min(block_b, N)
    assert N % bb == 0

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:].astype(jnp.float32), (0, 2, 1))

    out = pl.pallas_call(
        kernel, grid=(N // bb,),
        in_specs=[pl.BlockSpec((Ts, do, bb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Ts, bb, do), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ts, N, do), jnp.float32),
        interpret=interpret)(sub)
    return out.reshape(Ts * N, do)


def main():
    import jax
    import jax.numpy as jnp

    from trpo_robot_control_tpu.configs import CONFIGS
    cfg = CONFIGS[os.environ.get("PROBE_CONFIG", "c5_multitask")]
    T, N, do = cfg.horizon, cfg.n_envs, cfg.obs_dim
    k = max(cfg.trpo.fvp_subsample, 2)
    interpret = jax.default_backend() == "cpu"
    print(f"# {cfg.name}: T={T} N={N} do={do} stride={k} "
          f"(sub = ({T // k}, {do}, {N}))", flush=True)

    obs16 = jax.random.normal(jax.random.PRNGKey(0), (T, do, N)) \
        .astype(jnp.bfloat16)

    def shipped(o_ff):
        sub = o_ff[::k]
        return jnp.transpose(sub, (0, 2, 1)).reshape(-1, do) \
            .astype(jnp.float32)

    def cast_first(o_ff):
        sub = o_ff[::k].astype(jnp.float32)
        return jnp.transpose(sub, (0, 2, 1)).reshape(-1, do)

    def pallas_v(o_ff):
        return pallas_ff_to_batch(o_ff[::k], interpret=interpret)

    # correctness first (tiny shapes, any backend)
    small = jax.random.normal(jax.random.PRNGKey(1), (16, do, 256)) \
        .astype(jnp.bfloat16)
    ref = np.asarray(jnp.transpose(small[::k], (0, 2, 1))
                     .reshape(-1, do).astype(jnp.float32))
    got = np.asarray(pallas_ff_to_batch(small[::k], block_b=256,
                                        interpret=interpret))
    np.testing.assert_array_equal(got, ref)
    print("# pallas variant == shipped (bitwise) at small scale",
          flush=True)

    for tag, fn in (("shipped", shipped), ("cast_first", cast_first),
                    ("pallas", pallas_v)):
        ms = _slope_time(fn, (obs16,))
        print(f"{tag:12s} {ms:8.3f} ms", flush=True)

    # --- the update glue's full-batch 2-D transposes (candidates for
    # the ~14 ms c5 "misc" remainder): the ff path today flips between
    # (N, T) and (T, N) for rewards (kernel wrapper), GAE/whiten
    # (adv.T), targets (normal_eq_ff y.T), and values (values_ff v.T).
    # A (T, N)-native ff pipeline would delete all of them.
    rew_nt = jax.random.normal(jax.random.PRNGKey(2), (N, T))
    rew_tn = jax.random.normal(jax.random.PRNGKey(3), (T, N))
    print(f"transpose_NT_to_TN {_slope_time(lambda x: x.T, (rew_nt,)):8.3f}"
          " ms", flush=True)
    print(f"transpose_TN_to_NT {_slope_time(lambda x: x.T, (rew_tn,)):8.3f}"
          " ms", flush=True)


if __name__ == "__main__":
    main()
