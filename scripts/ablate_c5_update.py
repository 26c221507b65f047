#!/usr/bin/env python
"""Attribute the c5 update-side time (VERDICT r2 item 2b).

scripts/ablate_update.py measured 131.6 ms of non-rollout, non-CG time
per c5 update. This times each update-side block STANDALONE at c5 scale
on synthetic kernel-layout inputs — fp32 as shipped and a bf16-storage
variant — so the remainder can be attributed and the bf16 lever sized
before implementing it.

Blocks (mirrors trpo/update.py order, ff path):
  baseline  phi_ff features + values einsum + normal-equation A/b + fit
  gae       reverse suffix scan + whiten + targets
  surrgrad  models/policy.py:surrogate_grad_ff (fwd + manual bwd)
  lseval    one line-search eval: dist_ff + log_prob_ff + kl_ff

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
    """Time fn(*args) by slope between two on-device repeat chains.

    Each iteration perturbs the first array arg by a carry-dependent
    epsilon — without it the args are loop-invariant and XLA hoists the
    whole block out of the scan (measured: slope ~ 0)."""
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
    from trpo_robot_control_tpu.models import baseline, policy
    from trpo_robot_control_tpu.ops.gae import gae
    from trpo_robot_control_tpu.trpo.train import init_state

    cfg = CONFIGS[os.environ.get("ABLATE_CONFIG", "c5_multitask")]
    T, N, do, da = cfg.horizon, cfg.n_envs, cfg.obs_dim, cfg.arm.n_joints
    tr = cfg.trpo
    print(f"# {cfg.name}: T={T} N={N} do={do} da={da} B={T * N}",
          flush=True)

    state = init_state(cfg, seed=0)
    params = state.params
    w = jnp.ones(baseline.n_features(do), jnp.float32) * 0.01

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    obs_ff = jax.random.normal(k1, (T, do, N), jnp.float32)
    act_ff = 0.1 * jax.random.normal(k2, (T, da, N), jnp.float32)
    rewards = -jax.random.uniform(k3, (N, T), jnp.float32)
    adv_ff = jax.random.normal(k1, (T, N), jnp.float32)
    values = jnp.zeros((N, T), jnp.float32)

    results = {}

    def report(tag, ms):
        results[tag] = ms
        print(f"{tag:24s} {ms:8.3f} ms", flush=True)

    # ---- baseline pipeline, round-2 form (phi materialised)
    def baseline_phi_block(o_ff, targets):
        phi_ff = baseline.features_ff(o_ff.astype(jnp.float32),
                                      cfg.horizon)
        vals = jnp.einsum("tfn,f->nt", phi_ff, w)
        F = phi_ff.shape[1]
        A = jnp.einsum("tfn,tgn->fg", phi_ff, phi_ff) \
            + tr.baseline_reg * jnp.eye(F)
        b = jnp.einsum("tfn,nt->f", phi_ff, targets)
        return baseline.fit_normal(A, b), vals

    report("baseline_phi_fp32",
           _slope_time(baseline_phi_block, (obs_ff, rewards)))

    # ---- baseline pipeline, round-3/4 form (block-decomposed, no phi;
    # (T, N)-native targets as the round-4 ff pipeline feeds them)
    rewards_tn = jnp.transpose(rewards)

    def baseline_block(o_ff, targets_tn):
        vals = baseline.values_ff(w, o_ff, cfg.horizon, tn=True)
        A, b = baseline.normal_eq_ff(o_ff, targets_tn, cfg.horizon)
        A = A + tr.baseline_reg * jnp.eye(A.shape[0])
        return baseline.fit_normal(A, b), vals

    report("baseline_fp32",
           _slope_time(baseline_block, (obs_ff, rewards_tn)))
    report("baseline_bf16in",
           _slope_time(baseline_block, (obs_ff.astype(jnp.bfloat16),
                                        rewards_tn)))

    # ---- GAE + whiten
    def gae_block(rew, vals):
        adv_raw = gae(rew, vals, tr.gamma, tr.lam)
        m1 = jnp.mean(adv_raw)
        std = jnp.std(adv_raw)
        return (adv_raw - m1) / (std + 1e-8), adv_raw + vals

    report("gae", _slope_time(gae_block, (rewards, values)))

    # ---- surrogate gradient (fwd + manual bwd)
    def surr_block(o, a, adv):
        g, mu, logp = policy.surrogate_grad_ff(params, o, a, adv)
        return g

    def surr_block_store16(o, a, adv):
        g, mu, logp = policy.surrogate_grad_ff(params, o, a, adv,
                                               store_dtype=jnp.bfloat16)
        return g

    report("surrgrad_fp32", _slope_time(surr_block,
                                        (obs_ff, act_ff, adv_ff)))
    report("surrgrad_store_bf16",
           _slope_time(surr_block_store16, (obs_ff, act_ff, adv_ff)))
    report("surrgrad_bf16in",
           _slope_time(surr_block, (obs_ff.astype(jnp.bfloat16),
                                    act_ff.astype(jnp.bfloat16),
                                    adv_ff)))

    # ---- CG-subsample relayout (part of the previously unattributed
    # remainder: (T/k, do, N) -> (B/k, do) transpose + fp32 cast)
    def sub_relayout(o_ff):
        sub = o_ff[::tr.fvp_subsample if tr.fvp_subsample > 1 else 8]
        return jnp.transpose(sub, (0, 2, 1)).reshape(-1, do) \
            .astype(jnp.float32)

    report("fvp_sub_relayout", _slope_time(sub_relayout, (obs_ff,)))
    report("fvp_sub_relayout_bf16in",
           _slope_time(sub_relayout, (obs_ff.astype(jnp.bfloat16),)))

    # ---- one line-search eval
    logstd = params["logstd"]

    def ls_block(o, a, adv, mu_old, logp_old):
        mu, ls = policy.dist_ff(params, o)
        logp = policy.log_prob_ff(mu, ls, a)
        surr = jnp.mean(jnp.exp(logp - logp_old) * adv)
        kl = policy.kl_ff(mu_old, logstd, mu, ls)
        return surr, kl

    mu_old = jnp.zeros((T, da, N), jnp.float32)
    logp_old = jnp.zeros((T, N), jnp.float32)
    report("lseval_fp32", _slope_time(
        ls_block, (obs_ff, act_ff, adv_ff, mu_old, logp_old)))
    report("lseval_bf16", _slope_time(
        ls_block, (obs_ff.astype(jnp.bfloat16), act_ff.astype(jnp.bfloat16),
                   adv_ff, mu_old.astype(jnp.bfloat16), logp_old)))

    total = (results["baseline_fp32"] + results["gae"]
             + results["surrgrad_fp32"] + results["lseval_fp32"])
    print(json.dumps({"config": cfg.name, "blocks_ms": results,
                      "sum_fp32_ms": total}, indent=2))


if __name__ == "__main__":
    main()
