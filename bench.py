#!/usr/bin/env python
"""Benchmark harness (SURVEY.md section 8 metrics contract).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: FVP-CG natural-gradient updates/s on config 2 (3-link
arm, 1024 envs, horizon 100, 10 CG iterations) — one full TRPO iteration
(rollout + GAE + baseline refit + CG natural gradient + KL line search)
entirely on-device per update.

Timing method: on this tunnelled TPU runtime `block_until_ready` returns
at enqueue-ack, not completion — only a host fetch of the result forces
truth, and one fetch round-trip costs ~30-40 ms with multi-ms jitter. So
every number here is a SLOPE between two on-device `lax.scan` chain
lengths (one dispatch + one fetch each); the fetch cost and its jitter
cancel in the difference, the headline is the MEDIAN rep slope, and the
reported variance band is the full spread of that slope across
repetitions. Chain lengths scale with config size so the slope clears
the jitter (tiny c1 runs 64 -> 1024-update chains).

`--all` benches every config c1-c5 and writes one JSON block per config
into bench_details.json (BASELINE.md asks for per-config numbers); the
default benches the headline config only.

`vs_baseline`: speedup over the reference TRPO implementation's
per-update latency at the same config. The reference mount was empty
(SURVEY.md section 0), so the stand-in is this repo's fp64 NumPy oracle —
the "pure-NumPy/CPU reference TRPO update" of BASELINE.json config 1 —
measured on this machine: 615.5 s/update at config 2 (rollout 543.9 s +
update 71.6 s; reproduce with `python bench.py --measure-oracle`).
"""
import argparse
import json
import os
import sys
import time

# fp64 NumPy oracle on this machine's CPU, config 2 (1024 envs x horizon
# 100): one full TRPO update. Measured 2026-08-17; reproduce with
# --measure-oracle.
ORACLE_C2_SECONDS_PER_UPDATE = 615.5


def measure_oracle():
    import numpy as np

    from oracle import net
    from oracle.trpo import OracleEnv, collect_rollouts, trpo_update
    from trpo_robot_control_tpu.configs import C2_REACHER3
    cfg = C2_REACHER3
    rng = np.random.RandomState(0)
    env = OracleEnv(cfg)
    params = net.init_params(rng, cfg.arm.obs_dim, cfg.arm.n_joints,
                             cfg.trpo.hidden, cfg.trpo.logstd_init)
    w = np.zeros(2 * cfg.arm.obs_dim + 4)
    t0 = time.perf_counter()
    batch = collect_rollouts(cfg, env, params, rng)
    t1 = time.perf_counter()
    trpo_update(cfg, params, w, batch)
    t2 = time.perf_counter()
    print(f"rollout_s={t1 - t0:.3f} update_s={t2 - t1:.3f} "
          f"total_s={t2 - t0:.3f}")
    return t2 - t0


def _fetch(x):
    """Force completion: pull one scalar to host."""
    import numpy as np
    return float(np.asarray(x).ravel()[-1])


def _provenance():
    """Commit + timestamp stamps for every bench block (staleness
    guard: a carried-forward table is identifiable as such)."""
    import subprocess
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        commit = "unknown"
    return dict(commit=commit or "unknown",
                timestamp=time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                        time.gmtime()))


def bench_config(cfg, mesh, n_dev, n_lo=None, n_hi=None, reps=3,
                 ab=False):
    """Slope-timed updates/s + rollout steps/s for one config."""
    import jax

    from trpo_robot_control_tpu.envs import arm
    from trpo_robot_control_tpu.trpo.train import (init_state,
                                                   make_train_many)

    samples = cfg.n_envs * cfg.horizon
    if n_lo is None:
        # big configs: a 144-update scan of a 13M-sample update is a
        # large enough program to crash the tunnelled TPU worker, and
        # their multi-100ms updates don't need long chains to clear the
        # fetch jitter anyway. TINY configs (c1: ~0.25 ms/update) need
        # the opposite: chains long enough that the slope is >~100x the
        # multi-ms fetch jitter — 16->144 updates spans only ~30 ms and
        # produced a 10x band (VERDICT r3 weak #1); 64->1024 spans
        # ~250 ms.
        if samples >= 2_000_000:
            n_lo, n_hi = 8, 40
        elif samples < 50_000:
            n_lo, n_hi = 64, 1024
        else:
            n_lo, n_hi = 16, 144

    state = init_state(cfg, seed=0)
    many_lo = make_train_many(cfg, n_lo, mesh=mesh)
    many_hi = make_train_many(cfg, n_hi, mesh=mesh)
    # --ab: a second, separately-jitted but mathematically identical
    # chain; alternating A/B reps shows whether the variance band is
    # chip/tunnel state (A and B span the same band) or code.
    chains = [many_hi]
    if ab:
        chains.append(make_train_many(cfg, n_hi, mesh=mesh))

    t0 = time.perf_counter()
    state, stats = many_lo(state)           # train steps donate state;
    _fetch(stats["mean_return"])            # chain it through every call
    for c in chains:
        state, stats = c(state)
        _fetch(stats["mean_return"])
    compile_s = time.perf_counter() - t0

    slopes = [[] for _ in chains]
    last_return = None
    for _ in range(reps):
        for ci, chain in enumerate(chains):
            t0 = time.perf_counter()
            state, stats = many_lo(state)
            _fetch(stats["mean_return"])
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, stats = chain(state)
            last_return = _fetch(stats["mean_return"])
            t_hi = time.perf_counter() - t0
            slopes[ci].append((t_hi - t_lo) / (n_hi - n_lo))
    flat = [s for series in slopes for s in series]
    # headline = MEDIAN of the rep slopes (best-of-reps quoted the
    # luckiest chip-state window — one-sided; VERDICT r3 weak #1); the
    # band still reports the full spread as evidence.
    s_med = sorted(flat)[len(flat) // 2] if len(flat) % 2 else \
        sum(sorted(flat)[len(flat) // 2 - 1:len(flat) // 2 + 1]) / 2.0
    s_best, s_worst = min(flat), max(flat)

    # --- rollout-only steps/s/chip, same slope method
    rollout_fn = arm.make_rollout_fn(cfg)

    def roll_chain(n):
        def body(k, _):
            k, k2 = jax.random.split(k)
            batch = rollout_fn(state.params, k2)
            return k, batch["rewards"].sum()
        return jax.jit(lambda k: jax.lax.scan(body, k, None, length=n))

    def timed(n, reps=2):
        r = roll_chain(n)
        _fetch(r(jax.random.PRNGKey(0))[1])          # compile + warm
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            _fetch(r(jax.random.PRNGKey(1 + i))[1])
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo, k_hi = (32, 1024) if samples < 50_000 else (8, 104)
    roll_s = max((timed(k_hi) - timed(k_lo)) / (k_hi - k_lo), 1e-6)
    env_steps = samples

    out = dict(
        updates_per_s=1.0 / s_med,
        updates_per_s_band=[1.0 / s_worst, 1.0 / s_best],
        per_update_ms=1e3 * s_med,
        # raw per-rep slopes (s/update) — the evidence behind the band
        slopes_raw_s=[round(s, 6) for s in slopes[0]],
        rollout_steps_per_s_per_chip=env_steps / roll_s / max(n_dev, 1),
        env_steps_per_update=env_steps,
        compile_s=compile_s,
        final_return=last_return,
        **_provenance(),
    )
    if ab:
        out["slopes_raw_s_ab"] = [round(s, 6) for s in slopes[1]]
    return out


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def dist_worker(out_path, devs_per_proc, envs_per_dev, reps):
    """--dist worker: one process of the jax.distributed CPU layout.
    Times the sharded step on the GLOBAL mesh; process 0 writes JSON."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devs_per_proc}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from trpo_robot_control_tpu.configs import C1_REACHER2
    from trpo_robot_control_tpu.parallel.mesh import (init_distributed,
                                                      make_mesh)
    from trpo_robot_control_tpu.trpo.train import (init_state,
                                                   make_train_many)
    init_distributed()
    import numpy as np
    n_dev = len(jax.devices())
    cfg = C1_REACHER2.replace(n_envs=envs_per_dev * n_dev, horizon=50)
    mesh = make_mesh(n_data=n_dev)
    # CPU wall-clock is too noisy for lo/hi slope timing (GC pauses and
    # the co-resident TPU host process produced negative slopes); for a
    # weak-scaling RATIO, min-of-reps over one fixed-length chain is
    # robust — per-dispatch overhead appears equally in numerator and
    # denominator.
    k_chain = 20
    many = make_train_many(cfg, k_chain, mesh=mesh)
    state = jax.tree.map(np.asarray, init_state(cfg, seed=0))
    state, stats = many(state)          # compile + warm caches
    _fetch(stats["mean_return"])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, stats = many(state)
        _fetch(stats["mean_return"])
        times.append(time.perf_counter() - t0)
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump(dict(updates_per_s=k_chain / min(times),
                           chain_times_raw_s=[round(t, 4) for t in times],
                           k_chain=k_chain,
                           n_envs=cfg.n_envs, n_devices=n_dev,
                           n_processes=jax.process_count()), f)
    if jax.process_count() > 1:
        jax.distributed.shutdown()


def bench_dist(n_procs, total_devs=None, envs_per_dev=256, reps=5):
    """Mechanism-level multi-process overhead on CPU (labelled non-TPU):
    the SAME global mesh (total_devs fake devices) and the SAME total
    env batch, run as 1 process vs split across n_procs processes
    joined by jax.distributed. Ideal = equal updates/s; the deficit is
    the pure cost of crossing the process boundary (the DCN leg:
    gRPC-backed collectives instead of in-process ones). On one host
    this is the only honest distributed measurement — true weak scaling
    needs more hardware, and doubling total work on fixed cores just
    measures the core count. This stages the BASELINE.md >=80%-linear
    pathway for when real multi-host TPU hardware is available — the
    launch recipe is identical (BASELINE.md 'Multi-host launch
    recipe')."""
    import subprocess
    import tempfile
    if total_devs is None:
        total_devs = os.cpu_count() or 4
    total_devs -= total_devs % n_procs
    here = os.path.abspath(__file__)
    results = {}
    for procs in sorted({1, n_procs}):
        devs_per_proc = total_devs // procs
        outs = [os.path.join(tempfile.mkdtemp(), "dist.json")]
        port = _free_port()
        ps = []
        for pid in range(procs):
            env = {k: v for k, v in os.environ.items()
                   if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
            if procs > 1:
                env.update(JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                           JAX_NUM_PROCESSES=str(procs),
                           JAX_PROCESS_ID=str(pid),
                           JAX_DIST_INIT_TIMEOUT="60")
            ps.append(subprocess.Popen(
                [sys.executable, here, "--dist-worker", outs[0],
                 str(devs_per_proc), str(envs_per_dev), str(reps)],
                cwd=os.path.dirname(here), env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                text=True))
        for p in ps:
            _, err = p.communicate(timeout=1800)
            if p.returncode != 0:
                print(f"# dist worker failed:\n{err[-2000:]}",
                      file=sys.stderr)
                return None
        with open(outs[0]) as f:
            results[procs] = json.load(f)
        r = results[procs]
        print(f"# dist {procs} proc(s): {r['updates_per_s']:.2f} "
              f"updates/s over {r['n_devices']} fake devices, "
              f"{r['n_envs']} envs", file=sys.stderr, flush=True)
    eff = None
    if n_procs in results and 1 in results and n_procs > 1:
        # same global mesh + batch both times, so ideal = equal updates/s
        eff = results[n_procs]["updates_per_s"] \
            / results[1]["updates_per_s"]
        print(f"# same-mesh efficiency 1 -> {n_procs} processes: "
              f"{eff:.1%} (CPU mechanism-level, NOT a TPU number)",
              file=sys.stderr, flush=True)
    return dict(kind="cpu_mechanism_same_mesh_split",
                total_devs=total_devs, envs_per_dev=envs_per_dev,
                results={str(k): v for k, v in results.items()},
                efficiency_vs_1proc=eff, **_provenance())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="c2_reacher3")
    ap.add_argument("--all", action="store_true",
                    help="bench every config c1-c5")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ab", action="store_true",
                    help="interleave a second identical-code jitted "
                         "chain to document chip-state variance")
    ap.add_argument("--measure-oracle", action="store_true")
    ap.add_argument("--dist", type=int, default=0, metavar="N",
                    help="measure N-process jax.distributed weak "
                         "scaling on CPU (mechanism-level, non-TPU)")
    ap.add_argument("--dist-worker", nargs=4, metavar=("OUT", "DEVS",
                                                       "ENVS", "REPS"))
    args = ap.parse_args()

    if args.dist_worker:
        out, devs, envs, reps = args.dist_worker
        dist_worker(out, int(devs), int(envs), int(reps))
        return

    if args.dist:
        block = bench_dist(args.dist)
        if block is None:
            return 1
        details_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "bench_details.json")
        try:
            with open(details_path) as f:
                details = json.load(f)
        except (OSError, ValueError):
            details = {}
        details["dist"] = block
        with open(details_path, "w") as f:
            json.dump(details, f, indent=2)
        print(json.dumps({
            "metric": "same_mesh_split_efficiency_cpu_mechanism",
            "value": round(block["efficiency_vs_1proc"], 4)
            if block["efficiency_vs_1proc"] else None,
            "unit": "ratio", "vs_baseline": None}))
        return

    if args.measure_oracle:
        measure_oracle()
        return

    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_details.json")

    if args.all:
        # One SUBPROCESS per config — and NO jax import in this parent:
        # the tunnelled TPU worker accumulates loaded programs across
        # configs and crashes partway through c5 when all five run in
        # one process (jax.clear_caches + gc did not help), and a parent
        # holding a TPU client would deadlock the children (one client
        # at a time). Sequential children; the server-side HLO cache
        # makes repeat compiles cheap.
        import subprocess
        from trpo_robot_control_tpu.configs import CONFIGS
        here = os.path.abspath(__file__)
        per_config = {}
        meta = {}
        for name in CONFIGS:
            try:
                r = subprocess.run(
                    [sys.executable, here, "--config", name,
                     "--reps", str(args.reps)]
                    + (["--ab"] if args.ab else []),
                    cwd=os.path.dirname(here), capture_output=True,
                    text=True, timeout=3600)
            except subprocess.TimeoutExpired:
                print(f"# {name}: FAILED (timeout — backend hang?)",
                      file=sys.stderr, flush=True)
                continue
            if r.returncode != 0:
                print(f"# {name}: FAILED\n{r.stderr[-2000:]}",
                      file=sys.stderr, flush=True)
                continue
            with open(details_path) as f:
                block = json.load(f)
            meta = {k: block[k] for k in ("n_devices", "device_kind")}
            per_config[name] = {
                k: v for k, v in block.items()
                if k not in ("config", "n_devices", "device_kind",
                             "oracle_seconds_per_update", "configs")}
            print(f"# {name}: "
                  f"{per_config[name]['updates_per_s']:.1f} updates/s, "
                  f"{per_config[name]['rollout_steps_per_s_per_chip']:.3g}"
                  f" rollout steps/s/chip", file=sys.stderr, flush=True)
        if not per_config:
            print("ERROR: every per-config bench subprocess failed "
                  "(see FAILED lines above)", file=sys.stderr)
            return 1
        head_name = "c2_reacher3" if "c2_reacher3" in per_config \
            else next(iter(per_config))
        head = per_config[head_name]
    else:
        # the tunnelled TPU backend can HANG (not error) when down;
        # probe it in a killable child so a dead tunnel produces a
        # clean failure instead of consuming the caller's whole budget.
        # The backend self-recovers from crashes in ~1 min and an outage
        # may end at any point during the run window, so RETRY: short
        # probes every ~60 s for up to ~12 min before declaring rc=2
        # (round-2 lost its driver-captured number to a single-probe
        # timeout during a transient outage).
        import subprocess
        deadline = time.monotonic() + 720
        attempt = 0
        while True:
            attempt += 1
            try:
                probe = subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    capture_output=True, text=True, timeout=90)
                if probe.returncode == 0:
                    break
                err = ("probe exited rc=%d:\n" % probe.returncode
                       + probe.stderr[-500:])
            except subprocess.TimeoutExpired:
                err = "probe timed out after 90 s (TPU tunnel down?)"
            remaining = deadline - time.monotonic()
            print(f"# backend probe attempt {attempt} failed: {err}",
                  file=sys.stderr, flush=True)
            if remaining <= 0:
                print("ERROR: jax backend unreachable after "
                      f"{attempt} probe attempts over ~12 min",
                      file=sys.stderr)
                return 2
            print(f"# retrying in 60 s ({remaining:.0f} s left)",
                  file=sys.stderr, flush=True)
            time.sleep(min(60, max(remaining, 1)))

        import jax

        from trpo_robot_control_tpu.configs import CONFIGS
        from trpo_robot_control_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        mesh = make_mesh() if n_dev > 1 else None
        head_name = args.config
        head = bench_config(CONFIGS[args.config], mesh, n_dev,
                            reps=args.reps, ab=args.ab)
        per_config = {args.config: head}
        meta = dict(n_devices=n_dev,
                    device_kind=jax.devices()[0].device_kind)

    vs_baseline = head["updates_per_s"] * ORACLE_C2_SECONDS_PER_UPDATE \
        if head_name == "c2_reacher3" else None

    details = dict(
        config=head_name,
        oracle_seconds_per_update=ORACLE_C2_SECONDS_PER_UPDATE,
        **meta, **head,
    )
    if args.all:
        details["configs"] = per_config
    else:
        # a solo run keeps the last --all run's per-config table so the
        # driver's end-of-round headline refresh doesn't erase it — and
        # refreshes its own config's row (each block carries its own
        # commit/timestamp provenance, so staleness is visible)
        try:
            with open(details_path) as f:
                old = json.load(f)
            if "configs" in old:
                # scrub any nested 'configs' keys (a pre-fix --all run
                # recursively embedded the whole table in every block)
                details["configs"] = {
                    n: {k: v for k, v in blk.items() if k != "configs"}
                    for n, blk in old["configs"].items()}
        except (OSError, ValueError):
            pass
        details.setdefault("configs", {})[head_name] = {
            k: v for k, v in head.items() if k != "configs"}
    with open(details_path, "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "fvp_cg_natural_gradient_updates_per_s",
        "value": round(head["updates_per_s"], 4),
        "unit": "updates/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
