"""Checkpoint / deterministic resume (SURVEY.md section 7).

Plain ``np.savez`` of the TrainState pytree plus a config hash — no
pickle, no external deps. Resuming reproduces the seeded run exactly
(tests/test_train.py::test_checkpoint_resume_deterministic).
"""
from __future__ import annotations

import hashlib
import os

import jax
import numpy as np


def config_hash(cfg) -> str:
    return hashlib.sha256(repr(cfg).encode()).hexdigest()[:16]


def save_checkpoint(ckpt_dir: str, cfg, state) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    it = int(state.iteration)
    path = os.path.join(ckpt_dir, f"ckpt_{it:06d}.npz")
    arrays = {f"params.{k}": np.asarray(v) for k, v in state.params.items()}
    if isinstance(state.w, dict):        # MLP baseline: a param pytree
        arrays.update({f"w.{k}": np.asarray(v)
                       for k, v in state.w.items()})
    else:
        arrays["w"] = np.asarray(state.w)
    arrays["key"] = np.asarray(state.key)
    arrays["iteration"] = np.asarray(state.iteration)
    np.savez(path, __config_hash__=config_hash(cfg), **arrays)
    return path


def load_checkpoint(path: str, cfg=None):
    from ..trpo.train import TrainState
    data = np.load(path)
    if cfg is not None:
        stored = str(data["__config_hash__"])
        if stored != config_hash(cfg):
            raise ValueError(
                f"checkpoint config hash {stored} != current "
                f"{config_hash(cfg)} — refusing silent mismatch")
    params = {k[len("params."):]: jax.numpy.asarray(data[k])
              for k in data.files if k.startswith("params.")}
    if "w" in data.files:
        w = jax.numpy.asarray(data["w"])
    else:                                # MLP baseline pytree
        w = {k[len("w."):]: jax.numpy.asarray(data[k])
             for k in data.files if k.startswith("w.")}
    return TrainState(params=params, w=w,
                      key=jax.numpy.asarray(data["key"]),
                      iteration=jax.numpy.asarray(data["iteration"]))


def latest_checkpoint(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return None
    files = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_") and f.endswith(".npz"))
    return os.path.join(ckpt_dir, files[-1]) if files else None
