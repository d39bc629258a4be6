"""Checkpoint / save / resume (ref ext/JLD2Ext/save.jl + the iterator API as
the checkpointing surface, SURVEY §5).

Branches serialize to a single `.npz` (numpy archive): the branch table,
eigen-elements, saved solutions and special points.  `save_every_step`
returns a finalise-hook that appends incrementally, mirroring the
reference's `save_to_file` option (ref src/ContParameters.jl:64).
Continuation can resume from the last saved state via `resume_data`.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..continuation.results import ContResult
from ..detection.points import SpecialPoint


def save_branch(br, path: str):
    """Serialize a ContResult/Branch to `<path>.npz`."""
    gamma = getattr(br, "gamma", br)
    tbl = gamma._table()
    payload = {f"branch/{k}": np.asarray(v) for k, v in tbl.items()}
    for i, e in enumerate(gamma.eig):
        payload[f"eig/{i}/vals"] = np.asarray(e["eigenvals"])
        if e.get("eigenvecs") is not None:
            payload[f"eig/{i}/vecs"] = np.asarray(e["eigenvecs"])
        payload[f"eig/{i}/step"] = np.asarray(e["step"])
    for i, s in enumerate(gamma.sol):
        payload[f"sol/{i}/x"] = np.asarray(s["x"])
        payload[f"sol/{i}/p"] = np.asarray(s["p"])
        payload[f"sol/{i}/step"] = np.asarray(s["step"])
    sps = []
    for sp in gamma.specialpoint:
        sps.append({"type": sp.type, "idx": int(sp.idx),
                    "param": float(sp.param), "step": int(sp.step),
                    "status": sp.status,
                    "interval": [float(sp.interval[0]),
                                 float(sp.interval[1])],
                    "delta": [int(sp.delta[0]), int(sp.delta[1])]})
        if sp.x is not None:
            payload[f"sp/{len(sps) - 1}/x"] = np.asarray(sp.x)
    payload["specialpoints_json"] = np.frombuffer(
        json.dumps(sps).encode(), dtype=np.uint8)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(path, **payload)
    return path


def load_branch(path: str) -> ContResult:
    """Reload a branch saved by `save_branch`."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    res = ContResult()
    tbl_keys = [k for k in z.files if k.startswith("branch/")]
    ncols = {k.split("/", 1)[1]: z[k] for k in tbl_keys}
    nrows = len(next(iter(ncols.values()))) if ncols else 0
    for i in range(nrows):
        res._records.append({k: v[i] for k, v in ncols.items()})
    eig_idx = sorted({int(k.split("/")[1]) for k in z.files
                      if k.startswith("eig/")})
    for i in eig_idx:
        res.eig.append({
            "eigenvals": z[f"eig/{i}/vals"],
            "eigenvecs": z.get(f"eig/{i}/vecs"),
            "step": int(z[f"eig/{i}/step"]),
            "converged": True})
    sol_idx = sorted({int(k.split("/")[1]) for k in z.files
                      if k.startswith("sol/")})
    for i in sol_idx:
        res.sol.append({"x": z[f"sol/{i}/x"], "p": float(z[f"sol/{i}/p"]),
                        "step": int(z[f"sol/{i}/step"])})
    sps = json.loads(bytes(z["specialpoints_json"]).decode())
    for i, d in enumerate(sps):
        sp = SpecialPoint(type=d["type"], idx=d["idx"], param=d["param"],
                          step=d["step"], status=d["status"],
                          interval=tuple(d["interval"]),
                          delta=tuple(d["delta"]))
        key = f"sp/{i}/x"
        if key in z.files:
            sp.x = z[key]
        res.specialpoint.append(sp)
    return res


def save_every_step(path: str, every: int = 10):
    """finalise_solution hook: checkpoint the running branch every `every`
    steps (ref save_to_file appending, ext/JLD2Ext/save.jl:8-48)."""

    def hook(z, tau, step, res, state=None, **kwargs):
        if step % every == 0:
            save_branch(res, path)
        return True

    return hook


def resume_data(path: str):
    """Extract (x_last, p_last) from a checkpoint for resuming a run."""
    res = load_branch(path)
    if not res.sol:
        raise ValueError("checkpoint has no saved solutions")
    last = res.sol[-1]
    return last["x"], last["p"], res
