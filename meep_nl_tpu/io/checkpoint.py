"""Checkpoint/resume of the full simulation state.

Analog of the reference's dump/load (structure_dump.cpp:89 structure::dump,
fields_dump.cpp:108 fields::dump): every field array family (f, f_u, f_w,
f_cond), polarization internal state, DFT accumulators, and the time counter
round-trip through a single .npz file.  The structure side (materials/PML
coefficients) is regenerated from the scene, so only the plan signature is
stored for validation (the reference likewise requires the same chunk layout
on load, meep.hpp:880)."""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}", v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}/#{i}", v, out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(keys, arrays) -> Any:
    """Rebuild the nested dict/list structure from flat keys."""
    root: Dict[str, Any] = {}
    for key, arr in zip(keys, arrays):
        parts = key.split("/")[1:]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def fix(node):
        if isinstance(node, dict):
            if node and all(k.startswith("#") for k in node):
                return [fix(node[f"#{i}"]) for i in range(len(node))]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(root)


def plan_signature(plan) -> str:
    """Minimal compatibility signature for load-time validation."""
    return json.dumps({
        "dim": plan.gv.dim,
        "num": plan.gv.num,
        "resolution": plan.gv.resolution,
        "courant": plan.courant,
        "storage": plan.storage_shape,
        "complex": plan.complex_fields,
        "t_monitors": sorted(m.name for m in plan.dfts),
    }, sort_keys=True)


def save_state(path: str, plan, state: Dict[str, Any], t: int = None):
    import jax
    state = jax.device_get(state)
    flat: Dict[str, np.ndarray] = {}
    _flatten("s", state, flat)
    flat["__sig__"] = np.frombuffer(plan_signature(plan).encode(), np.uint8)
    if t is not None:
        flat["__t_host__"] = np.asarray(t)
    np.savez_compressed(path, **flat)


def load_state(path: str, plan) -> Dict[str, Any]:
    from ..stepper.step import init_state
    z = np.load(path)
    sig = bytes(z["__sig__"]).decode()
    if sig != plan_signature(plan):
        raise ValueError(
            "checkpoint layout mismatch (the reference likewise requires an "
            f"identical chunk layout, meep.hpp:880):\nsaved: {sig}\n"
            f"plan:  {plan_signature(plan)}")
    keys = [k for k in z.files if k.startswith("s/")]
    loaded = _unflatten(keys, [z[k] for k in keys])
    # merge into a freshly initialized template so empty containers (which
    # flatten to nothing) keep their structure
    state = init_state(plan)

    def merge(tmpl, got):
        if isinstance(tmpl, dict):
            return {k: merge(v, got[k]) if isinstance(got, dict) and k in got
                    else v for k, v in tmpl.items()}
        if isinstance(tmpl, list):
            return [merge(v, got[i]) if isinstance(got, list) and i < len(got)
                    else v for i, v in enumerate(tmpl)]
        return _to_jnp(got) if got is not None else tmpl

    return merge(state, loaded)


def _to_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jnp(v) for v in tree]
    return jnp.asarray(tree)


def load_t(path: str) -> int:
    z = np.load(path)
    if "__t_host__" in z.files:
        return int(z["__t_host__"])
    return 0
