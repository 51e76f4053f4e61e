"""Checkpointing: directory-per-checkpoint, examples-seen progress, resume scan.

Layout mirrors the reference
(reference: src/tha4/shion/core/training/distrib/distributed_training_states.py:29-47):

    {prefix}/checkpoint/{NNNN}/       every num_examples_per_checkpoint
    {prefix}/snapshot/                rolling, every num_examples_per_snapshot
        examples_seen_so_far.txt
        module_<name>.npz             param pytree, flattened by path
        optimizer_<name>.npz          optax state, flattened by path
        rng_state_<process>.npz       per-process JAX PRNG key

Writes are crash-safe: process 0 writes into a temp dir and renames, so a
partially-written checkpoint never validates (the reference instead validates
file-set completeness, :200-234; rename is the native equivalent).  Resume
semantics match distributed_trainer.py:145-169: prefer the snapshot if its
examples_seen fits the target, else scan checkpoints newest to oldest, else
fresh.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

SEP = "\x1f"  # unit separator: safe against '/'-like names in keys


def flatten_tree(tree: Any) -> Dict[str, np.ndarray]:
    """Pytree (nested dicts/lists/tuples of arrays) -> {path: array}."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [str(k)])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])
        elif node is None:
            out[SEP.join(path) + SEP + "__none__"] = np.zeros(0)
        else:
            out[SEP.join(path)] = np.asarray(node)

    walk(tree, [])
    return out


def unflatten_into(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    """Rebuild arrays into the shape of ``template`` (same treedef)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + [str(k)]) for k, v in node.items()}
        if isinstance(node, tuple):
            children = [walk(v, path + [str(i)]) for i, v in enumerate(node)]
            if hasattr(node, "_fields"):  # NamedTuple (e.g. optax states)
                return type(node)(*children)
            return tuple(children)
        if isinstance(node, list):
            return [walk(v, path + [str(i)]) for i, v in enumerate(node)]
        if node is None:
            return None
        key = SEP.join(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing key {'/'.join(path)}")
        arr = flat[key]
        if hasattr(node, "shape") and tuple(node.shape) != tuple(arr.shape):
            raise ValueError(f"shape mismatch at {'/'.join(path)}: {node.shape} vs {arr.shape}")
        return arr

    return walk(template, [])


def _save_npz(path: str, tree: Any) -> None:
    np.savez(path, **flatten_tree(tree))


def _load_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


EXAMPLES_FILE = "examples_seen_so_far.txt"


def save_state(
    directory: str,
    modules: Dict[str, Any],
    optimizers: Dict[str, Any],
    examples_seen: int,
    rng_key: Any,
    accumulated: Optional[Dict[str, Any]] = None,
    process_index: int = 0,
) -> None:
    """Write a complete training state. Atomic via temp-dir rename."""
    tmp = directory + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, EXAMPLES_FILE), "w") as f:
        f.write(str(int(examples_seen)))
    for name, params in modules.items():
        _save_npz(os.path.join(tmp, f"module_{name}.npz"), params)
    for name, opt_state in optimizers.items():
        _save_npz(os.path.join(tmp, f"optimizer_{name}.npz"), opt_state)
    for name, acc in (accumulated or {}).items():
        _save_npz(os.path.join(tmp, f"accumulated_{name}.npz"), acc)
    np.savez(os.path.join(tmp, f"rng_state_{process_index:08d}.npz"), key=np.asarray(rng_key))
    if os.path.exists(directory):
        shutil.rmtree(directory)
    os.replace(tmp, directory)


def can_load(directory: str, module_names: List[str], num_processes: int = 1) -> bool:
    """Completeness validation (reference distributed_training_states.py:200-234)."""
    if not os.path.isdir(directory):
        return False
    if not os.path.exists(os.path.join(directory, EXAMPLES_FILE)):
        return False
    for name in module_names:
        if not os.path.exists(os.path.join(directory, f"module_{name}.npz")):
            return False
        if not os.path.exists(os.path.join(directory, f"optimizer_{name}.npz")):
            return False
    for p in range(num_processes):
        if not os.path.exists(os.path.join(directory, f"rng_state_{p:08d}.npz")):
            return False
    return True


def read_examples_seen(directory: str) -> int:
    with open(os.path.join(directory, EXAMPLES_FILE)) as f:
        return int(f.read().strip())


def load_state(
    directory: str,
    module_templates: Dict[str, Any],
    optimizer_templates: Dict[str, Any],
    accumulated_templates: Optional[Dict[str, Any]] = None,
    process_index: int = 0,
) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any], int, np.ndarray]:
    modules = {
        name: unflatten_into(tpl, _load_npz(os.path.join(directory, f"module_{name}.npz")))
        for name, tpl in module_templates.items()
    }
    optimizers = {
        name: unflatten_into(tpl, _load_npz(os.path.join(directory, f"optimizer_{name}.npz")))
        for name, tpl in optimizer_templates.items()
    }
    accumulated = {
        name: unflatten_into(tpl, _load_npz(os.path.join(directory, f"accumulated_{name}.npz")))
        for name, tpl in (accumulated_templates or {}).items()
    }
    examples_seen = read_examples_seen(directory)
    with np.load(os.path.join(directory, f"rng_state_{process_index:08d}.npz")) as data:
        rng_key = data["key"]
    return modules, optimizers, accumulated, examples_seen, rng_key


def checkpoint_dir(prefix: str, index: int) -> str:
    return os.path.join(prefix, "checkpoint", f"{index:04d}")


def snapshot_dir(prefix: str) -> str:
    return os.path.join(prefix, "snapshot")


def find_resume_dir(
    prefix: str,
    target_examples: int,
    batch_size: int,
    module_names: List[str],
    num_processes: int = 1,
) -> Optional[str]:
    """Newest loadable state whose progress fits the target
    (reference distributed_trainer.py:145-169)."""
    snap = snapshot_dir(prefix)
    if can_load(snap, module_names, num_processes):
        if read_examples_seen(snap) <= target_examples + batch_size:
            return snap
    ckpt_root = os.path.join(prefix, "checkpoint")
    if os.path.isdir(ckpt_root):
        indices = sorted(
            (int(m.group(1)) for d in os.listdir(ckpt_root) if (m := re.fullmatch(r"(\d{4})", d))),
            reverse=True,
        )
        for idx in indices:
            d = checkpoint_dir(prefix, idx)
            if can_load(d, module_names, num_processes) and read_examples_seen(d) <= target_examples + batch_size:
                return d
    return None
