"""Checkpoint weight auditor (reference inspect_model.py): per-leaf min / max /
mean-|w| / finiteness with ASCII histograms, warning on non-finite weights."""

from __future__ import annotations

import argparse

import jax
import numpy as np


def ascii_histogram(values: np.ndarray, bins: int = 40, width: int = 60) -> str:
    finite = values[np.isfinite(values)]
    if finite.size == 0:
        return "  (no finite values)"
    counts, edges = np.histogram(finite, bins=bins)
    peak = counts.max() or 1
    lines = []
    for c, lo, hi in zip(counts, edges[:-1], edges[1:]):
        bar = "#" * int(round(width * c / peak))
        lines.append(f"  [{lo:+.3e}, {hi:+.3e}) {bar}")
    return "\n".join(lines)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def inspect_params(params, histograms: bool = True, out=print) -> bool:
    """Dump stats; returns True when every leaf is finite."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    all_finite = True
    all_values = np.concatenate(
        [np.asarray(v, np.float64).reshape(-1) for _, v in leaves]
    )
    out(f"Total parameters: {all_values.size:,}")
    out("Global histogram:")
    out(ascii_histogram(all_values))
    for path, leaf in leaves:
        arr = np.asarray(leaf, np.float64)
        finite = np.isfinite(arr)
        name = _path_str(path)
        out(
            f"{name}: shape={tuple(arr.shape)} min={arr.min():+.4e} "
            f"max={arr.max():+.4e} mean|w|={np.abs(arr).mean():.4e}"
        )
        if not finite.all():
            all_finite = False
            out(f"  WARNING: {np.count_nonzero(~finite)} non-finite values!")
        if histograms:
            out(ascii_histogram(arr.reshape(-1)))
    if not all_finite:
        out("WARNING: model contains non-finite weights")
    return all_finite


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Inspect checkpoint weights.")
    parser.add_argument("checkpoint", help="Checkpoint directory")
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--no-histograms", action="store_true")
    args = parser.parse_args(argv)

    from ..train.checkpoint import restore_raw

    params, step = restore_raw(args.checkpoint, args.step)
    print(f"Inspecting checkpoint at step {step}")
    ok = inspect_params(params, histograms=not args.no_histograms)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
