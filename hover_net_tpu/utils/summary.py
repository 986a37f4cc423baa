"""Model summary: per-module parameter table (run_utils/utils.py:77-201
`get_model_summary` analog, torch-free)."""

from __future__ import annotations

import numpy as np
from flax import traverse_util


def model_summary(variables, max_rows: int = 0) -> str:
    params = variables.get("params", variables)
    flat = traverse_util.flatten_dict(params)
    rows = []
    total = 0
    for path, leaf in sorted(flat.items()):
        n = int(np.prod(np.shape(leaf)))
        total += n
        rows.append(("/".join(path), str(tuple(np.shape(leaf))), n))
    if max_rows and len(rows) > max_rows:
        rows = rows[:max_rows] + [("...", "", 0)]
    name_w = max(len(r[0]) for r in rows)
    shape_w = max(len(r[1]) for r in rows)
    lines = [f"{'name':<{name_w}}  {'shape':<{shape_w}}  params"]
    for name, shape, n in rows:
        lines.append(f"{name:<{name_w}}  {shape:<{shape_w}}  {n:,}")
    lines.append(f"total parameters: {total:,}")
    if "batch_stats" in variables:
        bs = sum(int(np.prod(np.shape(v))) for v in
                 traverse_util.flatten_dict(variables["batch_stats"]).values())
        lines.append(f"batch-stat buffers: {bs:,}")
    return "\n".join(lines)
