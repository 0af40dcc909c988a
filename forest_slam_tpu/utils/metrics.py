"""Structured per-frame metrics sink (JSON lines).

The reference's observability is stdout prints and live RViz topics
(SURVEY.md §5 metrics row); here every pipeline already returns fixed-shape
per-frame outputs (n_matches, n_inliers, ok, ...), and this helper dumps
them as one JSON object per frame for machine consumption (dashboards,
regression diffing). Used by the CLI's ``--metrics-out``.
"""

from __future__ import annotations

import json

import numpy as np


def write_metrics_jsonl(path: str, timestamps, outs, extra: dict | None = None):
    """Write per-frame metrics to ``path`` as JSON lines.

    ``outs`` is any NamedTuple of per-frame arrays (StereoStepOut /
    MonoStepOut); array fields with a leading frame axis and scalar-per-
    frame shape are serialized, higher-rank fields are skipped.
    """
    ts = np.asarray(timestamps)
    fields = {}
    n = None
    for name, val in outs._asdict().items():
        arr = np.asarray(val)
        if arr.ndim == 1:
            fields[name] = arr
            n = arr.shape[0] if n is None else n
    with open(path, "w") as f:
        for i in range(n or 0):
            row = {"frame": i, "t": float(ts[i]) if i < len(ts) else None}
            for name, arr in fields.items():
                v = arr[i]
                row[name] = bool(v) if arr.dtype == bool else float(v)
            if extra:
                row.update(extra)
            f.write(json.dumps(row) + "\n")
