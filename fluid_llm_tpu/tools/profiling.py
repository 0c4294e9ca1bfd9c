"""Shared xplane trace aggregation for on-chip profiles.

``jax.profiler.trace`` writes an ``*.xplane.pb`` per capture; this module
rolls device time up per op and per op-category (the leading ``%fusion`` /
``%dynamic-update-slice`` / ``%all-reduce`` stem), the same view
``tools/rollout_profile.py trace`` prints for the flagship rollout.  Used by
``baselines_cli --profile_dir`` to decide whether scatter (segment-sum)
dominates graph-baseline training at EAGLE scale (~3.5k nodes) before
reaching for a Pallas kernel (ROADMAP "Perf candidates").
"""

from __future__ import annotations

import glob
import re
from collections import defaultdict


def summarize_xplane(trace_dir: str, divisor: float = 1.0, top: int = 25):
    """Print per-category + top-op device time from the newest xplane under
    ``trace_dir``; return ``{category: ms}`` (total under key ``"_total"``).

    ``divisor`` scales the per-step annotation (e.g. number of steps traced).
    Returns ``None`` when no TPU plane is present (CPU-only trace).
    """
    from jax.profiler import ProfileData

    pbs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not pbs:
        print(f"no xplane.pb under {trace_dir}")
        return None
    pd = ProfileData.from_file(pbs[-1])
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_op, per_cat = defaultdict(float), defaultdict(float)
            total = 0.0
            for ev in line.events:
                if ev.name.startswith("%while"):
                    continue  # parent; children are listed separately
                per_op[ev.name[:130]] += ev.duration_ns
                m = re.match(r"%([a-z_-]+)", ev.name)
                per_cat[m.group(1) if m else "?"] += ev.duration_ns
                total += ev.duration_ns
            if not total:
                continue
            print(f"device busy: {total / 1e6:.2f} ms"
                  f" ({total / 1e6 / max(divisor, 1e-9):.3f} ms/step)")
            print("== categories ==")
            for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])[:15]:
                print(f"  {v / 1e6:8.2f} ms  {v / total * 100:5.1f}%  {k}")
            print("== top ops ==")
            for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {v / 1e6:8.2f} ms  {k}")
            out = {k: v / 1e6 for k, v in per_cat.items()}
            out["_total"] = total / 1e6
            return out
    print(f"no TPU 'XLA Ops' plane in {pbs[-1]} (CPU trace?)")
    return None
