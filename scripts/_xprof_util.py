"""Shared xprof trace parsing for the profiler scripts: top HLO ops with
source attribution from a jax.profiler trace dir."""
from __future__ import annotations

import glob
import json
import os
import re


def print_top_ops(trace_dir: str, top: int = 30) -> None:
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no xplane under {trace_dir}"
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    obj = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["label"] for c in obj["cols"]]
    rows = [[c["v"] if c else None for c in r["c"]] for r in obj["rows"]]
    idx = {c: i for i, c in enumerate(cols)}
    i_time = idx["Total self time (us)"]
    rows.sort(key=lambda r: -(r[i_time] or 0))
    total = sum(r[i_time] or 0 for r in rows)
    print(f"total self time {total / 1e6:.2f} s")
    print(f"{'ms':>10} {'%':>5} {'n':>5}  {'bound':<10} op")
    for r in rows[:top]:
        t = r[i_time] or 0
        src = re.sub(r"<[^>]*>", "", str(r[idx.get("Source Info", 0)] or ""))
        cat = r[idx.get("HLO op category", 0)] or ""
        occ = int(r[idx.get("#Occurrences", 0)] or 0)
        fw = str(r[idx.get("Framework op name", 0)] or "")[:80]
        bound = str(r[idx.get("Bound by", 0)] or "")[:10]
        print(f"{t / 1000:10.1f} {100 * t / max(total, 1):5.1f} {occ:5d}  "
              f"{bound:<10} {cat} | {fw} | {src}", flush=True)
