"""Shared jax.profiler trace parsing for the profile_* tools.

Traces captured through the axon tunnel put device events on a pid whose
process name is "/device:TPU:N", with named thread lanes:

  * "XLA Modules" — one envelope event per executable launch (step time)
  * "XLA Ops"     — per-fusion events (the breakdown; sums to the module)
  * "Steps"       — step markers (overlapping envelopes; NOT summable)

Summing every lane double-counts ~3x; aggregate "XLA Ops" only and take
totals from "XLA Modules".
"""

from __future__ import annotations

import glob
import gzip
import json
from collections import defaultdict


def parse_device_events(out_dir: str):
    """Parse the newest trace under `out_dir`.

    Returns (agg: name->total us on the XLA Ops lane,
             cnt: name->event count,
             module_total_us: summed XLA Modules envelope time).
    """
    files = sorted(glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True))
    assert files, f"no trace under {out_dir}"
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])

    dev_pids = set()
    op_lanes = set()      # (pid, tid) of "XLA Ops"
    module_lanes = set()  # (pid, tid) of "XLA Modules"
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(e["pid"])
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e.get("pid") in dev_pids:
            lane = e.get("args", {}).get("name", "")
            if lane == "XLA Ops":
                op_lanes.add((e["pid"], e["tid"]))
            elif lane == "XLA Modules":
                module_lanes.add((e["pid"], e["tid"]))

    assert op_lanes or module_lanes, (
        f"trace under {out_dir} has no 'XLA Ops'/'XLA Modules' lanes on "
        f"device pids {sorted(dev_pids)} — profiler format changed? "
        f"(refusing to report 0 device time)")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    module_total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        key = (e["pid"], e.get("tid"))
        dur = float(e.get("dur", 0.0))
        if key in op_lanes:
            agg[e.get("name", "?")] += dur
            cnt[e.get("name", "?")] += 1
        elif key in module_lanes:
            module_total += dur
    return agg, cnt, module_total


def print_top(agg, cnt, module_total, top: int = 25):
    op_total = sum(agg.values())
    print(f"device time: modules {module_total/1e3:.1f} ms, "
          f"ops lane {op_total/1e3:.1f} ms")
    denom = op_total or 1.0
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:9.2f} ms  {100*dur/denom:5.1f}%  x{cnt[name]:<4d} "
              f"{name[:110]}")
