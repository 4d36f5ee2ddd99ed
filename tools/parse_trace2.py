"""xplane parser v2: aggregate the 'XLA Ops' line (the TensorCore
timeline — events there tile the whole frame without overlap).

Prints per-line busy totals, then op-kind aggregates and top ops from the
XLA Ops line only. Durations divided by the traced frame count (argv[2]).
"""
import glob
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = glob.glob(sys.argv[1] if len(sys.argv) > 1 else
                  "/tmp/jaxtrace_frame/**/*.xplane.pb", recursive=True)
nframes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

space = xplane_pb2.XSpace()
with open(paths[0], "rb") as f:
    space.ParseFromString(f.read())

for plane in space.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
    print(f"\n=== plane: {plane.name} ===")
    opline = None
    for line in plane.lines:
        busy = sum(ev.duration_ps for ev in line.events)
        print(f"line {line.name!r}: busy {busy/1e9/nframes:9.2f} ms/frame"
              f"  ({len(line.events)} events)")
        if line.name == "XLA Ops":
            opline = line
    if opline is None:
        continue
    totals = defaultdict(int)
    counts = defaultdict(int)
    kinds = defaultdict(int)
    for ev in opline.events:
        name = meta.get(ev.metadata_id, "?")
        totals[name] += ev.duration_ps
        counts[name] += 1
        key = name.split(" = ")[0].lstrip("%")
        key = re.sub(r"\.\d+$", "", key)
        kinds[key] += ev.duration_ps
    print("\n-- aggregate by op kind (XLA Ops line, ms/frame) --")
    for k, t in sorted(kinds.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {t/1e9/nframes:9.2f}  {k}")
    print("\n-- top ops (ms/frame) --")
    for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:50]:
        print(f"  {t/1e9/nframes:8.2f} x{counts[name]:<3d} {name[:220]}")
