"""Parse an xplane.pb trace directly and print top device ops by time."""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = glob.glob(sys.argv[1] if len(sys.argv) > 1 else
                  "/tmp/jaxtrace/**/*.xplane.pb", recursive=True)
print("files:", paths, flush=True)

space = xplane_pb2.XSpace()
with open(paths[0], "rb") as f:
    space.ParseFromString(f.read())

for plane in space.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
    totals = defaultdict(int)
    counts = defaultdict(int)
    for line in plane.lines:
        for ev in line.events:
            name = meta.get(ev.metadata_id, "?")
            totals[name] += ev.duration_ps
            counts[name] += 1
    if not totals:
        continue
    print(f"\n=== plane: {plane.name} ===")
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:35]
    for name, ps in top:
        print(f"{ps/1e9:10.2f} ms  x{counts[name]:<5d} {name[:120]}")
