"""Attribute XLA-Ops busy time to renderer passes via named scopes.

The isolated-jit passbench numbers don't reconcile with the headline
(sum 419 ms > frame 385 ms, VERDICT r4 weak #5): isolated passes re-fetch
inputs the fused frame keeps in flight. This tool attributes the REAL
fused frame instead: it joins the profiler xplane (per-op busy ps on the
'XLA Ops' line) with the dumped HLO's metadata op_name (which carries the
jax.named_scope path, e.g. ``jit(render_frame)/shadows/...``) and sums
busy ms per scope and per source file.

Usage:
  python tools/attrib_scopes.py [xplane_glob] [hlo_txt] [nframes]
Defaults match tools/trace_frame.py outputs:
  /tmp/jaxtrace_frame/**/*.xplane.pb  /tmp/frame_hlo.txt  3
"""
import glob
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_scopes(hlo_path):
    """Map HLO instruction name -> (scope, source_file:line)."""
    scopes = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*metadata=\{[^}]*?op_name=\"([^\"]*)\""
        r"(?:[^}]*?source_file=\"([^\"]*)\" source_line=(\d+))?")
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            name, op_name, sf, sl = m.groups()
            parts = op_name.split("/")
            # scope = named_scope path under jit(render_frame)
            scope = "/".join(parts[1:-1]) if len(parts) > 2 else (
                parts[1] if len(parts) == 2 else "(top)")
            src = f"{sf.rsplit('/', 1)[-1]}:{sl}" if sf else ""
            scopes[name] = (scope or "(top)", src)
    return scopes


def main():
    xglob = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/jaxtrace_frame/**/*.xplane.pb"
    hlo = sys.argv[2] if len(sys.argv) > 2 else "/tmp/frame_hlo.txt"
    nframes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    scopes = load_scopes(hlo)
    import os
    paths = sorted(glob.glob(xglob, recursive=True), key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:  # newest capture
        space.ParseFromString(f.read())

    by_scope = defaultdict(float)
    by_scope_kind = defaultdict(float)
    by_src = defaultdict(float)
    unmatched = 0.0
    unmatched_by_op = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                txt = meta.get(ev.metadata_id, "?")
                m = re.match(r"%([\w.\-]+)", txt)
                ms = ev.duration_ps / 1e9 / nframes
                if not m or m.group(1) not in scopes:
                    unmatched += ms
                    # bucket by op text prefix so repeated instances pool
                    key = re.sub(r"[\d.]+", "#", txt.split("(")[0])[:90]
                    unmatched_by_op[key] += ms
                    continue
                scope, src = scopes[m.group(1)]
                top = scope.split("/")[0]
                if "custom-call" in txt:
                    kind = "custom-call"
                else:
                    rhs = txt.split("=", 1)[-1].strip().split("(")[0].split()
                    kind = rhs[-1] if rhs else "?"
                by_scope[top] += ms
                by_scope_kind[(top, kind)] += ms
                if src:
                    by_src[src] += ms

    print("-- busy ms/frame by top-level scope --")
    for s, ms in sorted(by_scope.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.2f}  {s}")
    print(f"  {unmatched:8.2f}  (unmatched)")
    print("\n-- scope x op-kind (>= 1 ms) --")
    for (s, k), ms in sorted(by_scope_kind.items(), key=lambda kv: -kv[1]):
        if ms >= 1.0:
            print(f"  {ms:8.2f}  {s:28s} {k}")
    print("\n-- busy ms/frame by source line (top 25) --")
    for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:8.2f}  {src}")
    print("\n-- unmatched ops (top 20, pooled by shape-erased text) --")
    for op, ms in sorted(unmatched_by_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms:8.2f}  {op}")


if __name__ == "__main__":
    main()
