"""Summarize a jax.profiler xplane trace: top device ops by total time.

Usage: python tools/parse_trace.py [/tmp/jaxtrace] [top_n]
"""

from __future__ import annotations

import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    f = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))[-1]
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(f, "rb").read())

    for plane in sp.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        smeta = {k: v.name for k, v in plane.stat_metadata.items()}
        emeta = {k: v.name for k, v in plane.event_metadata.items()}
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
        print(f"== plane {plane.name}: {sum(tot.values()):.1f} ms total "
              f"({len(tot)} distinct ops) ==")
        for name, ms in tot.most_common(top_n):
            print(f"  {ms:9.2f} ms  x{cnt[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
