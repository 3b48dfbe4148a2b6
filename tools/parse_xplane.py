"""Parse a jax.profiler xplane.pb trace: list planes and the top ops by
summed duration per device plane (VERDICT r4 #1a — trace-derived top-10
op list for the b=32 train step). Usage: python parse_xplane.py <logdir>."""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    logdir = sys.argv[1]
    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print(f"no xplane.pb under {logdir}")
        return
    for p in paths:
        print(f"== {p}")
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            n_events = sum(len(line.events) for line in plane.lines)
            print(f"plane: {plane.name!r} lines={len(plane.lines)} "
                  f"events={n_events}")
        for plane in xs.planes:
            if not any(k in plane.name.lower()
                       for k in ("tpu", "device", "xla")):
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            per_line = {}
            for line in plane.lines:
                tot = defaultdict(int)
                cnt = defaultdict(int)
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    tot[name] += ev.duration_ps
                    cnt[name] += 1
                if tot:
                    per_line[line.name or str(line.id)] = (tot, cnt)
            for lname, (tot, cnt) in per_line.items():
                total_ps = sum(tot.values())
                print(f"\n-- plane {plane.name!r} line {lname!r}: "
                      f"{len(tot)} distinct events, "
                      f"total {total_ps / 1e12 * 1e3:.3f} ms")
                top = sorted(tot.items(), key=lambda kv: -kv[1])[:20]
                for name, ps in top:
                    print(f"  {ps / 1e9:10.3f} us x? n={cnt[name]:<5d} "
                          f"{100 * ps / max(total_ps, 1):5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
