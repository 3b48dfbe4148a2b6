"""Roofline analysis of a b=N train-step xplane trace (VERDICT r4 #1a):
per-HLO-category device time + bytes, measured HBM traffic per step, and
the top ops by device time. Usage: python analyze_trace.py <xplane.pb>
[n_steps]."""
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def parse_breakdown(raw: bytes):
    """Hand-decode OpMetrics.MemoryAccessedBreakdown (op_metrics.proto):
    repeated MemoryAccessed{operation_type=1(enum), memory_space=2(uint),
    bytes_accessed=3(uint)}. Returns [(op_type, space, bytes)]."""
    out = []
    i = 0

    def varint(j):
        shift, val = 0, 0
        while True:
            b = raw[j]
            val |= (b & 0x7F) << shift
            j += 1
            if not b & 0x80:
                return val, j
            shift += 7

    while i < len(raw):
        tag, i = varint(i)
        if tag >> 3 == 1 and tag & 7 == 2:  # repeated message
            ln, i = varint(i)
            sub = raw[i:i + ln]
            i += ln
            j, rec = 0, {}
            while j < len(sub):
                t2, j = varint(j)
                v, j = varint(j)
                rec[t2 >> 3] = v
            out.append((rec.get(1, 0), rec.get(2, 0), rec.get(3, 0)))
        else:  # skip unknown
            wt = tag & 7
            if wt == 0:
                _, i = varint(i)
            elif wt == 2:
                ln, i = varint(i)
                i += ln
            else:
                raise ValueError(f"wire type {wt}")
    return out


def main():
    path = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    smeta = {i: m.name for i, m in plane.stat_metadata.items()}

    def meta_stats(md):
        d = {}
        for st in md.stats:
            name = smeta[st.metadata_id]
            d[name] = (st.int64_value or st.uint64_value or st.double_value
                       or st.bytes_value or st.str_value)
        return d

    # step span
    steps_line = next(ln for ln in plane.lines if ln.name == "Steps")
    span_ps = sum(ev.duration_ps for ev in steps_line.events)
    print(f"steps traced: {len(steps_line.events)}, "
          f"mean step span: {span_ps / len(steps_line.events) / 1e9:.3f} ms")

    for line_name in ("XLA Ops", "Async XLA Ops"):
        line = next(ln for ln in plane.lines if ln.name == line_name)
        cat_time = defaultdict(int)
        cat_bytes = defaultdict(int)
        cat_space_bytes = defaultdict(lambda: defaultdict(int))
        cat_flops = defaultdict(int)
        op_time = defaultdict(int)
        op_info = {}
        for ev in line.events:
            md = plane.event_metadata[ev.metadata_id]
            ms = meta_stats(md)
            cat = ms.get("hlo_category", "?")
            cat_time[cat] += ev.duration_ps
            b = int(ms.get("bytes_accessed", 0) or 0)
            cat_bytes[cat] += b
            cat_flops[cat] += int(ms.get("flops", 0) or 0)
            br = ms.get("memory_access_breakdown")
            if isinstance(br, bytes) and br:
                for (_op, space, nb) in parse_breakdown(br):
                    cat_space_bytes[cat][space] += nb
            else:
                cat_space_bytes[cat][1] += b  # assume HBM when no breakdown
            op_time[md.name] += ev.duration_ps
            op_info[md.name] = (cat, b)
        total_t = sum(cat_time.values())
        total_b = sum(cat_bytes.values())
        hbm_b = sum(sb.get(1, 0) for sb in cat_space_bytes.values())
        print(f"\n=== line {line_name!r}: busy {total_t / n_steps / 1e9:.2f} "
              f"ms/step ({100 * total_t / span_ps:.1f}% of span), "
              f"bytes {total_b / n_steps / 1e9:.2f} GB/step "
              f"(HBM-space {hbm_b / n_steps / 1e9:.2f} GB/step)")
        print(f"{'category':<22}{'ms/step':>9}{'%span':>7}{'GB/step':>9}"
              f"{'HBM GB/step':>12}{'GB/s@busy':>10}{'GF/step':>9}")
        for cat in sorted(cat_time, key=lambda c: -cat_time[c]):
            t = cat_time[cat] / n_steps / 1e12  # s/step
            gb = cat_bytes[cat] / n_steps / 1e9
            hgb = cat_space_bytes[cat].get(1, 0) / n_steps / 1e9
            bw = (cat_space_bytes[cat].get(1, 0) / n_steps / 1e9 / t
                  if t > 0 else 0)
            print(f"{cat:<22}{t * 1e3:>9.3f}"
                  f"{100 * cat_time[cat] / span_ps:>7.1f}{gb:>9.3f}"
                  f"{hgb:>12.3f}{bw:>10.1f}"
                  f"{cat_flops[cat] / n_steps / 1e9:>9.1f}")
        print("top 12 ops by device time:")
        for name, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:12]:
            cat, b = op_info[name]
            print(f"  {t / n_steps / 1e9:8.3f} ms/step  {cat:<16} "
                  f"{b / 1e6:9.1f} MB  {name[:86]}")


if __name__ == "__main__":
    main()
