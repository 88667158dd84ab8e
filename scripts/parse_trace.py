"""Aggregate per-op device time from a jax.profiler xplane trace ("XLA Ops"
line = exclusive device time)."""

import collections
import glob
import re

import jax.profiler

path = sorted(glob.glob("/tmp/jax_trace/**/*.xplane.pb", recursive=True))[-1]
pd = jax.profiler.ProfileData.from_file(path)

for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        agg = collections.defaultdict(float)
        cnt = collections.defaultdict(int)
        raw = collections.defaultdict(float)
        for ev in line.events:
            dur = ev.duration_ns / 1e6
            name = ev.name
            m = re.match(r"%?([a-zA-Z_-]+)", name)
            kind = m.group(1) if m else name[:20]
            agg[kind] += dur
            cnt[kind] += 1
            raw[re.sub(r"\.\d+", "", name)[:130]] += dur
        total = sum(agg.values())
        print(f"== {plane.name} / XLA Ops: total {total:.1f} ms (3 steps -> {total/3:.1f} ms/step)")
        for k, d in sorted(agg.items(), key=lambda x: -x[1]):
            print(f"  {d:9.2f} ms ({d/total*100:4.1f}%) x{cnt[k]:<6} {k}")
        print("-- top individual ops:")
        for k, d in sorted(raw.items(), key=lambda x: -x[1])[:25]:
            print(f"  {d:9.2f} ms  {k}")
