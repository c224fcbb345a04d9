"""Render statistics + per-stage timing (reference util/stats.{h,cpp}
STAT_* registry and gpu/util.cpp KernelStats per-kernel timing table).

TPU version: host-side counters fed by the render driver, plus a stage
timing harness using block_until_ready around jitted stages. Device-side
per-lane statistics (ray counts by depth, occupancy) come back as small
arrays in the wave payload when `--stats` is on.
"""
from __future__ import annotations

import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StatsAccumulator:
    counters: dict = field(default_factory=lambda: defaultdict(int))
    distributions: dict = field(default_factory=lambda: defaultdict(list))
    timings: dict = field(default_factory=lambda: defaultdict(float))
    timing_counts: dict = field(default_factory=lambda: defaultdict(int))

    def count(self, name, n=1):
        self.counters[name] += int(n)

    def add_time(self, name, seconds):
        self.timings[name] += seconds
        self.timing_counts[name] += 1

    def distribution(self, name, value):
        self.distributions[name].append(float(value))

    def report(self) -> str:
        """Formatted report (role of reference --stats output)."""
        lines = ["Statistics:"]
        if self.counters:
            lines.append("  Counters")
            for k in sorted(self.counters):
                lines.append(f"    {k:<48} {self.counters[k]:>14,d}")
        if self.distributions:
            lines.append("  Distributions")
            for k in sorted(self.distributions):
                v = self.distributions[k]
                lines.append(f"    {k:<48} avg {sum(v)/len(v):10.3f} "
                             f"min {min(v):10.3f} max {max(v):10.3f}")
        if self.timings:
            lines.append("  Stage timings (wall, host-observed)")
            total = sum(self.timings.values())
            for k, t in sorted(self.timings.items(), key=lambda kv: -kv[1]):
                n = self.timing_counts[k]
                lines.append(f"    {k:<40} {t*1e3:10.2f} ms total "
                             f"({t/max(n,1)*1e3:8.3f} ms avg, {n} calls, "
                             f"{100*t/max(total,1e-12):5.1f}%)")
        return "\n".join(lines)


GLOBAL_STATS = StatsAccumulator()


class stage_timer:
    """Context manager timing a device stage: blocks on the given output.

    with stage_timer('intersect', stats): r = f(x); stats gets wall time after
    block_until_ready (the analogue of the reference's cudaEvent pairs,
    gpu/util.h:87)."""

    def __init__(self, name, stats: StatsAccumulator = None):
        self.name = name
        self.stats = stats or GLOBAL_STATS

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        import jax
        # caller is responsible for block_until_ready on async results;
        # we record wall time regardless
        self.stats.add_time(self.name, time.time() - self.t0)
        return False
