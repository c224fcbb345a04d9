"""Terminal progress reporter with ETA (reference util/progressreporter.h:44
ProgressReporter: work counter + elapsed/ETA bar on stderr).

Host-side: the render driver updates it once per dispatched wave (device
work is opaque between dispatches, like the reference's GPU mode which
advances progress from a host thread watching an event queue).
"""
from __future__ import annotations

import shutil
import sys
import time


class ProgressReporter:
    def __init__(self, total_work: int, title: str = "Rendering",
                 enabled: bool = True, out=None):
        self.total = max(int(total_work), 1)
        self.title = title
        self.enabled = enabled and (out is not None or sys.stderr.isatty()
                                    or True)
        self.out = out or sys.stderr
        self.done_work = 0
        self.t0 = time.time()
        self._last_draw = 0.0

    def update(self, n: int = 1):
        self.done_work += n
        now = time.time()
        # redraw at most ~5x/sec (the reference uses a watcher thread;
        # we piggyback on wave completion)
        if self.enabled and (now - self._last_draw > 0.2
                             or self.done_work >= self.total):
            self._draw(now)
            self._last_draw = now

    def _draw(self, now):
        frac = min(self.done_work / self.total, 1.0)
        elapsed = now - self.t0
        eta = elapsed / frac - elapsed if frac > 0 else 0.0
        cols = shutil.get_terminal_size((80, 20)).columns
        barw = max(10, cols - len(self.title) - 32)
        filled = int(barw * frac)
        bar = "+" * filled + " " * (barw - filled)
        msg = (f"\r{self.title}: [{bar}] "
               f"({elapsed:.1f}s|{eta:.1f}s)  {100 * frac:5.1f}%")
        print(msg, end="", file=self.out, flush=True)

    def finish(self):
        if self.enabled:
            self._draw(time.time())
            print(file=self.out, flush=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()
        return False
