"""Fixed-tick accumulator — 50 ticks/s, at most one tick per frame
(src/ticker.rs:9-22; instantiated but unused in the reference's frame loop,
src/renderer.rs:346 — provided for parity and used by app.py)."""

from __future__ import annotations


class Ticker:
    TICK_RATE = 50.0

    def __init__(self):
        self.accumulator = 0.0
        self.tick_count = 0

    def update(self, delta: float) -> bool:
        """Accumulate frame time; returns True when a tick fires (max one)."""
        self.accumulator += delta
        if self.accumulator >= 1.0 / self.TICK_RATE:
            self.accumulator -= 1.0 / self.TICK_RATE
            self.accumulator = min(self.accumulator, 1.0 / self.TICK_RATE)
            self.tick_count += 1
            return True
        return False
