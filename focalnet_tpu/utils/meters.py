"""Running-average and wall-clock meters (``/root/reference/ITS/utils.py``)."""

from __future__ import annotations

import time


class Adder:
    """Running mean accumulator (``utils.py:5-19``)."""

    def __init__(self):
        self.count = 0
        self.num = 0.0

    def reset(self):
        self.count = 0
        self.num = 0.0

    def __call__(self, num):
        self.count += 1
        self.num += float(num)

    def average(self):
        return self.num / self.count if self.count else 0.0


class Timer:
    """tic/toc timer with s/m/h divider (``utils.py:22-37``)."""

    def __init__(self, option: str = "s"):
        self.tm = 0.0
        self.divider = {"s": 1, "m": 60, "h": 3600}[option]

    def tic(self):
        self.tm = time.time()

    def toc(self):
        return (time.time() - self.tm) / self.divider
