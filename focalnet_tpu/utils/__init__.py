"""Small training utilities (``/root/reference/ITS/utils.py:5-43``)."""

from focalnet_tpu.utils.meters import Adder, Timer
from focalnet_tpu.utils.flops import model_flops, scan_flops
from focalnet_tpu.utils.profiling import annotate, timed, trace

__all__ = ["Adder", "Timer", "model_flops", "scan_flops",
           "trace", "annotate", "timed"]
