"""Utils tests: meters, FLOPs cost model, log parsing."""

import numpy as np

from focalnet_tpu.utils import Adder, Timer, scan_flops
from focalnet_tpu.utils.plot_logs import parse_log


def test_adder():
    a = Adder()
    for v in [1.0, 2.0, 3.0]:
        a(v)
    assert a.average() == 2.0
    a.reset()
    assert a.average() == 0.0


def test_timer():
    t = Timer("s")
    t.tic()
    assert t.toc() >= 0.0
    assert Timer("m").divider == 60 and Timer("h").divider == 3600


def test_scan_flops_cost_model():
    # 9*B*L*D*N + B*D*L (with D skip), vmamba_layers.py:96-117
    assert scan_flops(2, 100, 8, 16, with_D=True) == 9 * 2 * 100 * 8 * 16 + 2 * 8 * 100
    assert scan_flops(1, 10, 4, 2, with_D=False, with_Z=True) == 9 * 10 * 4 * 2 + 10 * 4


def test_parse_log(tmp_path):
    log = tmp_path / "train.log"
    log.write_text(
        "Time:  0.1234 Epoch: 001 Iter:  100/ 825 LR: 0.0000333333 "
        "Loss content:  0.1234 Loss fft:  0.5678\n"
        "EPOCH: 01\n"
        "Elapsed time: 1.00 Epoch Pixel Loss: 0.1 Epoch FFT Loss: 0.2\n"
        "001 epoch \n Average PSNR 33.21 dB\n"
    )
    d = parse_log(str(log))
    assert d["content"] == [(0, 0.1234)]
    assert d["fft"] == [(0, 0.5678)]
    assert d["psnr"] == [(1.0, 33.21)]


def test_plot_logs_renders(tmp_path):
    from focalnet_tpu.utils.plot_logs import plot_logs

    log = tmp_path / "train.log"
    log.write_text(
        "Time:  0.1 Epoch: 001 Iter:  100/ 825 LR: 0.0000333333 "
        "Loss content:  0.9 Loss fft:  50.0\n"
        "001 epoch \n Average PSNR 30.00 dB\n"
        "Time:  0.1 Epoch: 002 Iter:  100/ 825 LR: 0.0000666667 "
        "Loss content:  0.7 Loss fft:  40.0\n"
        "002 epoch \n Average PSNR 33.00 dB\n"
    )
    out = plot_logs([str(log)], labels=["run"], out=str(tmp_path / "c.png"))
    import os
    assert os.path.getsize(out) > 1000
