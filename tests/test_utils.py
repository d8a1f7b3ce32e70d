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


def test_parse_log_epoch_loss_fallback(tmp_path):
    """When print_freq exceeds iters/epoch, train.log has no per-iter loss
    lines; loss curves fall back to the per-epoch summaries (x = epoch)."""
    log = tmp_path / "train.log"
    log.write_text(
        "EPOCH: 01\n"
        "Elapsed time: 1.00 Epoch Pixel Loss: 0.9 Epoch FFT Loss: 50.0\n"
        "001 epoch \n Average PSNR 30.00 dB\n"
        "EPOCH: 02\n"
        "Elapsed time: 1.00 Epoch Pixel Loss: 0.7 Epoch FFT Loss: 40.0\n"
    )
    d = parse_log(str(log))
    assert d["content"] == [(1.0, 0.9), (2.0, 0.7)]
    assert d["fft"] == [(1.0, 50.0), (2.0, 40.0)]
    assert d["psnr"] == [(1.0, 30.0)]


def test_parse_log_resumed_epochs(tmp_path):
    """A resumed run APPENDS to train.log with epoch numbering restarting
    mid-file; the loss x values must be the real epochs from the 'EPOCH: NN'
    headers, not a running line counter (which would stretch the curve)."""
    log = tmp_path / "train.log"
    log.write_text(
        "EPOCH: 01\n"
        "Elapsed time: 1.0 Epoch Pixel Loss: 0.9 Epoch FFT Loss: 50.0\n"
        "EPOCH: 02\n"
        "Elapsed time: 1.0 Epoch Pixel Loss: 0.8 Epoch FFT Loss: 45.0\n"
        # crash + resume from epoch 1's rolling ckpt: epoch 2 re-runs
        "EPOCH: 02\n"
        "Elapsed time: 1.0 Epoch Pixel Loss: 0.8 Epoch FFT Loss: 44.0\n"
        "EPOCH: 03\n"
        "Elapsed time: 1.0 Epoch Pixel Loss: 0.7 Epoch FFT Loss: 40.0\n"
    )
    d = parse_log(str(log))
    assert [x for x, _ in d["content"]] == [1.0, 2.0, 2.0, 3.0]


def test_use_cpu_cache_points_at_fingerprinted_dir():
    """The runtime CPU fallback must move the compile cache off the shared
    TPU dir (~/.jax_cache) onto the host-fingerprinted CPU dir — XLA:CPU AOT
    entries from another machine can segfault (see conftest)."""
    import jax

    from focalnet_tpu.utils.cache import _host_cpu_tag, use_cpu_cache

    before = jax.config.jax_compilation_cache_dir
    try:
        use_cpu_cache()
        assert jax.config.jax_compilation_cache_dir.endswith(
            f".jax_cache_cpu_{_host_cpu_tag()}"
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_cpu_tag_sensitivity():
    """Pin what the cache fingerprint reacts to (VERDICT r4 task 5): the r4
    flags-only md5 let a feature-mismatched XLA:CPU AOT entry load (the
    driver dryrun tail carried XLA's SIGILL warning).  The tag must change
    when ANY CPUID-derived field changes — model name, family/model/stepping,
    vendor, microcode — not just the flags line, and must be insensitive to
    flag ORDER (same feature set, different /proc ordering)."""
    from focalnet_tpu.utils.cache import _host_cpu_identity, _host_cpu_tag

    base = (
        "vendor_id\t: GenuineIntel\n"
        "cpu family\t: 6\n"
        "model\t\t: 85\n"
        "model name\t: Intel(R) Xeon(R) CPU @ 2.00GHz\n"
        "stepping\t: 7\n"
        "microcode\t: 0xffffffff\n"
        "flags\t\t: fpu vme sse sse2 avx avx2 avx512f\n"
    )
    tag0 = _host_cpu_tag(base)
    # order-insensitive over flags
    reordered = base.replace(
        "fpu vme sse sse2 avx avx2 avx512f", "avx512f avx2 avx sse2 sse vme fpu"
    )
    assert _host_cpu_tag(reordered) == tag0
    # sensitive to every CPUID field LLVM's host detection keys off
    for old, new in [
        ("GenuineIntel", "AuthenticAMD"),
        ("cpu family\t: 6", "cpu family\t: 25"),
        ("model\t\t: 85", "model\t\t: 106"),
        ("Xeon(R) CPU @ 2.00GHz", "Xeon(R) Platinum 8481C"),
        ("stepping\t: 7", "stepping\t: 6"),
        ("microcode\t: 0xffffffff", "microcode\t: 0x2b000603"),
        ("avx512f", "avx512f amx_tile"),
    ]:
        assert _host_cpu_tag(base.replace(old, new)) != tag0, (old, new)
    # jaxlib version (executable serialization owner) is part of the identity
    assert "jaxlib=" in _host_cpu_identity(base)
    # the real-host tag is stable call-to-call
    assert _host_cpu_tag() == _host_cpu_tag()


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


def test_parse_trace_and_op_mix(tmp_path):
    """parse_trace sums LEAF ops from the device "XLA Ops" track only —
    module spans, host tracks, and control-flow container events ("while"
    wraps every op of an in-jit timing loop) must not double-count — and
    op_mix buckets on the hlo_category carried in the event args."""
    import gzip
    import json
    import os

    from focalnet_tpu.utils.profiling import op_mix, parse_trace

    def ev(pid, tid, name, dur_us, cat=None):
        e = {"ph": "X", "pid": pid, "tid": tid, "name": name,
             "ts": 0, "dur": dur_us}
        if cat is not None:
            e["args"] = {"hlo_category": cat}
        return e

    events = [
        # metadata: pid 1 = TPU device with an XLA Ops and an XLA Modules
        # track; pid 2 = host python track
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 10, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 1, "tid": 11, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "python"}},
        # leaf ops on the op track
        ev(1, 10, "op._core.1", 1000.0, "custom-call"),
        ev(1, 10, "transpose.5", 200.0, "data formatting"),
        ev(1, 10, "fusion.9", 300.0, "loop fusion"),
        ev(1, 10, "fusion.12", 150.0, "convolution fusion"),
        # container + module + host events that must all be EXCLUDED
        ev(1, 10, "while.2", 1650.0, "while"),
        ev(1, 11, "jit_many", 1700.0),
        ev(2, 20, "python_dispatch", 9999.0),
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    r = parse_trace(str(tmp_path))
    assert abs(r["total_ms"] - 1.65) < 1e-9
    names = {n for n, _, _, _ in r["ops"]}
    assert "while.2" not in names and "jit_many" not in names

    mix = op_mix(str(tmp_path))
    assert abs(mix["scan_kernel"] - 1.0) < 1e-9
    assert abs(mix["layout"] - 0.2) < 1e-9
    assert abs(mix["conv"] - 0.15) < 1e-9
    assert abs(mix["fusion"] - 0.3) < 1e-9
    assert mix["other"] == 0.0


_AOT_WARN = (
    "E0821 01:46:18.191208 910 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
    "result. Target machine feature +prefer-no-gather is not  supported on "
    "the host machine. Machine type used for XLA:CPU compilation doesn't "
    "match the machine type for execution. Compile machine features: "
    "[+64bit,+avx,+avx2,{extra}+prefer-no-scatter,+prefer-no-gather,-amx-avx512] "
    "vs host machine features: [64bit,avx,avx2,sse]. This could lead to "
    "execution errors such as SIGILL."
)


def test_aot_warning_parse_and_benignity():
    """The cpu_aot_loader warning fires on every SAME-HOST load because XLA
    adds tuning preferences (prefer-no-gather/scatter) to the compile
    feature string that LLVM's host probe never reports.  The filter must
    drop exactly that case and keep everything else."""
    from focalnet_tpu.utils.cache import (
        _is_benign_aot_line,
        aot_warning_missing_features,
    )

    benign = _AOT_WARN.format(extra="")
    assert aot_warning_missing_features(benign) == {
        "prefer-no-gather", "prefer-no-scatter"}
    assert _is_benign_aot_line(benign)

    # a REAL missing ISA feature (cross-host entry) must pass through
    real = _AOT_WARN.format(extra="+amx-int8,")
    assert aot_warning_missing_features(real) == {
        "prefer-no-gather", "prefer-no-scatter", "amx-int8"}
    assert not _is_benign_aot_line(real)

    # disabled-at-compile features absent on the host are fine ('-' prefix)
    assert "amx-avx512" not in aot_warning_missing_features(benign)

    # non-warning lines are not classified as benign
    assert aot_warning_missing_features("dryrun: OK") is None
    assert not _is_benign_aot_line("dryrun: OK")
    assert not _is_benign_aot_line("")


def test_filter_benign_aot_warnings_fd_level():
    """The filter must intercept C++-style raw writes to fd 2, drop benign
    AOT warnings, and pass real lines through."""
    import os
    import sys

    from focalnet_tpu.utils.cache import filter_benign_aot_warnings

    r, w = os.pipe()
    saved = os.dup(2)
    os.dup2(w, 2)
    os.close(w)
    try:
        with filter_benign_aot_warnings():
            os.write(2, (_AOT_WARN.format(extra="") + "\n").encode())
            os.write(2, b"real error line\n")
            os.write(2, (_AOT_WARN.format(extra="+amx-int8,") + "\n").encode())
    finally:
        os.dup2(saved, 2)
        os.close(saved)
    out = os.read(r, 1 << 20).decode()
    os.close(r)
    assert "real error line" in out
    assert "amx-int8" in out          # real mismatch kept
    assert out.count("SIGILL") == 1   # benign line dropped


def test_copy_inventory_signatures(tmp_path):
    """benchmarks/copy_inventory groups data-formatting events by
    opcode + layout-transition signature with byte accounting."""
    import gzip
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from benchmarks.copy_inventory import load_events, signature

    ln = ("%copy.1 = f32[4,1,192,16384]{3,2,1,0:T(8,128)} "
          "copy(f32[4,1,192,16384]{2,3,0,1:T(8,128)} %bitcast.6070)")
    sig = signature(ln, "copy.1")
    assert sig == ("copy f32[4,1,192,16384]{3,2,1,0:T(8,128)} "
                   "<- f32[4,1,192,16384]{2,3,0,1:T(8,128)}")
    # same transition, different HLO number -> same signature
    assert signature(ln.replace(".1 ", ".99 ").replace("6070", "1"),
                     "copy.99") == sig

    meta = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "python host"}},
        {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
    ]
    dev = {"ph": "X", "pid": 3, "tid": 7, "ts": 0.0, "dur": 100.0,
           "name": "copy.1",
           "args": {"hlo_category": "copy", "bytes_accessed": "1000",
                    "long_name": ln}}
    host = dict(dev, pid=9, tid=1)  # host-track twin must be excluded
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": meta + [dev, host]}, f)
    events = load_events(str(tmp_path))
    assert len(events) == 1 and events[0]["pid"] == 3
