"""Offline training-log analysis (``/root/reference/ITS/plot_logs.py``).

Scrapes the stdout/`train.log` formats emitted by the trainer (which match
the reference's print formats, the de-facto API consumed by the reference's
scraper regexes at ``plot_logs.py:27-37``):

    "Time: ... Loss content: %7.4f Loss fft: %7.4f"   (per print_freq iters)
    "%03d epoch \n Average PSNR %.2f dB"              (per valid_freq epochs)

Produces PSNR / pixel-loss / FFT-loss curves, with the reference's plot-band
clamp (PSNR plotted within [28, 50] dB, ``plot_logs.py:5``) as an option.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

PSNR_RE = re.compile(r"Average PSNR\s+([0-9.]+)\s*dB")
EPOCH_RE = re.compile(r"^(\d+)\s+epoch")
EPOCH_HDR_RE = re.compile(r"^EPOCH:\s*(\d+)")
LOSS_RE = re.compile(r"Loss content:\s*([0-9.]+)\s+Loss fft:\s*([0-9.]+)")
# per-epoch summary line ("Epoch Pixel Loss ... Epoch FFT Loss", the
# reference's train.py:106-108 format) — the only loss record in train.log
# when print_freq exceeds the iters per epoch
EPOCH_LOSS_RE = re.compile(
    r"Epoch Pixel Loss:\s*([0-9.]+)\s+Epoch FFT Loss:\s*([0-9.]+)")


def parse_log(path: str) -> Dict[str, List[Tuple[float, float]]]:
    """Return {"psnr": [(epoch, dB)], "content": [(i, v)], "fft": [(i, v)]}.

    Loss curves come from the per-print_freq iteration lines when present,
    otherwise from the per-epoch summary lines (x = epoch).
    """
    psnr, content, fft = [], [], []
    ep_content, ep_fft = [], []
    last_epoch = None
    hdr_epoch = None
    n_epoch_loss = 0
    with open(path) as f:
        for line in f:
            m = EPOCH_HDR_RE.match(line.strip())
            if m:
                hdr_epoch = int(m.group(1))
            m = EPOCH_RE.match(line.strip())
            if m:
                last_epoch = int(m.group(1))
            m = PSNR_RE.search(line)
            if m:
                psnr.append((float(last_epoch or len(psnr)), float(m.group(1))))
            m = LOSS_RE.search(line)
            if m:
                content.append((len(content), float(m.group(1))))
                fft.append((len(fft), float(m.group(2))))
            m = EPOCH_LOSS_RE.search(line)
            if m:
                n_epoch_loss += 1
                # x = the REAL epoch from the preceding "EPOCH: NN" header
                # (a resumed run's appended log restarts epoch numbering
                # mid-file; a raw counter would misalign vs the PSNR series)
                x = float(hdr_epoch if hdr_epoch is not None else n_epoch_loss)
                ep_content.append((x, float(m.group(1))))
                ep_fft.append((x, float(m.group(2))))
    if not content:
        content, fft = ep_content, ep_fft
    return {"psnr": psnr, "content": content, "fft": fft}


def plot_logs(paths, labels=None, out: str = "curves.png",
              psnr_band: Optional[Tuple[float, float]] = (28.0, 50.0)):
    """Plot PSNR / pixel / FFT curves for one or more logs side by side."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = labels or [str(p) for p in paths]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for path, label in zip(paths, labels):
        d = parse_log(path)
        if d["psnr"]:
            xs, ys = zip(*d["psnr"])
            if psnr_band:
                ys = [min(max(y, psnr_band[0]), psnr_band[1]) for y in ys]
            axes[0].plot(xs, ys, label=label)
        if d["content"]:
            xs, ys = zip(*d["content"])
            axes[1].plot(xs, ys, label=label)
        if d["fft"]:
            xs, ys = zip(*d["fft"])
            axes[2].plot(xs, ys, label=label)
    for ax, title in zip(axes, ["PSNR (dB)", "Pixel loss", "FFT loss"]):
        ax.set_title(title)
        if ax.get_legend_handles_labels()[0]:
            ax.legend()
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    return out


if __name__ == "__main__":
    import sys

    print(plot_logs(sys.argv[1:] or ["results/weights/train.log"]))
