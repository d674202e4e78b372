#!/usr/bin/env python3
"""Canonical-config learning curves figure (docs/figures).

Two small multiples sharing the epoch axis domain — val accuracy (the
0.5-on-logits val meter) and train loss — for the two canonical
PathTracker configs trained on one TPU chip:

  series 1: dist=5 / T=32  (results_conv/32_1_5/convInT2)
  series 2: dist=14 / T=64 (results_conv/64_1_14/convInT64b)

Each accuracy panel carries its config's greedy nearest-neighbor bar
(measured on the actual test shard — BASELINE.md) as a neutral dashed
reference line. Colors are the dataviz reference palette's first two
categorical slots (light mode), assigned in fixed order; lines are 2px,
grid recessive, legend present, series direct-labeled at line ends.
"""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))

SERIES = [
    # (label, run dir, greedy bar %, color)
    ("dist=5 / T=32", "results_conv/32_1_5/convInT2", 79.8, "#2a78d6"),
    ("dist=14 / T=64", "results_conv/64_1_14/convInT64b", 60.8, "#eb6834"),
]
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"


def main():
    fig, (ax_acc, ax_loss) = plt.subplots(
        1, 2, figsize=(10.5, 4.0), facecolor=SURFACE)
    for ax in (ax_acc, ax_loss):
        ax.set_facecolor(SURFACE)
        ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(GRID)
        ax.tick_params(colors=TEXT2, labelsize=9)

    for label, rel, greedy, color in SERIES:
        folder = os.path.join(REPO, rel)
        val = np.load(os.path.join(folder, "val.npz"))
        train = np.load(os.path.join(folder, "train.npz"))
        acc = np.asarray(val["balacc"], np.float64)
        ep = np.arange(len(acc))
        ax_acc.plot(ep, acc, color=color, linewidth=2, label=label, zorder=3)
        ax_acc.annotate(label, (ep[-1], acc[-1]), xytext=(4, 0),
                        textcoords="offset points", color=TEXT2, fontsize=9,
                        va="center")
        ax_acc.axhline(greedy, color=TEXT2, linewidth=1, linestyle=(0, (4, 3)),
                       zorder=1)
        ax_acc.annotate(f"greedy tracker {greedy:.0f}%", (0, greedy),
                        xytext=(2, 3), textcoords="offset points",
                        color=TEXT2, fontsize=8)
        # Train loss history is per-log-interval; aggregate to per-epoch
        # means so the line reads as a trend, not step noise.
        loss = np.asarray(train["loss"], np.float64)
        per = max(len(loss) // max(len(acc), 1), 1)
        n = (len(loss) // per) * per
        ep_loss = loss[:n].reshape(-1, per).mean(axis=1)
        lx = np.linspace(0, len(acc) - 1, len(ep_loss))
        ax_loss.plot(lx, ep_loss, color=color, linewidth=2, label=label,
                     zorder=3)

    ax_acc.set_title("Validation accuracy (0.5-threshold meter)", color=TEXT,
                     fontsize=11, loc="left")
    ax_acc.set_xlabel("epoch", color=TEXT2, fontsize=9)
    ax_acc.set_ylabel("balanced accuracy (%)", color=TEXT2, fontsize=9)
    ax_acc.set_ylim(40, 100)
    ax_loss.set_title("Train BCE loss", color=TEXT, fontsize=11, loc="left")
    ax_loss.set_xlabel("epoch", color=TEXT2, fontsize=9)
    ax_loss.legend(frameon=False, fontsize=9, labelcolor=TEXT2)

    fig.suptitle("InT on canonical PathTracker configs — one TPU v5 chip, "
                 "warm-started transfer", color=TEXT, fontsize=12, x=0.01,
                 ha="left")
    fig.tight_layout(rect=(0, 0, 0.93, 0.95))
    out = os.path.join(HERE, "canonical_learning_curves.png")
    fig.savefig(out, dpi=150, facecolor=SURFACE)
    print("wrote", out)


if __name__ == "__main__":
    main()
