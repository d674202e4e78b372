#!/usr/bin/env python3
"""Round-5 cold-start campaign curves figure (docs/figures).

Two small multiples — val accuracy (the 0.5-on-logits val meter) and
val BCE loss — for the two from-scratch campaigns run at the reference
protocol's lr 3e-4 (`/root/reference/train_InT.sh:3` behavior spec):

  series 1: reference cold start, dist=14 / T=64
            (results_conv/64_1_14/coldstart — 300 epochs committed)
  series 2: speed-4 isolation cold start, dist=1 / speed=4 / T=32
            (results_conv/32_4_1/speed4cold — 350 epochs committed)

Each accuracy panel carries its config's greedy nearest-neighbor bar
(measured on the actual test shard — BASELINE.md) as a neutral dashed
reference line, plus the 50% chance line. Both runs hold the chance
plateau for their entire committed budget — the figure documents the
negative result behind BASELINE.md's "cold-start protocol" and
"speed-4 verdict" sections. Style follows make_learning_curves.py
(dataviz reference palette, recessive grid, direct labels).
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
    ("cold start dist=14 / T=64", "results_conv/64_1_14/coldstart",
     57.2, "#2a78d6"),
    ("cold start speed=4 / dist=1 / T=32", "results_conv/32_4_1/speed4cold",
     68.0, "#eb6834"),
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

    for i, (label, rel, greedy, color) in enumerate(SERIES):
        folder = os.path.join(REPO, rel)
        val = np.load(os.path.join(folder, "val.npz"))
        acc = np.asarray(val["balacc"], np.float64)
        loss = np.asarray(val["loss"], np.float64)
        ep = np.arange(len(acc))
        ax_acc.plot(ep, acc, color=color, linewidth=2, label=label, zorder=3)
        # Stagger the two end labels (both series end near 50%).
        ax_acc.annotate(f"{label}  ({len(acc)} ep)", (ep[-1], acc[-1]),
                        xytext=(4, 10 if i == 0 else -10),
                        textcoords="offset points",
                        color=TEXT2, fontsize=8, va="center")
        ax_acc.axhline(greedy, color=color, linewidth=1,
                       linestyle=(0, (4, 3)), zorder=1, alpha=0.7)
        ax_acc.annotate(f"greedy tracker {greedy:.0f}%", (0, greedy),
                        xytext=(2, 3), textcoords="offset points",
                        color=TEXT2, fontsize=8)
        ax_loss.plot(ep, loss, color=color, linewidth=2, label=label,
                     zorder=3)

    ax_acc.axhline(50, color=TEXT2, linewidth=1, linestyle=(0, (1, 2)),
                   zorder=1)
    ax_acc.annotate("chance", (0, 44), xytext=(2, 0),
                    textcoords="offset points", color=TEXT2, fontsize=8)
    ax_loss.axhline(np.log(2), color=TEXT2, linewidth=1,
                    linestyle=(0, (1, 2)), zorder=1)
    ax_loss.annotate("ln 2 (chance BCE)", (0, 0.6875), xytext=(2, 0),
                     textcoords="offset points", color=TEXT2, fontsize=8)

    ax_acc.set_title("Validation accuracy (0.5-threshold meter)", color=TEXT,
                     fontsize=11, loc="left")
    ax_acc.set_xlabel("epoch", color=TEXT2, fontsize=9)
    ax_acc.set_ylabel("balanced accuracy (%)", color=TEXT2, fontsize=9)
    ax_acc.set_ylim(40, 100)
    ax_loss.set_title("Validation BCE loss", color=TEXT, fontsize=11,
                      loc="left")
    ax_loss.set_xlabel("epoch", color=TEXT2, fontsize=9)
    ax_loss.set_ylim(0.66, 0.73)
    ax_loss.legend(frameon=False, fontsize=9, labelcolor=TEXT2)

    fig.suptitle("Reference-protocol cold starts (lr 3e-4) hold their "
                 "chance plateaus — one TPU v5 chip, committed slices",
                 color=TEXT, fontsize=12, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 0.80, 0.95))
    out = os.path.join(HERE, "coldstart_curves_r05.png")
    fig.savefig(out, dpi=150, facecolor=SURFACE)
    print("wrote", out)


if __name__ == "__main__":
    main()
