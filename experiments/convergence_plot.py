"""Render the convergence-run trajectory artifact from a training
checkpoint dir's CSV event logs (utils/logging.py ScalarWriter format:
tag,value,step rows in tensorboard-train/events.csv and
tensorboard-val/events.csv).

Usage:
  python experiments/convergence_plot.py CKPT_DIR OUT_PNG \
      [--lr_boundaries 100 200 300] [--title "..."]

Produces a small-multiples figure (one y-axis per panel, shared step
axis): total train/val loss, loss components (log y), learning rate
(log y), curriculum mix, and validation metrics.  Vertical rules mark
the multi-step LR boundaries so descent through the transitions is
visible at a glance.  Colors are the Okabe-Ito colorblind-safe set,
assigned in fixed order.
"""

import argparse
import csv
import os
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Okabe-Ito (colorblind-safe), fixed assignment order
C_BLUE, C_ORANGE, C_GREEN, C_PINK, C_VERM = (
    "#0072B2", "#E69F00", "#009E73", "#CC79A7", "#D55E00")


def read_events(path):
    """events.csv -> {tag: (steps, values)} sorted by step."""
    series = defaultdict(list)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        for row in csv.DictReader(f):
            try:
                series[row["tag"]].append(
                    (int(row["step"]), float(row["value"])))
            except (KeyError, ValueError):
                continue
    out = {}
    for tag, pts in series.items():
        pts.sort()
        out[tag] = ([p[0] for p in pts], [p[1] for p in pts])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("out_png")
    ap.add_argument("--lr_boundaries", nargs="*", type=int, default=[])
    ap.add_argument("--curriculum_marks", nargs="*", type=int, default=[],
                    help="steps where a curriculum phase lands (e.g. "
                         "pct_medium hits 0, pct_hard saturates)")
    ap.add_argument("--title", default="rangeclip_tpu convergence run")
    args = ap.parse_args()

    train = read_events(
        os.path.join(args.ckpt_dir, "tensorboard-train", "events.csv"))
    val = read_events(
        os.path.join(args.ckpt_dir, "tensorboard-val", "events.csv"))

    fig, axes = plt.subplots(5, 1, figsize=(9, 13), sharex=True)
    fig.suptitle(args.title, fontsize=12)

    def rules(ax):
        for i, s in enumerate(args.lr_boundaries):
            ax.axvline(s, color="0.55", lw=1, ls="--",
                       label="LR boundary" if i == 0 else None)
        for i, s in enumerate(args.curriculum_marks):
            ax.axvline(s, color="0.75", lw=1, ls=":",
                       label="curriculum phase" if i == 0 else None)

    # 1. total loss
    ax = axes[0]
    rules(ax)
    if "Loss/train_step" in train:
        ax.plot(*train["Loss/train_step"], color=C_BLUE, lw=1.6,
                label="train total")
    for tag, label in (("Loss/val", "val total"),
                       ("val/loss", "val total"),
                       ("val/avg_loss", "val total")):
        if tag in val:
            ax.plot(*val[tag], color=C_ORANGE, lw=1.6, marker="o",
                    ms=3.5, label=label)
            break
    ax.set_ylabel("total loss")
    ax.legend(loc="upper right", fontsize=8, frameon=False)

    # 2. components (log y — they live on different decades)
    ax = axes[1]
    rules(ax)
    for tag, color, label in (
        ("Loss/text_contrast", C_BLUE, "text InfoNCE"),
        ("Loss/image_contrast", C_ORANGE, "image InfoNCE"),
        ("Loss/smoothness", C_GREEN, "TV smoothness"),
    ):
        if tag in train:
            ax.plot(*train[tag], color=color, lw=1.6, label=label)
    ax.set_yscale("log")
    ax.set_ylabel("component (log)")
    ax.legend(loc="upper right", fontsize=8, frameon=False)

    # 3. learning rate
    ax = axes[2]
    rules(ax)
    if "Params/learning_rate" in train:
        steps, vals = train["Params/learning_rate"]
        ax.step(steps, vals, where="post", color=C_BLUE, lw=1.6)
    ax.set_yscale("log")
    ax.set_ylabel("learning rate")

    # 4. curriculum mix
    ax = axes[3]
    rules(ax)
    for tag, color, label in (
        ("train/curriculum/pct_medium", C_BLUE, "medium"),
        ("train/curriculum/pct_hard", C_ORANGE, "hard"),
        ("train/curriculum/pct_rand", C_GREEN, "random"),
    ):
        if tag in train:
            ax.plot(*train[tag], color=color, lw=1.6, label=label)
    ax.set_ylabel("distractor mix")
    ax.set_ylim(-0.05, 1.05)
    ax.legend(loc="center right", fontsize=8, frameon=False)

    # 5. val metrics
    ax = axes[4]
    rules(ax)
    for tag, color, label in (
        ("val/mIoU_t1", C_BLUE, "mIoU top-1"),
        ("val/mIoU_tk", C_ORANGE, "mIoU top-k"),
        ("val/pixel_accuracy_t1", C_GREEN, "pixel acc top-1"),
        ("val/pixel_accuracy_tk", C_PINK, "pixel acc top-k"),
    ):
        if tag in val:
            ax.plot(*val[tag], color=color, lw=1.6, marker="o", ms=3.5,
                    label=label)
    ax.set_ylabel("val metric")
    ax.set_ylim(0, 1)
    ax.set_xlabel("optimizer step")
    ax.legend(loc="lower right", fontsize=8, frameon=False)

    for ax in axes:
        ax.grid(alpha=0.25, lw=0.5)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)

    fig.tight_layout(rect=(0, 0, 1, 0.985))
    fig.savefig(args.out_png, dpi=150)
    print(f"wrote {args.out_png}")


if __name__ == "__main__":
    main()
