#!/usr/bin/env python
"""Reference-compatible entry point (ref eval_dice_plot.py): aggregate
foreground-Dice npz arrays across experiments."""

import sys

from phiseg_tpu.cli.eval_plots import main

if __name__ == "__main__":
    main(["dice"] + sys.argv[1:])
