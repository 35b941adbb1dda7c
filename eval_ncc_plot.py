#!/usr/bin/env python
"""Reference-compatible entry point (ref eval_ncc_plot.py): aggregate S_NCC
npz arrays across experiments."""

import sys

from phiseg_tpu.cli.eval_plots import main

if __name__ == "__main__":
    main(["ncc"] + sys.argv[1:])
