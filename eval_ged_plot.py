#!/usr/bin/env python
"""Reference-compatible entry point (ref eval_ged_plot.py): aggregate GED
npz arrays across experiments (mean±std, paired t-tests, boxplot).

Usage: python eval_ged_plot.py --files a/ged50_best_ged.npz b/... [--names A B]
"""

import sys

from phiseg_tpu.cli.eval_plots import main

if __name__ == "__main__":
    main(["ged"] + sys.argv[1:])
