#!/usr/bin/env python
"""Reference-compatible entry point (ref phiseg_test_predictions.py):
per-label Dice over the test set. Forwards to phiseg_tpu.cli.test_predictions."""

from phiseg_tpu.cli.test_predictions import main

if __name__ == "__main__":
    main()
