#!/usr/bin/env python
"""Reference-compatible entry point (ref phiseg_test_quantitative.py):
GED^2 + S_NCC over the test set. Forwards to phiseg_tpu.cli.test_quantitative."""

from phiseg_tpu.cli.test_quantitative import main

if __name__ == "__main__":
    main()
