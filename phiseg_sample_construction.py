#!/usr/bin/env python
"""Reference-compatible entry point (ref phiseg_sample_construction.py):
per-level residual construction figures. Forwards to phiseg_tpu.cli.sample_construction."""

from phiseg_tpu.cli.sample_construction import main

if __name__ == "__main__":
    main()
