#!/usr/bin/env python
"""Reference-compatible entry point (ref phiseg_generate_samples.py):
qualitative sample grids + error maps. Forwards to phiseg_tpu.cli.generate_samples."""

from phiseg_tpu.cli.generate_samples import main

if __name__ == "__main__":
    main()
