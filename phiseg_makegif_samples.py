#!/usr/bin/env python
"""Reference-compatible entry point (ref phiseg_makegif_samples.py):
animated sample GIFs. Forwards to phiseg_tpu.cli.makegif_samples."""

from phiseg_tpu.cli.makegif_samples import main

if __name__ == "__main__":
    main()
