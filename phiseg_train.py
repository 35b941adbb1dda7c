#!/usr/bin/env python
"""Reference-compatible entry point (ref phiseg_train.py).

`python phiseg_train.py phiseg_7_5` works like the original
`python phiseg_train.py phiseg/experiments/phiseg_7_5.py`; accepts either a
registered experiment name or a config.json path. Forwards to
phiseg_tpu.cli.train.
"""

from phiseg_tpu.cli.train import main

if __name__ == "__main__":
    main()
