"""Training CLI.

Equivalent of `phiseg_train.py` (ref :16-50): resolve the experiment config,
create the log dir, snapshot the config into it, build the data pipeline and
model, train with periodic validation + multi-criterion checkpointing.

Usage:
  python -m phiseg_tpu.cli.train phiseg_7_5                  # named experiment
  python -m phiseg_tpu.cli.train path/to/config.json         # config snapshot
  python -m phiseg_tpu.cli.train phiseg_7_5 --data synthetic --num-iter 2000
  python -m phiseg_tpu.cli.train phiseg_7_5 --mesh 8         # data-parallel
"""

from __future__ import annotations

import argparse
import logging
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("experiment", help="experiment name or config.json path")
    p.add_argument("--data", default=None, choices=[None, "lidc", "synthetic"],
                   help="override the config's dataset")
    p.add_argument("--num-iter", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--mesh", type=int, default=None,
                   help="number of devices for data-parallel training")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--dtype", default=None, choices=[None, "float32", "bfloat16"])
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(coordinator from env, e.g. on a TPU pod slice)")
    p.add_argument("--no-image-summaries", action="store_true",
                   help="disable TB image grids / per-level output maps "
                        "(scalar monitoring is unaffected)")
    p.add_argument("--no-histogram-summaries", action="store_true",
                   help="disable TB weight/activation histograms")
    return p.parse_args(argv)


def resolve_config(name_or_path: str):
    from phiseg_tpu.engine.config import ExperimentConfig

    if os.path.exists(name_or_path):
        return ExperimentConfig.load(name_or_path)
    from phiseg_tpu.experiments import get_experiment

    return get_experiment(name_or_path)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = parse_args(argv)
    if args.distributed:
        import jax

        jax.distributed.initialize()
    cfg = resolve_config(args.experiment)
    if args.data:
        cfg = cfg.replace(data_identifier=args.data)
    if args.num_iter is not None:
        cfg = cfg.replace(num_iter=args.num_iter)
    if args.batch_size is not None:
        cfg = cfg.replace(batch_size=args.batch_size)
    if args.dtype is not None:
        cfg = cfg.replace(compute_dtype=args.dtype)
    if args.no_image_summaries:
        cfg = cfg.replace(do_image_summaries=False)
    if args.no_histogram_summaries:
        cfg = cfg.replace(do_histogram_summaries=False)

    from phiseg_tpu.data import get_dataset
    from phiseg_tpu.engine.trainer import Trainer

    mesh = None
    if args.mesh:
        from phiseg_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)

    data = get_dataset(cfg)
    trainer = Trainer(cfg, log_dir=args.log_dir, mesh=mesh,
                      resume=not args.no_resume)
    trainer.train(data)


if __name__ == "__main__":
    main()
