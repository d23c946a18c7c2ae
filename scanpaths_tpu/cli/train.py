"""Training entry point: ``python -m scanpaths_tpu.cli.train --task osie
--img_dir ... --fix_dir ...`` (flags mirror the reference opts.py files;
one binary serves all three tasks via --task)."""

from __future__ import annotations

import numpy as np

from ..core.config import parse_opt


def main(argv=None):
    args = parse_opt(argv)
    np.random.seed(args.seed)
    if args.task == "joint":
        from ..train.joint import JointTrainer as Trainer
    else:
        from ..train.trainer import Trainer

    trainer = Trainer(args)
    best = trainer.fit()
    trainer.logger.info(f"Training complete; best metric {best}")
    return best


if __name__ == "__main__":
    main()
