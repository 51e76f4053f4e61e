"""distill — train the per-character student models from a config file.

CLI-compatible with the reference (reference: src/tha4/app/distill.py:8-25):

  tha4-distill --config_file <prefix>/config.yaml

Interruptible at any time; rerunning the same command resumes from the newest
checkpoint/snapshot (the documented contract, reference docs/distill.md).
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--f32", dest="bf16", action="store_false")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")

    import jax.numpy as jnp

    from tha4_tpu.distiller.config import DistillerConfig
    from tha4_tpu.distiller.pipeline import run_config

    config = DistillerConfig.load(args.config_file)
    run_config(config, compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    return 0


if __name__ == "__main__":
    sys.exit(main())
