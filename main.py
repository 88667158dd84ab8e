"""CLI entry point.

Counterpart of the reference's ``main.py`` (Hydra ``@hydra.main``, 45 LoC):

    python main.py -cn so2sat_city_cfg model=dichavit ++model.gamma_s=0.5

Group swaps (``model=dichavit``), key overrides (``train.batch_size=64``) and
force-adds (``++model.gamma_s=0.5``) behave like Hydra, so the recipes in the
reference's ``train_scripts.sh`` map 1:1. The reference's ``ddp_setup``
(NCCL process group, ``main.py:17-20``) becomes ``jax.distributed.initialize``
— invoked only under multi-host launch (JAX coordination env vars present).
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-cn", "--config-name", default="so2sat_city_cfg")
    parser.add_argument("-m", "--multirun", action="store_true", help="accepted for CLI parity")
    parser.add_argument("overrides", nargs="*", help="Hydra-style key=value overrides")
    return parser.parse_args(argv)


def maybe_init_distributed():
    """Multi-host init (TPU pods set the coordination env automatically)."""
    import jax

    # honor JAX_PLATFORMS even when a sitecustomize preloaded jax before the
    # env var could take effect (e.g. JAX_PLATFORMS=cpu python main.py ...)
    from diverse_channel_vit_tpu.compile_cache import enable as _enable_cache
    from diverse_channel_vit_tpu.compile_cache import (
        filter_benign_aot_warnings,
        honor_env_platform,
    )

    _enable_cache()
    honor_env_platform()
    filter_benign_aot_warnings()
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize()


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    maybe_init_distributed()
    cfg = load_config(args.config_name, args.overrides)
    trainer = Trainer(cfg)
    trainer.logger.log_config(cfg)
    best = trainer.train()
    return best


if __name__ == "__main__":
    main()
