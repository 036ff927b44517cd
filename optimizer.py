"""Hyperparameter sweep entry point.

The reference optimizer.py runs a serial W&B random search with its own
drifted argparse copy (reference optimizer.py:106-202 — missing flags break
`LENS.__init__` as shipped; SURVEY.md C15).  Here the sweep shares the single
LensConfig schema, the trials train/evaluate as ONE vmapped device program
(lens_tpu/parallel/sweep.py), and W&B is optional.

    python optimizer.py --n_trials 16
"""


from lens_tpu.config import LensConfig, build_arg_parser
from lens_tpu.utils.jaxsetup import setup_jax


def run_cli(argv=None):
    """Parse args and run the sweep; returns the SweepResult (used by tests
    and programmatic callers)."""
    setup_jax()
    parser = build_arg_parser()
    parser.add_argument("--n_trials", type=int, default=8, help="Sweep trials")
    parser.add_argument("--sweep_seed", type=int, default=0, help="Search-space seed")
    parser.add_argument("--wandb", action="store_true", help="Log trials to W&B")
    args = parser.parse_args(argv)
    extra = {"n_trials", "sweep_seed", "wandb"}
    cfg = LensConfig.from_dict(
        {k: v for k, v in vars(args).items() if k not in extra}
    )

    from lens_tpu import checker
    from lens_tpu.parallel.sweep import run_sweep
    from lens_tpu.utils.loggers import model_logger

    checker.check_args(cfg)
    logger, output_folder = model_logger(cfg.output_base)
    return run_sweep(
        cfg,
        n_trials=args.n_trials,
        seed=args.sweep_seed,
        logger=logger,
        output_folder=output_folder,
        use_wandb=args.wandb,
    )


def main(argv=None) -> int:
    """Console entry (`lens-tpu-sweep`): setuptools scripts sys.exit(main()),
    so this must return an int status — returning the SweepResult itself
    would dump its repr to stderr and exit 1 on every successful sweep."""
    run_cli(argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
