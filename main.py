"""LENS-TPU command-line entry point.

CLI-compatible with the reference main.py:78-192 — same flags, same modes:

    python main.py --sim_mat --matching            # inference (float path)
    python main.py --simulated_speck --sim_mat --matching  # quantized chip sim
    python main.py --train_model                   # STDP training
    python main.py --event_driven                  # online streaming VPR
    python main.py --collect_data                  # event-frame collection
"""

from lens_tpu.config import config_from_args
from lens_tpu.utils.jaxsetup import setup_jax


def initialize_and_run_model(cfg):
    """Mode dispatch (reference main.py:40-76); orchestrators imported lazily
    so each mode only pays for what it uses."""
    if cfg.train_model:
        from lens_tpu.train_model import run_training

        return run_training(cfg)
    if cfg.collect_data:
        from lens_tpu.runtime.collect import run_collector

        return run_collector(cfg)
    if cfg.event_driven:
        from lens_tpu.runtime.stream import run_event_driven

        return run_event_driven(cfg)
    from lens_tpu.run_model import run_inference

    return run_inference(cfg)


def run_cli(argv=None):
    """Parse args and dispatch; returns the mode's result object (used by
    tests and programmatic callers)."""
    setup_jax()
    cfg = config_from_args(argv)
    if cfg.nocuda:
        # Reference semantics: --nocuda forces CPU (run_model.py:70-71);
        # here it pins the JAX CPU backend instead of torch.device('cpu').
        from lens_tpu.utils.jaxsetup import force_cpu

        force_cpu()
    return initialize_and_run_model(cfg)


def main(argv=None) -> int:
    """Console entry (`lens-tpu`): setuptools scripts sys.exit(main()), so
    this must return an int status, not the mode's result object (whose
    truthy repr would exit 1 and spill to stderr on every success)."""
    run_cli(argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
