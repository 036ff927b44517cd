"""LENS-TPU: TPU-native event-camera visual place recognition.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AdamDHines/LENS
(see SURVEY.md): spiking visual place recognition from DVS event streams,
with STDP training, a bit-accurate quantized chip simulator, streaming
event-driven inference, vmapped hyperparameter sweeps, and VPR evaluation.

Public API entry points:
    lens_tpu.config.LensConfig          — the single typed configuration
    lens_tpu.models.LensModel           — inference-ready model facade
    lens_tpu.run_model.run_inference    — the --sim_mat/--matching mode
    lens_tpu.train_model.run_training   — the --train_model mode
    lens_tpu.parallel.sweep.run_sweep   — vmapped hyperparameter search
"""

__version__ = "0.2.0"


def __getattr__(name):  # lazy top-level exports: `from lens_tpu import LensModel`
    if name == "LensConfig":
        from lens_tpu.config import LensConfig

        return LensConfig
    if name == "LensModel":
        from lens_tpu.models.lens import LensModel

        return LensModel
    if name == "run_inference":
        from lens_tpu.run_model import run_inference

        return run_inference
    if name == "run_training":
        from lens_tpu.train_model import run_training

        return run_training
    if name == "run_sweep":
        from lens_tpu.parallel.sweep import run_sweep

        return run_sweep
    raise AttributeError(f"module 'lens_tpu' has no attribute {name!r}")
