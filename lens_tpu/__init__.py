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

__version__ = "0.1.0"
