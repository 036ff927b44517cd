"""LENS-TPU: TPU-native event-camera visual place recognition.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AdamDHines/LENS
(see SURVEY.md): spiking visual place recognition from DVS event streams,
with STDP training, a bit-accurate quantized chip simulator, streaming
event-driven inference, vmapped hyperparameter sweeps, and VPR evaluation.
"""

__version__ = "0.1.0"
