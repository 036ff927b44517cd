"""Run-directory + logger setup (reference lens/src/loggers.py:7-66).

Creates a timestamped output directory `<output_base>/%d%m%y-%H-%M-%S`,
wires a file+console logger, prints the banner, and reports the JAX device
instead of the reference's CUDA/Speck report.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime

_BANNER = r"""
██╗░░░░░███████╗███╗░░██╗░██████╗
██║░░░░░██╔════╝████╗░██║██╔════╝
██║░░░░░█████╗░░██╔██╗██║╚█████╗░
██║░░░░░██╔══╝░░██║╚████║░╚═══██╗
███████╗███████╗██║░╚███║██████╔╝
╚══════╝╚══════╝╚═╝░░╚══╝╚═════╝░
"""


def model_logger(output_base: str = "./lens/output", name: str = "LENS"):
    """Create the per-run output folder and logger.

    Returns (logger, output_folder) — the reference mutates the model object
    (loggers.py:12-13, 21); we return values instead.
    """
    now = datetime.now()
    output_folder = os.path.join(output_base, now.strftime("%d%m%y-%H-%M-%S"))
    os.makedirs(output_base, exist_ok=True)
    # Disambiguate if two runs start within the same second.
    base = output_folder
    n = 1
    while os.path.exists(output_folder):
        output_folder = f"{base}-{n}"
        n += 1
    os.mkdir(output_folder)

    logger = logging.getLogger(name)
    if logger.hasHandlers():
        for h in logger.handlers:
            h.close()  # a cleared-but-open FileHandler leaks one fd per run
        logger.handlers.clear()
    logger.setLevel(logging.DEBUG)
    fmt = logging.Formatter("%(asctime)-15s %(levelname)-8s %(message)s")
    fh = logging.FileHandler(os.path.join(output_folder, "lens.log"), mode="a+")
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(logging.StreamHandler())
    logger.propagate = False

    for ln in _BANNER.strip("\n").split("\n"):
        logger.info(ln)
    logger.info("")
    logger.info("LENS-TPU: Locational Encoding with Neuromorphic Systems")
    logger.info("TPU-native rebuild (JAX/XLA/Pallas) of AdamDHines/LENS")
    logger.info("")
    try:
        import jax

        dev = jax.devices()[0]
        logger.info(f"Current device is {dev.platform}:{dev.device_kind}")
    except Exception:  # pragma: no cover - jax should always import
        logger.info("Current device is CPU")
    logger.info("")
    return logger, output_folder
