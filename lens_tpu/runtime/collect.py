"""Event-frame data collection — the `--collect_data` mode.

The reference streams raw DVS events off the devkit, a polling thread
accumulates each `timebin` window into an 80x80 count frame, writes PNGs, and
builds the annotation CSV (reference collect_data.py:108-252).  Here the
source is a recorded event stream (`--event_file`), pushed through the native
accumulation engine with the same ROI/hot-pixel preprocessing the reference
programs into the chip (collect_data.py:227-237), then saved as
`frame_%05d.png` + CSV — producing datasets directly trainable with
`--train_model`.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from lens_tpu import checker
from lens_tpu.config import LensConfig
from lens_tpu.runtime import events_native
from lens_tpu.tools.csvtools import create_csv_from_images
from lens_tpu.utils.loggers import model_logger


def run_collector(cfg: LensConfig) -> str:
    checker.check_args(cfg)
    logger, _ = model_logger(cfg.output_base)

    if not cfg.event_file:
        raise ValueError(
            "--collect_data needs --event_file: a recorded DVS stream, or '-' "
            "for live stdin ingest (text AER lines)"
        )

    # Stale-frame safety: check_args (above) asserts the target folder does
    # not exist yet, so a reused data_name can never mix a previous
    # collection's frame_*.png into this run's CSV (create_csv_from_images
    # enumerates the whole folder — mixing would silently corrupt the
    # dataset).  Guarded by tests/test_e2e_cli.py.
    img_folder = os.path.join(cfg.data_dir, cfg.dataset, cfg.camera, cfg.data_name)
    os.makedirs(img_folder, exist_ok=True)

    if cfg.event_file == "-":
        # LIVE collection: text AER lines on stdin feed the native ring
        # session; each frame is written the moment its timebin completes —
        # the reference's devkit collector-thread role (collect_data.py:
        # 186-202) with stdin as the source.  try/finally: a live feed ends
        # by Ctrl-C, and the frames already on disk must still get their
        # CSV (without it the collected dataset is untrainable).
        import sys

        from lens_tpu.runtime.stream import live_aer_bin_source

        n_frames = 0
        try:
            for _, frame in live_aer_bin_source(cfg, sys.stdin, frames_only=True):
                _save_frame(img_folder, n_frames, frame)
                n_frames += 1
        finally:
            if n_frames:
                _finish_csv(cfg, img_folder, n_frames, logger)
        return img_folder
    else:
        # One loader with the streaming path (stream.load_raw_events), then
        # the same time-sort --event_driven applies: the accumulation
        # engines assume ascending time (the C++ frame pointer only
        # advances; the fallback drops everything before row 0), so an
        # unsorted recording would silently misbin or drop events here
        # while replaying fine through the streaming mode.
        from lens_tpu.runtime.stream import load_raw_events

        t, x, y = load_raw_events(cfg.event_file)
        order = np.argsort(t, kind="stable")
        t, x, y = t[order], x[order].astype(np.uint16), y[order].astype(np.uint16)

        frames = events_native.accumulate_frames(
            t,
            x,
            y,
            timebin_s=cfg.timebin / 1000.0,
            # Chip DVS constants as config (defaults: collect_data.py:230-235).
            roi_origin=cfg.roi_origin,
            roi_size=(cfg.roi_dim, cfg.roi_dim),
            hot_pixel_threshold=cfg.hot_cap(),
        )
        for i, frame in enumerate(frames):
            _save_frame(img_folder, i, frame)
        n_frames = len(frames)
    _finish_csv(cfg, img_folder, n_frames, logger)
    return img_folder


def _finish_csv(cfg: LensConfig, img_folder: str, n_frames: int, logger) -> None:
    csv_path = os.path.join(cfg.data_dir, f"{cfg.data_name}.csv")
    create_csv_from_images(img_folder, csv_path)
    logger.info(f"Collected {n_frames} frames to {img_folder}; CSV at {csv_path}")


def _save_frame(img_folder: str, idx: int, frame: np.ndarray) -> None:
    img = np.clip(frame, 0, 255).astype(np.uint8)
    # collect_data.py:198 naming
    Image.fromarray(img).save(os.path.join(img_folder, f"frame_{idx:05d}.png"))
