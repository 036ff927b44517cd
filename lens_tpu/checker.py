"""Fail-fast precondition checks (reference lens/tools/checker.py:5-26).

Same assertions, minus the torch Conv2d probe: the ROI/dims compatibility is
a pure arithmetic property (the stride-k center-pixel selection yields `dims`
outputs iff roi_dim // dims stride tiles exactly), so we check it directly.
"""

from __future__ import annotations

import os

from lens_tpu.config import LensConfig


def check_args(cfg: LensConfig) -> None:
    assert cfg.precision in ("f32", "bf16"), (
        f"--precision must be 'f32' or 'bf16', got {cfg.precision!r}"
    )
    assert not (cfg.precision == "bf16" and cfg.simulated_speck), (
        "--precision bf16 is a float-path option; the quantized chip "
        "simulator (--simulated_speck) is integer-exact and stays f32"
    )
    # ROI / dims compatibility (checker.py:22-26 probes an actual Conv2d; the
    # conv with kernel=stride=k emits floor((roi - k)/k) + 1 windows).
    # Checked in EVERY mode — including --collect_data, where a bad geometry
    # would otherwise surface only after the whole collection run, at train
    # time (the reference's checker also ran its probe unconditionally).
    k = cfg.roi_dim // cfg.dims
    assert k >= 1 and (cfg.roi_dim - k) // k + 1 == cfg.dims, (
        "ROI dimension and final image size are incompatible"
    )

    # The sequence matcher's diagonal window must fit the similarity matrix
    # (an oversized L yields silent zeros or a cryptic shape error downstream).
    assert 0 <= cfg.sequence_length <= min(
        cfg.query_places, cfg.reference_places
    ), (
        f"--sequence_length {cfg.sequence_length} exceeds the "
        f"{cfg.query_places}x{cfg.reference_places} similarity matrix"
    )

    if cfg.train_model:
        # The spike-forced output rule divides by the feature layer's fire
        # rates (blitnet.py:185-215); an all-zero rate range would NaN the
        # whole run silently.
        assert cfg.fire_h_feat > 0, (
            "--fire_h_feat must be > 0: the output layer's forced STDP rule "
            "divides by the feature fire rates"
        )

    basepath = os.path.join(cfg.data_dir, cfg.dataset, cfg.camera)
    assert os.path.exists(basepath), f"Data directory does not exist: {basepath}"

    if cfg.event_file and cfg.event_file != "-":  # "-" = live stdin feed
        assert os.path.exists(cfg.event_file), (
            f"Event file does not exist: {cfg.event_file}"
        )

    if cfg.collect_data:
        # Collection CREATES datasets, so (deliberate fix of a reference
        # quirk — checker.py:9 demands an existing reference dir even here)
        # only the no-clobber check applies.
        target = os.path.join(basepath, cfg.data_name)
        assert not os.path.exists(target), f"Data directory already exists: {target}"
        return

    ref_dir = os.path.join(basepath, cfg.reference)
    assert os.path.exists(ref_dir), f"Reference directory does not exist: {ref_dir}"

    inference_mode = not (cfg.train_model or cfg.event_driven)
    if inference_mode:
        qry_dir = os.path.join(basepath, cfg.query)
        assert os.path.exists(qry_dir), f"Query directory does not exist: {qry_dir}"

    n_ref = len(os.listdir(ref_dir))
    assert cfg.reference_places * cfg.filter <= n_ref, (
        f"Not enough reference images for {cfg.reference_places} places"
        f" and a filter of {cfg.filter}"
    )
    if inference_mode:
        n_qry = len(os.listdir(os.path.join(basepath, cfg.query)))
        assert cfg.query_places * cfg.filter <= n_qry, (
            f"Not enough query images for {cfg.query_places} places"
            f" and a filter of {cfg.filter}"
        )

