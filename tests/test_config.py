from lens_tpu.config import LensConfig, build_arg_parser, config_from_args


def test_defaults_match_reference():
    cfg = LensConfig()
    # reference main.py:85-186 defaults
    assert cfg.dataset == "example" and cfg.camera == "davis128"
    assert cfg.reference_places == 100 and cfg.query_places == 100
    assert cfg.sequence_length == 2 and cfg.timebin == 250
    assert cfg.thr_h_feat == 0.75 and cfg.fire_l_feat == 0.4
    assert cfg.f_exc == 0.35 and cfg.f_inh == 0.75
    assert cfg.dims == 10 and cfg.roi_dim == 80
    # derived (run_model.py:78-80, 101)
    assert cfg.input == 100 and cfg.feature == 200 and cfg.output == 100
    assert cfg.kernel_size == 8


def test_all_reference_flags_exist():
    parser = build_arg_parser()
    flags = {a.dest for a in parser._actions}
    required = {
        "dataset", "camera", "data_name", "reference", "query", "data_dir",
        "reference_places", "query_places", "sequence_length",
        "feature_multiplier", "filter", "epoch_feat", "epoch_out",
        "thr_l_feat", "thr_h_feat", "fire_l_feat", "fire_h_feat",
        "ip_rate_feat", "stdp_rate_feat", "thr_l_out", "thr_h_out",
        "fire_l_out", "fire_h_out", "ip_rate_out", "stdp_rate_out",
        "f_exc", "f_inh", "o_exc", "o_inh", "dims", "roi_dim",
        "train_model", "GT_tolerance", "sim_mat", "PR_curve", "matching",
        "sad", "timebin", "nocuda", "event_driven", "simulated_speck",
        "collect_data", "headless", "save_input",
    }
    missing = required - flags
    assert not missing, f"missing reference flags: {missing}"


def test_cli_parsing():
    cfg = config_from_args(
        ["--sim_mat", "--matching", "--timebin", "500", "--dims", "7",
         "--roi_dim", "49", "--reference_places", "641"]
    )
    assert cfg.sim_mat and cfg.matching
    assert cfg.timebin == 500
    assert cfg.input == 49 and cfg.kernel_size == 7
    assert cfg.model_name() == "example-reference_LENS_IN49_FN98_DB641.pth"


def test_model_name_scheme():
    # main.py:27-38: {reference}_LENS_IN{n}_FN{n}_DB{n}.pth
    assert LensConfig().model_name() == "example-reference_LENS_IN100_FN200_DB100.pth"


def test_json_roundtrip():
    cfg = LensConfig(dims=7, roi_dim=49)
    import json

    cfg2 = LensConfig.from_dict(json.loads(cfg.to_json()))
    assert cfg2.dims == 7 and cfg2.input == 49
