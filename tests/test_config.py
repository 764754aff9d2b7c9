from apde_mvs_tpu import config


def test_round_num():
    # reference: while (max_size > 800) { max_size /= 2; round_num++ }
    assert config.compute_round_num(800) == 1
    assert config.compute_round_num(801) == 2
    assert config.compute_round_num(1600) == 2
    assert config.compute_round_num(1601) == 2  # integer halving: 1601//2=800
    assert config.compute_round_num(3100) == 3
    assert config.compute_round_num(6200) == 4


def test_schedule_structure():
    sched = config.build_schedule(3100, dataset="ETH3D")
    # 3 rounds x (1 photometric + 3 geometric)
    assert len(sched) == 12
    assert [s.iteration for s in sched] == list(range(12))
    # round 0: FIRST_INIT with APD off, geom off
    assert sched[0].params.state == "first_init"
    assert not sched[0].params.use_apd
    assert not sched[0].params.geom_consistency
    assert sched[0].scale_size == 4
    # round 0 geometric passes keep APD off
    for s in sched[1:4]:
        assert s.params.state == "refine_iter"
        assert not s.params.use_apd
        assert s.params.geom_consistency
    # weak_peak_radius schedule 6 then 4, 2, 2
    assert sched[0].params.weak_peak_radius == 6
    assert [s.params.weak_peak_radius for s in sched[1:4]] == [4, 2, 2]
    # round 1 photometric: REFINE_INIT, APD on, scaled threshold
    s = sched[4]
    assert s.params.state == "refine_init"
    assert s.params.use_apd
    assert abs(s.params.ransac_threshold - (0.01 - 0.00125)) < 1e-9
    assert s.params.rotate_time == 2
    assert s.scale_size == 2
    # round 2: rotate_time saturates at 4, full resolution
    assert sched[8].params.rotate_time == 4
    assert sched[8].scale_size == 1
    # last geometric pass flagged
    assert sched[-1].is_last_iteration
    assert sum(s.is_last_iteration for s in sched) == 1


def test_geom_factor_presets():
    assert config.build_schedule(800, dataset="TaT_i")[0].params.geom_factor == 0.05
    assert config.build_schedule(800, dataset="DTU")[0].params.geom_factor == 0.2


def test_infer_dataset():
    assert config.infer_dataset("/data/DTU/test", "scan1") == "DTU"
    assert config.infer_dataset("/data/TaT/x", "Palace") == "TaT_a"
    assert config.infer_dataset("/data/TaT/x", "Family") == "TaT_i"
    assert config.infer_dataset("/data/ETH3D/hr", "office") == "ETH3D"
    assert config.infer_dataset("/data/other", "s") == "General"


def test_window_offsets():
    p = config.PatchMatchParams()
    strong = p.strong_window_offsets
    assert len(strong) == 36  # radius 5 step 2 -> 6x6 taps
    assert (0, 0) not in strong
    weak = p.weak_window_offsets
    assert len(weak) == 9  # radius 5 step 5 -> 3x3 taps
