"""Config tests — parity with reference tests/test_config.cu."""

from cu2rec_tpu.utils.config import Config


def test_defaults_match_reference():
    # reference config.h:20-58
    cfg = Config()
    assert cfg.total_iterations == 5000
    assert cfg.n_factors == 50
    assert cfg.learning_rate == 0.01
    assert cfg.seed == 42
    assert cfg.P_reg == cfg.Q_reg == cfg.user_bias_reg == cfg.item_bias_reg == 0.02
    assert cfg.is_train is True
    assert cfg.n_threads == 32
    assert cfg.check_error == 500
    assert cfg.patience == 2
    assert cfg.learning_rate_decay == 0.2


def test_read_legacy_config(data_dir):
    # fixture: "0 100 10 0.0001 42 0.2 0.1 0.1 0.1" (test_config.cfg;
    # asserts mirror test_config.cu:14-16)
    cfg = Config()
    cfg.read_config(str(data_dir / "test_config.cfg"))
    assert cfg.cur_iterations == 0
    assert cfg.total_iterations == 100
    assert cfg.n_factors == 10
    assert abs(cfg.learning_rate - 1e-4) < 1e-9
    assert cfg.seed == 42
    assert abs(cfg.P_reg - 0.2) < 1e-4
    assert abs(cfg.Q_reg - 0.1) < 1e-9
    assert abs(cfg.user_bias_reg - 0.1) < 1e-9
    assert abs(cfg.item_bias_reg - 0.1) < 1e-9


def test_write_read_roundtrip(tmp_path):
    # test_config.cu:19-26 equivalent
    cfg = Config(total_iterations=123, n_factors=7, learning_rate=0.005,
                 seed=99, P_reg=0.3, Q_reg=0.4, user_bias_reg=0.5,
                 item_bias_reg=0.6)
    path = tmp_path / "cfg.txt"
    cfg.write_config(str(path))
    cfg2 = Config()
    cfg2.read_config(str(path))
    for f in Config.LEGACY_FIELDS:
        assert getattr(cfg2, f) == getattr(cfg, f), f


def test_extended_roundtrip(tmp_path):
    cfg = Config(check_error=100, patience=3, learning_rate_decay=0.5,
                 n_threads=64)
    path = tmp_path / "cfg_ext.txt"
    cfg.write_config(str(path), legacy=False)
    cfg2 = Config()
    cfg2.read_config(str(path))
    assert cfg2.check_error == 100
    assert cfg2.patience == 3
    assert cfg2.learning_rate_decay == 0.5
    assert cfg2.n_threads == 64


def test_json_roundtrip(tmp_path):
    cfg = Config(collision_policy="mean", dtype="bfloat16", check_error=7)
    path = tmp_path / "cfg.json"
    cfg.write_json(str(path))
    cfg2 = Config()
    cfg2.read_config(str(path))
    assert cfg2.collision_policy == "mean"
    assert cfg2.dtype == "bfloat16"
    assert cfg2.check_error == 7
