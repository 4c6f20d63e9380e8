"""HOCON-subset parser edge cases + config override plumbing."""

import numpy as np

from neuraludf_tpu import config as config_mod
from neuraludf_tpu import hocon


def test_parse_basics():
    d = hocon.parse_string(
        """
        a {
          x = 1        # comment
          y = 2.5      // comment
          z = hello
          flag = False
          lst = [1, 2, 3]
          lst2 = [4],
          path = /tmp/some/dir/CASE_NAME/
        }
        b { k = v, n = 7, arr = [1, 2], t = True }
        """
    )
    assert d["a"]["x"] == 1 and d["a"]["y"] == 2.5
    assert d["a"]["z"] == "hello"
    assert d["a"]["flag"] is False
    assert d["a"]["lst"] == [1, 2, 3]
    assert d["a"]["lst2"] == [4]
    assert d["b"]["k"] == "v" and d["b"]["n"] == 7 and d["b"]["arr"] == [1, 2]
    assert d["b"]["t"] is True


def test_multiline_list():
    d = hocon.parse_string("a {\n  rec = [\n    ./,\n    ./models,\n  ]\n}")
    assert d["a"]["rec"] == ["./", "./models"]


def test_reference_confs_load():
    for name in ["udf_dtu_blending", "udf_garment_blending"]:
        cfg = config_mod.load(f"/root/reference/confs/{name}.conf", case="scanX")
        assert "scanX" in cfg.dataset.data_dir
        assert cfg.model.udf_network.d_out == 257


def test_cli_style_overrides():
    cfg = config_mod.load(
        "confs/udf_dtu_blending.conf", case="scan118",
        train__learning_rate=1e-4, train__sparse_weight=0.02,
        general__model_type="udf",
    )
    assert cfg.train.learning_rate == 1e-4
    assert cfg.train.sparse_weight == 0.02
    assert "scan118" in cfg.dataset.data_dir
