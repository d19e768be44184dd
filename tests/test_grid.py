import yaml

from medsegpretrainimagenet_tpu.config import expand_grid, parse


def test_scalar_and_dict():
    assert expand_grid(5) == [5]
    assert expand_grid({"a": 1}) == [{"a": 1}]


def test_list_is_product_axis():
    out = expand_grid({"a": [1, 2], "b": [3, 4]})
    assert len(out) == 4
    assert {"a": 1, "b": 3} in out
    assert {"a": 2, "b": 4} in out


def test_tuple_is_literal():
    out = expand_grid({"a": (1, 2)})
    assert out == [{"a": (1, 2)}]


def test_nested_lists_expand():
    cfg = {"model": {"width": [32, 64]}, "seed": [0, 1]}
    out = expand_grid(cfg)
    assert len(out) == 4


def test_list_of_dicts_alternatives():
    cfg = {"enc": [{"w": "a.pt"}, {"w": "b.pt"}]}
    out = expand_grid(cfg)
    assert out == [{"enc": {"w": "a.pt"}}, {"enc": {"w": "b.pt"}}]


def test_tuple_elements_still_expand():
    # a list nested inside a tuple element is a product axis for the tuple
    cfg = {"t": ({"x": [1, 2]},)}
    out = expand_grid(cfg)
    assert len(out) == 2
    assert out[0]["t"][0]["x"] in (1, 2)


def test_parse_yaml(tmp_path):
    p = tmp_path / "grid.yaml"
    yaml.safe_dump({"lr": [0.1, 0.01], "bs": 8}, p.open("w"))
    configs, original = parse(str(p))
    assert len(configs) == 2
    assert original["bs"] == 8


def test_reference_config_grid_sizes():
    """The shipped downstream unet config must expand to 38 experiments
    (19 encoder weight options x 2 freeze options)."""
    import os
    path = "/root/reference/config/downstream/covidqu/unet.yaml"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference configs not mounted")
    configs, _ = parse(path)
    assert len(configs) == 38
