import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict


def test_path_get_set():
    cd = ConfigDict({"a": {"b": {"c": 3}}})
    assert cd["a/b/c"] == 3
    cd["a/b/d"] = 4
    assert cd["a"]["b"]["d"] == 4
    cd["x/y/z"] = "deep"
    assert cd["x/y/z"] == "deep"
    assert cd[None] is cd


def test_space_underscore_aliasing():
    cd = ConfigDict({"batch size": 24, "image_sizes": 224})
    assert cd["batch_size"] == 24
    assert cd["batch size"] == 24
    assert cd["image sizes"] == 224
    cd["learning rate/base"] = 0.1
    assert cd["learning_rate/base"] == 0.1


def test_slash_in_string_values():
    cd = ConfigDict({"weights": "../enc/ckpt_epoch_1.pt"})
    assert cd["weights"] == "../enc/ckpt_epoch_1.pt"
    cd["metric"] = "val_metrics/dice_index"
    assert cd["metric"] == "val_metrics/dice_index"
    d = cd.to_dict()
    assert d["metric"] == "val_metrics/dice_index"


def test_list_of_dicts_traversal():
    cd = ConfigDict({"layers": [
        {"conv": {"kernel": 3}},
        {"norm": {"eps": 1e-5}},
    ]})
    assert cd["layers/conv/kernel"] == 3
    assert cd["layers/norm/eps"] == 1e-5
    assert cd.has("layers/conv")
    assert not cd.has("layers/missing")
    # single-element list unwraps
    cd2 = ConfigDict({"w": [{"inner": {"v": 7}}]})
    assert cd2["w/inner/v"] == 7


def test_has_get_pop():
    cd = ConfigDict({"a": {"b": 1}})
    assert "a/b" in cd
    assert cd.get("a/c", 42) == 42
    assert cd.pop("a/b") == 1
    assert not cd.has("a/b")
    assert cd.pop("nope", "dflt") == "dflt"
    with pytest.raises(KeyError):
        cd.pop("nope")


def test_get_or_update_and_fill_with_defaults():
    cd = ConfigDict({"present": 5})
    assert cd.get_or_update("present", 0) == 5
    assert cd.get_or_update("absent", 7) == 7
    assert cd["absent"] == 7
    spec = {"alpha": {"default": 0.5}, "beta": 2}
    cd2 = ConfigDict({"alpha": 0.9})
    cd2.fill_with_defaults(spec)
    assert cd2["alpha"] == 0.9
    assert cd2["beta"] == 2
    # final=False expands strings
    cd3 = ConfigDict()
    cd3.get_or_update("model", "unet", final=False)
    assert isinstance(cd3["model"], ConfigDict)
    assert cd3["model"].key() == "unet"


def test_to_kwargs_argument_renaming():
    spec = {
        "number of channels": {"default": 64, "argument name": "channels"},
        "depth": {"default": 4},
    }
    cd = ConfigDict({"block": {"number of channels": 128}})
    kwargs = cd.to_kwargs(spec, "block")
    assert kwargs == {"channels": 128, "depth": 4}
    # defaults are injected back into the config
    assert cd["block/depth"] == 4


def test_trim_and_expand():
    cd = ConfigDict({"k1": {"v1": {}}, "k2": [5], "k3": {"a": {"b": {}}}})
    trimmed = cd.trim()
    assert trimmed["k1"] == "v1"
    assert trimmed["k2"] == 5
    assert trimmed["k3/a"] == "b"
    cd2 = ConfigDict({"model": "unet", "path": "a/b"})
    cd2.expand()
    assert isinstance(cd2["model"], ConfigDict)
    assert cd2["model"].key() == "unet"
    # strings with '/' are not expanded
    assert cd2["path"] == "a/b"


def test_trim_protects_name_fields():
    cd = ConfigDict({"meta": {"technical": {"name_fields": ({"a": {}},)}}})
    trimmed = cd.trim()
    value = trimmed["meta/technical/name_fields"]
    assert isinstance(value, tuple)


def test_elements_of_normalises_in_place():
    cd = ConfigDict({"metrics": "metrics.DiceIndex"})
    elements = list(cd.elements_of("metrics"))
    assert len(elements) == 1
    assert elements[0].key() == "metrics.DiceIndex"
    assert isinstance(cd["metrics"], list)
    assert list(cd.elements_of("missing")) == []


def test_key_value_item():
    cd = ConfigDict({"only": {"a": 1}})
    assert cd.key() == "only"
    assert cd.value()["a"] == 1
    k, v = cd.item()
    assert k == "only"
    with pytest.raises(ValueError):
        ConfigDict({"a": 1, "b": 2}).key()


def test_mask_update_copy():
    cd = ConfigDict({"a": {"b": 1, "c": 2}, "d": 3})
    masked = cd.mask("a/b")
    assert not masked.has("a/b")
    assert cd.has("a/b")  # original untouched
    cd.update({"a": {"b": 10}, "e": 4})
    assert cd["a/b"] == 10
    assert cd["a/c"] == 2
    assert cd["e"] == 4
    clone = cd.copy()
    clone["a/b"] = 99
    assert cd["a/b"] == 10


def test_typed_getters():
    cd = ConfigDict({"one": "x", "many": ["x", "y"], "named": {"unet": {}}})
    assert cd.get_tuple("one") == ("x",)
    assert cd.get_str_tuple("many") == ("x", "y")
    assert cd.get_str("named") == "unet"
    assert cd.get_tuple("missing", default=[1]) == (1,)


def test_depth_and_to_dict():
    cd = ConfigDict({"a": {"b": {"c": 1}}, "flat": 0})
    assert cd.depth() == 3  # longest key path is a/b/c
    d = cd.to_dict()
    assert d == {"a": {"b": {"c": 1}}, "flat": 0}
    cd2 = ConfigDict({"has space": {"inner key": [1, 2]}})
    d2 = cd2.to_dict()
    assert d2 == {"has_space": {"inner_key": (1, 2)}}


def test_from_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("data:\n  batch size: 8\nmodel: unet\n")
    cd = ConfigDict.from_yaml(p)
    assert cd["data/batch_size"] == 8
    assert cd["model"] == "unet"


def test_update_preserves_slash_values():
    """update()/re-ingest must be idempotent under the '/'-escaping: _ESC
    itself contains '/', so double-escaping permanently corrupted values."""
    a = ConfigDict({"x": 1})
    a.update(ConfigDict({"path": "data/img", "nested": {"p": "a/b/c"}}))
    assert a["path"] == "data/img"
    assert a["nested/p"] == "a/b/c"
    # repeated update with the same source stays stable
    a.update(ConfigDict({"path": "data/img"}))
    assert a["path"] == "data/img"


def test_has_on_list_scalar_path_returns_false():
    cd = ConfigDict({"lst": [{"a": 1}, {"b": 2}]})
    assert cd.has("lst/a")
    assert not cd.has("lst/a/x")  # previously AttributeError
    assert cd.get("lst/a/x", 42) == 42
