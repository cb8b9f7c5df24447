"""SettingsCarrier: the reference's MOUSE_settings.yaml surface —
defaulting chain, exists-validation, and YAML error contract."""

from __future__ import annotations

from pathlib import Path

import pytest

from mousedatapipeline_spark.config import (
    SettingsCarrier,
    load_config_from_yaml,
)


def test_defaulting_chain_matches_reference(tmp_path):
    c = SettingsCarrier(vsi_root=tmp_path, validate_paths=False)
    assert c.saxs_dir == tmp_path / "Measurements" / "SAXS002"
    assert c.data_dir == c.saxs_dir / "data"
    assert c.masks_dir == c.data_dir / "Masks"
    assert c.logbook_file == c.saxs_dir / "logbooks" / "logbook_MOUSE.xlsx"
    assert (c.stacker_config_file
            == c.data_dir / "StackerConfigurations" / "stacker_config.yaml")
    assert c.projects_dir == tmp_path / "Proposals" / "SAXS002"


def test_supplied_paths_override_defaults(tmp_path):
    lb = tmp_path / "lb.xlsx"
    lb.touch()
    c = SettingsCarrier(vsi_root=tmp_path, logbook_file=lb)
    assert c.logbook_file == lb
    assert c.saxs_dir == tmp_path / "Measurements" / "SAXS002"


def test_missing_supplied_path_raises(tmp_path):
    with pytest.raises(ValueError, match="does not exist"):
        SettingsCarrier(vsi_root=tmp_path,
                        logbook_file=tmp_path / "nope.xlsx")


def test_yaml_error_contract(tmp_path):
    with pytest.raises(FileNotFoundError, match="not found"):
        load_config_from_yaml(str(tmp_path / "missing.yaml"))
    bad = tmp_path / "bad.yaml"
    bad.write_text("a: [unclosed\n  b: }{")
    with pytest.raises(ValueError, match="Error parsing YAML"):
        load_config_from_yaml(str(bad))


def test_from_yaml_maps_known_keys_and_keeps_extras(tmp_path):
    f = tmp_path / "settings.yaml"
    f.write_text(
        f'vsi_root: "{tmp_path}"\n'
        f'sf_dir: "{tmp_path}"\n'
        'post_translation_dir: "/somewhere/src"\n'
        'logging_level: "DEBUG"\n')
    c = SettingsCarrier.from_yaml(str(f))
    assert c.vsi_root == Path(str(tmp_path))
    assert c.sf_dir == Path(str(tmp_path))
    assert c.logging_level == "DEBUG"
    assert c.extras["post_translation_dir"] == "/somewhere/src"
