"""Settings carrier: the reference's ``MOUSE_settings.yaml`` surface.

Mirrors ``/root/reference/src/defaults_carrier.py``: YAML loading with
the same error behavior (:29-39 — FileNotFoundError for a missing file,
ValueError for unparseable YAML) and the same path-defaulting chain
(:66-97 — ``saxs_dir = vsi_root/Measurements/SAXS002``, ``data_dir =
saxs_dir/data``, ``masks_dir = data_dir/Masks``, ``logbook_file =
saxs_dir/logbooks/logbook_MOUSE.xlsx``, ``stacker_config_file =
data_dir/StackerConfigurations/stacker_config.yaml``, ``projects_dir =
vsi_root/Proposals/SAXS002``), including exists-validation of supplied
paths (:9-18).

Engine extension: an ``sf_dir`` key points the CLI at a parquet fixture
tree; ``validate_paths=False`` lets tests build carriers without a real
measurement tree on disk.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


def load_config_from_yaml(file_path: str) -> dict:
    """YAML -> dict with the reference's exact error contract."""
    try:
        import yaml
        with open(file_path) as fh:
            return yaml.safe_load(fh) or {}
    except FileNotFoundError:
        raise FileNotFoundError(
            f"Configuration file '{file_path}' not found.")
    except ImportError:
        # yaml should be present; degrade to the simple `key: "value"`
        # subset the reference settings file actually uses
        out: dict = {}
        with open(file_path) as fh:
            for line in fh:
                line = line.split("#", 1)[0].strip()
                if ":" in line:
                    k, v = line.split(":", 1)
                    out[k.strip()] = v.strip().strip('"').strip("'")
        return out
    except Exception as e:  # yaml.YAMLError without a static import
        raise ValueError(f"Error parsing YAML file: {e}")


@dataclass
class SettingsCarrier:
    """Default paths + settings (reference ``DefaultsCarrier``)."""

    vsi_root: Path
    saxs_dir: Path | None = None
    data_dir: Path | None = None
    masks_dir: Path | None = None
    projects_dir: Path | None = None
    logbook_file: Path | None = None
    stacker_config_file: Path | None = None
    sf_dir: Path | None = None          # engine extension
    logging_level: str = "INFO"
    validate_paths: bool = True
    extras: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.vsi_root = Path(self.vsi_root)
        supplied = {
            n: getattr(self, n)
            for n in ("saxs_dir", "data_dir", "masks_dir", "projects_dir",
                      "logbook_file", "stacker_config_file", "sf_dir")
            if getattr(self, n) is not None
        }
        for n, v in supplied.items():
            setattr(self, n, Path(v))
        if self.validate_paths:
            for n, v in [("vsi_root", self.vsi_root), *supplied.items()]:
                if not Path(v).exists():
                    raise ValueError(f"{n} path '{v}' does not exist.")
        # The reference's defaulting chain, verbatim order.
        self.saxs_dir = self.saxs_dir or (
            self.vsi_root / "Measurements" / "SAXS002")
        self.data_dir = self.data_dir or self.saxs_dir / "data"
        self.masks_dir = self.masks_dir or self.data_dir / "Masks"
        self.logbook_file = self.logbook_file or (
            self.saxs_dir / "logbooks" / "logbook_MOUSE.xlsx")
        self.stacker_config_file = self.stacker_config_file or (
            self.data_dir / "StackerConfigurations" / "stacker_config.yaml")
        self.projects_dir = self.projects_dir or (
            self.vsi_root / "Proposals" / "SAXS002")

    @classmethod
    def from_yaml(cls, file_path: str,
                  validate_paths: bool = True) -> "SettingsCarrier":
        cfg = load_config_from_yaml(file_path)
        known = {f for f in cls.__dataclass_fields__ if f != "extras"}
        kwargs = {k: v for k, v in cfg.items() if k in known}
        extras = {k: v for k, v in cfg.items() if k not in known}
        # post_translation_dir / translator_template_dir are shell-out
        # locations in the reference; the engine has no subprocess step,
        # so they ride in extras untouched.
        return cls(validate_paths=validate_paths, extras=extras, **kwargs)
