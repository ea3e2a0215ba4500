"""Config system: YAML groups + dot-path CLI overrides + interpolation.

Hydra/omegaconf are not available in the TPU image, so this is a small
self-contained equivalent preserving the reference's config *surface*
(config/config.yaml groups: common / datasets / checkpoint / optimization /
lr_scheduler / model / distributed / balancer / wandb) and the override
syntax used by the reference's launch scripts
(``python train.py distributed.world_size=8 model.norm=weight_norm``).

Unlike the reference, config strings are never ``eval()``-ed
(train_multi_gpu.py:107,205): ``segment`` accepts None/number,
``train_discriminator`` accepts bool or a probability (number or "2/3").
"""

import copy
import os
from fractions import Fraction
from typing import Any, Dict, List, Optional, Sequence

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'configs')


class Config:
    """Attribute-access view over nested dicts (omegaconf-lite)."""

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, '_data', data)

    def __getattr__(self, name):
        try:
            value = self._data[name]
        except KeyError:
            raise AttributeError(name) from None
        if isinstance(value, dict):
            return Config(value)
        return value

    def __setattr__(self, name, value):
        self._data[name] = value

    def __getitem__(self, name):
        return getattr(self, name)

    def __contains__(self, name):
        return name in self._data

    def get(self, name, default=None):
        value = self._data.get(name, default)
        if isinstance(value, dict):
            return Config(value)
        return value

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self._data)

    def keys(self):
        return self._data.keys()

    def __repr__(self):
        return yaml.safe_dump(self._data, sort_keys=False)


def _set_dotted(data: Dict[str, Any], dotted: str, value: Any):
    parts = dotted.split('.')
    node = data
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise ValueError(f"cannot override through non-dict at {p} in {dotted}")
    node[parts[-1]] = value


def _get_dotted(data: Dict[str, Any], dotted: str) -> Any:
    node = data
    for p in dotted.split('.'):
        node = node[p]
    return node


def _interpolate(data: Dict[str, Any]):
    """Resolve ``${a.b}`` references (OmegaConf-style), e.g. the checkpoint
    save_location template (config/config.yaml:23)."""
    def resolve(value):
        if isinstance(value, str) and '${' in value:
            out = ''
            rest = value
            while '${' in rest:
                pre, _, tail = rest.partition('${')
                ref, _, rest = tail.partition('}')
                out += pre + str(resolve(_get_dotted(data, ref)))
            out += rest
            return out
        return value

    def walk(node):
        for k, v in list(node.items()):
            if isinstance(v, dict):
                walk(v)
            else:
                node[k] = resolve(v)
    walk(data)


def _parse_override_value(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def load_config(name: str = 'config', overrides: Optional[Sequence[str]] = None,
                config_dir: Optional[str] = None) -> Config:
    """Load ``<config_dir>/<name>.yaml`` and apply ``key.path=value``
    overrides. ``name`` may also be a direct path to a yaml file."""
    config_dir = config_dir or CONFIG_DIR
    path = name if name.endswith(('.yaml', '.yml')) and os.path.exists(name) \
        else os.path.join(config_dir, f'{name}.yaml')
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    for ov in overrides or []:
        if '=' not in ov:
            raise ValueError(f"override must be key.path=value, got {ov!r}")
        key, _, val = ov.partition('=')
        _set_dotted(data, key.strip(), _parse_override_value(val.strip()))
    _interpolate(data)
    return Config(data)


def parse_segment(value: Any) -> Optional[float]:
    """'None'/None → None; number/numeric-string → float (no eval())."""
    if value is None or (isinstance(value, str) and value.strip().lower() in
                         ('none', 'null', '')):
        return None
    return float(value)


def parse_probability(value: Any) -> float:
    """train_discriminator: True→1.0, False→0.0, number, or "2/3"."""
    if isinstance(value, bool):
        return 1.0 if value else 0.0
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, str):
        return float(Fraction(value))
    raise ValueError(f"cannot parse probability from {value!r}")
