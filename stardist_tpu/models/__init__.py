"""Model registry and public model API (reference stardist/models/__init__.py)."""
from __future__ import annotations

import warnings

from .base import StarDistBase, StarDistDataBase, StarDistPadAndCropResizer
from .model2d import Config2D, StarDist2D, StarDistData2D
from .model3d import Config3D, StarDist3D, StarDistData3D

# pretrained model registry -------------------------------------------------
# The reference registers downloadable pretrained models with URL+md5
# (models/__init__.py:19-27). In this offline environment models must be
# registered with a local path (directory containing config.json/weights);
# the registry mechanics and aliases mirror the reference.

_MODELS = {}
_ALIASES = {}


def register_model(cls, key, path_or_url, hash=None):
    _MODELS.setdefault(cls.__name__, {})[key] = dict(source=path_or_url, hash=hash)


def register_aliases(cls, key, *names):
    for name in names:
        _ALIASES.setdefault(cls.__name__, {})[name] = key


def clear_models_and_aliases(*cls_list):
    if len(cls_list) == 0:
        _MODELS.clear()
        _ALIASES.clear()
    else:
        for cls in cls_list:
            _MODELS.pop(cls.__name__, None)
            _ALIASES.pop(cls.__name__, None)


def get_registered_models(cls, verbose=False):
    models = _MODELS.get(cls.__name__, {})
    aliases = _ALIASES.get(cls.__name__, {})
    if verbose:
        print(f"Registered models for '{cls.__name__}':")
        for k in models:
            names = [a for a, v in aliases.items() if v == k]
            print(f"  {k}" + (f" (aliases: {', '.join(names)})" if names else ""))
    return models, aliases


def get_model_details(cls, key_or_alias, verbose=False):
    models, aliases = get_registered_models(cls)
    key = aliases.get(key_or_alias, key_or_alias)
    if key not in models:
        raise ValueError(f"'{key_or_alias}' is not a registered model for '{cls.__name__}'")
    return key, models[key]


def _from_pretrained(cls, name_or_alias):
    from pathlib import Path
    key, details = get_model_details(cls, name_or_alias)
    source = Path(details["source"])
    if not source.is_dir():
        raise NotImplementedError(
            f"pretrained model source '{source}' is not a local directory; "
            "downloading from URLs is not available in this offline build")
    return cls(None, name=source.name, basedir=str(source.parent))


def _patch_from_pretrained():
    def from_pretrained(cls, name_or_alias=None):
        if name_or_alias is None:
            get_registered_models(cls, verbose=True)
            return None
        return _from_pretrained(cls, name_or_alias)

    StarDist2D.from_pretrained = classmethod(from_pretrained)
    StarDist3D.from_pretrained = classmethod(from_pretrained)


_patch_from_pretrained()
del _patch_from_pretrained


def _register_reference_zoo():
    """Names of the reference's pretrained zoo (stardist/models/__init__.py:
    19-27). Downloading is unavailable in this offline build; from_pretrained
    raises an informative error for URL sources, but the names/aliases are
    registered for API parity."""
    base = "https://github.com/stardist/stardist-models/releases/download"
    register_model(StarDist2D, "2D_versatile_fluo", f"{base}/v0.1/2D_versatile_fluo.zip")
    register_model(StarDist2D, "2D_versatile_he", f"{base}/v0.1/2D_versatile_he.zip")
    register_model(StarDist2D, "2D_paper_dsb2018", f"{base}/v0.1/2D_paper_dsb2018.zip")
    register_aliases(StarDist2D, "2D_versatile_fluo", "Versatile (fluorescent nuclei)")
    register_aliases(StarDist2D, "2D_versatile_he", "Versatile (H&E nuclei)")
    register_aliases(StarDist2D, "2D_paper_dsb2018", "DSB 2018 (from StarDist 2D paper)")


_register_reference_zoo()
del _register_reference_zoo


def _register_demo_models():
    """Register the demo models committed under <repo>/models/examples
    (analog of the reference's downloadable registry,
    stardist/models/__init__.py:19-27)."""
    from pathlib import Path
    for base in (
        Path(__file__).resolve().parents[2] / "models" / "examples",
    ):
        d2 = base / "2D_demo"
        d3 = base / "3D_demo"
        if d2.is_dir():
            register_model(StarDist2D, "2D_demo", str(d2))
            register_aliases(StarDist2D, "2D_demo", "Demo 2D")
        if d3.is_dir():
            register_model(StarDist3D, "3D_demo", str(d3))
            register_aliases(StarDist3D, "3D_demo", "Demo 3D")


_register_demo_models()
del _register_demo_models
