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


def _cache_dir():
    import os
    from pathlib import Path
    return Path(os.environ.get("STARDIST_TPU_MODEL_CACHE",
                               Path.home() / ".cache" / "stardist_tpu" / "models"))


def _fetch_model_zip(cls, key, url, md5=None):
    """Download (urllib; http/https/file URLs) + md5-check + unzip into the
    model cache; returns the model directory. Mirrors csbdeep's
    get_model_folder caching contract (reference models load via
    BaseModel.from_pretrained)."""
    import hashlib
    import shutil
    import urllib.request
    import zipfile

    target = _cache_dir() / cls.__name__ / key
    if (target / "config.json").exists():
        return target
    target.mkdir(parents=True, exist_ok=True)
    zip_path = target / "model.zip"
    with urllib.request.urlopen(url) as r, open(zip_path, "wb") as f:
        shutil.copyfileobj(r, f)
    if md5 is not None:
        got = hashlib.md5(zip_path.read_bytes()).hexdigest()
        if got != md5:
            zip_path.unlink()
            raise ValueError(f"md5 mismatch for {url}: got {got}, expected {md5}")
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(target)
    zip_path.unlink()
    # some zips nest the model dir one level down
    if not (target / "config.json").exists():
        subdirs = [d for d in target.iterdir() if d.is_dir()
                   and (d / "config.json").exists()]
        if len(subdirs) == 1:
            for item in subdirs[0].iterdir():
                shutil.move(str(item), str(target / item.name))
            subdirs[0].rmdir()
    if not (target / "config.json").exists():
        raise ValueError(f"downloaded archive for '{key}' contains no config.json")
    return target


def _from_pretrained(cls, name_or_alias):
    from pathlib import Path
    key, details = get_model_details(cls, name_or_alias)
    source = details["source"]
    path = Path(source)
    if path.is_dir():
        return cls(None, name=path.name, basedir=str(path.parent))
    if "://" in str(source):
        target = _fetch_model_zip(cls, key, str(source), md5=details.get("hash"))
        return cls(None, name=target.name, basedir=str(target.parent))
    raise ValueError(
        f"pretrained model source '{source}' is neither a local directory "
        "nor a URL")


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
    """The reference's pretrained zoo — same URLs, md5s, and aliases
    (stardist/models/__init__.py:19-27). Keras HDF5 weights inside the zips
    are imported via the h5->flax mapper (base.py _import_keras_h5)."""
    base = "https://github.com/stardist/stardist-models/releases/download/v0.1"
    register_model(StarDist2D, "2D_versatile_fluo", f"{base}/python_2D_versatile_fluo.zip",
                   "8db40dacb5a1311b8d2c447ad934fb8a")
    register_model(StarDist2D, "2D_versatile_he", f"{base}/python_2D_versatile_he.zip",
                   "bf34cb3c0e5b3435971e18d66778a4ec")
    register_model(StarDist2D, "2D_paper_dsb2018", f"{base}/python_2D_paper_dsb2018.zip",
                   "6287bf283f85c058ec3e7094b41039b5")
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
