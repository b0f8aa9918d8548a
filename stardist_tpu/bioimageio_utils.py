"""bioimage.io model export/import (reference stardist/bioimageio_utils.py).

The reference builds a full bioimage.io resource (SavedModel bundle + RDF
metadata + deepimagej macro) via the ``bioimageio.core`` library. This
offline TPU build writes the same *contract* without that dependency:
a zip containing ``rdf.yaml`` (format 0.4-style metadata with the stardist
``config:`` section holding the model config + thresholds), the flax
weights, and sample input/output arrays. ``import_bioimageio`` reconstructs
a usable model folder from such a zip (also reads the stardist ``config:``
section of RDFs produced by the reference exporter).
"""
from __future__ import annotations

import json
import shutil
import tempfile
import zipfile
from pathlib import Path

import numpy as np

DEEPIMAGEJ_MACRO = """\
// StarDist postprocessing macro placeholder (prob={prob}, nms={nms})
"""


def _axes_string(model):
    return "b" + model.config.axes.replace("C", "").lower() + "c"


def export_bioimageio(model, outpath, test_input=None, name=None, mode="tpu_flax",
                      min_percentile=1.0, max_percentile=99.8, overwrite_spec_kwargs=None):
    """Export a trained model as a bioimage.io-style zip package."""
    import yaml

    outpath = Path(outpath)
    if outpath.suffix == "":
        outdir = outpath
        zip_path = outdir / f"{outdir.name}.zip"
    elif outpath.suffix == ".zip":
        outdir = outpath.parent
        zip_path = outpath
    else:
        raise ValueError("outpath has to be a folder or zip file")
    outdir.mkdir(exist_ok=True, parents=True)

    name = model.name if name is None else name
    ndim = model.config.n_dim

    if test_input is None:
        div_by = model._axes_div_by(model.config.axes.replace("C", ""))
        shape = tuple(4 * d for d in div_by)
        rng = np.random.RandomState(0)
        test_input = rng.uniform(0, 1, shape + (model.config.n_channel_in,)).astype(np.float32)
        if model.config.n_channel_in == 1:
            test_input = test_input[..., 0]

    # run the model to produce sample outputs
    prob, dist = model.predict(test_input)[:2]

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        np.save(tmp / "test_input.npy", np.asarray(test_input))
        np.save(tmp / "test_prob.npy", prob)
        np.save(tmp / "test_dist.npy", dist)

        weights_name = "stardist_weights.h5"
        from flax import serialization
        (tmp / weights_name).write_bytes(
            serialization.to_bytes({"params": model.params, **model._extra_vars}))

        config = dict(
            stardist=dict(
                python_version="0.1.0",
                weights_format="flax_msgpack",
                config=model.config.to_dict(),
                thresholds=dict(model.thresholds._asdict()),
            )
        )

        rdf = dict(
            format_version="0.4.9",
            type="model",
            name=name,
            description=f"TPU-native StarDist {ndim}D model ({name})",
            authors=[dict(name="stardist_tpu")],
            license="BSD-3-Clause",
            documentation="README.md",
            cite=[dict(text="Cell Detection with Star-convex Polygons",
                       doi="10.1007/978-3-030-00934-2_30")],
            tags=[f"stardist{ndim}d", "segmentation", "tpu", "jax"],
            inputs=[dict(name="input", axes=_axes_string(model),
                         data_type="float32")],
            outputs=[dict(name="prob"), dict(name="dist")],
            weights={mode: dict(source=weights_name)},
            test_inputs=["test_input.npy"],
            test_outputs=["test_prob.npy", "test_dist.npy"],
            config=config,
        )
        if overwrite_spec_kwargs:
            rdf.update(overwrite_spec_kwargs)
        with open(tmp / "rdf.yaml", "w") as f:
            yaml.safe_dump(rdf, f, sort_keys=False)
        (tmp / "README.md").write_text(
            f"# {name}\n\nTPU-native StarDist model exported by stardist_tpu.\n")
        (tmp / "deepimagej_macro.ijm").write_text(
            DEEPIMAGEJ_MACRO.format(prob=model.thresholds.prob, nms=model.thresholds.nms))

        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
            for p in sorted(tmp.iterdir()):
                z.write(p, p.name)
    return zip_path


def import_bioimageio(source, outpath):
    """Import a bioimage.io stardist package -> model folder at ``outpath``;
    returns the loaded model."""
    import yaml

    source = Path(source)
    outpath = Path(outpath)
    outpath.mkdir(parents=True, exist_ok=True)

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        if source.is_dir():
            shutil.copytree(source, tmp / "pkg")
            pkg = tmp / "pkg"
        else:
            with zipfile.ZipFile(source) as z:
                z.extractall(tmp / "pkg")
            pkg = tmp / "pkg"
        rdf_path = next(pkg.rglob("rdf.yaml"))
        with open(rdf_path) as f:
            rdf = yaml.safe_load(f)
        try:
            sd = rdf["config"]["stardist"]
        except (KeyError, TypeError):
            raise ValueError("RDF has no 'config: stardist:' section — not a StarDist package")

        cfg_dict = sd["config"]
        thresholds = sd.get("thresholds", dict(prob=0.5, nms=0.4))

        with open(outpath / "config.json", "w") as f:
            json.dump(cfg_dict, f)
        with open(outpath / "thresholds.json", "w") as f:
            json.dump(thresholds, f)

        # locate weights file
        weights = None
        for w in rdf.get("weights", {}).values():
            cand = rdf_path.parent / w.get("source", "")
            if cand.exists():
                weights = cand
                break
        if weights is None:
            for pat in ("*.h5", "*.msgpack", "*.weights"):
                found = sorted(rdf_path.parent.glob(pat))
                if found:
                    weights = found[0]
                    break
        if weights is not None:
            shutil.copy(weights, outpath / "weights_best.h5")

    from .models import StarDist2D, StarDist3D
    cls = StarDist2D if cfg_dict.get("n_dim", 2) == 2 else StarDist3D
    return cls(None, name=outpath.name, basedir=str(outpath.parent))
