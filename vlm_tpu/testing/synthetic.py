"""Synthetic datasets in the reference's standard disk layout
(``<base>/<name>/<split>/{images/, labels.csv}``) — the "TestDataset" idea
the reference registers but never ships
(`/root/reference/datasets_vlm/face_dataset.py:17`, SURVEY.md §4).

Used by the test suite (tests/conftest.py re-exports these) and by the
driver's ``dryrun_multichip`` to exercise the *script-level* product path
(config → factory → mesh → batcher → evaluator) without real data.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def write_image(path: Path, seed: int, size=(32, 32)) -> None:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(*size, 3), dtype=np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def make_face_dataset(base: Path, name: str, split: str, rows, *,
                      extensionless: bool = False) -> Path:
    """Create a face-layout dataset. ``rows`` is a list of dicts with keys
    gender/age/ethnicity/emotion/identity (missing → empty CSV field)."""
    droot = Path(base) / name / split
    (droot / "images").mkdir(parents=True, exist_ok=True)
    lines = ["Path,Gender,Age,Ethnicity,Facial Emotion,Identity"]
    for i, r in enumerate(rows):
        img_name = f"img_{i:04d}.jpg"
        write_image(droot / "images" / img_name, seed=i)
        csv_path = f"{name}/{split}/images/" + (
            f"img_{i:04d}" if extensionless else img_name)
        vals = [str(r.get(k, "")) for k in
                ("gender", "age", "ethnicity", "emotion")]
        ident = str(r.get("identity", ""))
        lines.append(",".join([csv_path] + vals + [ident]))
    (droot / "labels.csv").write_text("\n".join(lines) + "\n")
    return droot


def make_mivia_dataset(base: Path, split: str, rows) -> Path:
    """Create a MiviaPar-layout dataset. ``rows`` is a list of
    (upper, lower, gender, bag, hat) tuples."""
    droot = Path(base) / "MiviaPar" / split
    (droot / "images").mkdir(parents=True, exist_ok=True)
    lines = []
    for i, r in enumerate(rows):
        img_name = f"p_{i:04d}.jpg"
        write_image(droot / "images" / img_name, seed=1000 + i)
        lines.append(",".join([img_name] + [str(v) for v in r]))
    (droot / "labels.csv").write_text("\n".join(lines) + "\n")
    return droot
