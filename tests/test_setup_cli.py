"""Setup CLI dispatcher: every subcommand end-to-end on tiny fixtures."""

import csv
import os

import numpy as np
import pytest
from PIL import Image

from rangeclip_tpu.cli import setup as setup_cli


@pytest.fixture()
def fixtures(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "void/image").mkdir(parents=True)
    (tmp_path / "void/depth").mkdir(parents=True)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(tmp_path / f"void/image/{i:03d}.png")
        Image.fromarray(
            rng.integers(0, 5000, (16, 16)).astype(np.int32), mode="I"
        ).save(tmp_path / f"void/depth/{i:03d}.png")

    (tmp_path / "dets").mkdir()
    (tmp_path / "dets/img0.txt").write_text(
        "1 0.5 0.5 0.4 0.4 0.9\n2 0.52 0.52 0.4 0.4 0.8\n"
        "3 0.1 0.1 0.1 0.1 0.7\n"
    )

    (tmp_path / "raw_labels.txt").write_text("Chair\nchair \nTable\nlamp\n")
    (tmp_path / "labelpngs").mkdir()
    Image.fromarray(
        rng.integers(1, 5, (8, 8)).astype(np.int32), mode="I"
    ).save(tmp_path / "labelpngs/a.png")

    labels_csv = tmp_path / "candidate_labels.csv"
    with open(labels_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "label"])
        for i, name in enumerate(["chair", "table", "lamp"], start=1):
            w.writerow([i, name])

    meta = tmp_path / "meta.csv"
    with open(meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "depth", "object_id"])
        w.writeheader()
        for k in range(8):
            w.writerow({"image": f"i{k}.png", "depth": f"d{k}.png",
                        "object_id": str(1 if k < 5 else 2)})
    return tmp_path


def test_similarity_sets(fixtures):
    out = fixtures / "sim.csv"
    setup_cli.main([
        "similarity-sets", "--labels_path", str(fixtures / "candidate_labels.csv"),
        "--output_csv", str(out), "--embedding_dim", "32",
    ])
    rows = list(csv.DictReader(open(out)))
    assert rows[0]["label"] == "unavailable"
    assert len(rows) == 4  # dummy + 3 labels


def test_cleanup_and_void_and_prune(fixtures):
    setup_cli.main([
        "cleanup-labels", "--raw_labels", str(fixtures / "raw_labels.txt"),
        "--label_png_glob", str(fixtures / "labelpngs/*.png"),
        "--output_dir", str(fixtures / "clean"),
        "--labels_csv", str(fixtures / "clean.csv"),
        "--frequency_csv", str(fixtures / "freq.csv"),
    ])
    assert os.path.exists(fixtures / "clean.csv")

    setup_cli.main([
        "void-train-files", "--image_dir", str(fixtures / "void/image"),
        "--depth_dir", str(fixtures / "void/depth"),
        "--image_list_out", str(fixtures / "img.txt"),
        "--depth_list_out", str(fixtures / "dep.txt"),
    ])
    assert len(open(fixtures / "img.txt").readlines()) == 4

    setup_cli.main([
        "remove-small", "--metadata_csv", str(fixtures / "meta.csv"),
        "--output_csv", str(fixtures / "pruned.csv"), "--min_count", "4",
    ])
    assert len(list(csv.DictReader(open(fixtures / "pruned.csv")))) == 5


def test_pseudo_gt_nms(fixtures):
    setup_cli.main([
        "pseudo-gt", "--detections_glob", str(fixtures / "dets/*.txt"),
        "--output_dir", str(fixtures / "nms"),
    ])
    lines = open(fixtures / "nms/img0.txt").read().strip().splitlines()
    kept_classes = [int(l.split()[0]) for l in lines]
    assert kept_classes == [1, 3]  # overlapping class-2 box suppressed
