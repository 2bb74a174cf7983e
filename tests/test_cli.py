"""CLI entry-point mechanics (dispatch, conversions, data prep)."""

import base64
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from gitax.common import json_dump
from gitax.inference import (
    _load_param,
    convert_tsv_to_coco_format,
    convert_tsv_to_vqa_json,
    iter_caption_to_json,
)
from gitax.io.tsv import TSVFile, tsv_writer


def test_load_param_zoo():
    assert _load_param("GIT_BASE") == {}
    p = _load_param("GIT_LARGE_VQAv2")
    assert p["image_encoder_type"] == "CLIPViT_L_14"
    assert p["test_crop_size"] == 420
    assert _load_param("SOME_CUSTOM_MODEL") == {}


def test_convert_tsv_to_coco_format(tmp_path):
    res = str(tmp_path / "res.tsv")
    tsv_writer([["7", json_dump([{"caption": "hi there"}])]], res)
    out = str(tmp_path / "coco.json")
    convert_tsv_to_coco_format(res, out)
    with open(out) as fp:
        data = json.load(fp)
    assert data == [{"image_id": "7", "caption": "hi there"}]


def test_convert_tsv_to_vqa_json(tmp_path):
    res = str(tmp_path / "pred.tsv")
    tsv_writer(
        [[json_dump({"answer": "blue", "question_id": 3})],
         [json_dump({"answer": "two", "question_id": 4})]],
        res,
    )
    out = str(tmp_path / "vqa.json")
    convert_tsv_to_vqa_json(res, out)
    with open(out) as fp:
        data = json.load(fp)
    assert data == [
        {"answer": "blue", "question_id": 3},
        {"answer": "two", "question_id": 4},
    ]


def test_iter_caption_to_json(tmp_path):
    gt = str(tmp_path / "gt.tsv")
    tsv_writer(
        [["k1", json_dump([{"caption": "a"}, {"caption": "b"}])]],
        gt,
    )
    out = str(tmp_path / "ann.json")
    iter_caption_to_json(TSVFile(gt), out)
    with open(out) as fp:
        data = json.load(fp)
    assert len(data["annotations"]) == 2
    assert data["annotations"][0]["image_id"] == "k1"
    assert data["images"] == [{"file_name": "k1", "id": "k1"}]


def test_prepare_coco_test(tmp_path, monkeypatch):
    from gitax.data_prepare import prepare_coco_test

    monkeypatch.chdir(tmp_path)
    raw = tmp_path / "aux_data" / "raw_data" / "val2014"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for name in ["x.jpg", "y.jpg"]:
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            str(raw / name)
        )
    infos = [
        {"split": "test", "filepath": "val2014", "filename": "x.jpg",
         "cocoid": 1, "sentences": [{"raw": "first"}]},
        {"split": "train", "filepath": "val2014", "filename": "y.jpg",
         "cocoid": 2, "sentences": [{"raw": "skip me"}]},
        {"split": "test", "filepath": "val2014", "filename": "y.jpg",
         "cocoid": 3, "sentences": [{"raw": "third"}, {"raw": "third b"}]},
    ]
    (tmp_path / "aux_data" / "raw_data" / "dataset_coco.json").write_text(
        json.dumps({"images": infos})
    )
    prepare_coco_test()
    img_tsv = TSVFile("data/coco_caption/test.img.tsv")
    cap_tsv = TSVFile("data/coco_caption/test.caption.tsv")
    assert len(img_tsv) == 2 and len(cap_tsv) == 2  # only split == test
    assert img_tsv.get_key(0) == "1" and img_tsv.get_key(1) == "3"
    # payload round-trips to the original jpeg
    img_bytes = base64.b64decode(img_tsv[0][1])
    assert Image.open(io.BytesIO(img_bytes)).size == (8, 8)
    caps = json.loads(cap_tsv[1][1])
    assert caps == [{"caption": "third"}, {"caption": "third b"}]


def test_dispatch_main(tmp_path, capsys):
    from gitax.common import dispatch_main

    calls = {}

    def my_function(alpha, beta=1):
        calls["args"] = (alpha, beta)
        return alpha + beta

    result = dispatch_main(
        {"my_function": my_function},
        ["-p", "{'type': 'my_function', 'alpha': 2, 'beta': 3}"],
    )
    assert result == 5
    assert calls["args"] == (2, 3)
