"""`python -m gitax.*` dispatch smoke tests — the exact command surface
the reference documents (README commands run verbatim with the module
swapped).  Uses the fast conversion/prep functions to keep subprocesses
cheap."""

import json
import os
import subprocess
import sys

import pytest

from e2e_common import strip_remote_tpu_env
from gitax.common import json_dump
from gitax.io.tsv import tsv_writer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(module, param, cwd):
    env = strip_remote_tpu_env(dict(os.environ))
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", module, "-p", param],
        cwd=str(cwd),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_inference_cli_convert_coco(tmp_path):
    tsv_writer([["77", json_dump([{"caption": "hello world"}])]],
               str(tmp_path / "res.tsv"))
    r = run_cli(
        "gitax.inference",
        "{'type': 'convert_tsv_to_coco_format', 'res_tsv': 'res.tsv', "
        "'outfile': 'out.json'}",
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "out.json") as fp:
        assert json.load(fp) == [{"image_id": "77", "caption": "hello world"}]


def test_inference_cli_evaluate(tmp_path):
    tsv_writer([["a", json_dump([{"caption": "a dog runs"}])]],
               str(tmp_path / "pred.tsv"))
    tsv_writer([["a", json_dump([{"caption": "a dog running"}])]],
               str(tmp_path / "gt.tsv"))
    r = run_cli(
        "gitax.inference",
        "{'type': 'evaluate_on_coco_caption', 'res_file': 'pred.tsv', "
        "'label_file': 'gt.tsv'}",
        tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "pred.eval.json") as fp:
        result = json.load(fp)
    assert "CIDEr" in result


def test_data_prepare_cli(tmp_path):
    import numpy as np
    from PIL import Image

    raw = tmp_path / "aux_data" / "raw_data" / "val2014"
    raw.mkdir(parents=True)
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (8, 8, 3), dtype=np.uint8)
    ).save(str(raw / "z.jpg"))
    (tmp_path / "aux_data" / "raw_data" / "dataset_coco.json").write_text(
        json.dumps(
            {
                "images": [
                    {
                        "split": "test",
                        "filepath": "val2014",
                        "filename": "z.jpg",
                        "cocoid": 9,
                        "sentences": [{"raw": "tiny"}],
                    }
                ]
            }
        )
    )
    r = run_cli("gitax.data_prepare", "{'type': 'prepare_coco_test'}", tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "data" / "coco_caption" / "test.img.tsv").exists()


def test_cli_bad_type_errors(tmp_path):
    r = run_cli("gitax.inference", "{'type': 'no_such_function'}", tmp_path)
    assert r.returncode != 0
    assert "no_such_function" in (r.stderr + r.stdout)
