"""Flag-system hygiene: --aug-cfg wiring + a parsed-but-never-read audit.

The reference parses ~140 flags of which many are vestigial (SURVEY.md §5);
this build deliberately keeps only consumed flags. These tests pin that
property so a new flag can't land parsed-but-dangling (the --aug-cfg bug
class: parsed via ParseKwargs, silently never threaded to the transform).
"""
import re
import subprocess
import sys
from pathlib import Path

import pytest

from colxlip_tpu.data.transforms import AugmentationCfg
from colxlip_tpu.params import parse_args

REPO = Path(__file__).resolve().parents[1]


def test_aug_cfg_parses_and_builds():
    ns = parse_args(["--model", "ViT-S-16-test",
                     "--aug-cfg", "scale=(0.5,1.0)", "ratio=(1.0,1.0)"])
    aug = AugmentationCfg.from_kwargs(ns.aug_cfg)
    assert aug.scale == (0.5, 1.0)
    assert aug.ratio == (1.0, 1.0)


def test_aug_cfg_unknown_key_errors():
    ns = parse_args(["--model", "ViT-S-16-test",
                     "--aug-cfg", "color_jitter=0.4"])
    with pytest.raises(ValueError, match="color_jitter"):
        AugmentationCfg.from_kwargs(ns.aug_cfg)


def test_aug_cfg_reaches_train_transform(tmp_path, monkeypatch):
    """Driver wiring: --aug-cfg must thread into create_model_and_transforms
    (the reference's own bug class: main.py builds transforms without it)."""
    import colxlip_tpu.main as main_mod

    captured = {}

    class _Stop(Exception):
        pass

    def fake_cmat(model_name, **kw):
        captured.update(kw)
        raise _Stop

    monkeypatch.setattr(main_mod, "create_model_and_transforms", fake_cmat)
    argv = [
        "--model", "ViT-S-16-test", "--dataset-type", "synthetic",
        "--logs", str(tmp_path), "--name", "augwire",
        "--aug-cfg", "scale=(0.5,1.0)",
    ]
    with pytest.raises(_Stop):
        main_mod.main(argv)
    aug = captured.get("aug_cfg")
    assert isinstance(aug, AugmentationCfg), captured.keys()
    assert aug.scale == (0.5, 1.0)


def test_aug_cfg_changes_factory_transform():
    from colxlip_tpu.factory import create_model_and_transforms

    _, _, _, tr, _ = create_model_and_transforms(
        "ViT-S-16-test", aug_cfg=AugmentationCfg(scale=(0.5, 1.0)))
    assert tr.aug.scale == (0.5, 1.0)
    _, _, _, tr_default, _ = create_model_and_transforms("ViT-S-16-test")
    assert tr_default.aug.scale == (0.9, 1.0)


# Flags whose consumption is not an ``args.<dest>`` read:
#   caption_sampling_mode — enforced at parse time (choices pins the only
#     mode the reference implements, its data.py:146-183)
#   torchcompile — documented accepted no-op (params.py: jit is always on)
_CONSUMED_ELSEWHERE = {"caption_sampling_mode", "torchcompile"}


def test_no_dangling_flags():
    """Every parsed flag is read somewhere (args.<dest> or getattr)."""
    ns = parse_args(["--model", "ViT-S-16-test"])
    dests = set(vars(ns))

    srcs = []
    for sub in ("colxlip_tpu", "scripts"):
        for p in (REPO / sub).rglob("*.py"):
            srcs.append(p.read_text())
    blob = "\n".join(srcs)
    used = set(re.findall(r"args\.(\w+)", blob))
    used |= set(re.findall(r'getattr\(\s*args,\s*"(\w+)"', blob))

    dangling = sorted(dests - used - _CONSUMED_ELSEWHERE)
    assert not dangling, (
        f"flags parsed but never read: {dangling} — wire them up or add to "
        f"_CONSUMED_ELSEWHERE with a reason")
