"""Golden-parity tests for the label/format core against the reference oracle.

Randomized property tests: generate random tag sequences, segments, offsets,
and merge groups; assert exact equality of outputs with the reference's pure
Python implementations (SURVEY.md §4 "Golden-parity tests").
"""

import random

import numpy as np
import pytest
import torch

from wfl_asr_tpu import labels as L
from wfl_asr_tpu import metrics as M

PHS = ["a", "i", "u", "e", "o", "k", "s", "SP", "AP", "ja/cl"]


def random_tags(rng, n):
    tags = []
    for _ in range(n):
        kind = rng.random()
        ph = rng.choice(PHS)
        if kind < 0.3:
            tags.append("O")
        elif kind < 0.6:
            tags.append(f"B-{ph}")
        else:
            tags.append(f"I-{ph}")
    return tags


def random_segments(rng, n, max_t=3.0):
    out = []
    t = 0.0
    for _ in range(n):
        dur = rng.uniform(0.01, 0.3)
        out.append((round(t, 4), round(t + dur, 4), rng.choice(PHS)))
        t += dur * rng.uniform(0.7, 1.3)
    return out


@pytest.mark.parametrize("seed", range(20))
def test_decode_bio_tags_parity(reference_oracle, seed):
    rng = random.Random(seed)
    n = rng.randint(0, 60)
    tags = random_tags(rng, n)
    assert L.decode_bio_tags(tags, 0.02) == \
        reference_oracle.utils.decode_bio_tags(tags, 0.02)

    if n > 0:
        offsets = torch.rand(n, 2)
        ours = L.decode_bio_tags(tags, 0.02, offsets=offsets.numpy())
        ref = reference_oracle.utils.decode_bio_tags(tags, 0.02, offsets=offsets)
        assert len(ours) == len(ref)
        for (s1, e1, p1), (s2, e2, p2) in zip(ours, ref):
            assert p1 == p2
            assert s1 == pytest.approx(s2, abs=1e-9)
            assert e1 == pytest.approx(e2, abs=1e-9)


@pytest.mark.parametrize("seed", range(20))
def test_to_bio_tags_parity(reference_oracle, seed):
    rng = random.Random(100 + seed)
    segs = random_segments(rng, rng.randint(0, 15))
    num_frames = rng.randint(1, 200)
    assert L.to_bio_tags(segs, num_frames, 0.02) == \
        reference_oracle.preprocess.to_bio_tags(segs, num_frames, 0.02)


@pytest.mark.parametrize("mode", ["right", "left", "previous", "none"])
@pytest.mark.parametrize("seed", range(8))
def test_merge_adjacent_segments_parity(reference_oracle, mode, seed):
    rng = random.Random(200 + seed)
    # Use a small alphabet to force runs of repeated phonemes.
    segs = [(i * 0.1, i * 0.1 + 0.1, rng.choice(["a", "b", "c"]))
            for i in range(rng.randint(0, 12))]
    assert L.merge_adjacent_segments(list(segs), mode) == \
        reference_oracle.utils.merge_adjacent_segments(list(segs), mode)


def test_merge_map_parity(reference_oracle):
    cases = [
        [],
        None,
        [["A", "en/ae", "ja/a"]],
        [["en/ax", "en/ah", "ja/a"]],          # "/" canonical edge case
        [["X"]],                                # too short → skipped
        [["Y", "noslash", "en/y"]],             # member without "/" ignored
        [["A", "en/a"], ["A", "ja/a"], ["B", "en/a"]],  # overwrites
    ]
    for groups in cases:
        assert L.build_merge_map(groups) == \
            reference_oracle.preprocess.build_merge_map(groups)

    mm = {"A": {"en": "ae", "ja": "a"}}
    for ph in ["A", "B"]:
        for lang in ["en", "zh"]:
            assert L.canonical_to_lang(ph, lang, mm) == \
                reference_oracle.utils.canonical_to_lang(ph, lang, mm)
    assert L.canonical_to_lang("A", "en", None) == "A"


@pytest.mark.parametrize("seed", range(10))
def test_align_phoneme_list_parity(reference_oracle, seed):
    rng = random.Random(300 + seed)
    segs = random_segments(rng, rng.randint(0, 15))
    forced = [rng.choice(PHS) for _ in range(rng.randint(0, 12))]
    assert L.align_phoneme_list(segs, forced) == \
        reference_oracle.infer.align_phoneme_list(segs, forced)


def test_parse_save_lab_roundtrip(reference_oracle, tmp_path):
    segs = [(0.0, 0.1234567, "a"), (0.1234567, 0.25, "b"), (0.25, 1.0, "SP")]
    ours_path = str(tmp_path / "ours.lab")
    ref_path = str(tmp_path / "ref.lab")
    L.save_lab(ours_path, segs)
    reference_oracle.utils.save_lab(ref_path, segs)
    assert open(ours_path).read() == open(ref_path).read()

    # Malformed-line tolerance
    lab = tmp_path / "weird.lab"
    lab.write_text("0 1000000 a\nbadline\n1000000 2000000 b c\nxx yy zz\n"
                   "2000000 3000000 c\n")
    assert L.parse_lab(str(lab)) == reference_oracle.preprocess.parse_lab(str(lab))


@pytest.mark.parametrize("seed", range(10))
def test_per_ter_parity(reference_oracle, seed):
    rng = random.Random(400 + seed)
    pred = random_segments(rng, rng.randint(0, 12))
    gt = random_segments(rng, rng.randint(0, 12))
    assert M.phoneme_error_rate(pred, gt) == pytest.approx(
        reference_oracle.train.compute_phoneme_error_rate(pred, gt))
    assert M.timing_error_rate(pred, gt) == pytest.approx(
        reference_oracle.train.compute_timing_error(pred, gt))


def test_clean_lab_parity(reference_oracle):
    cases = [(0.0, 1.0, "ja/a"), "a", [["b"]], ("x",), (0, 1, ["c"]),
             (0.0, 1.0, [["en/d"]])]
    for c in cases:
        assert L.clean_lab(c) == reference_oracle.train.clean_lab(c)


def test_decode_bio_end_flush_quirk():
    # Quirk Q14: end-of-sequence flush uses len(tags)-1.
    segs = L.decode_bio_tags(["B-a", "I-a", "I-a"], 0.02)
    assert segs == [(0.5 * 0.02, 2.5 * 0.02, "a")]
