"""Device-side BIO→segments decode parity vs the host decoder.

The extractor (ops/postprocess.extract_segments_ids) must match
``labels.decode_bio_tags`` — the host mirror of reference utils.py:10-74 —
bit-for-bit through the offset math: the device returns frame INDICES plus
the gathered f32 offsets and the host multiplies in float64 exactly like
the host decoder, so ``int(t * 1e7)`` .lab truncation cannot diverge.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wfl_asr_tpu.labels import decode_bio_tags
from wfl_asr_tpu.ops.postprocess import (bio_tables, extract_segments_ids,
                                         median_filter_ids,
                                         median_filter_ids_masked)

FRAME = 0.02


def _label_list(with_stray=False):
    phs = ["a", "b", "SP", "k"]
    tags = ["O"] + [f"B-{p}" for p in phs] + [f"I-{p}" for p in phs]
    if with_stray:
        # non-BIO strays (hand-edited / legacy phonemes.txt): the host
        # decoder's startswith chain falls through on these — neither
        # open nor close.
        tags += ["SIL", "<pad>"]
    return tags


def _device_decode(ids, offsets, length, label_list):
    kind, ph, ph_names = bio_tables(label_list)
    t = len(ids)
    off = (np.full((t, 2), 0.5, np.float32) if offsets is None
           else np.asarray(offsets, np.float32))
    b, e, p, so, eo, count = extract_segments_ids(
        jnp.asarray(np.asarray(ids, np.int32)), jnp.asarray(off),
        jnp.int32(length), jnp.asarray(kind), jnp.asarray(ph))
    b, e, p = np.asarray(b), np.asarray(e), np.asarray(p)
    so, eo, count = np.asarray(so), np.asarray(eo), int(count)
    segs = []
    for k in range(count):
        st = (int(b[k]) + float(so[k])) * FRAME
        en = (int(e[k]) + float(eo[k])) * FRAME
        segs.append((st, en, ph_names[int(p[k])]))
    return segs


def _host_decode(ids, offsets, length, label_list):
    tags = [label_list[i] for i in ids[:length]]
    off = None if offsets is None else np.asarray(offsets)[:length]
    return decode_bio_tags(tags, frame_duration=FRAME, offsets=off)


@pytest.mark.parametrize("with_offsets", [False, True])
@pytest.mark.parametrize("with_stray", [False, True])
def test_extract_segments_randomized(with_offsets, with_stray):
    label_list = _label_list(with_stray)
    rng = np.random.RandomState(0)
    for trial in range(40):
        t = int(rng.randint(1, 60))
        ids = rng.randint(0, len(label_list), size=t)
        length = int(rng.randint(1, t + 1))
        offsets = (rng.rand(t, 2).astype(np.float32)
                   if with_offsets else None)
        got = _device_decode(ids, offsets, length, label_list)
        want = _host_decode(ids, offsets, length, label_list)
        assert got == want, (trial, ids[:length].tolist(), length)


def test_extract_segments_edge_cases():
    label_list = _label_list()  # O=0, B-a=1, B-b=2, ..., I-a=5, ...
    cases = [
        ([0, 0, 0], 3),                  # all O
        ([1], 1),                        # single B, flush
        ([5], 1),                        # orphan I starts a segment
        ([1, 1, 1], 3),                  # B B B: close on every B
        ([1, 5, 5, 0], 4),               # B I I O: close on O
        ([1, 5, 6, 6], 4),               # I phoneme change = implicit B
        ([1, 5, 0, 5, 5], 5),            # restart after O via I
        ([0, 0, 1], 3),                  # B at last frame: flush only
        ([1, 5, 5], 2),                  # true length shorter than ids
        ([1, 2, 3, 4], 4),               # B chain of distinct phonemes
    ]
    for ids, length in cases:
        for offsets in (None,
                        np.linspace(0, 1, 2 * len(ids))
                        .reshape(len(ids), 2).astype(np.float32)):
            got = _device_decode(ids, offsets, length, label_list)
            want = _host_decode(ids, offsets, length, label_list)
            assert got == want, (ids, length)


def test_extract_segments_stray_passthrough():
    """Non-BIO tags are pass-through in the host decoder (labels.py falls
    through its startswith chain) — the device decode must keep the open
    segment open across them, not close it like an O."""
    label_list = _label_list(with_stray=True)
    sil = label_list.index("SIL")        # 9
    pad = label_list.index("<pad>")      # 10
    cases = [
        ([1, sil, 5, 5], 4),             # B-a SIL I-a I-a: ONE segment
        ([1, sil, 6], 3),                # B-a SIL I-b: close at I-b
        ([sil, sil, sil], 3),            # all stray: no segments
        ([0, sil, 5], 3),                # O SIL I-a: open at I-a
        ([1, sil], 2),                   # flush across a trailing stray
        ([sil, 1, pad, 0], 4),           # stray B-a stray O: close on O
        ([1, pad, pad, pad], 4),         # long stray tail, flush
        ([1, sil, 1], 3),                # B-a SIL B-a: close + reopen
    ]
    for ids, length in cases:
        for offsets in (None,
                        np.linspace(0, 1, 2 * len(ids))
                        .reshape(len(ids), 2).astype(np.float32)):
            got = _device_decode(ids, offsets, length, label_list)
            want = _host_decode(ids, offsets, length, label_list)
            assert got == want, (ids, length)


def test_extract_segments_bitwise_times():
    """float64 host math on device-gathered f32 offsets is bit-identical to
    the host decoder (the .lab int truncation contract)."""
    label_list = _label_list()
    rng = np.random.RandomState(7)
    t = 200
    ids = rng.randint(0, len(label_list), size=t)
    offsets = rng.rand(t, 2).astype(np.float32)
    got = _device_decode(ids, offsets, t, label_list)
    want = _host_decode(ids, offsets, t, label_list)
    assert len(got) == len(want)
    for (gs, ge, gp), (ws, we, wp) in zip(got, want):
        assert gp == wp
        assert gs == ws and ge == we            # exact float equality
        assert int(gs * 1e7) == int(ws * 1e7)   # .lab truncation


def test_masked_median_matches_sliced():
    rng = np.random.RandomState(3)
    for size in (3, 5, 4):
        for _ in range(20):
            t = int(rng.randint(2, 40))
            length = int(rng.randint(1, t + 1))
            ids = rng.randint(0, 9, size=t).astype(np.int32)
            got = np.asarray(median_filter_ids_masked(
                jnp.asarray(ids), size, jnp.int32(length)))
            want = np.asarray(median_filter_ids(
                jnp.asarray(ids[:length]), size))
            np.testing.assert_array_equal(got[:length], want)
            np.testing.assert_array_equal(got[length:], ids[length:])
