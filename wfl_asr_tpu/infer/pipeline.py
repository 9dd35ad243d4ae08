"""Inference pipeline: wav → (chunked) forward → postprocess → HTK ``.lab``.

Behavioral contract: reference infer.py end to end —

- 30 s chunking with per-chunk re-normalization and time shifting
  (infer.py:19-28, 98-184; quirk Q11 double-normalize preserved),
- per-language logits/offsets **averaging** when ``lang_id`` is None
  (infer.py:146-156, 265-276) — implemented as ONE batched forward over all
  language ids instead of a Python loop per language,
- ``.wfl_cache`` logits/offsets cache with the reference's exact file-name
  scheme (infer.py:120-131, 222-229); our entries are numpy-serialized, and
  the reference's torch-format entries load transparently when torch exists,
- confidence gate → median filter → BIO decode with sub-frame offsets →
  canonical→language mapping → segment merging → forced alignment
  (infer.py:163-183, 283-319),
- sampling flags accepted with the reference's *dead* semantics (quirk Q2:
  the sampled ids are overwritten by the confidence/argmax path; chunked
  inference ignores them entirely) — flag-compatible by construction.

TPU architecture: audio is padded into static 1 s buckets; sample/frame masks
make valid-frame outputs bit-equal to exact-length runs (see
tests/test_masked_inference.py), so each (bucket, num_langs) pair compiles
once. The confidence gate and median filter run on device; ids/offsets cross
to host once per chunk. With ``postprocess.device_decode`` the batched
folder mode goes further: per-language averaging, gate, masked median, and
the BIO→segments state machine all run on device and ONE transfer carries
segment index/offset arrays — the host only multiplies
``(idx + offset) * Δ`` in float64 (preserving ``.lab`` truncation parity;
tests/test_device_decode.py, tests/test_batched_folder.py).
"""

from __future__ import annotations

import functools
import os
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.audio import peak_normalize, read_wav, resample, wav_duration
from ..labels import (Segment, align_phoneme_list, canonical_to_lang,
                      load_langs, load_phoneme_list, load_phoneme_merge_map,
                      merge_adjacent_segments, save_lab)
from ..models.tagger import TaggerArch, apply_tagger
from ..ops.postprocess import (confidence_gate_ids, extract_segments_ids,
                               median_filter_ids, median_filter_ids_masked)
from ..checkpoint import load_model_checkpoint

FRAME_DURATION = 0.02          # reference infer.py:12
MAX_SEGMENT_DURATION = 30.0    # reference infer.py:13
BUCKET_SECONDS = 1.0           # static-shape compile granularity


@functools.partial(jax.jit, static_argnames=("arch", "masked", "precentered",
                                             "compute_dtype", "mesh",
                                             "sequence_parallel"))
def _forward_impl(params, state, arch, audio, lang_ids, sample_mask,
                  frame_mask, pos_bias, masked: bool, precentered: bool,
                  compute_dtype, mesh=None, sequence_parallel: bool = False):
    logits, offsets, _ = apply_tagger(
        params, state, arch, audio, lang_ids,
        sample_mask=sample_mask if masked else None,
        frame_mask=frame_mask if masked else None,
        precentered=precentered, compute_dtype=compute_dtype,
        precomputed_pos_bias=pos_bias, mesh=mesh,
        sequence_parallel=sequence_parallel)
    return logits, offsets


@functools.partial(jax.jit, static_argnames=("n_items", "n_langs",
                                             "median_size", "o_id"))
def _decode_rows_impl(logits, offsets, lengths, threshold, kind_t, ph_t,
                      n_items: int, n_langs: int, median_size: int,
                      o_id: int):
    """Device-side tail of the batched folder path: average the per-language
    rows, gate, median-filter at each item's TRUE length, and run the BIO
    state machine — all in one dispatch on the un-transferred forward
    outputs. Returns segment arrays plus the averaged logits/offsets."""
    n_real = n_items * n_langs
    lg = logits[:n_real].astype(jnp.float32).reshape(
        (n_items, n_langs) + logits.shape[1:]).mean(axis=1)
    off = offsets[:n_real].astype(jnp.float32).reshape(
        (n_items, n_langs) + offsets.shape[1:]).mean(axis=1)

    def one(lg_i, off_i, len_i):
        ids = confidence_gate_ids(lg_i, threshold, o_id)
        if median_size > 1:
            ids = median_filter_ids_masked(ids, median_size, len_i)
        return extract_segments_ids(ids, off_i, len_i, kind_t, ph_t)

    b, e, p, so, eo, cnt = jax.vmap(one)(lg, off, lengths)
    return b, e, p, so, eo, cnt, lg, off


def split_audio(audio: np.ndarray, sr: int,
                max_duration: float = MAX_SEGMENT_DURATION) -> List[np.ndarray]:
    """Fixed-size 30 s splits (reference infer.py:19-28)."""
    samples_per_segment = int(max_duration * sr)
    return [audio[start:start + samples_per_segment]
            for start in range(0, len(audio), samples_per_segment)]


class InferenceSession:
    """A loaded tagger + compiled bucketed forward."""

    def __init__(self, config_path: str, checkpoint_path: str,
                 compute_dtype=jnp.float32, arch: Optional[TaggerArch] = None,
                 mesh=None):
        self.cfg = Config.load(config_path)
        save_dir = self.cfg.save_dir
        self.label_list = load_phoneme_list(os.path.join(save_dir, "phonemes.txt"))
        self.label2id = {l: i for i, l in enumerate(self.label_list)}
        self.id2label = {i: l for i, l in enumerate(self.label_list)}
        self.lang2id = load_langs(os.path.join(save_dir, "langs.txt"))
        self.merge_map = load_phoneme_merge_map(
            os.path.join(save_dir, "phoneme_merge_map.json"))
        self.arch = arch or TaggerArch.from_config(self.cfg, len(self.label_list))
        # Pallas kernels on TPU — single chip or mesh: under a mesh the
        # kernels run per-shard via shard_map (rows on 'data'), so DP
        # serving keeps the flash/fused-conv speedups instead of falling
        # back to the pure-XLA graph.
        if jax.devices()[0].platform == "tpu":
            import dataclasses
            self.arch = dataclasses.replace(self.arch,
                                            use_flash_attention=True)
            if self.arch.wavlm is not None:
                self.arch = dataclasses.replace(
                    self.arch, wavlm=dataclasses.replace(
                        self.arch.wavlm, use_flash_attention=True,
                        use_fused_conv=True))
            if self.arch.whisper is not None:
                self.arch = dataclasses.replace(
                    self.arch, whisper=dataclasses.replace(
                        self.arch.whisper, use_flash_attention=True))
        params, state = load_model_checkpoint(checkpoint_path, self.arch)
        quant = self.cfg.serving_quantization
        if quant == "int8" and "encoder" in params:
            # W8A8-dynamic int8 on the encoder's large linears (the
            # dominant serving FLOPs). layers.linear dispatches on the
            # quantized param form; everything else is unchanged.
            # MEASURED NULL on v5e at WavLM-base serving shapes: bench A/B
            # 3176.4 int8 vs 3171.6 bf16 (+0.15%, inside relay noise —
            # docs/TPU_RUNS_r04.log); the mode stays for experimentation
            # and halved checkpoint-transfer size, not for speed. Gate any
            # retuning on scripts/probe_int8.py first.
            from ..models.layers import quantize_tree_int8
            params = dict(params)
            params["encoder"] = quantize_tree_int8(params["encoder"])
            print("[INFO] int8 serving: encoder linears quantized "
                  "(W8A8-dynamic, per-output-channel weights)")
        elif quant not in ("none", "int8"):
            raise ValueError(
                f"model.serving_quantization={quant!r}: only 'int8' or "
                f"'none' are supported")
        # Serving-path data parallelism: with a mesh, params/state are
        # replicated and batch rows shard on 'data' (the training-side DP
        # story extended to inference; SURVEY.md §2 parallelism table).
        # model.pipeline_parallel: S — GPipe the encoder stack over a
        # ('data','stage') mesh (parallel/pp.py). Built here when the
        # caller didn't supply a stage mesh already; composes with DP on
        # the leading 'data' axis.
        pp_stages = int(self.cfg.serving_pipeline_parallel)
        if pp_stages > 1 and self.arch.encoder_type not in ("wavlm",
                                                            "whisper"):
            raise ValueError("model.pipeline_parallel needs a layered "
                             "encoder (wavlm or whisper)")
        if pp_stages > 1:
            from ..parallel import pp as _pp
            if mesh is None:
                if len(jax.devices()) % pp_stages:
                    raise ValueError(
                        f"model.pipeline_parallel={pp_stages} does not "
                        f"divide the {len(jax.devices())} visible devices")
                mesh = _pp.make_pp_mesh(pp_stages)
            elif "stage" not in mesh.shape:
                raise ValueError(
                    "model.pipeline_parallel needs a ('data','stage') "
                    "mesh; the session was given one without a 'stage' "
                    "axis")
            params = dict(params)
            enc = dict(params["encoder"])
            enc["layers"] = _pp.stack_layers(enc["layers"])
            params["encoder"] = enc
            print(f"[INFO] pipeline-parallel serving: encoder layers over "
                  f"{pp_stages} stages (mesh {dict(mesh.shape)})")
        self.mesh = mesh
        # model.sequence_parallel: Megatron-SP activation sharding between
        # encoder layers (parallel/sp.py); needs a mesh with model > 1.
        mp = dict(mesh.shape).get("model", 1) if mesh is not None else 1
        self.sequence_parallel = bool(self.cfg.serving_sequence_parallel
                                      and mp > 1)
        if self.cfg.serving_sequence_parallel and not self.sequence_parallel:
            print("[WARN] model.sequence_parallel ignored: the session has "
                  "no mesh with a >1 'model' axis")
        if mesh is not None:
            from ..parallel import replicate
            if pp_stages > 1:
                # Stacked encoder layers shard their leading (layer) axis
                # over 'stage'; everything else replicates — one call,
                # the same path-rule placement the train driver uses.
                from ..parallel import pp as _pp
                self.params = _pp.shard_params_pp(params, mesh)
            elif mp > 1:
                # Megatron TP serving: weight shards on 'model' (quantized
                # int8 leaves keep replicated placement — their param names
                # fall outside tp.py's column/row tables, by design).
                from ..parallel import shard_params_tp
                self.params = shard_params_tp(params, mesh)
            else:
                self.params = replicate(params, mesh)
            self.state = replicate(state, mesh)
        else:
            self.params = jax.device_put(params)
            self.state = jax.device_put(state)
        self.compute_dtype = compute_dtype
        self.sr = self.cfg.sample_rate
        # Position-bias store: ONE buffer at the largest bucket length seen
        # (the T5-style bucket depends only on k−q, so every shorter
        # length's bias is the leading [:t,:t] submatrix — no per-length
        # cache). Stored at the serving dtype (bf16 halves it: 108→54 MB at
        # T=1499 for wavlm-base). Replaces the r2 unbounded per-length dict
        # that could pin >1 GB of HBM across a varied-duration folder.
        self._pos_bias_full: Optional[jnp.ndarray] = None
        self._pos_bias_len = 0
        # Small LRU of sliced shorter-length views: a folder alternating
        # between two bucket lengths must not re-materialize a tens-of-MB
        # device slice every call (r3 review), but the store stays bounded.
        self._pos_bias_slices: "OrderedDict[int, jnp.ndarray]" = OrderedDict()
        self._pos_bias_slice_cap = 4

    # -- compiled forward ---------------------------------------------------

    def _jit_forward(self, audio, lang_ids, sample_mask, frame_mask,
                     masked: bool, precentered: bool, t_pad: int):
        return _forward_impl(self.params, self.state, self.arch,
                             audio, lang_ids, sample_mask, frame_mask,
                             self._pos_bias_for(t_pad), masked, precentered,
                             self.compute_dtype, mesh=self.mesh,
                             sequence_parallel=self.sequence_parallel)

    def _put(self, x) -> jnp.ndarray:
        """Device-put a batch array; with a mesh, shard rows on 'data'."""
        x = np.ascontiguousarray(x)
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel import batch_sharding
        return jax.device_put(x, batch_sharding(self.mesh, x.ndim))

    def _row_count(self, n: int) -> int:
        """Rows to run for n real rows (padded up to a 'data'-axis multiple
        under a mesh so every device gets equal work)."""
        if self.mesh is None:
            return n
        d = self.mesh.shape["data"]
        return ((n + d - 1) // d) * d

    def _pos_bias_for(self, t_pad: int):
        """Precomputed WavLM position bias for a bucket length (params are
        fixed at inference, so the [T,T] bucket gather runs once instead of
        in every forward). Bounded: one full-size buffer at the max length
        seen, plus at most one sliced view for the current shorter length
        (`warmup([30.0])` pins the max up front)."""
        if self.arch.encoder_type != "wavlm":
            return None
        if t_pad > self._pos_bias_len:
            from ..models.wavlm import position_bias
            bias = jax.jit(
                position_bias, static_argnames=("arch", "length"))(
                    self.params["encoder"], self.arch.wavlm, t_pad)
            if self.compute_dtype == jnp.bfloat16:
                # the flash kernel streams bias at the activation dtype
                # anyway (_prep_inputs); storing bf16 also removes the
                # per-call f32→bf16 cast copy
                bias = bias.astype(jnp.bfloat16)
            self._pos_bias_full = jax.device_put(bias)
            self._pos_bias_len = t_pad
            self._pos_bias_slices.clear()
        if t_pad == self._pos_bias_len:
            return self._pos_bias_full
        if t_pad not in self._pos_bias_slices:
            # leading-submatrix property: bias(t) == bias(T_max)[:, :t, :t]
            # slicing outside jit materializes a fresh device array
            self._pos_bias_slices[t_pad] = \
                self._pos_bias_full[:, :t_pad, :t_pad]
            while len(self._pos_bias_slices) > self._pos_bias_slice_cap:
                self._pos_bias_slices.popitem(last=False)
        else:
            self._pos_bias_slices.move_to_end(t_pad)
        return self._pos_bias_slices[t_pad]

    def num_frames_for(self, num_samples: int) -> int:
        """Frame count the reference model would emit for this exact length
        (model called without max_label_len at inference). Clamped at 0:
        wavlm's floor((L-k)/s)+1 recurrence goes NEGATIVE below one
        receptive field (e.g. L=0 → −1), and a negative t_ref used as a
        slice end would silently keep t_pad−1 garbage frames."""
        if self.arch.encoder_type == "whisper":
            return self.arch.whisper.max_source_positions
        if self.arch.encoder_type == "wavlm":
            return max(self.arch.wavlm.feature_lengths(num_samples), 0)
        hop = int(self.arch.frame_duration * self.sr)
        return num_samples // hop + 1 if num_samples > 0 else 0

    def warmup(self, durations_s: Sequence[float] = (30.0,),
               num_langs: int = 1) -> None:
        """Pre-compile the bucketed forward graphs (first compile of a
        large graph costs 30-90 s in this environment) so the first real
        request is served at steady-state latency. One entry per expected
        bucket duration; multi-language callers pass their language count
        so the row-batched graph matches."""
        for dur in durations_s:
            s = max(int(float(dur) * self.sr), 1)
            self.forward(np.zeros(s, np.float32), list(range(num_langs)))

    def forward(self, audio: np.ndarray,
                lang_ids: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
        """Exact-length forward on bucketed static shapes.

        audio: [S] float; lang_ids: L ids (the same audio is batched over
        languages). Returns (logits [L, T_ref, n_tags], offsets [L, T_ref, 2]).
        """
        s_true = len(audio)
        L = len(lang_ids)
        R = self._row_count(L)  # mesh-padded row count (extra rows dropped)
        bucket = max(int(np.ceil(s_true / (BUCKET_SECONDS * self.sr))), 1) \
            * int(BUCKET_SECONDS * self.sr)
        t_ref = self.num_frames_for(s_true)
        if t_ref == 0:
            # Empty/sub-receptive-field input: zero frames, no device call
            # (the forward would only produce masked garbage to slice away).
            return (np.zeros((L, 0, self.arch.num_labels), np.float32),
                    np.zeros((L, 0, 2), np.float32))

        precentered = False
        if self.arch.encoder_type == "none":
            # Host-side exact-length center padding (reflect 200), then
            # zero-fill the bucket; the device STFT runs center=False.
            pad_n = 200
            centered = np.pad(audio.astype(np.float32), pad_n, mode="reflect")
            buf = np.zeros(bucket + 2 * pad_n, np.float32)
            buf[:len(centered)] = centered
            batch = np.broadcast_to(buf, (R, len(buf)))
            precentered = True
        else:
            buf = np.zeros(bucket, np.float32)
            buf[:s_true] = audio
            batch = np.broadcast_to(buf, (R, bucket))

        t_pad = self.num_frames_for(bucket)
        row_langs = np.zeros(R, np.int32)
        row_langs[:L] = np.asarray(lang_ids, np.int32)
        sample_mask = np.broadcast_to(
            np.arange(bucket) < s_true, (R, bucket))
        frame_mask = np.broadcast_to(np.arange(t_pad) < t_ref, (R, t_pad))
        masked = (self.arch.encoder_type != "whisper") and (s_true != bucket)

        logits, offsets = self._jit_forward(
            self._put(batch), self._put(row_langs),
            self._put(sample_mask), self._put(frame_mask),
            masked, precentered, t_pad)
        logits = np.asarray(logits[:L, :t_ref])
        offsets = np.asarray(offsets[:L, :t_ref])
        return logits, offsets

    def _forward_many_device(self, audios: Sequence[np.ndarray],
                             lang_ids_per_item: Sequence[Sequence[int]]):
        """Shared body of the batched multi-utterance forward: one bucketed
        graph over per-row masks; returns DEVICE arrays plus row metadata
        (callers decide what crosses to host)."""
        bucket_unit = int(BUCKET_SECONDS * self.sr)
        s_true = [len(a) for a in audios]
        bucket = max(int(np.ceil(max(s_true) / bucket_unit)), 1) * bucket_unit
        t_pad = self.num_frames_for(bucket)

        rows_audio, rows_lang, row_owner = [], [], []
        for i, (audio, langs) in enumerate(zip(audios, lang_ids_per_item)):
            if self.arch.encoder_type == "none":
                buf = np.zeros(bucket + 400, np.float32)
                centered = np.pad(audio.astype(np.float32), 200,
                                  mode="reflect")
                buf[:len(centered)] = centered
            else:
                buf = np.zeros(bucket, np.float32)
                buf[:len(audio)] = audio
            for lang in langs:
                rows_audio.append(buf)
                rows_lang.append(lang)
                row_owner.append(i)

        # Mesh padding: duplicate the last row up to a 'data'-axis multiple
        # (outputs beyond the real row count are never read back).
        n_real = len(rows_audio)
        for _ in range(self._row_count(n_real) - n_real):
            rows_audio.append(rows_audio[-1])
            rows_lang.append(rows_lang[-1])
            row_owner.append(row_owner[-1])

        precentered = self.arch.encoder_type == "none"
        batch = np.stack(rows_audio)
        t_refs = [self.num_frames_for(s) for s in s_true]
        sample_mask = (np.arange(bucket)[None, :]
                       < np.array([s_true[o] for o in row_owner])[:, None])
        frame_mask = (np.arange(t_pad)[None, :]
                      < np.array([t_refs[o] for o in row_owner])[:, None])
        masked = self.arch.encoder_type != "whisper"

        logits, offsets = self._jit_forward(
            self._put(batch), self._put(np.array(rows_lang, np.int32)),
            self._put(sample_mask), self._put(frame_mask),
            masked, precentered, t_pad)
        return logits, offsets, t_refs

    def forward_many(self, audios: Sequence[np.ndarray],
                     lang_ids_per_item: Sequence[Sequence[int]]):
        """Batched multi-utterance forward: items of different true lengths
        share one bucketed graph via per-row masks (bit-equal to per-item
        exact-length runs — tests/test_masked_inference.py).

        Returns a list of (logits [L_i, T_ref_i, n], offsets [L_i, T_ref_i, 2])
        per item, where L_i = len(lang_ids_per_item[i]).
        """
        if not audios:
            return []
        logits, offsets, t_refs = self._forward_many_device(
            audios, lang_ids_per_item)
        logits = np.asarray(logits)
        offsets = np.asarray(offsets)

        out = []
        row = 0
        for i, langs in enumerate(lang_ids_per_item):
            n = len(langs)
            out.append((logits[row:row + n, :t_refs[i]],
                        offsets[row:row + n, :t_refs[i]]))
            row += n
        return out

    def _bio(self):
        """Cached (kind_table, ph_table device arrays, ph_names)."""
        if not hasattr(self, "_bio_cache"):
            from ..ops.postprocess import bio_tables
            kind, ph, names = bio_tables(self.label_list)
            self._bio_cache = (jnp.asarray(kind), jnp.asarray(ph), names)
        return self._bio_cache

    def forward_many_decoded(self, audios: Sequence[np.ndarray],
                             langs: Sequence[int],
                             confidence_threshold: float,
                             median_size: int):
        """Fused batched forward + device-side postprocess + BIO decode —
        the complete north-star chain (BASELINE.json): per-language logits
        averaging, confidence gate, median filter, and the BIO→segments
        state machine all run on device; ONE host transfer carries the
        segment arrays (plus the averaged logits/offsets the .wfl_cache
        contract needs on disk).

        Every item shares the same language list ``langs`` (the batched
        folder mode's shape). Returns per item
        ``(mean_logits [T_i, n], mean_offsets [T_i, 2], segments)`` where
        ``segments`` is the host List[Segment] — boundary times are
        multiplied on host in float64 from device-gathered indices/f32
        offsets, exactly matching ``labels.decode_bio_tags`` (so ``.lab``
        int-truncation parity holds; tests/test_device_decode.py).
        """
        if not audios:
            return []
        n_items, n_langs = len(audios), len(langs)
        logits, offsets, t_refs = self._forward_many_device(
            audios, [list(langs)] * n_items)
        kind_t, ph_t, ph_names = self._bio()
        lengths = jnp.asarray(np.array(t_refs, np.int32))
        o_id = self.label2id["O"]
        b, e, p, so, eo, cnt, mlg, moff = _decode_rows_impl(
            logits, offsets, lengths, jnp.float32(confidence_threshold),
            kind_t, ph_t, n_items=n_items, n_langs=n_langs,
            median_size=median_size, o_id=o_id)
        # the single host transfer
        b, e, p = np.asarray(b), np.asarray(e), np.asarray(p)
        so, eo, cnt = np.asarray(so), np.asarray(eo), np.asarray(cnt)
        mlg, moff = np.asarray(mlg), np.asarray(moff)

        out = []
        for i in range(n_items):
            segs = []
            for k in range(int(cnt[i])):
                st = (int(b[i, k]) + float(so[i, k])) * FRAME_DURATION
                en = (int(e[i, k]) + float(eo[i, k])) * FRAME_DURATION
                segs.append((st, en, ph_names[int(p[i, k])]))
            out.append((mlg[i, :t_refs[i]], moff[i, :t_refs[i]], segs))
        return out

    def decode_predictions(self, logits) -> np.ndarray:
        """argmax label ids per frame (reference model.py:196-198)."""
        return np.asarray(jnp.argmax(jnp.asarray(logits), axis=-1))

    def id_to_label(self, ids) -> list:
        """[[tag, ...], ...] for a batch of id sequences
        (reference model.py:200-201)."""
        return [[self.id2label[int(i)] for i in seq] for seq in np.asarray(ids)]

    def postprocess_ids(self, logits: np.ndarray,
                        confidence_threshold: float,
                        median_size: int) -> np.ndarray:
        """Device-side confidence gate + median filter → label ids [T]."""
        o_id = self.label2id["O"]
        ids = confidence_gate_ids(jnp.asarray(logits),
                                  jnp.float32(confidence_threshold), o_id)
        if median_size > 1:
            ids = median_filter_ids(ids, median_size)
        return np.asarray(ids)


# ---------------------------------------------------------------------------
# Cache (reference .wfl_cache layout)
# ---------------------------------------------------------------------------

def _cache_save(path: str, arr: np.ndarray) -> None:
    """Write a cache entry the reference can read back: its cache-read path
    does a bare ``torch.load`` on any existing file (infer.py:127-131,
    246-249), so entries are torch-format when torch is importable, with a
    raw ``.npy`` fallback for torch-less deployments."""
    try:
        import torch
        torch.save(torch.from_numpy(np.ascontiguousarray(arr)), path)
    except ImportError:
        with open(path, "wb") as f:
            np.save(f, arr)


def _cache_load(path: str) -> Optional[np.ndarray]:
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            arr = np.load(f, allow_pickle=False)
        if isinstance(arr, np.ndarray):
            return arr
    except ValueError:
        pass
    try:  # a torch-format cache written by the reference (zip archive —
          # np.load opens it as NpzFile, hence the isinstance gate above)
        import torch
        val = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(val.detach().cpu().numpy(), np.float32)
    except Exception:
        return None


def _squeeze_batch(arr: Optional[np.ndarray]) -> Optional[np.ndarray]:
    if arr is not None and arr.ndim == 3 and arr.shape[0] == 1:
        return arr[0]
    return arr


# ---------------------------------------------------------------------------
# Prediction on one audio segment (with cache + language averaging)
# ---------------------------------------------------------------------------

def _lang_name_for(session: InferenceSession, lang_id: Optional[int]):
    if lang_id is None:
        return None
    for name, idx in session.lang2id.items():
        if idx == lang_id:
            return name
    return None


def _predict_segment(session: InferenceSession, segment: np.ndarray,
                     lang_id: Optional[int],
                     logit_path: Optional[str], offset_path: Optional[str]):
    """Forward one segment (all langs batched + averaged when lang_id is
    None), honoring/filling the cache. Returns (logits [T,n], offsets [T,2])."""
    logits = offsets = None
    if logit_path is not None:
        logits = _squeeze_batch(_cache_load(logit_path))
        if logits is not None:
            print(f"Loaded cached logits for {os.path.basename(logit_path)}")
            offsets = _squeeze_batch(_cache_load(offset_path))

    if logits is None:
        if lang_id is not None:
            if lang_id < 0 or (session.lang2id
                               and lang_id > max(session.lang2id.values())):
                # Both sides: the traced embedding gather CLAMPS
                # out-of-range ids (negative ones land on language 0), so
                # without this check a bad id silently emits wrong labels;
                # the reference's torch embedding raises (infer.py:257-259).
                raise ValueError(
                    f"Language ID {lang_id} is invalid. "
                    f"Available: {session.lang2id}")
            lang_ids = [lang_id]
        else:
            lang_ids = sorted(session.lang2id.values()) or [0]
        batched_logits, batched_offsets = session.forward(segment, lang_ids)
        logits = batched_logits.mean(axis=0)
        offsets = batched_offsets.mean(axis=0)
        if logit_path is not None:
            _cache_save(logit_path, logits)
            _cache_save(offset_path, offsets)
    return logits, offsets


def _decode_segment(session: InferenceSession, logits: np.ndarray,
                    offsets: Optional[np.ndarray],
                    confidence_threshold: float, median_size: int,
                    lang_name: Optional[str]) -> List[Segment]:
    """Gate → median → BIO decode → canonical→lang mapping
    (reference infer.py:163-179)."""
    from ..labels import decode_bio_tags
    ids = session.postprocess_ids(logits, confidence_threshold, median_size)
    tags = [session.id2label[int(i)] for i in ids]
    segments = decode_bio_tags(tags, frame_duration=FRAME_DURATION,
                               offsets=offsets)
    if session.merge_map and lang_name:
        segments = [(s, e, canonical_to_lang(ph, lang_name, session.merge_map))
                    for s, e, ph in segments]
    return segments


def process_segments(session: InferenceSession, segments: List[np.ndarray],
                     sr: int, lang_id: Optional[int],
                     cache_dir: Optional[str], base_name: Optional[str],
                     confidence_threshold: float) -> List[Segment]:
    """Chunked-path processing (reference infer.py:98-184)."""
    all_segments: List[Segment] = []
    current_time = 0.0
    lang_name = _lang_name_for(session, lang_id)
    median_size = session.cfg.median_filter
    lang_suffix = f"_lang{lang_id}" if lang_id is not None else "_avg"

    for idx, segment in enumerate(segments):
        if len(segment) > 0:
            segment = segment / (np.max(np.abs(segment)) + 1e-8)  # Q11

        logit_path = offset_path = None
        if cache_dir is not None and base_name is not None:
            logit_path = os.path.join(
                cache_dir, f"{base_name}_seg{idx}{lang_suffix}_logits.pt")
            offset_path = os.path.join(
                cache_dir, f"{base_name}_seg{idx}{lang_suffix}_offsets.pt")

        logits, offsets = _predict_segment(session, segment, lang_id,
                                           logit_path, offset_path)
        decoded = _decode_segment(session, logits, offsets,
                                  confidence_threshold, median_size,
                                  lang_name)
        all_segments.extend([(s + current_time, e + current_time, ph)
                             for s, e, ph in decoded])
        current_time += len(segment) / sr
    return all_segments


# ---------------------------------------------------------------------------
# Public API (mirrors reference infer.py signatures)
# ---------------------------------------------------------------------------

_SESSION_CACHE: Dict[Tuple[str, str], InferenceSession] = {}


def _get_session(config_path: str, checkpoint_path: str,
                 data_parallel: bool = False) -> InferenceSession:
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed()  # multi-host serving; single-host no-ops
    key = (os.path.abspath(config_path), os.path.abspath(checkpoint_path))
    session = _SESSION_CACHE.get(key)
    # data_parallel is only actionable with >1 device; on a single-device
    # host the cached mesh-less session IS the right one (rebuilding it
    # would recompile every bucket graph per call).
    want_mesh = data_parallel and len(jax.devices()) > 1
    if session is None or (want_mesh and session.mesh is None):
        mesh = None
        if want_mesh:
            from ..config import Config as _Cfg
            if int(_Cfg.load(config_path).serving_pipeline_parallel) > 1:
                # model.pipeline_parallel: the session builds its own
                # ('data','stage') mesh; a ('data','model') one here
                # would conflict.
                mesh = None
            else:
                from ..parallel import make_mesh
                mesh = make_mesh()
        _SESSION_CACHE[key] = session = InferenceSession(
            config_path, checkpoint_path, mesh=mesh)
    return session


def infer_audio(audio_path: str, config_path: str = "config.yaml",
                checkpoint_path: str = "best_model.pt",
                output_lab_path: Optional[str] = None,
                device: str = "tpu", lang_id: Optional[int] = None,
                sample: bool = False, top_k: int = 0, top_p: float = 0.0,
                temperature: float = 1.0,
                confidence_threshold: float = 0.0) -> List[Segment]:
    """Single-file inference → segments (+ optional ``.lab``), mirroring
    reference infer.py:186-328. ``sample``/``top_k``/``top_p``/``temperature``
    are accepted for CLI compatibility; like the reference, they do not
    change the output (quirk Q2)."""
    del device, sample, top_k, top_p, temperature
    session = _get_session(config_path, checkpoint_path)

    lang_name = _lang_name_for(session, lang_id)

    forced = _load_forced_list(audio_path)

    audio, sr = read_wav(audio_path)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)  # downmix; reference assumes mono input
    if sr != session.sr:
        audio = resample(audio, sr, session.sr)
        sr = session.sr
    audio = np.asarray(audio, np.float64)

    base_name = os.path.splitext(os.path.basename(audio_path))[0]
    cache_dir = os.path.join(os.path.dirname(audio_path), ".wfl_cache")
    os.makedirs(cache_dir, exist_ok=True)
    lang_suffix = f"_lang{lang_id}" if lang_id is not None else "_avg"

    if len(audio) > 0:
        audio = peak_normalize(audio, eps=1e-8)

    median_size = session.cfg.median_filter
    if len(audio) / sr > MAX_SEGMENT_DURATION:
        print(f"Audio is too long ({len(audio)/sr:.1f}s), splitting...")
        segments_pred = process_segments(
            session, split_audio(audio, sr), sr, lang_id,
            cache_dir, base_name, confidence_threshold)
    else:
        logit_path = os.path.join(cache_dir,
                                  f"{base_name}{lang_suffix}_logits.pt")
        offset_path = os.path.join(cache_dir,
                                   f"{base_name}{lang_suffix}_offsets.pt")
        logits, offsets = _predict_segment(session, audio, lang_id,
                                           logit_path, offset_path)
        segments_pred = _decode_segment(session, logits, offsets,
                                        confidence_threshold, median_size,
                                        lang_name)

    if session.cfg.merge_segments != "none":
        segments_pred = merge_adjacent_segments(
            segments_pred, mode=session.cfg.merge_segments)

    if forced is not None:
        segments_pred = _apply_forced_alignment(segments_pred, forced)

    if output_lab_path:
        dir_path = os.path.dirname(output_lab_path)
        if dir_path:
            os.makedirs(dir_path, exist_ok=True)
        save_lab(output_lab_path, segments_pred)
        print(f"Predictions saved to: {output_lab_path}")

    return segments_pred


def _load_forced_list(audio_path: str) -> Optional[List[str]]:
    """Forced phoneme list from the sibling .txt (reference infer.py:210-215)."""
    phoneme_txt = audio_path.replace(".wav", ".txt")
    if not os.path.exists(phoneme_txt):
        return None
    forced: List[str] = []
    with open(phoneme_txt, "r", encoding="utf-8") as f:
        for line in f:
            forced.extend(line.strip().split())
    print(f"Loaded forced phoneme list with {len(forced)} phonemes.")
    return forced


def _apply_forced_alignment(segments_pred: List[Segment],
                            forced: List[str]) -> List[Segment]:
    """Forced alignment + SP/AP edge re-attachment (reference infer.py:312-319)."""
    aligned = align_phoneme_list(segments_pred, forced)
    if "SP" not in forced and "AP" not in forced:
        before = [s for s in segments_pred
                  if s[2] in ("SP", "AP") and aligned and s[1] <= aligned[0][0]]
        after = [s for s in segments_pred
                 if s[2] in ("SP", "AP") and aligned and s[0] >= aligned[-1][1]]
        return before + aligned + after
    return aligned


def infer_folder_batched(folder_path: str, config_path: str = "config.yaml",
                         checkpoint_path: str = "best_model.pt",
                         output_dir: str = "outputs",
                         lang_id: Optional[int] = None,
                         confidence_threshold: float = 0.0,
                         batch_files: int = 8,
                         data_parallel: Optional[bool] = None) -> None:
    """Throughput folder mode (TPU addition): ≤30 s files are batched into
    shared bucketed forwards via per-row masks; outputs stay identical to
    per-file inference. Files >30 s fall back to the chunked path; cached
    files skip the forward entirely.

    ``data_parallel``: shard batch rows over all visible devices (params
    replicated, rows on the mesh 'data' axis). Default: on when more than
    one device is visible."""
    if data_parallel is None:
        data_parallel = len(jax.devices()) > 1
    session = _get_session(config_path, checkpoint_path,
                           data_parallel=data_parallel)
    os.makedirs(output_dir, exist_ok=True)
    median_size = session.cfg.median_filter
    lang_suffix = f"_lang{lang_id}" if lang_id is not None else "_avg"
    lang_name = _lang_name_for(session, lang_id)
    if lang_id is not None and (
            lang_id < 0 or (session.lang2id
                            and lang_id > max(session.lang2id.values()))):
        # Same validation as _predict_segment / reference infer.py:257-259 —
        # otherwise jnp.take clamps the embedding gather (negative ids land
        # on language 0) and silently emits wrong labels.
        raise ValueError(f"Language ID {lang_id} is invalid. "
                         f"Available: {session.lang2id}")
    langs = ([lang_id] if lang_id is not None
             else sorted(session.lang2id.values()) or [0])

    def finish(name, segments):
        if session.cfg.merge_segments != "none":
            segments = merge_adjacent_segments(
                segments, mode=session.cfg.merge_segments)
        forced = _load_forced_list(os.path.join(folder_path, name))
        if forced is not None:
            segments = _apply_forced_alignment(segments, forced)
        save_lab(os.path.join(output_dir, name.replace(".wav", ".lab")),
                 segments)

    def flush(group):
        if session.cfg.device_decode:
            # North-star path: per-lang averaging + gate + median + BIO
            # decode all run on device; one transfer returns segment
            # arrays (plus the averaged logits/offsets for .wfl_cache).
            results = session.forward_many_decoded(
                [g[1] for g in group], langs, confidence_threshold,
                median_size)
            for (name, _audio, logit_path, offset_path), \
                    (logits, offsets, segs) in zip(group, results):
                _cache_save(logit_path, logits)
                _cache_save(offset_path, offsets)
                if session.merge_map and lang_name:
                    segs = [(s, e, canonical_to_lang(ph, lang_name,
                                                     session.merge_map))
                            for s, e, ph in segs]
                finish(name, segs)
            return
        results = session.forward_many([g[1] for g in group],
                                       [langs] * len(group))
        for (name, _audio, logit_path, offset_path), (lg, off) in \
                zip(group, results):
            logits = lg.mean(axis=0)
            offsets = off.mean(axis=0)
            _cache_save(logit_path, logits)
            _cache_save(offset_path, offsets)
            finish(name, _decode_segment(session, logits, offsets,
                                         confidence_threshold, median_size,
                                         lang_name))

    # Cache and duration gates run BEFORE any sample decode (warm-cache
    # reruns touch only headers), and each batch_files-sized group flushes
    # as soon as it is full — memory stays bounded at one group of
    # waveforms and I/O overlaps device compute on large folders.
    pending = []  # (name, audio, logit_path, offset_path)
    for name in sorted(f for f in os.listdir(folder_path)
                       if f.lower().endswith(".wav")):
        path = os.path.join(folder_path, name)
        # Duration gate FIRST (header only): a >30 s file must reach the
        # chunked path even if a stale non-chunked cache entry exists from
        # a shorter file that previously had this name — the chunked path
        # uses distinct _seg{idx} cache keys.
        n_samples, sr_hdr = wav_duration(path)   # header only, no decode
        if n_samples / sr_hdr > MAX_SEGMENT_DURATION:
            infer_audio(path, config_path, checkpoint_path,
                        os.path.join(output_dir,
                                     name.replace(".wav", ".lab")),
                        lang_id=lang_id,
                        confidence_threshold=confidence_threshold)
            continue

        cache_dir = os.path.join(folder_path, ".wfl_cache")
        os.makedirs(cache_dir, exist_ok=True)
        base = os.path.splitext(name)[0]
        logit_path = os.path.join(cache_dir,
                                  f"{base}{lang_suffix}_logits.pt")
        offset_path = os.path.join(cache_dir,
                                   f"{base}{lang_suffix}_offsets.pt")
        cached = _squeeze_batch(_cache_load(logit_path))
        if cached is not None:
            finish(name, _decode_segment(
                session, cached, _squeeze_batch(_cache_load(offset_path)),
                confidence_threshold, median_size, lang_name))
            continue

        audio, sr = read_wav(path)
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        if sr != session.sr:
            audio = resample(audio, sr, session.sr)
        if len(audio) > 0:
            audio = peak_normalize(audio, eps=1e-8)
        pending.append((name, np.asarray(audio, np.float32),
                        logit_path, offset_path))
        if len(pending) >= batch_files:
            flush(pending)
            pending = []
    if pending:
        flush(pending)


def infer_folder(folder_path: str, config_path: str = "config.yaml",
                 checkpoint_path: str = "best_model.pt",
                 output_dir: str = "outputs", device: str = "tpu",
                 lang_id: Optional[int] = None, sample: bool = False,
                 top_k: int = 0, top_p: float = 0.0, temperature: float = 1.0,
                 confidence_threshold: float = 0.0) -> None:
    """Folder inference (reference infer.py:330-357)."""
    wav_files = [f for f in os.listdir(folder_path)
                 if f.lower().endswith(".wav")]
    os.makedirs(output_dir, exist_ok=True)

    for wav_file in wav_files:
        print(f"\nInferencing: {wav_file}")
        segments = infer_audio(
            audio_path=os.path.join(folder_path, wav_file),
            config_path=config_path, checkpoint_path=checkpoint_path,
            output_lab_path=os.path.join(output_dir,
                                         wav_file.replace(".wav", ".lab")),
            device=device, lang_id=lang_id, sample=sample, top_k=top_k,
            top_p=top_p, temperature=temperature,
            confidence_threshold=confidence_threshold)
        print("Predicted segments:")
        for start, end, ph in segments:
            print(f"({round(start, 2)}, {round(end, 2)}, {ph})")
