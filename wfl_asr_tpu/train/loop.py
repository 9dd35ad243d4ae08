"""Training driver: jitted train step, validation, checkpoint rotation, TB.

Mirrors the reference ``train.py`` flow (train.py:294-454):

- artifacts from ``save_dir`` (phonemes/dataset/langs/merge map),
- split into train/val by ``num_val_files`` (seeded here; quirk Q9),
- optional finetune surgery: lang-embedding row expansion + classifier
  partial transfer by matching tag names (train.py:334-377),
- optimizer by name — ``Prodigy`` (our optax implementation) or an optax
  optimizer, kwargs filtered by signature (train.py:379-408),
- schedulers stepped per validation (default) or per update, with the
  ReduceLROnPlateau special case (train.py:441-449),
- auto-resume from the latest ``model_step{N}.pt`` (train.py:420-433) —
  plus optimizer-state sidecars the reference never wrote (quirk Q4),
- checkpoint rotation / ``best_model.pt`` / ``last_model.pt``
  (train.py:276-290, 453),
- TB scalars ``train/loss``, ``train/offset_loss``, ``train/learning_rate``,
  ``val/{loss,accuracy,per,ter}`` + prediction figures (train.py:252-262,
  451, 510-542).

TPU architecture: one jitted train step per (audio_len, label_len) bucket —
forward, CE + vectorized sub-frame offset loss, grads, optimizer — with the
segmental term computed host-side as a value-only metric (quirk Q1: it
carries no gradient in the reference either).
"""

from __future__ import annotations

import functools
import inspect
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..checkpoint import (find_resume_checkpoints, load_model_checkpoint,
                          load_train_state, remove_checkpoint,
                          save_model_checkpoint, save_train_state)
from ..config import Config
from ..data.dataset import BatchLoader, PhonemeDataset, split_dataset
from ..labels import (canonical_to_lang, clean_lab, decode_bio_tags,
                      load_langs, load_phoneme_list, load_phoneme_merge_map,
                      merge_adjacent_segments)
from ..metrics import framewise_accuracy, phoneme_error_rate, timing_error_rate
from ..models.tagger import TaggerArch, apply_tagger, init_tagger
from .losses import (cross_entropy, offset_loss, segmental_loss_value,
                     soft_iou_segmental_loss)
from .prodigy import prodigy
from .schedules import get_scheduler


def _median_filter_np(ids: np.ndarray, size: int) -> np.ndarray:
    """Host-side scipy-semantics median filter (symmetric pad, rank
    size//2) for the validation loop: label lengths are exact (unbucketed),
    so the jitted device version would re-trace per distinct length and pay
    the ~32 ms relay dispatch per sample. The serving path keeps the device
    version (ops.postprocess.median_filter_ids) on its static buckets."""
    if size <= 1 or ids.size == 0:
        return ids
    left = size // 2
    padded = np.pad(ids, (left, size - 1 - left), mode="symmetric")
    windows = np.lib.stride_tricks.sliding_window_view(padded, size)
    return np.sort(windows, axis=-1)[:, size // 2]


# ---------------------------------------------------------------------------
# Optimizer factory
# ---------------------------------------------------------------------------

# Name → optax factory. The reference resolves optimizer names by reflection
# over ``pytorch_optimizer`` then ``torch.optim`` (train.py:379-408), so the
# catalog here aliases the common names from BOTH onto their optax
# equivalents (lookup is case-insensitive; kwargs are signature-filtered the
# same way the reference filters by ``__init__`` signature).
_OPTAX_OPTIMIZERS = {
    # torch.optim family
    "adamw": optax.adamw, "adam": optax.adam, "sgd": optax.sgd,
    "adagrad": optax.adagrad, "adadelta": optax.adadelta,
    "rmsprop": optax.rmsprop, "rprop": optax.rprop,
    "nadam": optax.nadam, "nadamw": optax.nadamw, "radam": optax.radam,
    "adamax": optax.adamax, "adamaxw": optax.adamaxw,
    # pytorch_optimizer family
    "lion": optax.lion, "adafactor": optax.adafactor,
    "lamb": optax.lamb, "lars": optax.lars,
    "adabelief": optax.adabelief, "adan": optax.adan,
    "novograd": optax.novograd, "yogi": optax.yogi,
    "fromage": optax.fromage, "amsgrad": optax.amsgrad, "sm3": optax.sm3,
    # (optax.contrib.sophia is excluded: its update needs an obj_fn for the
    # Hutchinson Hessian estimate, which the standard train step can't feed.)
    "dadaptadamw": optax.contrib.dadapt_adamw,
    "ademamix": optax.contrib.ademamix,
    "adopt": optax.contrib.adopt,
}


def make_optimizer(cfg: Config, freeze_encoder_mask=None):
    """Resolve optimizer by name, filtering kwargs by the target signature —
    the reference's behavior (train.py:379-408). Returns an
    ``inject_hyperparams``-wrapped transform with a live ``learning_rate``."""
    name = cfg.optimizer
    params = dict(cfg.optimizer_params)
    if cfg.weight_decay is not None:
        params["weight_decay"] = cfg.weight_decay

    if name.lower() == "prodigy":
        factory = prodigy
    else:
        factory = _OPTAX_OPTIMIZERS.get(name.lower())
        if factory is None:
            raise ValueError(
                f"Optimizer '{name}' not found. Available: Prodigy, "
                f"{sorted(_OPTAX_OPTIMIZERS)}")

    sig = inspect.signature(factory)
    accepted = set(sig.parameters)
    if "betas" in params and "betas" not in accepted:
        # optax spells torch's betas as b1/b2
        if "b1" in accepted:
            params["b1"], params["b2"] = params.pop("betas")
        else:
            params.pop("betas")
    filtered = {k: v for k, v in params.items() if k in accepted}

    def build(learning_rate):
        inner = factory(learning_rate=learning_rate, **filtered)
        if freeze_encoder_mask is not None:
            # stop_gradient already zeroes encoder grads; zeroing the final
            # *updates* additionally keeps optimizer-side weight decay off
            # the frozen weights (requires_grad=False semantics).
            inner = optax.chain(
                inner, optax.masked(optax.set_to_zero(), freeze_encoder_mask))
        return inner

    return optax.inject_hyperparams(build)(learning_rate=cfg.learning_rate)


def encoder_freeze_mask(params):
    """True for leaves under the encoder subtree (to be zeroed when
    freeze_encoder is set — the stop_gradient already makes them zero; the
    mask guards against optimizer-side weight decay touching them)."""
    return {k: (jax.tree_util.tree_map(lambda _: k == "encoder", v)
                if isinstance(v, (dict, list)) else (k == "encoder"))
            for k, v in params.items()}


# ---------------------------------------------------------------------------
# Jitted train / eval steps
# ---------------------------------------------------------------------------

def make_train_step(arch: TaggerArch, label_smoothing: float,
                    subframe_weight: float, tx,
                    compute_dtype=jnp.float32,
                    seg_diff_weight: float = 0.0, mesh=None,
                    sequence_parallel: bool = False,
                    remat: bool = False,
                    pp_microbatches: int = 0,
                    param_shardings=None):
    @functools.partial(jax.jit, static_argnames=("max_label_len",),
                       donate_argnames=("params", "model_state", "opt_state"))
    def train_step(params, model_state, opt_state, rng, audio, labels,
                   lang_ids, off_f, off_c, off_x, off_v,
                   max_label_len: int):
        def loss_fn(p):
            logits, offsets, new_state = apply_tagger(
                p, model_state, arch, audio, lang_ids,
                max_label_len=max_label_len, rng=rng, train=True,
                compute_dtype=compute_dtype, mesh=mesh,
                sequence_parallel=sequence_parallel, remat=remat,
                pp_microbatches=pp_microbatches)
            ce = cross_entropy(logits, labels, label_smoothing)
            ol = offset_loss(offsets, off_f, off_c, off_x, off_v)
            loss = ce + subframe_weight * ol
            if seg_diff_weight:
                # Optional trainable segmental term (the reference's is
                # gradient-dead, quirk Q1): soft-IoU over tag posteriors.
                loss = loss + seg_diff_weight * soft_iou_segmental_loss(
                    logits, labels)
            return loss, (new_state, ce, ol, logits, offsets)

        (loss, (new_state, ce, ol, logits, offsets)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        if param_shardings is not None:
            # FSDP: pin grads to the param shardings so the batch-grad
            # reduction lowers to a reduce-scatter and the optimizer
            # update runs per-shard (ZeRO update partitioning).
            grads = jax.lax.with_sharding_constraint(grads, param_shardings)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        pred_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        metrics = {"loss": loss, "ce": ce, "offset_loss": ol}
        return new_params, new_state, new_opt_state, metrics, pred_ids, offsets

    return train_step


def make_grad_step(arch: TaggerArch, label_smoothing: float,
                   subframe_weight: float, compute_dtype=jnp.float32,
                   seg_diff_weight: float = 0.0, mesh=None,
                   sequence_parallel: bool = False,
                   remat: bool = False,
                   pp_microbatches: int = 0,
                   param_shardings=None):
    """Micro-batch gradient computation for gradient accumulation
    (training.grad_accumulation > 1): same loss as make_train_step but
    returns grads instead of applying them. Params are NOT donated (reused
    across micro-batches)."""
    @functools.partial(jax.jit, static_argnames=("max_label_len",),
                       donate_argnames=("model_state",))
    def grad_step(params, model_state, rng, audio, labels,
                  lang_ids, off_f, off_c, off_x, off_v,
                  max_label_len: int):
        def loss_fn(p):
            logits, offsets, new_state = apply_tagger(
                p, model_state, arch, audio, lang_ids,
                max_label_len=max_label_len, rng=rng, train=True,
                compute_dtype=compute_dtype, mesh=mesh,
                sequence_parallel=sequence_parallel, remat=remat,
                pp_microbatches=pp_microbatches)
            ce = cross_entropy(logits, labels, label_smoothing)
            ol = offset_loss(offsets, off_f, off_c, off_x, off_v)
            loss = ce + subframe_weight * ol
            if seg_diff_weight:
                loss = loss + seg_diff_weight * soft_iou_segmental_loss(
                    logits, labels)
            return loss, (new_state, ce, ol, logits, offsets)

        (loss, (new_state, ce, ol, logits, offsets)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        if param_shardings is not None:
            # FSDP: reduce-scatter each micro-batch's grads so the f32
            # accumulator stays sharded like the params it will update.
            grads = jax.lax.with_sharding_constraint(grads, param_shardings)
        pred_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        metrics = {"loss": loss, "ce": ce, "offset_loss": ol}
        return grads, new_state, metrics, pred_ids, offsets

    return grad_step


def make_accum_apply(tx):
    """Average accumulated grads and apply one optimizer update."""
    @functools.partial(jax.jit, static_argnames=("n_micro",),
                       donate_argnames=("params", "opt_state", "grad_sum"))
    def apply_step(params, opt_state, grad_sum, n_micro: int):
        grads = jax.tree_util.tree_map(lambda g: g / n_micro, grad_sum)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state

    return apply_step


def _looks_like_hbm_oom(e: BaseException) -> bool:
    """Explicit OOM matcher for the remat-auto fallback: XLA:TPU reports
    RESOURCE_EXHAUSTED / 'Ran out of memory in memory space hbm' at
    compile time (allocation is static)."""
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s
            or "Allocation failure" in s)


def _opaque_compile_error(e: BaseException) -> bool:
    """The axon relay used in this environment hides the compile-failure
    cause behind an opaque 'remote_compile ... HTTP 500' INTERNAL error
    (the OOM detail only reaches the server log — measured,
    docs/TPU_RUNS_r05_capacity.log). Possibly-OOM, possibly a transient
    relay blip — AutoRematStep retries the ORIGINAL build once before
    concluding OOM."""
    s = str(e)
    return "remote_compile" in s and "HTTP 500" in s


def _args_deleted(args, kwargs) -> bool:
    """True if any jax.Array argument was already consumed (donated
    buffers are invalidated at dispatch; a compile-time failure leaves
    them alive — the case the remat-auto retry relies on)."""
    for a in jax.tree_util.tree_leaves((args, kwargs)):
        if isinstance(a, jax.Array) and a.is_deleted():
            return True
    return False


class AutoRematStep:
    """``training.remat: auto`` — run the (~7% faster, measured) non-remat
    step; on a compile-time HBM OOM rebuild with gradient checkpointing
    and retry. Safe to retry because XLA:TPU memory failures happen at
    compile, before donated input buffers are consumed — and verified:
    if the failure consumed any donated argument (an execution-time
    error), the original error propagates instead of a retry on deleted
    arrays. On the relay's opaque HTTP-500 signature the ORIGINAL build
    is retried once first, so a transient relay blip doesn't permanently
    flip a run that never needed remat. The fallback can trigger on any
    jitted shape (bucketed batches retrace per shape); once it flips,
    remat stays on for every later shape. ``on_flip`` (optional callback)
    fires at the flip so the driver can record it in the run's metrics
    log."""

    def __init__(self, build, on_flip=None):
        self._build = build          # build(remat: bool) -> jitted step
        self._fn = build(False)
        self._on_flip = on_flip
        self.remat = False

    def __call__(self, *args, **kwargs):
        try:
            return self._fn(*args, **kwargs)
        except Exception as e:                  # noqa: BLE001 — re-raised
            opaque = _opaque_compile_error(e)
            if self.remat or not (opaque or _looks_like_hbm_oom(e)):
                raise
            if _args_deleted(args, kwargs):
                print("[WARN] training.remat: auto cannot retry — the "
                      "failure consumed donated input buffers "
                      "(execution-time, not compile-time); re-raising",
                      flush=True)
                raise
            if opaque:
                # could be a relay blip, not OOM: same build, one retry
                try:
                    return self._fn(*args, **kwargs)
                except Exception as e2:         # noqa: BLE001 — re-raised
                    if not (_opaque_compile_error(e2)
                            or _looks_like_hbm_oom(e2)):
                        raise
                    if _args_deleted(args, kwargs):
                        raise
            print("[WARN] train step failed to fit HBM "
                  f"({type(e).__name__}); retrying with gradient "
                  "checkpointing (training.remat: auto)", flush=True)
            self._fn = self._build(True)
            self.remat = True
            if self._on_flip is not None:
                self._on_flip()
            return self._fn(*args, **kwargs)


@functools.partial(jax.jit, donate_argnames=("grad_sum",))
def _accumulate_grads(grad_sum, grads):
    """f32 running sum of micro-batch gradients (donated accumulator).

    Works on any pytree — the train loop passes (grads, metrics) as ONE
    tree so each micro-batch costs a single extra dispatch (the relay adds
    ~32 ms per jitted call; eager per-metric adds would cost three)."""
    return jax.tree_util.tree_map(
        lambda a, g: a + g.astype(a.dtype), grad_sum, grads)


def make_eval_step(arch: TaggerArch, label_smoothing: float, mesh=None,
                   sequence_parallel: bool = False,
                   pp_microbatches: int = 0):
    @functools.partial(jax.jit, static_argnames=("max_label_len",))
    def eval_step(params, model_state, audio, labels, lang_ids,
                  max_label_len: int):
        logits, offsets, _ = apply_tagger(
            params, model_state, arch, audio, lang_ids,
            max_label_len=max_label_len, train=False, mesh=mesh,
            sequence_parallel=sequence_parallel,
            pp_microbatches=pp_microbatches)
        ce = cross_entropy(logits, labels, label_smoothing)
        pred_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return ce, pred_ids, offsets

    return eval_step


# ---------------------------------------------------------------------------
# Finetune surgery
# ---------------------------------------------------------------------------

def finetune_surgery(params, state, arch: TaggerArch, cfg: Config,
                     label_list, rng) -> tuple:
    """Load a base checkpoint, expand the language embedding, transfer
    classifier rows by matching tag names (reference train.py:334-377)."""
    base_path = cfg.finetuning_model_path
    if not base_path or not os.path.exists(base_path):
        return params, state
    print(f"[INFO] Loading finetune base model: {base_path}")

    base_phoneme_path = base_path.replace("best_model.pt", "phonemes.txt")
    if not os.path.exists(base_phoneme_path):
        raise RuntimeError(
            f"Missing phoneme list for base model: {base_phoneme_path}")
    old_label_list = load_phoneme_list(base_phoneme_path)

    import dataclasses
    base_arch = dataclasses.replace(arch, num_labels=len(old_label_list))
    # The base checkpoint may have fewer languages; detect from the weights.
    import torch
    sd = torch.load(base_path, map_location="cpu", weights_only=True)
    old_langs = sd["lang_emb.weight"].shape[0]
    base_arch = dataclasses.replace(base_arch, num_languages=old_langs)
    base_params, base_state = load_model_checkpoint(base_path, base_arch)

    new_langs = arch.num_languages
    if new_langs > old_langs:
        print(f"[INFO] Expanding lang_emb from {old_langs} -> {new_langs}")
        old_emb = np.asarray(base_params["lang"]["emb"]["w"])
        grown = np.concatenate([
            old_emb,
            0.01 * np.asarray(jax.random.normal(
                rng, (new_langs - old_langs, old_emb.shape[1])))], axis=0)
        base_params["lang"]["emb"]["w"] = jnp.asarray(grown)

    old_label2id = {l: i for i, l in enumerate(old_label_list)}
    new_label2id = {l: i for i, l in enumerate(label_list)}
    print(f"[INFO] Attempting partial reuse of classifier weights: "
          f"{len(old_label_list)} -> {len(label_list)}")
    new_w = np.asarray(params["classifier"]["w"]).copy()
    new_b = np.asarray(params["classifier"]["b"]).copy()
    old_w = np.asarray(base_params["classifier"]["w"])
    old_b = np.asarray(base_params["classifier"]["b"])
    matched = 0
    for label in old_label_list:
        if label in new_label2id:
            new_w[:, new_label2id[label]] = old_w[:, old_label2id[label]]
            new_b[new_label2id[label]] = old_b[old_label2id[label]]
            matched += 1
    print(f"[INFO] Transferred weights for {matched} matching phoneme tags")

    base_params["classifier"] = {"w": jnp.asarray(new_w),
                                 "b": jnp.asarray(new_b)}
    return base_params, base_state


# ---------------------------------------------------------------------------
# Validation / evaluate
# ---------------------------------------------------------------------------

def evaluate(params, model_state, arch: TaggerArch, eval_step, val_loader,
             label_list, cfg: Config, writer, step: int, id2lang,
             merge_map=None, mesh=None, cross_host: bool = False) -> float:
    """Reference evaluate() (train.py:456-545): CE, frame accuracy, PER, TER,
    median-filtered decode, merged segments, first-N prediction figures.

    ``cross_host``: sharded multi-host validation — ``val_loader`` holds
    only this process's shard of the val set; local sums are allgathered
    and reduced so every host derives IDENTICAL global metrics (schedulers
    stay in sync by construction). The loss becomes the token-weighted CE
    over the global val set (invariant to how samples land on hosts or in
    batches), vs the single-host mode's reference-parity mean of batch
    means. Prediction figures cover only process 0's shard."""
    id2label = {i: l for i, l in enumerate(label_list)}
    median_size = cfg.median_filter
    merge_mode = cfg.merge_segments
    frame_duration = cfg.frame_duration

    val_losses, total_acc, total_per, total_ter, count = [], 0.0, 0.0, 0.0, 0
    loss_tok_sum, tok_count = 0.0, 0.0
    vis_limit = cfg.num_vis_samples

    for batch in val_loader.epoch_batches(epoch=0):
        n_real = len(batch["label_lengths"])
        if mesh is not None:
            # Pad rows to a 'data'-axis multiple (shard_map kernels need
            # divisibility); padded rows use labels −100 so the CE mean is
            # unchanged, and their decodes are never read back.
            from ..parallel import shard_batch
            arrays = shard_batch(
                {k: batch[k] for k in ("audio", "labels", "lang_ids")},
                mesh, pad_value_map={"labels": -100})
        else:
            arrays = {k: jnp.asarray(batch[k])
                      for k in ("audio", "labels", "lang_ids")}
        ce, pred_ids, offsets = eval_step(
            params, model_state, arrays["audio"], arrays["labels"],
            arrays["lang_ids"], max_label_len=batch["max_label_len"])
        val_losses.append(float(ce))
        pred_ids = np.asarray(pred_ids)
        offsets = np.asarray(offsets)
        labels_np = np.asarray(batch["labels"])
        if cross_host:
            # token-weighted sums: the CE is a mean over valid (!= -100)
            # positions, so ce × n_tokens is exactly recomposable across
            # any batching/sharding of the same samples.
            n_tok = float((labels_np[:n_real] != -100).sum())
            loss_tok_sum += float(ce) * n_tok
            tok_count += n_tok

        for j in range(n_real):
            label_len = int(batch["label_lengths"][j])
            ids = pred_ids[j, :label_len]
            if median_size > 1:
                ids = _median_filter_np(ids, median_size)
            tags = [id2label[int(p)] for p in ids]
            segs_pred = decode_bio_tags(tags, frame_duration=frame_duration,
                                        offsets=offsets[j, :label_len])
            if merge_mode != "none":
                segs_pred = merge_adjacent_segments(segs_pred, mode=merge_mode)

            segs_gt = batch["segments_gt"][j]
            if isinstance(segs_gt, list) and len(segs_gt) == 1 \
                    and isinstance(segs_gt[0], list):
                segs_gt = segs_gt[0]

            total_acc += framewise_accuracy(pred_ids[j, :label_len],
                                            labels_np[j, :label_len])
            total_per += phoneme_error_rate(segs_pred, segs_gt)
            total_ter += timing_error_rate(segs_pred, segs_gt)
            count += 1

            if writer is not None and count <= vis_limit:
                from ..utils.viz import visualize_prediction
                lang_name = id2lang.get(int(batch["lang_ids"][j]))
                vis_pred, vis_gt = segs_pred, segs_gt
                if merge_map and lang_name:
                    vis_pred = [(s, e, canonical_to_lang(ph, lang_name,
                                                         merge_map))
                                for s, e, ph in segs_pred]
                    vis_gt = [(s, e, canonical_to_lang(clean_lab(ph),
                                                       lang_name, merge_map))
                              for s, e, ph in segs_gt]
                fig = visualize_prediction(batch["wavs"][j], cfg.sample_rate,
                                           vis_pred, vis_gt)
                writer.add_figure(f"val/prediction_{count}_{j}", fig,
                                  global_step=step)

    if cross_host:
        # Sum the per-host metric sums over all processes; every host
        # computes the same global metrics from the same gathered array.
        # (f32 transfer: token counts are exact in f32 up to 2^24 —
        # far beyond any val-set size at val cadence.)
        from jax.experimental import multihost_utils
        local = np.array([loss_tok_sum, tok_count, total_acc, total_per,
                          total_ter, float(count)], np.float32)
        gathered = np.asarray(multihost_utils.process_allgather(local))
        sums = gathered.sum(axis=0)
        loss_tok_sum, tok_count = float(sums[0]), float(sums[1])
        total_acc, total_per, total_ter = (float(sums[2]), float(sums[3]),
                                           float(sums[4]))
        count = int(round(float(sums[5])))
        avg_loss = loss_tok_sum / tok_count if tok_count else 0.0
    else:
        avg_loss = float(np.mean(val_losses)) if val_losses else 0.0
    avg_acc = total_acc / count if count else 0.0
    avg_per = total_per / count if count else 0.0
    avg_ter = total_ter / count if count else 0.0
    if writer is not None:
        writer.add_scalar("val/loss", avg_loss, step)
        writer.add_scalar("val/accuracy", avg_acc, step)
        writer.add_scalar("val/per", avg_per, step)
        writer.add_scalar("val/ter", avg_ter, step)
    print(f"\n[Validation] Loss: {avg_loss:.4f} | Acc: {avg_acc*100:.2f}% | "
          f"PER: {avg_per:.3f} | TER: {avg_ter:.3f}")
    return avg_loss


# ---------------------------------------------------------------------------
# Train driver
# ---------------------------------------------------------------------------

def train(config_path: str = "config.yaml",
          segmental_metric: bool = True):
    # Multi-host launches (TPU pods / multi-slice): join the cluster before
    # any device query; single-host runs no-op (guard in parallel/mesh.py).
    from ..parallel import maybe_initialize_distributed
    maybe_initialize_distributed()
    cfg = Config.load(config_path)
    save_dir = cfg.save_dir
    os.makedirs(save_dir, exist_ok=True)

    ckpt_fmt = str(cfg.raw.get("output", {}).get("checkpoint_format", "pt"))
    label_list = load_phoneme_list(os.path.join(save_dir, "phonemes.txt"))
    dataset = PhonemeDataset(os.path.join(save_dir, "dataset.json"),
                             label_list, cfg.max_seq_len, cfg.augmentation,
                             cfg.sample_rate)
    lang2id = load_langs(os.path.join(save_dir, "langs.txt"))
    id2lang = {i: l for l, i in lang2id.items()}
    merge_map_path = os.path.join(save_dir, "phoneme_merge_map.json")
    merge_map = load_phoneme_merge_map(merge_map_path)

    train_idx, val_idx = split_dataset(len(dataset), cfg.num_val_files,
                                       cfg.seed)
    if not train_idx:
        # The reference's random_split raises on a negative train count
        # (train.py:319-321); without this check the step loop would spin
        # forever on an empty loader.
        raise ValueError(
            f"num_val_files={cfg.num_val_files} leaves no training samples "
            f"(dataset has {len(dataset)})")

    # --- multi-host input feeding: each process loads a disjoint equal
    # shard of the (seeded-shuffled) train files and a per-process slice of
    # the global batch; collate shapes pin to dataset-wide maxima so every
    # host emits identical static shapes (shard_batch assembles the global
    # sharded array from the local rows). Validation/checkpointing run on
    # the full val set per host with LOCAL compute — identical inputs give
    # identical metrics everywhere (schedulers stay in sync, plateau
    # included); only process 0 writes files.
    pcount = jax.process_count()
    pidx = jax.process_index()
    local_bs = cfg.batch_size
    fixed_audio = fixed_label = fixed_targets = 0
    if pcount > 1:
        from ..data.dataset import shard_indices_for_process
        if cfg.batch_size % pcount:
            raise ValueError(
                f"batch_size {cfg.batch_size} (global) must be divisible "
                f"by the {pcount} processes")
        local_bs = cfg.batch_size // pcount
        train_idx = shard_indices_for_process(train_idx, pidx, pcount)
        fixed_audio, fixed_label, fixed_targets = \
            dataset.global_max_lengths()
        print(f"[INFO] Multi-host input: process {pidx}/{pcount}, "
              f"{len(train_idx)} files, local batch {local_bs}, "
              f"pinned shapes (audio {fixed_audio}, labels {fixed_label}, "
              f"targets {fixed_targets})")
    train_loader = BatchLoader(dataset, train_idx, local_bs,
                               seed=cfg.seed, shuffle=True,
                               frame_duration=cfg.frame_duration,
                               drop_last=pcount > 1,
                               fixed_audio_len=fixed_audio,
                               fixed_label_len=fixed_label,
                               fixed_targets_len=fixed_targets)
    # training.sharded_validation: instead of every host evaluating the
    # FULL val set (default — zero cross-host traffic, O(hosts) redundant
    # compute), partition the val set across processes and allgather-sum
    # the metric sums (evaluate(cross_host=True)). Global metrics are
    # identical on every host by construction, so schedulers stay in sync;
    # eval compute scales 1/hosts. Worth it at pod scale.
    sharded_val = pcount > 1 and bool(
        cfg.raw.get("training", {}).get("sharded_validation", False))
    val_idx_local = val_idx[pidx::pcount] if sharded_val else val_idx
    if sharded_val:
        print(f"[INFO] Sharded validation: process {pidx} evaluates "
              f"{len(val_idx_local)}/{len(val_idx)} val files")
    val_loader = BatchLoader(dataset, val_idx_local, cfg.batch_size,
                             seed=cfg.seed, shuffle=False,
                             frame_duration=cfg.frame_duration)

    arch = TaggerArch.from_config(cfg, len(label_list))

    # --- data/model parallelism over all visible devices (XLA collectives
    # over ICI; SURVEY.md §2 "Parallelism"). Enabled automatically with >1
    # device unless training.data_parallel is false. Created before the
    # step functions: the Pallas kernels need the mesh for shard_map.
    n_devices = len(jax.devices())
    model_parallel = int(
        cfg.raw.get("training", {}).get("model_parallel", 1))
    # training.sequence_parallel: shard encoder activations' time axis over
    # the 'model' mesh axis between layers (Megatron-SP, parallel/sp.py).
    # Only meaningful with model_parallel > 1; no-op otherwise.
    sequence_parallel = bool(
        cfg.raw.get("training", {}).get("sequence_parallel", False))
    if sequence_parallel and model_parallel <= 1:
        print("[WARN] training.sequence_parallel ignored: it shards the "
              "time axis over the 'model' mesh axis, which requires "
              "training.model_parallel > 1")
        sequence_parallel = False
    # training.remat (alias: gradient_checkpointing): wrap every encoder
    # transformer layer in jax.checkpoint — backward-pass activation
    # residency drops from O(layers) to O(1) layers at ~1/3 extra encoder
    # FLOPs, the standard deep-encoder memory lever on TPU. Bit-identical
    # numerics (tests/test_remat.py).
    # Accepts true/false or "auto": auto tries the (~7% faster) non-remat
    # step first and falls back to remat on a compile-time HBM OOM
    # (AutoRematStep) — e.g. wavlm-large B=8×30 s fits only with remat
    # while B=4 no longer needs it (docs/TPU_RUNS_r05_capacity.log).
    tsec = cfg.raw.get("training", {})
    remat_raw = tsec.get("remat", tsec.get("gradient_checkpointing", False))
    remat_auto = (isinstance(remat_raw, str)
                  and remat_raw.strip().lower() == "auto")
    remat = False if remat_auto else bool(remat_raw)
    if remat:
        print("[INFO] Gradient checkpointing (remat) on encoder layers")
    elif remat_auto:
        if pcount > 1:
            # the flip is a process-local decision; one host flipping
            # while peers don't would run structurally different programs
            # and deadlock the next collective (same divergence class the
            # resume-decision broadcast guards against).
            raise ValueError(
                "training.remat: auto is single-host only (the OOM "
                "fallback would desynchronize compiled programs across "
                "hosts); set training.remat true/false explicitly")
        print("[INFO] training.remat: auto — gradient checkpointing will "
              "engage only if the train step overflows HBM")
    # training.pipeline_parallel: S — GPipe the encoder transformer stack
    # over a ('data','stage') mesh (parallel/pp.py). Each stage holds
    # layers/S of the encoder; composes with DP on 'data'. Mutually
    # exclusive with TP (different reserved mesh axes).
    pipeline_parallel = int(tsec.get("pipeline_parallel", 1))
    # training.pp_microbatches: GPipe microbatch count M (bubble fraction
    # (S-1)/(M+S-1)); 0 = one row-group per data shard. Larger M shrinks
    # the pipeline bubble at smaller per-tick matmuls.
    pp_microbatches = int(tsec.get("pp_microbatches", 0))
    if pipeline_parallel > 1:
        if model_parallel > 1:
            raise ValueError("training.pipeline_parallel and "
                             "training.model_parallel are mutually "
                             "exclusive (different mesh layouts)")
        if pcount > 1:
            raise ValueError(
                "pipeline_parallel > 1 is not supported across hosts: "
                "checkpointing needs locally-addressable stages. Use data "
                "parallelism across hosts and PP within one host.")
        if arch.encoder_type not in ("wavlm", "whisper"):
            raise ValueError("training.pipeline_parallel needs a layered "
                             "encoder (wavlm or whisper)")
    # training.fsdp: ZeRO-3-style fully-sharded data parallelism — params
    # AND optimizer state shard over 'data' (parallel/fsdp.py). GSPMD
    # all-gathers weights per layer on demand and reduce-scatters grads;
    # per-device params+moments residency drops ~data-axis-fold (Prodigy
    # keeps three param-sized slots, so this is the big-model lever).
    fsdp = bool(tsec.get("fsdp", False))
    if fsdp:
        if model_parallel > 1 or pipeline_parallel > 1:
            raise ValueError(
                "training.fsdp is mutually exclusive with model_parallel/"
                "pipeline_parallel (different parameter placements)")
        if pcount > 1:
            raise ValueError(
                "training.fsdp is not supported across hosts: validation/"
                "checkpointing need locally-addressable parameters. Use "
                "plain data parallelism across hosts and FSDP within one.")
        if n_devices <= 1:
            print("[WARN] training.fsdp ignored: single visible device")
            fsdp = False
    use_mesh = n_devices > 1 and (model_parallel > 1
                                  or pipeline_parallel > 1 or fsdp or bool(
        cfg.raw.get("training", {}).get("data_parallel", True)))
    mesh = None
    if use_mesh:
        from ..parallel import make_mesh
        if pcount > 1 and model_parallel > 1:
            raise ValueError(
                "model_parallel > 1 is not supported across hosts: "
                "validation/checkpointing need locally-addressable "
                "(replicated) parameters. Use data parallelism across "
                "hosts and TP within one host.")
        if pipeline_parallel > 1:
            from ..parallel import pp as ppmod
            mesh = ppmod.make_pp_mesh(pipeline_parallel)
        else:
            mesh = make_mesh(model_parallel=model_parallel)
        data_size = mesh.shape["data"]
        if cfg.batch_size % data_size != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the "
                f"{data_size}-way data axis")
        print(f"[INFO] Parallel over {n_devices} devices "
              f"(mesh {dict(mesh.shape)})")
    elif pipeline_parallel > 1:
        raise ValueError("training.pipeline_parallel needs multiple "
                         "visible devices")

    if jax.devices()[0].platform == "tpu":
        # Differentiable Pallas flash attention for every encoder flavor
        # (measured: whisper-base train step 178 ms vs 191 ms XLA at
        # B=8×30 s). The WavLM kernel carries the gated relative-bias
        # gradients (dBias/dGate) through its custom VJP, so the flagship
        # encoder trains without materializing [B,H,T,T] score tensors.
        # On a mesh the kernels run per-shard under shard_map (batch on
        # 'data', heads on 'model'; replicated-input cotangents like dBias
        # are psum'd by shard_map's AD) — no more pure-XLA fallback.
        import dataclasses
        arch = dataclasses.replace(arch, use_flash_attention=True)
        # strict_attention_dropout composes with flash: the prob-level
        # dropout runs IN-KERNEL (ops/pallas/dropout_mask.py), so strict
        # training keeps the flash path's memory ceiling.
        if arch.whisper is not None:
            arch = dataclasses.replace(arch, whisper=dataclasses.replace(
                arch.whisper, use_flash_attention=True))
        if arch.wavlm is not None:
            # freeze_encoder: no gradient flows through the feature
            # encoder (stop_gradient), so the forward-only fused conv
            # chains are safe to use in training too.
            arch = dataclasses.replace(arch, wavlm=dataclasses.replace(
                arch.wavlm, use_flash_attention=True,
                use_fused_conv=arch.freeze_encoder))
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng, ft_rng = jax.random.split(rng, 3)
    params, model_state = init_tagger(init_rng, arch)

    if cfg.finetuning_enable:
        params, model_state = finetune_surgery(params, model_state, arch,
                                               cfg, label_list, ft_rng)

    def _stack_encoder(p):
        # PP: the encoder's layer list becomes one [L]-leading stacked
        # pytree (parallel/pp.py) — done BEFORE tx.init so the optimizer
        # state mirrors the stacked tree (and the train-state sidecars
        # are saved/restored in stacked form; the torch-format model
        # checkpoints stay canonical/unstacked via _ckpt_view below).
        from ..parallel import pp as _pp
        p = dict(p)
        enc = dict(p["encoder"])
        enc["layers"] = _pp.stack_layers(enc["layers"])
        p["encoder"] = enc
        return p

    if pipeline_parallel > 1:
        params = _stack_encoder(params)

    mask = encoder_freeze_mask(params) if (arch.freeze_encoder and
                                           "encoder" in params) else None
    tx = make_optimizer(cfg, mask)
    opt_state = tx.init(params)

    base_lr = cfg.learning_rate
    scheduler = get_scheduler(cfg.scheduler, cfg.scheduler_params,
                              base_lr=base_lr)

    try:
        from tensorboardX import SummaryWriter
        # one writer per run: non-zero processes would clobber the same dir
        writer = SummaryWriter(cfg.log_dir) if pidx == 0 else None
    except ImportError:
        writer = None

    # Structured metrics log (observability beyond TB — SURVEY.md §5 notes
    # the reference has none): one JSON object per train/val event.
    import json as _json
    os.makedirs(cfg.log_dir, exist_ok=True)
    metrics_log = (open(os.path.join(cfg.log_dir, "metrics.jsonl"), "a")
                   if pidx == 0 else open(os.devnull, "w"))

    def log_event(kind: str, step_: int, **fields):
        metrics_log.write(_json.dumps(
            {"event": kind, "step": step_, "time": time.time(), **fields})
            + "\n")
        metrics_log.flush()

    compute_dtype = jnp.bfloat16 if str(
        cfg.raw.get("training", {}).get("compute_dtype", "float32")) \
        in ("bfloat16", "bf16") else jnp.float32
    # FSDP: an explicit sharding constraint on the gradients turns the
    # batch-grad reduction into a reduce-scatter (each device updates only
    # its own parameter shard — ZeRO's update partitioning). Shape-driven,
    # so it matches however params were (re)loaded.
    param_shardings = None
    if fsdp and mesh is not None:
        from ..parallel.fsdp import fsdp_shardings
        param_shardings = fsdp_shardings(params, mesh)
        print(f"[INFO] FSDP: params + optimizer state sharded over the "
              f"{mesh.shape['data']}-way data axis")
    def _build_train_step(remat_flag):
        return make_train_step(
            arch, cfg.label_smoothing, cfg.subframe_loss_weight, tx,
            compute_dtype=compute_dtype,
            seg_diff_weight=cfg.differentiable_segmental_weight, mesh=mesh,
            sequence_parallel=sequence_parallel, remat=remat_flag,
            pp_microbatches=pp_microbatches,
            param_shardings=param_shardings)

    def _log_remat_flip():
        # visible in the run record, not just stdout: a flipped run
        # trains ~7% slower and the metrics log should say why.
        log_event("remat_auto_flip", step, remat=True)

    train_step = (AutoRematStep(_build_train_step, on_flip=_log_remat_flip)
                  if remat_auto else _build_train_step(remat))
    eval_step = make_eval_step(arch, cfg.label_smoothing, mesh=mesh,
                               sequence_parallel=sequence_parallel,
                               pp_microbatches=pp_microbatches)
    # Multi-host: every process evaluates the FULL val set with local
    # compute on the (replicated → locally addressable) params. Identical
    # inputs → identical metrics on every host, so schedulers that consume
    # val_loss stay in sync with no cross-host broadcast.
    eval_step_local = (make_eval_step(arch, cfg.label_smoothing, mesh=None)
                       if pcount > 1 else None)
    # training.grad_accumulation: N micro-batches per optimizer update
    # (effective batch = N × batch_size; torch-convention semantics —
    # the applied gradient is the mean of per-micro-batch mean-loss
    # gradients, and `step`/scheduler count optimizer UPDATES). N == 1
    # keeps the fused single-step path untouched.
    accum_steps = int(cfg.raw.get("training", {}).get(
        "grad_accumulation", 1))
    if accum_steps > 1:
        def _build_grad_step(remat_flag):
            return make_grad_step(
                arch, cfg.label_smoothing, cfg.subframe_loss_weight,
                compute_dtype=compute_dtype,
                seg_diff_weight=cfg.differentiable_segmental_weight,
                mesh=mesh, sequence_parallel=sequence_parallel,
                remat=remat_flag, pp_microbatches=pp_microbatches,
                param_shardings=param_shardings)

        grad_step = (AutoRematStep(_build_grad_step,
                                   on_flip=_log_remat_flip)
                     if remat_auto else _build_grad_step(remat))
        apply_step = make_accum_apply(tx)
        print(f"[INFO] Gradient accumulation: {accum_steps} micro-batches "
              f"per update (effective batch "
              f"{accum_steps * cfg.batch_size})")

    step = 0
    best_loss = float("inf")
    checkpoint_paths = []

    if mesh is not None:
        train_loader.drop_last = True

    # Newest checkpoint first, falling back past unreadable ones: a kill
    # mid-save (pre-atomic-write files, torn disks) must degrade to the
    # previous checkpoint — not poison every restart (SURVEY §5 auto-resume).
    # But if checkpoints exist and NONE load (arch/config mismatch, not a
    # torn file), abort instead of silently restarting from scratch — a
    # fresh run's first validation would overwrite best_model.pt.
    resume = None
    candidates = find_resume_checkpoints(save_dir)
    errors = []
    import pickle
    import zipfile
    # Corruption (torn/truncated file from a crash mid-save) degrades to the
    # previous checkpoint; a STRUCTURAL mismatch (missing/mismatched keys —
    # the arch or head config changed) aborts immediately: falling back to
    # an older checkpoint that happens to still load would silently resume
    # from stale weights and re-overwrite the newer checkpoints.
    _corruption = (EOFError, pickle.UnpicklingError, zipfile.BadZipFile,
                   ValueError, OSError, RuntimeError)
    for cand_path, cand_step in candidates:
        try:
            params, model_state = load_model_checkpoint(cand_path, arch)
            if pipeline_parallel > 1:
                params = _stack_encoder(params)
            resume = (cand_path, cand_step)
            break
        except _corruption as e:  # truncated/corrupt file
            print(f"[WARN] Skipping unreadable checkpoint "
                  f"{os.path.basename(cand_path)}: {e}")
            errors.append(e)
        except KeyError as e:
            raise RuntimeError(
                f"Checkpoint {os.path.basename(cand_path)} is readable but "
                f"does not match the configured model (missing {e}). If the "
                "model config changed, point output.save_dir at a fresh "
                "directory instead of resuming over the old run.") from e
    if resume is None and candidates:
        raise RuntimeError(
            f"{len(candidates)} checkpoint(s) found in {save_dir} but none "
            f"could be loaded (last error: {errors[-1]}). If the model "
            "config changed, point output.save_dir at a fresh directory; "
            "delete the unreadable files to deliberately restart.")
    if resume is not None:
        ckpt_path, ckpt_step = resume
        step = ckpt_step
        print(f"Resuming from checkpoint: {os.path.basename(ckpt_path)} "
              f"(step {step})")
        try:
            restored = load_train_state(ckpt_path, opt_state)
        except Exception as e:
            print(f"[WARN] Unreadable train-state sidecar, starting "
                  f"optimizer fresh: {e}")
            restored = None
        if restored is not None:
            opt_state, _, rng_np, sched_state = restored
            rng = jnp.asarray(rng_np)
            print("[INFO] Restored optimizer state from sidecar")
            if sched_state:
                scheduler.load_state_dict(sched_state)
                print("[INFO] Restored scheduler state from sidecar")
        else:
            # No sidecar (reference-written checkpoint, or deleted): the
            # optimizer must re-anchor to the LOADED params — Prodigy's p0
            # initial-point reference in particular would otherwise point
            # at the discarded random init and mis-adapt d.
            opt_state = tx.init(params)
        # best_loss intentionally resets to inf on resume — reference
        # behavior (quirk Q4, train.py:432-433).
        # Rotation list: the already-discovered candidates, oldest→newest,
        # capped at max_checkpoints (same filename contract as discovery).
        checkpoint_paths = [p for p, _ in
                            sorted(candidates, key=lambda c: c[1])
                            ][-cfg.max_checkpoints:]
    else:
        print("Training start")

    if pcount > 1:
        # Only process 0 writes checkpoints, but every process scans its
        # own view of save_dir — without a shared filesystem the hosts can
        # disagree on the resume point, giving different while-loop trip
        # counts and a collective desync/hang. Assert agreement with
        # process 0's decision and fail fast (the save_dir must be shared
        # or synced across hosts).
        from jax.experimental import multihost_utils
        local_decision = np.array(
            [step, 1 if resume is not None else 0], np.int64)
        lead_decision = multihost_utils.broadcast_one_to_all(local_decision)
        if not np.array_equal(local_decision, lead_decision):
            raise RuntimeError(
                f"Multi-host resume desync: process {pidx} sees "
                f"(step={int(local_decision[0])}, "
                f"found={int(local_decision[1])}) but process 0 decided "
                f"(step={int(lead_decision[0])}, "
                f"found={int(lead_decision[1])}). output.save_dir must be "
                "a shared (or fully synced) filesystem so every host "
                "resumes from the same checkpoint.")

    if mesh is not None:
        from ..parallel import replicate, shard_params_tp, tp_shardings
        if pipeline_parallel > 1:
            # Stacked encoder layers shard their leading (layer) axis over
            # 'stage'; everything else — heads, optimizer moments of the
            # heads — replicates. The optimizer moments of the stacked
            # layers follow the same path rule (pp_shardings).
            from ..parallel import pp as ppmod
            params = ppmod.shard_params_pp(params, mesh)
            opt_state = jax.tree_util.tree_map(
                jax.device_put, opt_state, ppmod.pp_shardings(opt_state,
                                                              mesh))
        elif mesh.shape["model"] > 1:
            # Tensor parallelism as a config change (training.model_parallel):
            # Megatron-style shardings on the attention/FFN projections; the
            # optimizer moments mirror the param tree's path suffixes, so the
            # same spec function places them consistently.
            params = shard_params_tp(params, mesh)
            opt_state = jax.tree_util.tree_map(
                jax.device_put, opt_state, tp_shardings(opt_state, mesh))
        elif fsdp:
            # ZeRO-3: every large leaf (params AND optimizer moments —
            # same shapes, same shape-driven rule) shards one dim over
            # 'data'; small leaves replicate (parallel/fsdp.py).
            from ..parallel.fsdp import shard_params_fsdp
            params = shard_params_fsdp(params, mesh)
            opt_state = shard_params_fsdp(opt_state, mesh)
        else:
            params = replicate(params, mesh)
            opt_state = replicate(opt_state, mesh)
        model_state = replicate(model_state, mesh)
    else:
        params = jax.device_put(params)
        model_state = jax.device_put(model_state)
        opt_state = jax.device_put(opt_state)

    def _ckpt_view(p):
        # torch-format checkpoints are ALWAYS canonical (unstacked layer
        # lists) so convert.py interop and PP-off resumes keep working.
        if pipeline_parallel > 1:
            from ..parallel import pp as _pp
            p = dict(p)
            enc = dict(p["encoder"])
            enc["layers"] = _pp.unstack_layers(enc["layers"])
            p["encoder"] = enc
        return p

    seg_weights = cfg.segmental_loss_weights
    seg_weight = cfg.segmental_loss_weight
    id2label = {i: l for i, l in enumerate(label_list)}

    def set_lr():
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            base_lr * scheduler.factor, jnp.float32)

    restart_loader = bool(cfg.raw.get("training", {}).get(
        "restart_loader_on_validation", False))
    epoch = 0
    last_log = time.time()

    # One-step-delayed metric readback: the loop dispatches step N, then
    # logs step N-1's (already finished) metrics while N runs on device.
    # Synchronous float(metrics) after every dispatch would serialize the
    # ~32 ms host/relay dispatch latency with device compute; the one-deep
    # pipeline overlaps them the same way the serving path does. Drained
    # before every validation/checkpoint so ordering in TB/metrics.jsonl
    # is unchanged.
    pending = None

    def host_rows(a):
        """Process-local rows of a batch-sharded array. On one host this is
        a plain transfer; with jax.process_count() > 1 the global array
        spans non-addressable devices and np.asarray would raise — fetch
        only this host's shards (unique by global row range, sorted), which
        correspond 1:1 to the local collated batch rows that
        make_array_from_process_local_data placed there."""
        if getattr(a, "is_fully_addressable", True):
            return np.asarray(a)
        by_start = {}
        for s in a.addressable_shards:
            start = s.index[0].start or 0
            if start not in by_start:
                by_start[start] = np.asarray(s.data)
        return np.concatenate(
            [by_start[k] for k in sorted(by_start)], axis=0)

    def drain_pending():
        nonlocal pending, last_log
        if pending is None:
            return
        # p_micro: [(pred_ids, offsets, batch), ...] — one entry per
        # micro-batch of the update (a single entry on the fused path), so
        # the segmental metric covers the SAME population the averaged
        # CE/offset metrics do.
        p_step, p_metrics, p_micro, p_lr = pending
        pending = None
        loss_val = float(p_metrics["loss"])
        offset_val = float(p_metrics["offset_loss"])
        if segmental_metric and seg_weight != 0.0:
            # Host-side value-only segmental term (quirk Q1: detached in
            # the reference — shifts the logged loss, no gradient).
            seg_total = 0.0
            n_samples = 0
            for p_pred, p_off, p_batch in p_micro:
                pred_np = host_rows(p_pred)
                off_np = host_rows(p_off)
                # shard_batch may have padded the global batch up to the
                # data-axis size; only the local collated rows are real.
                n_real = min(pred_np.shape[0],
                             len(p_batch["label_lengths"]))
                for i in range(n_real):
                    ll = int(p_batch["label_lengths"][i])
                    tags = [id2label[int(p)] for p in pred_np[i, :ll]]
                    segs_pred = decode_bio_tags(
                        tags, frame_duration=cfg.frame_duration,
                        offsets=off_np[i, :ll])
                    gt = p_batch["segments_gt"][i]
                    if isinstance(gt, list) and len(gt) == 1 \
                            and isinstance(gt[0], list):
                        gt = gt[0]
                    seg_total += segmental_loss_value(segs_pred, gt,
                                                      seg_weights)
                n_samples += n_real
            loss_val += seg_weight * seg_total / max(n_samples, 1)

        if writer is not None:
            writer.add_scalar("train/loss", loss_val, p_step)
            writer.add_scalar("train/offset_loss", offset_val, p_step)
        log_event("train", p_step, loss=loss_val, offset_loss=offset_val,
                  lr=p_lr)
        now = time.time()
        print(f"\r[Step {p_step}] Loss: {loss_val:.4f} "
              f"({1.0 / max(now - last_log, 1e-9):.2f} it/s)", end="")
        last_log = now

    from ..utils.profiling import maybe_trace
    profile_ctx = maybe_trace("train")
    profile_ctx.__enter__()
    # Gradient-accumulation carry (survives epoch boundaries so no
    # micro-batch is dropped; discarded only when max_steps ends training).
    grad_sum = None
    metric_sum = None
    micro_log = []
    micro_count = 0
    while step < cfg.max_steps:
        epoch_ran = False
        for batch in train_loader.epoch_batches(epoch):
            epoch_ran = True
            set_lr()
            lr_used = base_lr * scheduler.factor
            rng, step_rng = jax.random.split(rng)
            if mesh is not None:
                from ..parallel import shard_batch
                arrays = shard_batch(
                    {k: batch[k] for k in ("audio", "labels", "lang_ids",
                                           "off_frames", "off_channels",
                                           "off_fracs", "off_valid")},
                    mesh, pad_value_map={"labels": -100})
            else:
                arrays = {k: jnp.asarray(batch[k])
                          for k in ("audio", "labels", "lang_ids",
                                    "off_frames", "off_channels",
                                    "off_fracs", "off_valid")}
            if accum_steps > 1:
                grads, model_state, m, pred_ids, offsets = grad_step(
                    params, model_state, step_rng,
                    arrays["audio"], arrays["labels"],
                    arrays["lang_ids"], arrays["off_frames"],
                    arrays["off_channels"], arrays["off_fracs"],
                    arrays["off_valid"],
                    max_label_len=batch["max_label_len"])
                if grad_sum is None:
                    grad_sum, metric_sum = jax.tree_util.tree_map(
                        lambda g: g.astype(jnp.float32), (grads, m))
                else:
                    grad_sum, metric_sum = _accumulate_grads(
                        (grad_sum, metric_sum), (grads, m))
                micro_log.append((pred_ids, offsets, batch))
                micro_count += 1
                if micro_count < accum_steps:
                    continue  # no optimizer update yet
                params, opt_state = apply_step(params, opt_state,
                                               grad_sum, micro_count)
                metrics = {k: v / micro_count for k, v in metric_sum.items()}
                update_micro = micro_log
                grad_sum = None
                metric_sum = None
                micro_log = []
                micro_count = 0
            else:
                params, model_state, opt_state, metrics, pred_ids, offsets \
                    = train_step(params, model_state, opt_state, step_rng,
                                 arrays["audio"], arrays["labels"],
                                 arrays["lang_ids"], arrays["off_frames"],
                                 arrays["off_channels"], arrays["off_fracs"],
                                 arrays["off_valid"],
                                 max_label_len=batch["max_label_len"])
                update_micro = [(pred_ids, offsets, batch)]
            if cfg.scheduler_step_on_update:
                # After the update, as the reference does (train.py:254-259):
                # the update at step N runs with the factor from N-1 steps.
                scheduler.step()
            step += 1

            drain_pending()     # log step-1 while this step runs on device
            pending = (step, metrics, update_micro, lr_used)

            if step % cfg.val_check_interval == 0:
                drain_pending()
                if pcount > 1:
                    val_loss = evaluate(
                        jax.device_get(params), jax.device_get(model_state),
                        arch, eval_step_local, val_loader, label_list, cfg,
                        writer, step, id2lang, merge_map, mesh=None,
                        cross_host=sharded_val)
                else:
                    val_loss = evaluate(params, model_state, arch, eval_step,
                                        val_loader, label_list, cfg, writer,
                                        step, id2lang, merge_map, mesh=mesh)
                log_event("val", step, loss=val_loss)
                if pidx == 0:
                    model_path = os.path.join(save_dir,
                                              f"model_step{step}.pt")
                    save_model_checkpoint(model_path, _ckpt_view(params),
                                          model_state, arch, fmt=ckpt_fmt)
                    save_train_state(model_path, opt_state, step,
                                     np.asarray(rng),
                                     scheduler_state=scheduler.state_dict())
                    checkpoint_paths.append(model_path)
                    if len(checkpoint_paths) > cfg.max_checkpoints:
                        remove_checkpoint(checkpoint_paths.pop(0))
                if val_loss < best_loss:
                    best_loss = val_loss
                    if pidx == 0:
                        save_model_checkpoint(
                            os.path.join(save_dir, "best_model.pt"),
                            _ckpt_view(params), model_state, arch,
                            fmt=ckpt_fmt)
                        print(f"\nSaved best model with loss = "
                              f"{val_loss:.4f}")

                if not cfg.scheduler_step_on_update:
                    if type(scheduler).__name__ == "ReduceLROnPlateau":
                        scheduler.step(best_loss)
                    else:
                        # The reference jumps the scheduler to the global
                        # step when step() accepts an epoch/step argument —
                        # torch's always does (train.py:445-449). Without
                        # this, WarmupLR/StepLR/Cosine advance once per
                        # validation instead of tracking the step count.
                        scheduler.step(step)
                if writer is not None:
                    writer.add_scalar("train/learning_rate",
                                      base_lr * scheduler.factor, step)

                if restart_loader:
                    # Quirk Q10 compat: the reference rebuilds its
                    # DataLoader iterator after every validation
                    # (train.py:192,265-266,437-438), restarting +
                    # reshuffling the epoch — with small
                    # val_check_interval the epoch tail is never
                    # visited. Off by default (docs/MIGRATION.md).
                    break

            if step >= cfg.max_steps:
                break
        drain_pending()
        if not epoch_ran:
            raise ValueError(
                f"training epoch produced no batches ({len(train_idx)} "
                f"train samples, batch_size {cfg.batch_size}, "
                f"drop_last={train_loader.drop_last})")
        epoch += 1

    profile_ctx.__exit__(None, None, None)
    if pidx == 0:
        save_model_checkpoint(os.path.join(save_dir, "last_model.pt"),
                              _ckpt_view(params), model_state, arch,
                              fmt=ckpt_fmt)
    metrics_log.close()
    print("\nTraining complete at max_steps!")
    # Final state, for callers that keep going (tests, notebooks). On a
    # multi-host mesh these are globally-sharded arrays; fetch with
    # jax.device_get only if fully replicated/addressable.
    return params, model_state


def main() -> None:
    import argparse
    parser = argparse.ArgumentParser(
        description="Train the WFL model with a config file")
    parser.add_argument("config", type=str, help="Path to the config.yaml")
    args = parser.parse_args()
    train(args.config)


if __name__ == "__main__":
    main()
