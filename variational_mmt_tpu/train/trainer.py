"""Training runtime — the reference's ``onmt.Trainer`` re-designed TPU-first
(SURVEY.md §2.1 #11, §3.2 hot loop):

- ONE jit'd train step: forward (encoder, q, prior, reparameterized z,
  decoder, generator), ELBO, backward, clip, Adam update — a single XLA
  program per bucket shape, donated-buffer in-place state update;
- data parallel via sharding annotations (parallel/mesh.py): batch sharded
  on its leading axis, state replicated, GSPMD inserts the grad all-reduce;
- the image-feature gather + host->HBM copy overlaps compute through the
  background prefetcher (data/prefetch.py);
- per-step PRNG keys derived by folding the step counter (utils/prng.py), so
  runs are bit-reproducible given a seed regardless of how buckets interleave.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from variational_mmt_tpu.config import Config
from variational_mmt_tpu.data.dataset import BucketIterator
from variational_mmt_tpu.data.prefetch import prefetch
from variational_mmt_tpu.models.model import VMMTModel, generator_params, init_params
from variational_mmt_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding, shard_batch
from variational_mmt_tpu.train.loss import compute_loss
from variational_mmt_tpu.train.optim import PlateauScheduler, make_optimizer
from variational_mmt_tpu.utils.logging import Statistics
from variational_mmt_tpu.utils.prng import base_key, step_key


EPOCH_END = object()  # epoch-boundary sentinel in the training batch stream


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    lr: jax.Array  # float32 scalar (traced; plateau decay rewrites it)
    rng: jax.Array  # base PRNG key
    # EMA of params (train.ema_decay > 0) or None. None is an empty pytree,
    # so jit/scan/sharding treat the two layouts uniformly; the layout is
    # decided once by the Config, which checkpoints carry, so save/load
    # templates always agree.
    ema_params: Any = None


def create_train_state(cfg: Config, model: VMMTModel, rng: Optional[jax.Array] = None) -> TrainState:
    rng = base_key(cfg.train.seed) if rng is None else rng
    params = init_params(model, rng)
    if cfg.train.param_init > 0:
        # reference -param_init: uniform(-r, r) over EVERY parameter tensor
        # (upstream applies uniform_ to the whole model indiscriminately)
        r = cfg.train.param_init
        leaves, treedef = jax.tree.flatten(params)
        # fold a sentinel far outside the step-counter range: fold_in(rng,
        # small_n) is exactly step_key(rng, n), and reusing a step's stream
        # here would correlate init values with that step's dropout noise
        keys = jax.random.split(jax.random.fold_in(rng, 2**31 - 13), len(leaves))
        params = jax.tree.unflatten(treedef, [
            jax.random.uniform(k, x.shape, jnp.float32, -r, r).astype(x.dtype)
            for k, x in zip(keys, leaves)
        ])
    tx = make_optimizer(cfg.train)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.int32(0),
        lr=jnp.float32(cfg.train.learning_rate),
        rng=rng,
        # EMA starts AT the init point (Polyak), not at zero: a zero start
        # would need bias correction to be usable early. jnp.copy, not
        # asarray: aliased params/ema buffers break the donated jit step
        # ("donate the same buffer twice")
        ema_params=(jax.tree.map(jnp.copy, params)
                    if cfg.train.ema_decay > 0 else None),
    )


def state_shardings(cfg: Config, model: VMMTModel, mesh):
    """NamedSharding tree for the TrainState on ``mesh``: fully replicated
    on a 1-D data mesh; the tensor-parallel layout (parallel/tp.py rules —
    vocab-sharded embeddings + generator) when the mesh has a 'model' axis.
    Built from an eval_shape template so jit in/out shardings can be fixed
    before any real state exists (the one-compile-per-cold-start property)."""
    from variational_mmt_tpu.parallel.tp import MODEL_AXIS, tree_shardings

    if MODEL_AXIS not in mesh.axis_names:
        return replicated_sharding(mesh)
    tpl = jax.eval_shape(lambda: create_train_state(cfg, model))
    return tree_shardings(tpl, mesh)


def make_train_step(
    cfg: Config, model: VMMTModel, mesh=None, img_table: Optional[jax.Array] = None,
    steps_per_call: Optional[int] = None,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict[str, jax.Array]]]:
    """``img_table``: optional device-resident (N, ...) feature table. When
    given, batches carry only (B,) ``indices`` and the image rows are
    gathered ON DEVICE inside the jit — the host->HBM transfer per step
    shrinks from ~2MB of features to a few KB of ids (the TPU-idiomatic
    "stream features straight to HBM once" design; critical when the host
    link is slow, e.g. a remote-TPU tunnel)."""
    tx = make_optimizer(cfg.train)

    accum = max(1, cfg.train.grad_accum)

    has_table = img_table is not None

    def train_step(state: TrainState, batch: Dict[str, jax.Array], table=None):
        key = step_key(state.rng, state.step)

        def loss_fn(params, micro, key):
            kd, kl_, kw = jax.random.split(key, 3)
            rngs = {"dropout": kd, "latent": kl_, "word_dropout": kw}
            gen = generator_params(params, cfg.model) if cfg.model.fused_ce else None
            if cfg.train.pack:
                # sequence-packed batch (data/packing.py): per-sentence
                # tensors flow flattened (B·K, ...) so the ELBO normalizes
                # per packed SEGMENT exactly like an unpacked row
                sm = micro["seg_mask"]
                img = micro.get("img")
                if img is None and table is not None and "indices" in micro:
                    img = table[micro["indices"]] * sm.reshape(
                        sm.shape + (1,) * (table.ndim - 1)
                    )
                out = model.apply(
                    {"params": params},
                    micro["src"], micro["tgt_in"], micro["src_seg"],
                    micro["tgt_seg"], micro["seg_first"], micro["seg_last"],
                    img, deterministic=False, sample=True,
                    tgt_out=micro["tgt_out"], rngs=rngs,
                    method=VMMTModel.forward_packed,
                )
                img_flat = (None if img is None
                            else img.reshape((sm.size,) + img.shape[2:]))
                return compute_loss(
                    out, micro["tgt_out"], sm.reshape(-1), img_flat,
                    cfg.model, cfg.train, state.step,
                    generator_params=gen, tgt_seg=micro["tgt_seg"],
                )
            img = micro.get("img")
            if img is None and table is not None and "indices" in micro:
                img = table[micro["indices"]] * micro["example_mask"].reshape(
                    (-1,) + (1,) * (table.ndim - 1)
                )
            out = model.apply(
                {"params": params},
                micro["src"], micro["tgt_in"], img,
                deterministic=False, sample=True, tgt_out=micro["tgt_out"],
                rngs=rngs,
            )
            return compute_loss(
                out, micro["tgt_out"], micro["example_mask"], img,
                cfg.model, cfg.train, state.step,
                generator_params=gen,
            )

        if accum == 1:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, key
            )
        else:
            # gradient accumulation: split the global batch into `accum`
            # micro-batches and lax.scan the grad computation (sequential,
            # activation memory = one micro-batch). Grads are averaged over
            # micros — exact when micros hold equal example counts.
            micros = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]), batch
            )

            def micro_step(acc, xs):
                micro, k = xs
                (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params, micro, k)
                acc = jax.tree.map(jnp.add, acc, g)
                return acc, m

            zero = jax.tree.map(jnp.zeros_like, state.params)
            keys = jax.random.split(key, accum)
            grads_sum, metrics_all = jax.lax.scan(micro_step, zero, (micros, keys))
            grads = jax.tree.map(lambda g: g / accum, grads_sum)
            # metric SUMS add across micros; scalar diagnostics take the mean
            metrics = jax.tree.map(lambda m: m.sum(axis=0), metrics_all)
            for k_ in ("beta", "loss"):
                metrics[k_] = metrics[k_] / accum
        # frozen pretrained embeddings (reference -fix_word_vecs_enc/dec):
        # zeroing grads AND final updates (vs masking the optimizer) keeps
        # opt_state structure independent of the flags, so checkpoints resume
        # across settings. Zeroing grads alone is not enough: moments loaded
        # from an unfrozen-run checkpoint would still emit non-zero adam/
        # adadelta updates for ~1/(1-b1) steps.
        if cfg.model.share_embeddings:
            # one shared table: freezing either side freezes it
            frozen = ([("tgt_embed",)] if (cfg.train.fix_word_vecs_enc
                                           or cfg.train.fix_word_vecs_dec) else [])
        else:
            frozen = ([("src_embed",)] if cfg.train.fix_word_vecs_enc else []) + (
                [("tgt_embed",)] if cfg.train.fix_word_vecs_dec else []
            )

        def zero_frozen(tree):
            if not frozen:
                return tree
            tree = dict(tree)
            for (name,) in frozen:
                tree[name] = jax.tree.map(jnp.zeros_like, tree[name])
            return tree

        grads = zero_frozen(grads)
        gnorm = optax_global_norm(grads)
        if cfg.train.skip_nonfinite:
            # one bad batch (bf16 overflow, data glitch) must not poison the
            # params: skip the whole update when the global norm is not
            # finite. lax.cond keeps this jit-safe; both branches are cheap
            # relative to the backward pass.
            def _apply(_):
                updates, new_opt = tx.update(grads, state.opt_state, state.params)
                new_params = jax.tree.map(
                    lambda p, u: (p - state.lr * u.astype(p.dtype)).astype(p.dtype),
                    state.params, zero_frozen(updates),
                )
                return new_params, new_opt

            def _skip(_):
                return state.params, state.opt_state

            ok = jnp.isfinite(gnorm)
            new_params, new_opt = jax.lax.cond(ok, _apply, _skip, None)
            metrics["skipped_sum"] = (~ok).astype(jnp.float32)
        else:
            ok = None
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: (p - state.lr * u.astype(p.dtype)).astype(p.dtype),
                state.params, zero_frozen(updates),
            )
            metrics["skipped_sum"] = jnp.float32(0.0)
        metrics["grad_norm"] = gnorm
        if cfg.train.ema_decay > 0:
            # d_eff = 1.0 on a skipped step keeps the EMA exactly unchanged
            # (new_params == params there, but d_eff avoids even the float
            # round-trip e*d + (1-d)*e)
            d = jnp.float32(cfg.train.ema_decay)
            if cfg.train.ema_ramp:
                # num_updates warmup (TF ExponentialMovingAverage schedule):
                # n counts steps incl. this one; early on the EMA is close to
                # a running average, converging to the configured decay.
                n = (state.step + 1).astype(jnp.float32)
                d = jnp.minimum(d, (1.0 + n) / (10.0 + n))
            d_eff = d if ok is None else jnp.where(ok, d, jnp.float32(1.0))
            new_ema = jax.tree.map(
                lambda e, p: (d_eff * e.astype(jnp.float32)
                              + (1.0 - d_eff) * p.astype(jnp.float32)).astype(e.dtype),
                state.ema_params, new_params,
            )
        else:
            new_ema = state.ema_params
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  step=state.step + 1, ema_params=new_ema)
        return new_state, metrics

    spc = max(1, cfg.train.steps_per_call if steps_per_call is None else steps_per_call)

    def multi_step(state: TrainState, batches: Dict[str, jax.Array], table=None):
        """spc optimizer steps in ONE dispatch: lax.scan over batches whose
        leaves are stacked (spc, B, ...). Amortizes per-dispatch host/RPC
        latency (dominant on remote-TPU links). Metric sums cover all spc
        steps; scalar diagnostics (loss/beta/grad_norm) report the last."""

        def body(s, batch):
            return train_step(s, batch, table)

        state, metrics_all = jax.lax.scan(body, state, batches)
        metrics = jax.tree.map(lambda m: m.sum(axis=0), metrics_all)
        for k in ("beta", "loss", "grad_norm"):
            metrics[k] = metrics_all[k][-1]
        return state, metrics

    entry = train_step if spc == 1 else multi_step
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = replicated_sharding(mesh)
        state_sh = state_shardings(cfg, model, mesh)
        if not isinstance(state_sh, NamedSharding):
            # TP: indices of the sharded leaves (+ leaf 0 as the
            # replicated-placement sentinel) checked by _align_state
            sh_leaves = jax.tree.leaves(state_sh)
            check_idx = [i for i, s in enumerate(sh_leaves) if s.spec]
            if 0 not in check_idx:
                check_idx.append(0)
        # stacked (spc, B, ...) batches shard the SECOND axis
        data = (batch_sharding(mesh) if spc == 1
                else NamedSharding(mesh, P(None, cfg.train.data_axis)))
        jit_step = jax.jit(
            entry,
            in_shardings=(state_sh, data, repl) if has_table else (state_sh, data),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,),
        )
    else:
        jit_step = jax.jit(entry, donate_argnums=(0,))

    def _align_state(state: TrainState) -> TrainState:
        """Match a host-fresh (or checkpoint-restored) state's sharding to
        the steady-state signature BEFORE the first call. Without this the
        first call traces with empty-sharding avals and the second with the
        jit's output shardings — TWO full compiles of the identical program
        (measured: the whole cold-start compile tail doubled), and the
        second executable's cache key is the one that churned across
        sessions."""
        if mesh is None:
            return state
        if isinstance(state_sh, NamedSharding):  # 1-D mesh: one broadcast spec
            leaf = jax.tree.leaves(state.params)[0]
            if getattr(leaf, "sharding", None) == state_sh:
                return state
            return jax.device_put(state, state_sh)
        # TP tree: compare only the few leaves the rules actually shard
        # (plus leaf 0 as the replicated sentinel) — a full-tree compare
        # would cost a python lambda per leaf on EVERY dispatch
        leaves = jax.tree.leaves(state)
        if all(getattr(leaves[i], "sharding", None) == sh_leaves[i]
               for i in check_idx):
            return state
        return jax.device_put(state, state_sh)

    if has_table:
        # explicit argument (NOT a closure const: a closed-over 200MB array
        # would be serialized into every compile request)
        fn = lambda state, batch: jit_step(_align_state(state), batch, img_table)  # noqa: E731
    else:
        fn = lambda state, batch: jit_step(_align_state(state), batch)  # noqa: E731
    # the raw jit is reachable for AOT tooling (lower/compile/memory_analysis)
    fn._jit = jit_step
    return fn


def make_eval_step(cfg: Config, model: VMMTModel, mesh=None, img_table: Optional[jax.Array] = None):
    """Validation forward: deterministic, z = posterior mean (sample=False)."""

    has_table = img_table is not None

    def eval_step(state: TrainState, batch, table=None):
        img = batch.get("img")
        if img is None and table is not None and "indices" in batch:
            img = table[batch["indices"]] * batch["example_mask"].reshape(
                (-1,) + (1,) * (table.ndim - 1)
            )
        out = model.apply(
            {"params": state.params},
            batch["src"], batch["tgt_in"], img,
            deterministic=True, sample=False, tgt_out=batch["tgt_out"],
        )
        _, metrics = compute_loss(
            out, batch["tgt_out"], batch["example_mask"], img,
            cfg.model, cfg.train, state.step,
            generator_params=(
                generator_params(state.params, cfg.model) if cfg.model.fused_ce else None
            ),
        )
        return metrics

    if mesh is not None:
        repl = replicated_sharding(mesh)
        state_sh = state_shardings(cfg, model, mesh)
        data = batch_sharding(mesh)
        jit_eval = jax.jit(
            eval_step,
            in_shardings=(state_sh, data, repl) if has_table else (state_sh, data),
            out_shardings=repl,
        )
    else:
        jit_eval = jax.jit(eval_step)
    if has_table:
        return lambda state, batch: jit_eval(state, batch, img_table)
    return lambda state, batch: jit_eval(state, batch)


def optax_global_norm(tree) -> jax.Array:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree)))


class Trainer:
    """Epoch/step loop + validation + plateau LR decay + checkpointing."""

    def __init__(
        self,
        cfg: Config,
        model: VMMTModel,
        train_iter: BucketIterator,
        valid_iter: Optional[BucketIterator] = None,
        mesh=None,
        checkpoint_fn: Optional[Callable[[TrainState, int, Dict], None]] = None,
        metrics_logger=None,
        bleu_fn: Optional[Callable[[TrainState], float]] = None,
        valid_iw: int = 0,  # K>0: also report the K-sample IW-ELBO bound
        train_feats=None,  # (N, ...) image features -> device-resident table
        valid_feats=None,  # (per-step host transfer becomes ids-only)
    ):
        self.cfg = cfg
        self.model = model
        self.train_iter = train_iter
        self.valid_iter = valid_iter
        self.mesh = mesh if mesh is not None else make_mesh()
        # on a 2-D (data, model) mesh only the data axis slices the batch
        n_dev = int(dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
                    .get(cfg.train.data_axis, self.mesh.devices.size))
        if cfg.train.batch_size % n_dev != 0:
            raise ValueError(
                f"batch_size ({cfg.train.batch_size}) must be divisible by the "
                f"number of data-parallel devices ({n_dev}); pick e.g. "
                f"{(cfg.train.batch_size // n_dev + 1) * n_dev}"
            )
        accum = max(1, cfg.train.grad_accum)
        if cfg.train.batch_size % accum != 0:
            # otherwise the micro-batch reshape inside jit fails with a
            # generic 'cannot reshape' error that names neither knob
            raise ValueError(
                f"batch_size ({cfg.train.batch_size}) must be divisible by "
                f"grad_accum ({accum})"
            )
        if (cfg.train.batch_size // accum) % n_dev != 0:
            raise ValueError(
                f"each micro-batch (batch_size // grad_accum = "
                f"{cfg.train.batch_size // accum}) must be divisible by the "
                f"number of data-parallel devices ({n_dev})"
            )
        from variational_mmt_tpu.parallel.tp import (
            MODEL_AXIS, validate_tp_divisibility,
        )

        if MODEL_AXIS in self.mesh.axis_names:
            validate_tp_divisibility(
                cfg.model,
                int(dict(zip(self.mesh.axis_names,
                             self.mesh.devices.shape))[MODEL_AXIS]),
            )
        spc = max(1, cfg.train.steps_per_call)
        self._spc = spc
        # report/valid/checkpoint fire on interval-boundary CROSSINGS, so no
        # alignment between intervals, steps_per_call, and the resumed step
        # counter is required (a resume from step 1003 with valid_every=500
        # still validates at the dispatch that crosses 1500).
        repl = replicated_sharding(self.mesh)
        self._train_table = (
            jax.device_put(jnp.asarray(train_feats, jnp.float32), repl)
            if train_feats is not None else None
        )
        self._valid_table = (
            jax.device_put(jnp.asarray(valid_feats, jnp.float32), repl)
            if valid_feats is not None else None
        )
        self.train_step = make_train_step(cfg, model, self.mesh, self._train_table)
        # single-step path for epoch-boundary remainders of stacked dispatch
        # (bucket shapes that produced fewer than steps_per_call batches)
        self.train_step_single = (
            self.train_step if spc == 1
            else make_train_step(cfg, model, self.mesh, self._train_table,
                                 steps_per_call=1)
        )
        self.eval_step = make_eval_step(cfg, model, self.mesh, self._valid_table)
        self.scheduler = PlateauScheduler(cfg.train)
        self.checkpoint_fn = checkpoint_fn
        self.metrics_logger = metrics_logger
        self.bleu_fn = bleu_fn
        self.valid_iw = valid_iw
        self._iw_fn = None
        if valid_iw > 0 and model.is_latent:
            from variational_mmt_tpu.decode.iw_eval import make_iw_elbo_fn

            self._iw_fn = jax.jit(make_iw_elbo_fn(model, valid_iw))
        self.history: list = []

    def _device_batches(self, it: Iterable, use_table: bool = False,
                        stack: int = 1) -> Iterable:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = (batch_sharding(self.mesh) if stack == 1
              else NamedSharding(self.mesh, P(None, self.cfg.train.data_axis)))

        def tree_of(b):
            if hasattr(b, "seg_mask"):  # PackedBatch (data/packing.py)
                tree = {
                    "src": b.src, "tgt_in": b.tgt_in, "tgt_out": b.tgt_out,
                    "src_seg": b.src_seg, "tgt_seg": b.tgt_seg,
                    "seg_first": b.seg_first, "seg_last": b.seg_last,
                    "seg_mask": b.seg_mask,
                }
            else:
                tree = {
                    "src": b.src, "tgt_in": b.tgt_in, "tgt_out": b.tgt_out,
                    "example_mask": b.example_mask,
                }
            if use_table:
                tree["indices"] = b.indices  # device-side feature gather
            elif b.img is not None:
                tree["img"] = b.img
            return tree

        if stack == 1:
            def no_sentinel(source):
                for b in source:
                    if b is not EPOCH_END:
                        yield b

            return prefetch(no_sentinel(it), size=2,
                            transform=lambda b: jax.device_put(tree_of(b), sh))

        single_sh = batch_sharding(self.mesh)

        def stacked(source):
            # group consecutive same-shape batches so (stack, B, L) leaves
            # are homogeneous (bucketed shapes vary batch to batch); at each
            # epoch boundary (EPOCH_END sentinel) partial groups flush
            # through the single-step path so no batch is ever stranded
            # across epochs (rare bucket shapes would otherwise defer —
            # or never train — their batches)
            buffers: Dict[tuple, list] = {}
            for b in source:
                if b is EPOCH_END:
                    for key in list(buffers):
                        for t in buffers.pop(key):
                            yield ("single", t)
                    continue
                key = b.src.shape
                buf = buffers.setdefault(key, [])
                buf.append(tree_of(b))
                if len(buf) == stack:
                    yield ("stack", jax.tree.map(lambda *xs: np.stack(xs), *buf))
                    buffers[key] = []

        def put(item):
            kind, t = item
            return kind, jax.device_put(t, sh if kind == "stack" else single_sh)

        return prefetch(stacked(it), size=2, transform=put)

    def train(self, max_steps: Optional[int] = None) -> Statistics:
        return self.train_from(None, max_steps)

    def train_from(self, state: Optional[TrainState], max_steps: Optional[int] = None) -> Statistics:
        """Run the loop, optionally resuming from a loaded TrainState
        (the reference's ``-train_from``)."""
        cfg = self.cfg.train
        max_steps = max_steps or cfg.max_steps
        if state is None:
            state = create_train_state(self.cfg, self.model)
        # -train_from across ema_decay settings: the restored state's EMA
        # layout follows the CHECKPOINT's config, the step function this
        # run's. Align (seed a fresh EMA from params / drop a stale one) or
        # the jit in_shardings pytree would mismatch.
        if cfg.ema_decay > 0 and state.ema_params is None:
            # jnp.copy: an aliased seed would be donated twice by the step
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.params))
        elif cfg.ema_decay <= 0 and state.ema_params is not None:
            state = state.replace(ema_params=None)
        stats = Statistics()
        step = int(state.step)
        data = self._device_batches(iter(self._infinite_train()),
                                    use_table=self._train_table is not None,
                                    stack=self._spc)
        pending = []  # device-side metric dicts; synced only at report time
        skipped_total = 0  # non-finite updates skipped (skip_nonfinite)

        def flush():
            # one host sync per report interval, not per step (keeps the
            # dispatch pipeline full — the TPU analogue of async CUDA launch)
            nonlocal skipped_total
            for m in pending:
                skipped_total += int(float(m.get("skipped_sum", 0.0)))
                stats.update(
                    loss=float(m["ce_sum"]),
                    n_words=int(m["n_tokens"]),
                    n_correct=int(m["n_correct"]),
                    n_sents=int(m["n_sents"]),
                    kl=float(m["kl_sum"]),
                    img_loss=float(m["img_loss_sum"]),
                )
            pending.clear()

        def crossed(prev: int, cur: int, interval: int) -> bool:
            # fires once whenever the step counter crosses an interval
            # boundary — correct for any steps_per_call and any resumed
            # step offset (step % interval == 0 can never fire when the
            # resume point and interval are misaligned with spc)
            return interval > 0 and (cur // interval) > (prev // interval)

        metrics = None
        while step < max_steps:
            item = next(data)
            if self._spc == 1:
                kind, batch = "single", item
            else:
                kind, batch = item
            if kind == "stack" and max_steps - step < self._spc:
                # the stacked window would overshoot max_steps (possible
                # whenever the counter drifted via epoch-boundary single
                # flushes or max_steps % spc != 0): run exactly the
                # remaining micro-batches through the single-step path and
                # land on the budget to the step. Triggers fire once for
                # the group, same as for a stacked dispatch.
                prev = step
                for i in range(max_steps - step):
                    single = jax.tree.map(lambda x, i=i: x[i], batch)
                    state, metrics = self.train_step_single(state, single)
                    pending.append(metrics)
                step = max_steps
            elif kind == "stack":
                state, metrics = self.train_step(state, batch)
                prev, step = step, step + self._spc
                pending.append(metrics)
            else:
                state, metrics = self.train_step_single(state, batch)
                prev, step = step, step + 1
                pending.append(metrics)
            if len(pending) >= 512:  # bound host memory between reports
                flush()
            if crossed(prev, step, cfg.report_every):
                flush()
                stats.output(step, max_steps, beta=float(metrics["beta"]), lr=float(state.lr))
                if skipped_total:
                    print(f"  ({skipped_total} non-finite update(s) skipped so far)")
                if self.metrics_logger is not None:
                    self.metrics_logger.log(
                        step,
                        {**stats.scalars(), "beta": float(metrics["beta"]),
                         "lr": float(state.lr), "grad_norm": float(metrics["grad_norm"]),
                         "skipped_updates": skipped_total},
                        prefix="train",
                    )
            if self.valid_iter is not None and crossed(prev, step, cfg.valid_every):
                flush()
                val = self.validate(state)
                if self.bleu_fn is not None:
                    val["bleu"] = self.bleu_fn(state)
                    print(f"validation greedy BLEU: {val['bleu']:.2f}")
                new_lr = self.scheduler.update(val["ppl"], step, float(state.lr))
                if new_lr != float(state.lr):
                    print(f"validation ppl {val['ppl']:.3f} plateau -> lr {new_lr:.2e}")
                    state = state.replace(lr=jnp.float32(new_lr))
                self.history.append({"step": step, **val})
                if self.metrics_logger is not None:
                    self.metrics_logger.log(step, val, prefix="valid")
            if self.checkpoint_fn is not None and crossed(prev, step, cfg.checkpoint_every):
                self.checkpoint_fn(state, step, {})
        flush()
        self.final_state = state
        return stats

    def _infinite_train(self):
        e = 0
        while True:
            yield from self.train_iter.epoch(e)
            yield EPOCH_END
            e += 1

    def validate(self, state: TrainState) -> Dict[str, float]:
        import math

        agg = {"ce_sum": 0.0, "n_tokens": 0.0, "n_correct": 0.0, "n_sents": 0.0, "kl_sum": 0.0, "img_loss_sum": 0.0}
        iw_sum = 0.0
        for i, batch in enumerate(self._device_batches(
                self.valid_iter.epoch(0), use_table=self._valid_table is not None)):
            m = self.eval_step(state, batch)
            for k in agg:
                agg[k] += float(m[k])
            if self._iw_fn is not None:
                if "img" not in batch and self._valid_table is not None:
                    img = self._valid_table[batch["indices"]]
                    img = img * batch["example_mask"].reshape((-1,) + (1,) * (img.ndim - 1))
                    batch = dict(batch, img=img)
                iw = self._iw_fn(state.params, batch, jax.random.fold_in(state.rng, i))
                iw_sum += float(iw["iw_elbo_sum"])
        xent = agg["ce_sum"] / max(1.0, agg["n_tokens"])
        out = {
            "ppl": math.exp(min(xent, 100.0)),
            "xent": xent,
            "accuracy": 100.0 * agg["n_correct"] / max(1.0, agg["n_tokens"]),
            "kl": agg["kl_sum"] / max(1.0, agg["n_sents"]),
            "img_loss": agg["img_loss_sum"] / max(1.0, agg["n_sents"]),
            "elbo": -(agg["ce_sum"] + agg["kl_sum"]) / max(1.0, agg["n_sents"]),
        }
        if self._iw_fn is not None:
            out["iw_elbo"] = iw_sum / max(1.0, agg["n_sents"])
        return out
