"""Checkpointing with the reference's round-trip contract (SURVEY.md §2.1
#13, §2.5): a checkpoint carries everything needed to rebuild the exact
model and resume training — params, optimizer state, step, LR, PRNG key,
the full Config (the reference pickles its ``opt`` Namespace), and both
vocabs. save -> load -> identical decode is tested.

Layout (one directory per checkpoint):
    <dir>/step_000123/
        config.json      full Config
        vocab.src.json   source vocab itos
        vocab.tgt.json   target vocab itos
        state.msgpack    flax-serialized {params, opt_state, step, lr, rng}
Rolling retention keeps the newest ``keep`` checkpoints (reference kept
per-epoch files; bounded retention is strictly more production-friendly).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from variational_mmt_tpu.config import Config
from variational_mmt_tpu.data.vocab import Vocab
from variational_mmt_tpu.models.model import VMMTModel, build_model
from variational_mmt_tpu.train.trainer import TrainState, create_train_state

_STEP_RE = re.compile(r"^step_(\d+)$")


def _state_dict(state: TrainState) -> dict:
    # to_state_dict turns optax NamedTuple states into plain nested dicts
    # (msgpack can't encode tuples)
    raw = {
        "params": state.params,
        "opt_state": serialization.to_state_dict(state.opt_state),
        "step": state.step,
        "lr": state.lr,
        "rng": state.rng,
    }
    if state.ema_params is not None:
        raw["ema_params"] = state.ema_params
    return jax.tree.map(np.asarray, serialization.to_state_dict(raw))


def save_checkpoint(
    ckpt_dir: str,
    state: TrainState,
    cfg: Config,
    src_vocab: Vocab,
    tgt_vocab: Vocab,
    keep: int = 3,
) -> str:
    step = int(state.step)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "config.json"), "w") as f:
        f.write(cfg.to_json())
    src_vocab.save(os.path.join(tmp, "vocab.src.json"))
    tgt_vocab.save(os.path.join(tmp, "vocab.tgt.json"))
    blob = serialization.msgpack_serialize(_state_dict(state))
    with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
        f.write(blob)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)  # atomic publish: partial writes never look valid
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int) -> None:
    if keep <= 0:
        return
    steps = sorted(list_checkpoints(ckpt_dir))
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s:08d}"), ignore_errors=True)


def list_checkpoints(ckpt_dir: str) -> List[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m and not name.endswith(".tmp"):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    steps = list_checkpoints(ckpt_dir)
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{steps[-1]:08d}")


def load_checkpoint(
    path: str,
) -> Tuple[TrainState, Config, VMMTModel, Vocab, Vocab]:
    """Rebuild model + state entirely from the checkpoint (the reference's
    ``load_test_model`` contract: the saved opt defines the architecture)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = Config.from_json(f.read())
    src_vocab = Vocab.load(os.path.join(path, "vocab.src.json"))
    tgt_vocab = Vocab.load(os.path.join(path, "vocab.tgt.json"))
    model = build_model(cfg.model)
    # abstract template (no device compute): only the pytree STRUCTURE is
    # needed to restore; avoids a full jitted init at load time
    template = jax.eval_shape(lambda: create_train_state(cfg, model))
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(template.params, raw["params"])
    if "opt_state" in raw:
        opt_state = jax.tree.map(jnp.asarray, serialization.from_state_dict(
            template.opt_state, raw["opt_state"]))
    else:
        # released checkpoint (release_checkpoint stripped the optimizer):
        # synthesize a fresh zero state so decode paths load unchanged and
        # -train_from restarts the optimizer (cli/train warns)
        opt_state = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), template.opt_state)
    ema = None
    if template.ema_params is not None:
        if "ema_params" in raw:
            ema = jax.tree.map(jnp.asarray, serialization.from_state_dict(
                template.ema_params, raw["ema_params"]))
        else:
            # released artifact whose EMA was promoted/stripped, but whose
            # config still says ema_decay > 0: re-seed from params (exactly
            # what a fresh run at these weights would do). jnp.copy — an
            # aliased seed would be donated twice by the jit step
            ema = jax.tree.map(lambda x: jnp.copy(jnp.asarray(x)), params)
    state = TrainState(
        params=jax.tree.map(jnp.asarray, params),
        opt_state=opt_state,
        step=jnp.asarray(raw["step"]),
        lr=jnp.asarray(raw["lr"]),
        rng=jnp.asarray(raw["rng"]),
        ema_params=ema,
    )
    return state, cfg, model, src_vocab, tgt_vocab


def is_released(path: str) -> bool:
    """True if this checkpoint was stripped by release_checkpoint (no
    optimizer state — resuming training restarts the optimizer)."""
    return os.path.exists(os.path.join(path, "RELEASED"))


def release_checkpoint(src: str, dst: str, dtype: str = "keep",
                       ema: bool = False) -> dict:
    """Deployment artifact (the reference lineage's release_model tool):
    copy ``src`` to ``dst`` with the optimizer state stripped — for
    adam/adadelta that is ~2/3 of state.msgpack — and, with
    ``dtype="bfloat16"``, float param leaves cast in the artifact itself
    (halves it again; decode already computes logits/latents in f32 on
    bf16 params, the -infer_dtype bfloat16 path). The released checkpoint
    loads through the normal load_checkpoint; only -train_from semantics
    change (fresh optimizer, warned). ``ema=True`` publishes the EMA
    (Polyak-averaged) weights as the artifact's params — the standard way
    to deploy an ema_decay run. Returns {"src_bytes", "dst_bytes"}.
    """
    if dtype not in ("keep", "bfloat16"):
        raise ValueError(f"dtype must be keep | bfloat16, got {dtype!r}")
    state_path = os.path.join(src, "state.msgpack")
    with open(state_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    raw.pop("opt_state", None)
    # EMA weights never ship twice: -ema promotes them to be THE params of
    # the artifact, otherwise they are dropped. Either way load_checkpoint
    # re-seeds the (config-mandated) EMA slot from params, which is exactly
    # the artifact's single weight set.
    if ema:
        if "ema_params" not in raw:
            raise ValueError(
                f"{src}: no EMA state in checkpoint (trained with "
                "ema_decay=0) — cannot release with ema=True")
        raw["params"] = raw["ema_params"]
    raw.pop("ema_params", None)
    if dtype == "bfloat16":
        def cast(x):
            x = np.asarray(x)
            return x.astype(jnp.bfloat16) if np.issubdtype(
                x.dtype, np.floating) else x

        raw["params"] = jax.tree.map(cast, raw["params"])
    tmp = dst + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    for name in ("config.json", "vocab.src.json", "vocab.tgt.json"):
        shutil.copyfile(os.path.join(src, name), os.path.join(tmp, name))
    with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(raw))
    with open(os.path.join(tmp, "RELEASED"), "w") as f:
        f.write("optimizer state stripped by release_checkpoint\n")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.rename(tmp, dst)
    return {
        "src_bytes": os.path.getsize(state_path),
        "dst_bytes": os.path.getsize(os.path.join(dst, "state.msgpack")),
    }
