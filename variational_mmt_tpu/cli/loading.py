"""Shared ``-model`` checkpoint loading for the translate/serve CLIs.

Handles the single-checkpoint and comma-separated ensemble forms of the
``-model`` flag with the ensemble guards applied once — vocab identity
across members, vmmt_c image-feature-interface agreement — so the two
CLIs cannot drift apart. The interface-selection rule at decode time
(which member's cfg defines the expected feature tensor) mirrors
serve/service.py: vmmt_c members are the only decode-time feature
consumers (SURVEY.md §2.4: the conditional prior p(z|x,v) needs v;
vmmt_f substitutes the N(0,I) prior mean and ignores v).

Only params (and the step) are kept from each TrainState: the Adam
moments are ~2x params of dead device memory for a decode-only process,
which matters when serving a multi-member ensemble.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List

from variational_mmt_tpu.config import consumes_decode_feats  # noqa: F401 (re-export)


@dataclass
class LoadedModels:
    """One or more checkpoints loaded for decode (optimizer state dropped)."""

    models: list = field(default_factory=list)  # one VMMTModel per member
    params: list = field(default_factory=list)  # matching param trees
    steps: List[int] = field(default_factory=list)
    cfgs: list = field(default_factory=list)    # full Config per member
    src_vocab: object = None
    tgt_vocab: object = None

    @property
    def ensemble(self) -> bool:
        return len(self.models) > 1

    @property
    def model(self):
        return self.models[0]

    @property
    def cfg(self):
        return self.cfgs[0]

    def translator_args(self):
        """(model, params) in the form Translator expects: the bare
        model/tree for a single checkpoint, lists for an ensemble."""
        if self.ensemble:
            return self.models, self.params
        return self.models[0], self.params[0]


def load_model_spec(spec: str, use_ema: bool = False) -> LoadedModels:
    """Load ``-model`` (one checkpoint dir, or comma-separated dirs for an
    ensemble), resolving each to its latest step when given a run root.
    ``use_ema`` decodes with each member's EMA (Polyak-averaged) weights
    instead of the raw params (requires ema_decay > 0 at train time).
    Raises SystemExit with an operator-readable message on empty path
    segments, vocab mismatch, or vmmt_c feature-interface disagreement."""
    from variational_mmt_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
    )

    raw_paths = [s.strip() for s in spec.split(",")]
    if any(not s for s in raw_paths):
        raise SystemExit(
            f"-model: empty checkpoint path in {spec!r} (stray comma?)")
    out = LoadedModels()
    for path in raw_paths:
        if not os.path.exists(os.path.join(path, "state.msgpack")):
            resolved = latest_checkpoint(path)
            if resolved is None:
                raise SystemExit(
                    f"-model: no checkpoint at {path!r} (neither a "
                    "state.msgpack dir nor a run root with step_* dirs)")
            path = resolved
        state, cfg, model, sv_m, tv_m = load_checkpoint(path)
        print(f"loaded {path} (step {int(state.step)}, {cfg.model.model_type})")
        if out.src_vocab is None:
            out.src_vocab, out.tgt_vocab = sv_m, tv_m
        # ensemble members must index the same token space on both sides:
        # the beam combines distributions positionally and the source ids
        # are encoded once
        elif sv_m.itos != out.src_vocab.itos or tv_m.itos != out.tgt_vocab.itos:
            raise SystemExit(
                f"ensemble member {path} was trained with a different vocab; "
                "all -model checkpoints must come from the same preprocess run")
        member_params = state.params
        if use_ema:
            if state.ema_params is None:
                raise SystemExit(
                    f"-use_ema: {path} has no EMA state (trained with "
                    "ema_decay=0); retrain with -ema_decay or drop the flag")
            member_params = state.ema_params
        out.models.append(model)
        out.params.append(member_params)
        out.steps.append(int(state.step))
        out.cfgs.append(cfg)
        del state  # frees the optimizer moments once GC'd
    if out.ensemble:
        # one img tensor feeds every member's conditional prior, so members
        # that consume decode-time features must share the feature interface
        # (vmmt_f/nmt members ignore v at decode and may mix freely)
        ifaces = {
            (c.model.img_feat_dim, c.model.img_feat_type)
            for c in out.cfgs if consumes_decode_feats(c.model)
        }
        if len(ifaces) > 1:
            raise SystemExit(
                "ensemble members disagree on the image-feature interface "
                f"{sorted(ifaces)}: all vmmt_c members must be trained on "
                "the same feature type/dim (one -img_feats tensor feeds "
                "every conditional prior)")
    return out
