"""EMA (Polyak) parameter averaging: recurrence exactness, skip interaction,
checkpoint round trip, -use_ema loading, release -ema promotion.

Beyond-reference production knob (SURVEY.md's reference has no EMA); the
contract under test is this repo's own: ema = d*ema + (1-d)*params after
every APPLIED update, initialized at the init point, carried in TrainState
and checkpoints, decodable via load_model_spec(use_ema=True).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_train import make_batch, tiny_cfg
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.train.checkpoint import (
    load_checkpoint,
    release_checkpoint,
    save_checkpoint,
)
from variational_mmt_tpu.train.trainer import create_train_state, make_train_step


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_ema_matches_manual_recurrence():
    d = 0.5  # large (1-d) so drift is far above float noise
    cfg = tiny_cfg(ema_decay=d, ema_ramp=False)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)

    # EMA starts AT the init params
    for e, p in zip(_leaves(state.ema_params), _leaves(state.params)):
        np.testing.assert_array_equal(e, p)

    manual = _leaves(state.params)
    for i in range(4):
        state, _ = step(state, make_batch(seed=i))
        manual = [d * e + (1 - d) * p
                  for e, p in zip(manual, _leaves(state.params))]
    for got, want in zip(_leaves(state.ema_params), manual):
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # and the EMA genuinely lags the raw params (it is not a copy)
    diffs = [float(np.abs(e - p).max())
             for e, p in zip(_leaves(state.ema_params), _leaves(state.params))]
    assert max(diffs) > 1e-5


def test_ema_ramp_matches_manual_recurrence():
    """Default ramp: d_n = min(d, (1+n)/(10+n)) with n = 1-indexed update
    count — early steps average instead of anchoring to the init point."""
    d = 0.9
    cfg = tiny_cfg(ema_decay=d)  # ema_ramp defaults True
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)

    manual = _leaves(state.params)
    for i in range(4):
        state, _ = step(state, make_batch(seed=i))
        dn = min(d, (1.0 + (i + 1)) / (10.0 + (i + 1)))
        manual = [dn * e + (1 - dn) * p
                  for e, p in zip(manual, _leaves(state.params))]
    for got, want in zip(_leaves(state.ema_params), manual):
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_ema_ramp_grad_accum_through_sharded_step():
    """EMA x ramp x grad_accum THROUGH the 8-device sharded step (round-4
    gap: only the dryrun checked mesh-level EMA, and its assert was stale —
    this suite-level check pins the ramped recurrence on the mesh)."""
    from variational_mmt_tpu.parallel.mesh import batch_sharding, make_mesh

    d = 0.5
    cfg = tiny_cfg(ema_decay=d, grad_accum=2)  # ema_ramp defaults True
    model = build_model(cfg.model)
    mesh = make_mesh(8)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model, mesh)
    manual = _leaves(state.params)
    for i in range(3):
        batch = jax.device_put(make_batch(seed=i), batch_sharding(mesh))
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        dn = min(d, (1.0 + (i + 1)) / (10.0 + (i + 1)))
        manual = [dn * e + (1 - dn) * p
                  for e, p in zip(manual, _leaves(state.params))]
    for got, want in zip(_leaves(state.ema_params), manual):
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    # same steps single-device == mesh (EMA is a pure re-layout under DP)
    state_1 = create_train_state(cfg, model)
    step_1 = make_train_step(cfg, model)
    for i in range(3):
        state_1, _ = step_1(state_1, make_batch(seed=i))
    for a, b in zip(_leaves(state.ema_params), _leaves(state_1.ema_params)):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


def test_ema_untouched_on_skipped_step():
    cfg = tiny_cfg(ema_decay=0.5, skip_nonfinite=True)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    state, m = step(state, make_batch(seed=0))  # one applied step
    assert float(m["skipped_sum"]) == 0.0
    ema0 = _leaves(state.ema_params)

    bad = make_batch(seed=1)
    bad["img"] = bad["img"].at[0, 0].set(jnp.inf)  # img loss -> non-finite grads
    state, m = step(state, bad)
    assert float(m["skipped_sum"]) == 1.0
    for a, b in zip(_leaves(state.ema_params), ema0):
        np.testing.assert_array_equal(a, b)


def test_ema_off_keeps_state_layout():
    cfg = tiny_cfg()
    assert cfg.train.ema_decay == 0.0
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    assert state.ema_params is None
    step = make_train_step(cfg, model)
    state, _ = step(state, make_batch())
    assert state.ema_params is None


def test_ema_checkpoint_roundtrip_and_use_ema(tmp_path):
    from variational_mmt_tpu.cli.loading import load_model_spec
    from variational_mmt_tpu.data.vocab import Vocab

    cfg = tiny_cfg(ema_decay=0.5)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    for i in range(2):
        state, _ = step(state, make_batch(seed=i))
    toks = [f"w{i}" for i in range(30 - 4)]
    vocab = Vocab.build([toks], max_size=30)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, state, cfg, vocab, vocab)

    restored, _, _, _, _ = load_checkpoint(ckpt + "/step_00000002")
    for a, b in zip(_leaves(restored.ema_params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)

    lm = load_model_spec(ckpt, use_ema=True)
    for a, b in zip(_leaves(lm.params[0]), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)
    lm_raw = load_model_spec(ckpt)
    for a, b in zip(_leaves(lm_raw.params[0]), _leaves(state.params)):
        np.testing.assert_array_equal(a, b)


def test_use_ema_refused_without_ema(tmp_path):
    from variational_mmt_tpu.cli.loading import load_model_spec
    from variational_mmt_tpu.data.vocab import Vocab

    cfg = tiny_cfg()  # ema_decay = 0
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    vocab = Vocab.build([[f"w{i}" for i in range(26)]], max_size=30)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, state, cfg, vocab, vocab)
    with pytest.raises(SystemExit, match="no EMA state"):
        load_model_spec(ckpt, use_ema=True)


def test_release_ema_promotes(tmp_path):
    from variational_mmt_tpu.data.vocab import Vocab

    cfg = tiny_cfg(ema_decay=0.5)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    for i in range(3):
        state, _ = step(state, make_batch(seed=i))
    vocab = Vocab.build([[f"w{i}" for i in range(26)]], max_size=30)
    ckpt = str(tmp_path / "ck")
    path = save_checkpoint(ckpt, state, cfg, vocab, vocab)

    rel = str(tmp_path / "rel")
    release_checkpoint(path, rel, ema=True)
    restored, _, _, _, _ = load_checkpoint(rel)
    for a, b in zip(_leaves(restored.params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)
    # the artifact's (config-mandated) EMA slot re-seeds from its params
    for a, b in zip(_leaves(restored.ema_params), _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)

    # without -ema the raw params ship and the EMA is stripped
    rel2 = str(tmp_path / "rel2")
    release_checkpoint(path, rel2, ema=False)
    restored2, _, _, _, _ = load_checkpoint(rel2)
    for a, b in zip(_leaves(restored2.params), _leaves(state.params)):
        np.testing.assert_array_equal(a, b)

    # -ema on an EMA-less checkpoint is refused
    cfg0 = tiny_cfg()
    state0 = create_train_state(cfg0, model)
    ckpt0 = save_checkpoint(str(tmp_path / "ck0"), state0, cfg0, vocab, vocab)
    with pytest.raises(ValueError, match="no EMA state"):
        release_checkpoint(ckpt0, str(tmp_path / "rel0"), ema=True)
