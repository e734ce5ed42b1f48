"""jax.export StableHLO decode artifacts (tools/export_decode.py): export a
tiny checkpoint, reload through the model-code-free ExportedDecoder runtime,
and match the live Translator (the tool also self-verifies every blob before
publishing — this test covers the artifact-dir + runtime path on top)."""

import numpy as np
import pytest

from tests.test_train import make_batch, tiny_cfg
from variational_mmt_tpu.config import DecodeConfig
from variational_mmt_tpu.data.vocab import Vocab
from variational_mmt_tpu.decode.translator import Translator
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.train.checkpoint import save_checkpoint
from variational_mmt_tpu.train.trainer import create_train_state, make_train_step


def _tiny_checkpoint(tmp_path, **train_kw):
    cfg = tiny_cfg(**train_kw)
    model = build_model(cfg.model)
    state = create_train_state(cfg, model)
    step = make_train_step(cfg, model)
    state, _ = step(state, make_batch())
    vocab = Vocab.build([[f"w{i}" for i in range(26)]], max_size=30)
    path = save_checkpoint(str(tmp_path / "ck"), state, cfg, vocab, vocab)
    return path, cfg, model, state, vocab


def test_export_roundtrip_matches_live(tmp_path):
    from tools.export_decode import load_exported, main

    ck, cfg, model, state, vocab = _tiny_checkpoint(tmp_path)
    out = str(tmp_path / "art")
    main(["-model", ck, "-output", out, "-batch_size", "4", "-buckets", "8",
          "-beam_size", "2", "-max_length", "10"])

    dec = load_exported(out)
    assert dec.manifest["model_type"] == cfg.model.model_type
    src = [[5, 6, 7], [8, 9], [10, 11, 12, 13], [14], [15, 16]]
    img = np.random.default_rng(1).standard_normal((5, 16)).astype(np.float32)
    res = dec.decode(src, img)

    dcfg = DecodeConfig(beam_size=2, max_length=10, batch_size=4, alpha=0.6)
    live = Translator(model, state.params, vocab, vocab, dcfg,
                      buckets=[8]).translate_ids(src, img)
    assert [r[0][1] for r in res] == [l[0][1] for l in live]
    np.testing.assert_allclose([r[0][0] for r in res],
                               [l[0][0] for l in live], rtol=1e-5, atol=1e-5)
    # full n-best, not just the top hypothesis
    assert all(len(r) == 2 for r in res)


def test_export_refuses_ensemble_and_missing_ema(tmp_path):
    from tools.export_decode import main

    ck, *_ = _tiny_checkpoint(tmp_path)
    with pytest.raises(SystemExit, match="single-checkpoint"):
        main(["-model", f"{ck},{ck}", "-output", str(tmp_path / "a"),
              "-buckets", "8"])
    with pytest.raises(SystemExit, match="no EMA state"):
        main(["-model", ck, "-output", str(tmp_path / "b"),
              "-buckets", "8", "-use_ema"])
