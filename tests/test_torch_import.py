"""tools/import_torch_checkpoint.py: numerical equivalence of the
torch->native weight mapping, verified against torch itself (torch CPU is
available in this image even though the model stack is pure JAX).

The strongest possible offline check of SURVEY.md §3.2/§3.3 parity: build
the upstream-layout modules IN TORCH (nn.GRU/nn.LSTM encoder, stacked-cell
input-feed decoder, Luong attention, generator), run the reference
computation in torch, import the state dict, and require our full model
forward to reproduce the torch logits."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
from import_torch_checkpoint import (extract_state_dict, extract_vocabs,  # noqa: E402
                                     infer_dims, leaf_paths, load_torch_file,
                                     map_core, merge_into)
from variational_mmt_tpu.config import ModelConfig  # noqa: E402
from variational_mmt_tpu.data.vocab import SPECIALS  # noqa: E402
from variational_mmt_tpu.models.model import build_model, init_params  # noqa: E402

B, S, T = 3, 6, 5
E, H, V = 6, 8, 20
HALF = H // 2


def _onmt_state_dict(rnn_type: str, seed: int = 0):
    """Upstream-layout torch modules + their dotted state dict."""
    torch.manual_seed(seed)
    rnn_cls = {"gru": torch.nn.GRU, "lstm": torch.nn.LSTM}[rnn_type]
    cell_cls = {"gru": torch.nn.GRUCell, "lstm": torch.nn.LSTMCell}[rnn_type]
    mods = {
        "src_emb": torch.nn.Embedding(V, E),
        "tgt_emb": torch.nn.Embedding(V, E),
        "enc_rnn": rnn_cls(E, HALF, num_layers=2, bidirectional=True,
                           batch_first=True),
        "cell0": cell_cls(E + H, H),
        "cell1": cell_cls(H, H),
        "linear_in": torch.nn.Linear(H, H, bias=False),
        "linear_out": torch.nn.Linear(2 * H, H, bias=False),
        "generator": torch.nn.Linear(H, V),
        "bridge0": torch.nn.Linear(2 * H if rnn_type == "lstm" else H, H),
        "bridge1": torch.nn.Linear(2 * H if rnn_type == "lstm" else H, H),
    }
    for m in mods.values():
        for p in m.parameters():
            torch.nn.init.uniform_(p, -0.5, 0.5)
    sd = {}
    sd["encoder.embeddings.emb_luts.0.weight"] = mods["src_emb"].weight
    sd["decoder.embeddings.emb_luts.0.weight"] = mods["tgt_emb"].weight
    for k, v in mods["enc_rnn"].state_dict().items():
        sd[f"encoder.rnn.{k}"] = v
    for l in (0, 1):
        for k, v in mods[f"cell{l}"].state_dict().items():
            sd[f"decoder.rnn.layers.{l}.{k}"] = v
    sd["decoder.attn.linear_in.weight"] = mods["linear_in"].weight
    sd["decoder.attn.linear_out.weight"] = mods["linear_out"].weight
    sd["generator.0.weight"] = mods["generator"].weight
    sd["generator.0.bias"] = mods["generator"].bias
    for l in (0, 1):
        sd[f"decoder.bridge.{l}.weight"] = mods[f"bridge{l}"].weight
        sd[f"decoder.bridge.{l}.bias"] = mods[f"bridge{l}"].bias
    sd = {k: v.detach().clone() for k, v in sd.items()}
    return mods, sd


@torch.no_grad()
def _torch_forward(mods, src, tgt_in, rnn_type: str):
    """The reference computation (SURVEY.md §3.2): bi-RNN encode, bridge,
    input-feed stacked-cell decode with Luong general attention."""
    is_lstm = rnn_type == "lstm"
    emb = mods["src_emb"](torch.from_numpy(src))
    if is_lstm:
        mem, (h_n, c_n) = mods["enc_rnn"](emb)
    else:
        mem, h_n = mods["enc_rnn"](emb)
    inits = []
    for l in (0, 1):
        h_cat = torch.cat([h_n[2 * l], h_n[2 * l + 1]], dim=-1)
        if is_lstm:
            c_cat = torch.cat([c_n[2 * l], c_n[2 * l + 1]], dim=-1)
            h_cat = torch.cat([h_cat, c_cat], dim=-1)
        inits.append(torch.tanh(mods[f"bridge{l}"](h_cat)))
    h = [inits[0], inits[1]]
    c = [torch.zeros_like(inits[0]), torch.zeros_like(inits[1])]
    feed = torch.zeros(src.shape[0], H)
    emb_t = mods["tgt_emb"](torch.from_numpy(tgt_in))
    logits = []
    for t in range(tgt_in.shape[1]):
        x = torch.cat([emb_t[:, t], feed], dim=-1)
        if is_lstm:
            h[0], c[0] = mods["cell0"](x, (h[0], c[0]))
            h[1], c[1] = mods["cell1"](h[0], (h[1], c[1]))
        else:
            h[0] = mods["cell0"](x, h[0])
            h[1] = mods["cell1"](h[0], h[1])
        q = mods["linear_in"](h[1])
        scores = torch.einsum("bh,bsh->bs", q, mem)
        probs = torch.softmax(scores, dim=-1)
        ctx = torch.einsum("bs,bsh->bh", probs, mem)
        attn_h = torch.tanh(mods["linear_out"](torch.cat([ctx, h[1]], -1)))
        feed = attn_h
        logits.append(mods["generator"](attn_h))
    return torch.stack(logits, dim=1).numpy()


def _import_params(sd_np, rnn_type: str):
    cfg = ModelConfig(model_type="nmt", src_vocab_size=V, tgt_vocab_size=V,
                      emb_dim=E, hidden_dim=H, enc_layers=2, dec_layers=2,
                      rnn_type=rnn_type, compute_dtype="float32")
    model = build_model(cfg)
    params = jax.tree.map(np.asarray,
                          init_params(model, jax.random.PRNGKey(7)))
    consumed = set()
    updates = map_core(sd_np, consumed)
    filled, mismatched, unknown = merge_into(params, updates)
    assert not mismatched, mismatched
    assert not unknown, unknown
    assert sorted(set(sd_np) - consumed) == []
    # every target leaf must be overwritten for a full-core nmt import
    assert sorted(set(leaf_paths(params)) - set(filled)) == []
    return model, params


@pytest.mark.parametrize("rnn_type", ["gru", "lstm"])
def test_forward_equivalence_vs_torch(rnn_type):
    mods, sd = _onmt_state_dict(rnn_type)
    sd_np = {k: v.float().numpy() for k, v in sd.items()}
    rng = np.random.RandomState(3)
    src = rng.randint(4, V, size=(B, S)).astype(np.int32)
    tgt_in = rng.randint(4, V, size=(B, T)).astype(np.int32)
    tgt_in[:, 0] = 2  # BOS
    ref = _torch_forward(mods, src, tgt_in, rnn_type)

    model, params = _import_params(sd_np, rnn_type)
    out = model.apply({"params": params}, jnp.asarray(src), jnp.asarray(tgt_in),
                      deterministic=True)
    got = np.asarray(out["logits"], np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_infer_dims():
    _, sd = _onmt_state_dict("gru")
    dims = infer_dims({k: v.float().numpy() for k, v in sd.items()})
    assert dims["src_vocab_size"] == V and dims["tgt_vocab_size"] == V
    assert dims["emb_dim"] == E and dims["hidden_dim"] == H
    assert dims["enc_layers"] == 2 and dims["dec_layers"] == 2
    assert dims["rnn_type"] == "gru" and dims["attn_type"] == "general"
    assert dims["input_feed"] is True


def test_stub_unpickler_and_vocab_extraction(tmp_path):
    """Classes from the (uninstalled) upstream package unpickle as stubs,
    and legacy onmt Dict vocabs (idxToLabel) are recovered from them."""
    import types

    fake = types.ModuleType("onmt_fake_pkg")

    class Dict:
        pass

    class Opt:
        pass

    Dict.__module__ = Opt.__module__ = "onmt_fake_pkg"
    Dict.__qualname__, Opt.__qualname__ = "Dict", "Opt"
    fake.Dict, fake.Opt = Dict, Opt
    sys.modules["onmt_fake_pkg"] = fake
    try:
        itos = SPECIALS + [f"w{i}" for i in range(V - 4)]
        d = Dict()
        d.idxToLabel = {i: s for i, s in enumerate(itos)}
        opt = Opt()
        opt.rnn_size = H
        ckpt = {"model": {"x": torch.zeros(2, 2)},
                "dicts": {"src": d, "tgt": d}, "opt": opt}
        path = tmp_path / "ck.pt"
        with open(path, "wb") as f:
            torch.save(ckpt, f, pickle_protocol=pickle.HIGHEST_PROTOCOL)
    finally:
        del sys.modules["onmt_fake_pkg"]

    loaded = load_torch_file(str(path))
    assert repr(loaded["opt"]).startswith("<stub onmt_fake_pkg.Opt")
    assert loaded["opt"].rnn_size == H
    s, t = extract_vocabs(loaded)
    assert s == itos and t == itos
    assert extract_state_dict(loaded)["x"].shape == (2, 2)


def test_cli_end_to_end(tmp_path):
    """torch.save an OpenNMT-layout checkpoint -> CLI import -> native
    checkpoint loads and beam-decodes."""
    mods, sd = _onmt_state_dict("gru", seed=5)
    itos = SPECIALS + [f"w{i}" for i in range(V - 4)]
    gen = {k[len("generator."):]: v for k, v in sd.items()
           if k.startswith("generator.")}
    model_sd = {k: v for k, v in sd.items() if not k.startswith("generator.")}
    ckpt = {"model": model_sd, "generator": gen,
            "vocab": {"src": itos, "tgt": itos}, "epoch": 7}
    pt = tmp_path / "upstream.pt"
    torch.save(ckpt, pt)

    out_dir = tmp_path / "native_ckpt"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "import_torch_checkpoint.py"),
         "-ckpt", str(pt), "-out", str(out_dir), "-strict"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "mapped" in r.stdout

    from variational_mmt_tpu.config import DecodeConfig
    from variational_mmt_tpu.decode.translator import Translator
    from variational_mmt_tpu.train.checkpoint import (latest_checkpoint,
                                                      load_checkpoint)

    state, cfg, model, sv, tv = load_checkpoint(latest_checkpoint(str(out_dir)))
    assert cfg.model.model_type == "nmt"
    assert cfg.model.hidden_dim == H and cfg.model.emb_dim == E
    assert sv.itos == itos
    # imported embedding row-exact
    np.testing.assert_allclose(
        np.asarray(state.params["src_embed"]["embedding"]),
        sd["encoder.embeddings.emb_luts.0.weight"].numpy(), rtol=0, atol=0)
    tr = Translator(model, state.params, sv, tv,
                    DecodeConfig(beam_size=2, max_length=8, batch_size=4),
                    buckets=(8,))
    nbest = tr.translate_tokens([["w1", "w2", "w3"], ["w4", "w5"]])
    assert len(nbest) == 2
    for hyp in nbest:
        score, text = hyp[0][0], hyp[0][1]
        assert np.isfinite(score) and isinstance(text, str)


def test_bridgeless_refused_without_allow_partial(tmp_path, capsys):
    """A source checkpoint with no bridge tensors (OpenNMT-py's default
    decoder-init behavior, unrepresentable here) is refused unless
    -allow_partial (ADVICE r3: silent decode divergence)."""
    from import_torch_checkpoint import main

    _, sd = _onmt_state_dict("gru", seed=3)
    sd = {k: v for k, v in sd.items() if "bridge" not in k}
    itos = SPECIALS + [f"w{i}" for i in range(V - 4)]
    ckpt = {"model": sd, "vocab": {"src": itos, "tgt": itos}}
    pt = tmp_path / "nobridge.pt"
    torch.save(ckpt, pt)
    cli = ["-ckpt", str(pt), "-out", str(tmp_path / "o")]
    with pytest.raises(SystemExit) as ei:
        main(cli)
    assert "bridge" in str(ei.value) and "-allow_partial" in str(ei.value)
    capsys.readouterr()
    # opt-in writes (with the loud unfilled report)
    main(cli + ["-allow_partial"])
    assert "fresh init" in capsys.readouterr().out


def test_imported_config_defaults_to_float32(tmp_path, capsys):
    """The torch-equality guarantee was validated at f32; the CLI must not
    silently bake the framework's bfloat16 default into imported configs."""
    from import_torch_checkpoint import main

    from variational_mmt_tpu.train.checkpoint import (latest_checkpoint,
                                                      load_checkpoint)

    _, sd = _onmt_state_dict("gru", seed=4)
    itos = SPECIALS + [f"w{i}" for i in range(V - 4)]
    torch.save({"model": sd, "vocab": {"src": itos, "tgt": itos}},
               tmp_path / "up.pt")
    main(["-ckpt", str(tmp_path / "up.pt"), "-out", str(tmp_path / "o")])
    _, cfg, _, _, _ = load_checkpoint(latest_checkpoint(str(tmp_path / "o")))
    assert cfg.model.compute_dtype == "float32"
    capsys.readouterr()


def test_merge_into_structure_disagreement():
    """A -map rule landing a tensor on an interior node (or a subtree on a
    leaf) is classified as an unknown target, not an AttributeError."""
    params = {"decoder": {"step": {"k": np.zeros((2, 2), np.float32)}},
              "leafy": np.zeros(3, np.float32)}
    updates = {"decoder": np.ones((2, 2), np.float32),      # tensor -> subtree
               "leafy": {"sub": np.ones(3, np.float32)}}    # subtree -> leaf
    filled, mismatched, unknown = merge_into(params, updates)
    assert not filled and not mismatched
    assert len(unknown) == 2
    assert any("decoder" in u for u in unknown)
    assert any("leafy" in u for u in unknown)


def test_noncontiguous_vocab_refused(tmp_path):
    """Legacy idxToLabel with gaps must refuse (compaction silently shifts
    ids) instead of producing a wrong vocab."""
    from import_torch_checkpoint import _vocab_itos

    with pytest.raises(SystemExit) as ei:
        _vocab_itos(type("D", (), {"idxToLabel": {0: "a", 1: "b", 5: "c"}})())
    assert "non-contiguous" in str(ei.value)


def test_strict_flags_unmapped(tmp_path, capsys):
    """-strict refuses a checkpoint with an unconsumed (fork-specific)
    tensor; without -strict it imports with a loud report. Runs main()
    in-process (the subprocess CLI path is covered by test_cli_end_to_end)."""
    from import_torch_checkpoint import main

    _, sd = _onmt_state_dict("gru", seed=9)
    sd = dict(sd)
    sd["inf_net.weird.weight"] = torch.zeros(3, 3)
    itos = SPECIALS + [f"w{i}" for i in range(V - 4)]
    ckpt = {"model": sd, "vocab": {"src": itos, "tgt": itos}}
    pt = tmp_path / "up.pt"
    torch.save(ckpt, pt)
    cli = ["-ckpt", str(pt), "-out", str(tmp_path / "o"), "-strict"]
    with pytest.raises(SystemExit) as ei:
        main(cli)
    assert "-strict" in str(ei.value)
    assert "inf_net.weird.weight" in capsys.readouterr().out
    # non-strict: imports with a loud report
    main(cli[:-1])
    assert "UNCONSUMED" in capsys.readouterr().out
