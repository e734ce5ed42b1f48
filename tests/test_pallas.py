"""Pallas fused GRU-scan kernel: interpret-mode equivalence vs the XLA-scan
UniGRU and vs a numpy step-by-step reference (kernels run in interpret mode
on the CPU test mesh; the compiled path is exercised on real TPU by bench/
tools scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.models.gru import UniGRU
from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan, pallas_available

pytestmark = pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")


def _np_ref(xp, m, h0, Wh, bh, reverse=False):
    B, T, H3 = xp.shape
    H = H3 // 3

    def sig(v):
        return 1 / (1 + np.exp(-v))

    h = h0.copy()
    outs = np.zeros((B, T, H), np.float32)
    order = range(T - 1, -1, -1) if reverse else range(T)
    for t in order:
        hp = h @ Wh + bh
        xr, xz, xn = np.split(xp[:, t], 3, -1)
        hr, hz, hn = np.split(hp, 3, -1)
        r, z = sig(xr + hr), sig(xz + hz)
        n = np.tanh(xn + r * hn)
        h_new = (1 - z) * n + z * h
        h = np.where(m[:, t : t + 1] > 0, h_new, h)
        outs[:, t] = h
    return outs, h


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_kernel_matches_numpy(reverse):
    B, T, H = 8, 6, 8
    rng = np.random.default_rng(0)
    xp = rng.standard_normal((B, T, 3 * H)).astype(np.float32)
    m = np.ones((B, T), np.float32)
    m[2, 4:] = 0
    m[5, 1:] = 0
    h0 = np.zeros((B, H), np.float32)
    Wh = (rng.standard_normal((H, 3 * H)) * 0.3).astype(np.float32)
    bh = (rng.standard_normal(3 * H) * 0.1).astype(np.float32)
    outs, fin = gru_layer_scan(
        jnp.array(xp), jnp.array(m), jnp.array(h0), jnp.array(Wh), jnp.array(bh),
        reverse=reverse, interpret=True,
    )
    wo, wf = _np_ref(xp, m, h0, Wh, bh, reverse)
    np.testing.assert_allclose(np.asarray(outs), wo, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fin), wf, rtol=1e-3, atol=1e-4)


def test_gru_kernel_matches_unigru_module():
    """Drop-in equivalence with models/gru.py UniGRU given the same params."""
    B, T, E, H = 4, 5, 6, 8
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    m = np.ones((B, T), np.float32)
    m[1, 3:] = 0
    mod = UniGRU(hidden=H)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(m))["params"]
    outs_ref, fin_ref = mod.apply({"params": params}, jnp.array(x), jnp.array(m))

    Wi = jnp.asarray(params["ih"]["kernel"])
    bi = jnp.asarray(params["ih"]["bias"])
    Wh = jnp.asarray(params["hh_kernel"])
    bh = jnp.asarray(params["hh_bias"])
    x_proj = jnp.array(x) @ Wi + bi
    outs, fin = gru_layer_scan(
        x_proj, jnp.array(m), jnp.zeros((B, H)), Wh, bh, interpret=True
    )
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_ref), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(fin_ref), rtol=1e-3, atol=1e-4)


def test_gru_kernel_vjp_matches_autodiff():
    """Custom-VJP fused scan gradients == jax.grad through the XLA scan."""
    from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan_ad

    B, T, H = 4, 5, 8
    rng = np.random.default_rng(2)
    xp = jnp.asarray(rng.standard_normal((B, T, 3 * H)), jnp.float32)
    m = np.ones((B, T), np.float32)
    m[1, 3:] = 0
    m[3, 1:] = 0
    m = jnp.asarray(m)
    h0 = jnp.asarray(rng.standard_normal((B, H)) * 0.1, jnp.float32)
    Wh = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32)
    go = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    gf = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)

    def ref_scan(xp, h0, Wh, bh):
        from variational_mmt_tpu.models.gru import gru_gates

        def step(h, xs):
            x_t, m_t = xs
            h_new = gru_gates(x_t, h @ Wh + bh, h)
            h = jnp.where(m_t[:, None] > 0, h_new, h)
            return h, h

        fin, outs = jax.lax.scan(step, h0, (xp.swapaxes(0, 1), m.swapaxes(0, 1)))
        return outs.swapaxes(0, 1), fin

    def loss_ref(xp, h0, Wh, bh):
        outs, fin = ref_scan(xp, h0, Wh, bh)
        return (outs * go).sum() + (fin * gf).sum()

    def loss_ker(xp, h0, Wh, bh):
        outs, fin = gru_layer_scan_ad(xp, m, h0, Wh, bh, False, True)
        return (outs * go).sum() + (fin * gf).sum()

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xp, h0, Wh, bh)
    got = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(xp, h0, Wh, bh)
    for w, g, name in zip(want, got, ["dx", "dh0", "dWh", "dbh"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4, err_msg=name)


def test_gru_kernel_vjp_reverse():
    from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan_ad

    B, T, H = 2, 4, 8
    rng = np.random.default_rng(3)
    xp = jnp.asarray(rng.standard_normal((B, T, 3 * H)), jnp.float32)
    m = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 1, 1]], np.float32))
    h0 = jnp.zeros((B, H), jnp.float32)
    Wh = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32)

    def ref_scan_rev(xp, h0, Wh, bh):
        from variational_mmt_tpu.models.gru import gru_gates

        def step(h, xs):
            x_t, m_t = xs
            h_new = gru_gates(x_t, h @ Wh + bh, h)
            h = jnp.where(m_t[:, None] > 0, h_new, h)
            return h, h

        fin, outs = jax.lax.scan(step, h0, (xp.swapaxes(0, 1), m.swapaxes(0, 1)), reverse=True)
        return outs.swapaxes(0, 1), fin

    def loss_ref(xp):
        outs, fin = ref_scan_rev(xp, h0, Wh, bh)
        return (outs**2).sum() + (fin**2).sum()

    def loss_ker(xp):
        outs, fin = gru_layer_scan_ad(xp, m, h0, Wh, bh, True, True)
        return (outs**2).sum() + (fin**2).sum()

    np.testing.assert_allclose(float(loss_ker(xp)), float(loss_ref(xp)), rtol=1e-5)
    w = jax.grad(loss_ref)(xp)
    g = jax.grad(loss_ker)(xp)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_kernel_reset_matches_xla(reverse):
    """Sequence-packing resets: kernel fwd AND custom-VJP grads == the
    cell_layer_scan XLA path with the same reset stream."""
    from variational_mmt_tpu.models.gru import cell_layer_scan
    from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan_ad

    B, T, H = 4, 7, 8
    rng = np.random.default_rng(5)
    xp = jnp.asarray(rng.standard_normal((B, T, 3 * H)), jnp.float32)
    m = np.ones((B, T), np.float32)
    m[1, 5:] = 0
    m[2, 6:] = 0
    m = jnp.asarray(m)
    # segment boundaries mid-row (packed layout: resets at valid positions)
    r = np.zeros((B, T), np.float32)
    r[:, 0] = 1
    r[0, 3] = 1
    r[1, 2] = 1
    r[3, 4] = 1
    r = jnp.asarray(r)
    h0 = jnp.asarray(rng.standard_normal((B, H)) * 0.1, jnp.float32)
    Wh = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32)
    go = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    gf = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)

    def loss_ref(xp, h0, Wh, bh):
        outs, fin = cell_layer_scan(xp, h0, Wh, bh, "gru", 1, mask=m,
                                    reverse=reverse, reset=r)
        return (outs * go).sum() + (fin * gf).sum()

    def loss_ker(xp, h0, Wh, bh):
        outs, fin = gru_layer_scan_ad(xp, m, h0, Wh, bh, reverse, True, r)
        return (outs * go).sum() + (fin * gf).sum()

    np.testing.assert_allclose(float(loss_ker(xp, h0, Wh, bh)),
                               float(loss_ref(xp, h0, Wh, bh)), rtol=1e-5)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xp, h0, Wh, bh)
    got = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(xp, h0, Wh, bh)
    for w, g, name in zip(want, got, ["dx", "dh0", "dWh", "dbh"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3,
                                   atol=2e-4, err_msg=name)


def test_packed_forward_pallas_matches_xla():
    """The packed model forward with use_pallas=True (interpret) == the XLA
    packed forward: same loss, same grads (the packed encoder rides the
    reset-aware kernel; the packed decoder stays XLA by design)."""
    from tests.test_pack import (_mcfg, _packed_batch, _loss_packed,
                                 _sentences, D_IMG)
    from variational_mmt_tpu.config import Config, TrainConfig
    from variational_mmt_tpu.models.model import build_model, init_params

    rng = np.random.default_rng(11)
    sents = _sentences(rng, 4)
    img = rng.standard_normal((4, D_IMG)).astype(np.float32)
    pb, seg_mask = _packed_batch(sents, [[0, 1], [2, 3]], 20, 2, img)
    cfg_x = Config(model=_mcfg(), train=TrainConfig(pack=True))
    cfg_p = Config(model=_mcfg(use_pallas=True), train=TrainConfig(pack=True))
    model_x = build_model(cfg_x.model)
    model_p = build_model(cfg_p.model)
    params = init_params(model_x, jax.random.PRNGKey(7))

    def lx(p):
        return _loss_packed(model_x, p, pb, seg_mask, cfg_x)[0]

    def lp(p):
        return _loss_packed(model_p, p, pb, seg_mask, cfg_p)[0]

    np.testing.assert_allclose(float(lp(params)), float(lx(params)),
                               rtol=1e-4)
    gx = jax.tree.leaves(jax.grad(lx)(params))
    gp = jax.tree.leaves(jax.grad(lp)(params))
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3,
                                   atol=5e-4)


def test_use_pallas_model_equivalence():
    """use_pallas=True (interpret on CPU) produces the same training forward
    and gradients as the XLA scan path, over identical params."""
    from variational_mmt_tpu.config import ModelConfig
    from variational_mmt_tpu.models.model import build_model, init_params
    from variational_mmt_tpu.train.loss import compute_loss
    from variational_mmt_tpu.config import Config

    kw = dict(model_type="vmmt_f", src_vocab_size=30, tgt_vocab_size=30, emb_dim=8,
              hidden_dim=16, enc_layers=1, dec_layers=1, latent_dim=4, img_feat_dim=8,
              dropout=0.0, word_dropout=0.0, compute_dtype="float32")
    m_x = build_model(ModelConfig(**kw))
    m_p = build_model(ModelConfig(**kw, use_pallas=True))
    params = init_params(m_x, jax.random.PRNGKey(0))
    src = jnp.array([[4, 5, 6, 0], [7, 8, 0, 0]], jnp.int32)
    tgt_in = jnp.array([[2, 9, 10, 0], [2, 11, 0, 0]], jnp.int32)
    tgt_out = jnp.array([[9, 10, 3, 0], [11, 3, 0, 0]], jnp.int32)
    img = jnp.ones((2, 8), jnp.float32)
    cfg = Config()

    def loss(model, p):
        out = model.apply({"params": p}, src, tgt_in, img, deterministic=True, sample=False)
        l, _ = compute_loss(out, tgt_out, jnp.ones(2), img, model.cfg, cfg.train, jnp.int32(0))
        return l

    # identical param trees (pallas path reuses the same names)
    lx = float(loss(m_x, params))
    lp = float(loss(m_p, params))
    np.testing.assert_allclose(lp, lx, rtol=1e-5)
    gx = jax.grad(lambda p: loss(m_x, p))(params)
    gp = jax.grad(lambda p: loss(m_p, p))(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4)


def test_checkpoint_compatible_across_paths(tmp_path):
    """Params saved from the XLA-scan model load into the pallas model and
    decode identically (same parameter tree either way)."""
    from variational_mmt_tpu.config import Config, DecodeConfig, ModelConfig
    from variational_mmt_tpu.data.vocab import SPECIALS, Vocab
    from variational_mmt_tpu.decode.translator import Translator
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
    from variational_mmt_tpu.train.trainer import create_train_state

    kw = dict(model_type="vmmt_f", src_vocab_size=24, tgt_vocab_size=24, emb_dim=8,
              hidden_dim=16, enc_layers=1, dec_layers=1, latent_dim=4, img_feat_dim=8,
              dropout=0.0, compute_dtype="float32")
    cfg = Config(model=ModelConfig(**kw), decode=DecodeConfig(beam_size=2, max_length=8))
    model_x = build_model(cfg.model)
    state = create_train_state(cfg, model_x)
    save_checkpoint(str(tmp_path), state, cfg, Vocab(list(SPECIALS) + [f"w{i}" for i in range(20)]),
                    Vocab(list(SPECIALS) + [f"w{i}" for i in range(20)]), keep=1)
    state2, cfg2, _, sv, tv = load_checkpoint(latest_checkpoint(str(tmp_path)))
    model_p = build_model(ModelConfig(**kw, use_pallas=True))
    import numpy as np

    feats = np.ones((1, 8), np.float32)
    out_x = Translator(model_x, state2.params, sv, tv, cfg.decode, buckets=[8]).translate_ids([[5, 6, 7]], feats)
    out_p = Translator(model_p, state2.params, sv, tv, cfg.decode, buckets=[8]).translate_ids([[5, 6, 7]], feats)
    assert [ids for _, ids in out_x[0]] == [ids for _, ids in out_p[0]]


def test_gru_kernel_batch_chunking():
    """Large batches are split into VMEM-sized row chunks transparently."""
    from variational_mmt_tpu.ops.pallas.gru import gru_layer_scan

    B, T, H = 20, 4, 8
    rng = np.random.default_rng(5)
    xp = jnp.asarray(rng.standard_normal((B, T, 3 * H)), jnp.float32)
    m = jnp.ones((B, T))
    h0 = jnp.zeros((B, H))
    Wh = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.3, jnp.float32)
    bh = jnp.zeros(3 * H)
    full = gru_layer_scan(xp, m, h0, Wh, bh, False, True)
    chunked = gru_layer_scan(xp, m, h0, Wh, bh, False, True, row_chunk=8)
    np.testing.assert_allclose(np.asarray(chunked[0]), np.asarray(full[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(chunked[1]), np.asarray(full[1]), rtol=1e-6)


# ----------------------------------------------------------------------
# fused input-feed decoder kernel (ops/pallas/decoder.py)
# ----------------------------------------------------------------------
def _dec_setup(seed=0, B=12, T=7, S=5, H=16, dropout=False):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.array(rng.standard_normal(s) * 0.3, jnp.float32)
    emb_proj = r(B, T, 3 * H)
    dmid = (jnp.array(rng.random((B, T, H)) > 0.3, jnp.float32) / 0.7
            if dropout else jnp.ones((B, T, H), jnp.float32))
    h00, h01 = r(B, H), r(B, H)
    Wfeed, Wh0, Wmid, Wh1 = r(H, 3 * H), r(H, 3 * H), r(H, 3 * H), r(H, 3 * H)
    bh0, bmid, bh1 = r(3 * H), r(3 * H), r(3 * H)
    keys, mem_v = r(B, S, H), r(B, S, H)
    Wc_q = r(H, H)
    mask = np.ones((B, S), np.float32)
    mask[:, -1] = 0  # padded source tail
    mask_bias = jnp.array((1.0 - mask) * -1e9, jnp.float32)
    return (emb_proj, dmid, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
            keys, mem_v, Wc_q, mask_bias)


@pytest.mark.parametrize("dropout", [False, True])
@pytest.mark.parametrize("row_chunk", [0, 8])
def test_pallas_decoder_fwd_matches_jax(dropout, row_chunk):
    from variational_mmt_tpu.models.fused_decoder import _fwd_scan
    from variational_mmt_tpu.ops.pallas.decoder import decoder_fwd_pallas

    args = _dec_setup(dropout=dropout)
    want_attn, want_h0, want_h1, want_pr = _fwd_scan(*args, unroll=1)
    got_attn, got_h0, got_h1, got_pr = decoder_fwd_pallas(
        *args, interpret=True, row_chunk=row_chunk
    )
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(want_attn),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h0), np.asarray(want_h0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h1), np.asarray(want_h1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_pr), np.asarray(want_pr),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("row_chunk", [0, 8])
def test_pallas_decoder_grads_match_autodiff(row_chunk):
    """Full VJP vs jax.grad through the (autodiff-able) _fwd_scan: every
    differentiable input's gradient must match."""
    from variational_mmt_tpu.models.fused_decoder import _fwd_scan
    from variational_mmt_tpu.ops.pallas.decoder import fused_decoder_pallas

    args = _dec_setup(dropout=True)
    rng = np.random.default_rng(1)
    B, T, H = args[0].shape[0], args[0].shape[1], args[2].shape[1]
    S = args[11].shape[1]
    ga = jnp.array(rng.standard_normal((B, T, H)) * 0.1, jnp.float32)
    gp = jnp.array(rng.standard_normal((B, T, S)) * 0.1, jnp.float32)

    # differentiable positions: all except dmid (3-arg index 1) and mask_bias
    diff_idx = [0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13]

    def obj_ref(*dargs):
        full = list(args)
        for i, a in zip(diff_idx, dargs):
            full[i] = a
        attn, _, _, probs = _fwd_scan(*full, unroll=1)
        return (attn * ga).sum() + (probs * gp).sum()

    def obj_pal(*dargs):
        full = list(args)
        for i, a in zip(diff_idx, dargs):
            full[i] = a
        attn, probs = fused_decoder_pallas(*full, True, row_chunk)
        return (attn * ga).sum() + (probs * gp).sum()

    dargs = tuple(args[i] for i in diff_idx)
    g_ref = jax.grad(obj_ref, argnums=tuple(range(len(dargs))))(*dargs)
    g_pal = jax.grad(obj_pal, argnums=tuple(range(len(dargs))))(*dargs)
    for i, (a, b) in enumerate(zip(g_ref, g_pal)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6,
            err_msg=f"grad mismatch for arg {diff_idx[i]}",
        )


def test_use_pallas_model_equivalence_2layer_decoder():
    """dec_layers=2 routes through the fused Pallas decoder kernel: same
    loss/gradients as the XLA nn.scan path over identical params."""
    from variational_mmt_tpu.config import Config, ModelConfig
    from variational_mmt_tpu.models.model import build_model, init_params
    from variational_mmt_tpu.train.loss import compute_loss

    kw = dict(model_type="vmmt_c", src_vocab_size=30, tgt_vocab_size=30, emb_dim=8,
              hidden_dim=16, enc_layers=1, dec_layers=2, latent_dim=4, img_feat_dim=8,
              dropout=0.0, word_dropout=0.0, compute_dtype="float32",
              z_cond="init+input")
    m_x = build_model(ModelConfig(**kw))
    m_p = build_model(ModelConfig(**kw, use_pallas=True))
    params = init_params(m_x, jax.random.PRNGKey(0))
    src = jnp.array([[4, 5, 6, 0], [7, 8, 0, 0]], jnp.int32)
    tgt_in = jnp.array([[2, 9, 10, 0], [2, 11, 0, 0]], jnp.int32)
    tgt_out = jnp.array([[9, 10, 3, 0], [11, 3, 0, 0]], jnp.int32)
    img = jnp.ones((2, 8), jnp.float32)
    cfg = Config()

    def loss(model, p):
        out = model.apply({"params": p}, src, tgt_in, img, deterministic=True, sample=False)
        l, _ = compute_loss(out, tgt_out, jnp.ones(2), img, model.cfg, cfg.train, jnp.int32(0))
        return l

    np.testing.assert_allclose(float(loss(m_p, params)), float(loss(m_x, params)), rtol=1e-5)
    gx = jax.grad(lambda p: loss(m_x, p))(params)
    gp = jax.grad(lambda p: loss(m_p, p))(params)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gx), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(gp), key=str),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3,
                                   atol=1e-4, err_msg=str(ka))


# ----------------------------------------------------------------------
# fused decode-step kernel (ops/pallas/decode_step.py, round-4)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("row_chunk", [0, 8])
def test_pallas_decode_step_matches_fwd_scan(row_chunk):
    """One fused step == step 0 of the (exactness-proven) _fwd_scan
    reference, for carry, attention output and probs."""
    from variational_mmt_tpu.models.fused_decoder import _fwd_scan
    from variational_mmt_tpu.ops.pallas.decode_step import decode_step_pallas

    (emb_proj, _, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1,
     keys, mem_v, Wc_q, mask_bias) = _dec_setup(seed=11)
    B, _, H3 = emb_proj.shape
    H = H3 // 3
    dmid1 = jnp.ones((B, 1, H), jnp.float32)
    want_attn, want_h0, want_h1, want_pr = _fwd_scan(
        emb_proj[:, :1], dmid1, h00, h01, Wfeed, Wh0, bh0, Wmid, bmid,
        Wh1, bh1, keys, mem_v, Wc_q, mask_bias, unroll=1)
    # the step's input feed is the previous attn output; _fwd_scan starts
    # from feed=0, so compare against a zero-feed step
    got_h0, got_h1, got_attn, got_pr = decode_step_pallas(
        emb_proj[:, 0], h00, h01, jnp.zeros((B, H), jnp.float32),
        Wfeed, Wh0, bh0, Wmid, bmid, Wh1, bh1, keys, mem_v, Wc_q,
        mask_bias, interpret=True, row_chunk=row_chunk)
    np.testing.assert_allclose(np.asarray(got_h0), np.asarray(want_h0[:, 0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h1), np.asarray(want_h1[:, 0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(want_attn[:, 0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_pr), np.asarray(want_pr[:, 0]),
                               rtol=1e-5, atol=1e-6)


def test_pallas_step_beam_equivalence():
    """DecodeConfig.pallas_step=True (interpret on CPU) must reproduce the
    XLA beam token-for-token and score-for-score through the full
    translate fn (incl. nonzero input feed after step 0, z conditioning,
    and padded source rows)."""
    from variational_mmt_tpu.config import DecodeConfig, ModelConfig
    from variational_mmt_tpu.decode.translator import make_translate_fn
    from variational_mmt_tpu.models.model import build_model, init_params

    cfg = ModelConfig(
        model_type="vmmt_c", src_vocab_size=40, tgt_vocab_size=40, emb_dim=8,
        hidden_dim=16, enc_layers=1, dec_layers=2, latent_dim=4,
        img_feat_dim=8, dropout=0.0, compute_dtype="float32",
        z_cond="init+input")
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(2))
    src = jnp.array([[4, 5, 6, 7, 0, 0], [8, 9, 0, 0, 0, 0],
                     [10, 11, 12, 13, 14, 15]], jnp.int32)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 8)), jnp.float32)
    out = {}
    for flag in (0, 1, 2):  # off / full fused step / GRU-chain-only
        dcfg = DecodeConfig(beam_size=3, max_length=10, batch_size=3,
                            pallas_step=flag)
        toks, scores = jax.jit(make_translate_fn(model, dcfg))(params, src, img)
        out[flag] = (np.asarray(toks), np.asarray(scores))
    for flag in (1, 2):
        np.testing.assert_array_equal(out[flag][0], out[0][0])
        np.testing.assert_allclose(out[flag][1], out[0][1], rtol=2e-5, atol=2e-5)
