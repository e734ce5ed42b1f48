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
    Wh = jnp.asarray(params["scan"]["cell"]["hh"]["kernel"])
    bh = jnp.asarray(params["scan"]["cell"]["hh"]["bias"])
    x_proj = jnp.array(x) @ Wi + bi
    outs, fin = gru_layer_scan(
        x_proj, jnp.array(m), jnp.zeros((B, H)), Wh, bh, interpret=True
    )
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_ref), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fin), np.asarray(fin_ref), rtol=1e-3, atol=1e-4)
